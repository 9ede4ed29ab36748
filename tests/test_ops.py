"""Direct ops-level tests (most operators are covered end-to-end via
the driver-sim in test_queries.py; these cover properties the SQL
compare can't express)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_seeded_sample_layout_independent(ray_session):
    """O3 scale form: the hash sample keeps the same KEY SET whatever
    the block layout, unlike random_sample (and matches the exact
    integer-threshold spec)."""
    from kgray import ops

    keys = pa.table({"k": pa.array(range(10_000), type=pa.int64())})
    one = ray.data.from_arrow(keys)
    many = ray.data.from_arrow(keys).repartition(17)
    s1 = sorted(ops.seeded_sample(one, "k").to_pandas()["k"])
    s2 = sorted(ops.seeded_sample(many, "k").to_pandas()["k"])
    assert s1 == s2 and 300 < len(s1) < 700  # ~5% of 10k
    # spec check vs the numpy kernel directly
    h = ops._mix64(np.arange(10_000, dtype=np.uint64) ^ np.uint64(42))
    want = sorted(np.flatnonzero(h < np.uint64((1 << 64) // 20)).tolist())
    assert s1 == want


def test_salient_terms_join_path_parity(ray_session, monkeypatch):
    """doc_salient_terms' hash-join scale path (vocab above the
    broadcast gate) must equal the broadcast path."""
    from kgray import ops, queries

    sf = "/root/testdata/sf0.001"
    bcast = queries.q_doc_salient_terms(sf).to_pandas()
    monkeypatch.setattr(ops, "BROADCAST_MAX_KEYS", 0)
    joined = queries.q_doc_salient_terms(sf).to_pandas()
    cols = sorted(bcast.columns)
    a = bcast.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    b = joined.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    assert a.equals(b)


def test_with_global_index_layout_independent(ray_session):
    """O4: the distributed prefix-sum must produce the identical global
    index / running sum whatever the block layout (1 block vs many),
    and match the sequential definition exactly."""
    from kgray import ops

    rng = np.random.default_rng(7)
    keys = rng.permutation(20_000).astype(np.int64)
    vals = rng.integers(0, 100, 20_000).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})

    for nparts in (1, 23):
        ds = ray.data.from_arrow(t).repartition(nparts)
        out = (
            ops.with_global_index(ds, ["k"], index_col="idx",
                                  cumsum_of="v", cumsum_col="run")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert (out["idx"].to_numpy() == np.arange(20_000)).all()
        v = out["v"].to_numpy()
        assert (out["run"].to_numpy() == np.cumsum(v) - v).all()


def test_source_format_roundtrip(ray_session, tmp_path):
    """§2.1: CSV and JSONL adapters round-trip the same rows the
    parquet source produces (int/string columns — interchange types)."""
    import pandas as pd

    from kgray import sources

    base = sources.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )
    want = base.to_pandas().sort_values("event_id", ignore_index=True)

    for fmt in ("csv", "jsonl"):
        out = str(tmp_path / fmt)
        sources.write_table(base, out, format=fmt)
        got = (
            sources.read_table(
                out, format=fmt, columns=["event_id", "user_id", "event_type"]
            )
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"event_id": "int64", "user_id": "int64"}), want, check_like=True
        )


def test_connected_components_distributed(ray_session):
    """G1: distributed min-label propagation == driver union-find,
    including the Ray 2.49 empty-first-block join hazard (an empty
    leading block used to suppress the join's schema broadcast —
    drop_empty_blocks compacts it away)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    # path + pair + triangle, fed with an empty FIRST block on purpose
    sch = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    edges = rd.from_arrow(
        [sch.empty_table(), pa.table({"a": [2, 3, 7, 10, 21, 22], "b": [1, 2, 3, 11, 20, 21]})]
    )
    out = ops.connected_components_distributed(edges, "a", "b", num_partitions=4)
    lab = {r["node"]: r["label"] for r in out.take_all()}
    assert lab == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    # random graph vs an independent union-find
    rng = np.random.default_rng(7)
    a = rng.integers(0, 800, 1500).astype("int64")
    b = rng.integers(0, 800, 1500).astype("int64")
    keep = a != b
    a, b = a[keep], b[keep]
    got = {
        r["node"]: r["label"]
        for r in ops.connected_components_distributed(
            rd.from_arrow(pa.table({"a": a, "b": b})), num_partitions=4
        ).take_all()
    }

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comps: dict[int, list[int]] = {}
    for x in set(a.tolist()) | set(b.tolist()):
        comps.setdefault(find(x), []).append(x)
    want = {x: min(nodes) for nodes in comps.values() for x in nodes}
    assert got == want


def test_drop_empty_blocks(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    sch = pa.schema([("x", pa.int64())])
    ds = rd.from_arrow([sch.empty_table(), pa.table({"x": [1]}), sch.empty_table()])
    out = ops.drop_empty_blocks(ds)
    assert out.count() == 1 and out.num_blocks() == 1
    # all-empty input keeps its schema
    out2 = ops.drop_empty_blocks(rd.from_arrow([sch.empty_table()]))
    assert out2.count() == 0 and out2.schema().names == ["x"]


def test_ipc_format_roundtrip(ray_session, tmp_path):
    """§2.1: the Arrow IPC adapter round-trips bit-exact (zero-parse
    interchange — types survive, unlike CSV/JSONL), including a
    list<float> column that the row formats can't carry."""
    import pandas as pd

    from kgray import sources

    base = sources.read_table("/root/testdata/sf0.001/embeddings.parquet")
    want = base.to_pandas().sort_values("vec_id", ignore_index=True)
    out = str(tmp_path / "ipc")
    sources.write_table(base, out, format="arrow")
    got = (
        sources.read_table(out, format="arrow")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_global_quantile_disc(ray_session):
    """Exact global discrete quantile == numpy's sorted-index value,
    across block layouts and at the q extremes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 40, 10_001).astype("int64")
    t = pa.table({"x": vals})
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            want = int(np.sort(vals)[int(np.floor((len(vals) - 1) * q))])
            assert ops.global_quantile_disc(ds, "x", q) == want, (nblocks, q)


def test_bloom_prefilter_superset_and_exactness(ray_session):
    """Bloom prefilter: NO false negatives ever (every true member
    survives), and composed with the exact semi join it reproduces
    semi_join's result exactly — across block layouts and with an
    undersized bitmap that guarantees false positives."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(11)
    left_keys = [f"k{i}" for i in rng.integers(0, 500, 2_000)]
    right_keys = sorted({f"k{i}" for i in rng.integers(0, 500, 120)})
    left = pa.table({"key": left_keys, "v": np.arange(2_000, dtype=np.int64)})
    right = pa.table({"key": right_keys})
    want = set(np.flatnonzero(np.isin(np.array(left_keys), right_keys)))

    for nblocks in (1, 5):
        for m_bits in (1 << 16, 256):  # 256 bits over 120 keys: FPs certain
            lds = rd.from_arrow(left).repartition(nblocks)
            rds = rd.from_arrow(right).repartition(nblocks).materialize()
            bloom = ops.bloom_build(rds, "key", m_bits=m_bits, nhash=3)
            cand = ops.bloom_prefilter(
                lds, "key", ray.put(bloom), m_bits=m_bits, nhash=3
            )
            got_cand = set(cand.to_pandas()["v"])
            assert want <= got_cand, (nblocks, m_bits)  # superset always
            exact = ops.semi_join(cand, "key", rds, "key")
            assert set(exact.to_pandas()["v"]) == want, (nblocks, m_bits)


def test_skew_join_parity(ray_session):
    """skew_join == hash_join rows at every threshold regime: all-hot
    (threshold 0), mixed, and all-cold (threshold above the max key
    count) — across block layouts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(7)
    # Zipf-ish: key 0 hot (200 rows), keys 1..49 cold
    keys = np.concatenate([np.zeros(200, np.int64), rng.integers(1, 50, 300)])
    left = pa.table({"k": keys, "v": np.arange(len(keys), dtype=np.int64)})
    right = pa.table(
        {"rk": np.arange(50, dtype=np.int64),
         "attr": [f"a{i}" for i in range(50)]}
    )

    def run(join_fn):
        out = join_fn.to_pandas().sort_values(["v"], ignore_index=True)
        return out[["k", "v", "attr"]]

    for nblocks in (1, 6):
        lds = rd.from_arrow(left).repartition(nblocks)
        rds = rd.from_arrow(right).repartition(nblocks)
        want = run(
            ops.normalize_blocks(
                ops.hash_join(lds, rds, on=("k",), right_on=("rk",), num_partitions=4),
                pa.schema([("k", pa.int64()), ("v", pa.int64()), ("attr", pa.string())]),
            )
        )
        for thr in (0, 50, 10_000):
            got = run(
                ops.skew_join(
                    rd.from_arrow(left).repartition(nblocks),
                    rd.from_arrow(right).repartition(nblocks),
                    on="k", right_on="rk",
                    hot_threshold=thr, num_partitions=4,
                )
            )
            pd.testing.assert_frame_equal(got, want), (nblocks, thr)


def test_exact_heavy_hitters(ray_session):
    """Two-pass bounded heavy hitters == the exact combiner path when
    the guarantee holds (including a regime where per-block candidate
    pruning REALLY drops values), and raises loudly when the sketch
    width is defeated — across block layouts."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(13)
    # heavies must clear the guarantee: 200 > total/sketch_k = 11000/64
    heavy = np.repeat([f"h{i}" for i in range(30)], 200)  # 30 x 200
    tail = [f"t{i}" for i in range(5000)]  # 5000 singletons
    vals = np.concatenate([heavy, np.array(tail, dtype=object)])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(list(vals), pa.string())})

    for nblocks in (1, 8):
        ds = rd.from_arrow(t).repartition(nblocks)
        want = (
            ops.frequent_items(ds, "v", 10)
            .to_pandas()
            .sort_values(["n", "v"], ascending=[False, True], ignore_index=True)
        )
        got = ops.exact_heavy_hitters(
            rd.from_arrow(t).repartition(nblocks), "v", 10, sketch_k=64
        ).to_pandas()
        assert got.equals(want), nblocks

    # near-uniform data defeats a tiny sketch -> loud failure
    uni = pa.table({"v": pa.array([f"u{i % 400}" for i in range(4000)])})
    with pytest.raises(ValueError, match="guarantee void"):
        ops.exact_heavy_hitters(
            rd.from_arrow(uni).repartition(4), "v", 10, sketch_k=2
        )

    # ADVICE r3: when no block ever truncates (domain < sketch_k) the
    # candidate set is the FULL domain and the result is provably
    # exact — must NOT void the guarantee, even with total >= sketch_k
    # and fewer than k distinct values (kth used to default to 1)
    small = pa.table({"v": pa.array([f"s{i % 3}" for i in range(100)])})
    got = ops.exact_heavy_hitters(
        rd.from_arrow(small).repartition(4), "v", 10, sketch_k=8
    ).to_pandas()
    assert sorted(got["v"]) == ["s0", "s1", "s2"]
    assert got["n"].sum() == 100


def test_binary_files_source(ray_session, tmp_path):
    """S8: multimodal ingest via read_binary_files — KGIM blobs
    written as loose files round-trip through the source and the
    metadata stage agrees with the in-memory fixture table."""
    import pyarrow as pa
    import ray.data as rd

    from kgray import sources
    from kgray.extras import multimodal

    t = multimodal.make_image_table(20)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(t.num_rows):
        (d / f"{t['img_id'][i].as_py():04d}.kgim").write_bytes(
            t["image"][i].as_py()
        )

    ds = sources.read_table(str(d), format="binary_files")

    def parse(b: pa.Table) -> pa.Table:
        import os

        ids = [
            int(os.path.basename(p).split(".")[0]) for p in b["path"].to_pylist()
        ]
        return pa.table(
            {
                "img_id": pa.array(ids, pa.int64()),
                "image": pa.array(b["bytes"].to_pylist(), pa.binary()),
            }
        )

    meta = multimodal.image_metadata(
        ds.map_batches(parse, batch_format="pyarrow")
    ).to_pandas().sort_values("img_id", ignore_index=True)
    want = multimodal.image_metadata(
        rd.from_arrow(t.select(["img_id", "image"]))
    ).to_pandas().sort_values("img_id", ignore_index=True)
    assert meta.equals(want)


def test_pagerank_matches_sequential_twin(ray_session):
    """G2: the distributed integer PageRank equals an independent
    sequential evaluation of the same fixed-point recurrence on a
    small graph with a dangling node (4) and a node with no in-edges
    (5)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    E = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (5, 1)]
    got = (
        ops.pagerank(
            rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array([a for a, _ in E], pa.int64()),
                        "dst": pa.array([b for _, b in E], pa.int64()),
                    }
                )
            ).repartition(4),
            "src",
            "dst",
            iters=3,
        )
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )

    nodes = sorted({n for e in E for n in e})
    deg = {}
    for a, _ in E:
        deg[a] = deg.get(a, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        nxt = {n: 150_000 for n in nodes}
        for a, b in E:
            nxt[b] += (85 * r[a]) // (100 * deg[a])
        r = nxt
    assert got["node"].tolist() == nodes
    assert got["rank_fp"].tolist() == [r[n] for n in nodes]
    # dangling node 4 keeps only base + in-push; source node 5 sits at base
    assert r[5] == 150_000


def test_cms_sketch_guarantee_and_layout_independence(ray_session):
    """X46: with a deliberately undersized sketch (width 8, heavy
    collisions) the CMS estimate never underestimates the true count,
    and the sketch is bit-identical across block layouts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 40, size=5000, dtype=np.int64)
    t = pa.table({"k": keys})
    sk1 = ops.cms_build(rd.from_arrow(t).repartition(7), "k", depth=4, width=8)
    sk2 = ops.cms_build(rd.from_arrow(t).repartition(1), "k", depth=4, width=8)
    assert np.array_equal(sk1, sk2)

    uniq, true = np.unique(keys, return_counts=True)
    est = ops.cms_estimate(uniq, sk1)
    assert (est >= true).all()
    # every row of the sketch conserves total mass
    assert (sk1.sum(axis=1) == len(keys)).all()


def test_profile_columns_native_minmax_and_nulls(ray_session):
    """X48: min/max partials merge in NATIVE type (a string merge
    would order '150' < '9'), nulls counted, distinct exact — across
    an adversarial multi-block layout."""
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    t = pa.table(
        {
            "k": pa.array([150, 9, 1000, None, 9], pa.int64()),
            "s": pa.array(["b", None, "a", "zz", "a"], pa.string()),
        }
    )
    got = ops.profile_columns(rd.from_arrow(t).repartition(5), ["k", "s"])
    rows = {r["col_name"]: r for r in got.to_pylist()}
    assert rows["k"] == {
        "col_name": "k", "n_rows": 5, "n_nulls": 1, "min_str": "9",
        "max_str": "1000", "n_distinct": 3,
    }
    assert rows["s"] == {
        "col_name": "s", "n_rows": 5, "n_nulls": 1, "min_str": "a",
        "max_str": "zz", "n_distinct": 3,
    }


def test_triangle_count_normalizes_and_counts_once(ray_session):
    """G3: K4 plus a pendant edge has exactly 4 triangles; duplicate,
    reversed and self-loop edges must not change the count."""
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
         (2, 1), (3, 1), (1, 2), (5, 5)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in E], pa.int64()),
                "dst": pa.array([b for _, b in E], pa.int64()),
            }
        )
    ).repartition(4)
    out = ops.triangle_count(ds).to_pandas()
    assert out["n_triangles"].tolist() == [4]


def test_text_source_roundtrip(ray_session, tmp_path):
    """S9: line-delimited text ingest — one row per line, lines
    preserved in file order per file."""
    from kgray import sources

    p = tmp_path / "corpus"
    p.mkdir()
    lines = [f"line {i} tok{i % 3}" for i in range(50)]
    (p / "a.txt").write_text("\n".join(lines[:30]) + "\n")
    (p / "b.txt").write_text("\n".join(lines[30:]) + "\n")
    ds = sources.read_table(str(p), format="text")
    got = sorted(r["text"] for r in ds.take_all())
    assert got == sorted(lines)


def test_cube_from_finest_levels():
    """A16: all four grouping sets of a 2-dim cube derive from the
    finest table; sentinel rows sum correctly."""
    import pyarrow as pa

    from kgray import ops

    fine = pa.table(
        {
            "a": ["x", "x", "y"],
            "b": [1, 2, 1],
            "n": [2, 3, 5],
        }
    )
    out = ops.cube_from_finest(fine, ["a", "b"], ["n"])
    rows = {(r["a"], r["b"]): r["n"] for r in out.to_pylist()}
    assert rows[("x", "1")] == 2 and rows[("x", "2")] == 3
    assert rows[("x", "ALL")] == 5 and rows[("y", "ALL")] == 5
    assert rows[("ALL", "1")] == 7 and rows[("ALL", "2")] == 3
    assert rows[("ALL", "ALL")] == 10
    assert len(rows) == 8


def test_waterfill_level_edges():
    """X55: the MAX-over-qualifying-candidates identity handles
    budget >= total (no cap), tiny budgets (level 0), and the
    partially-covered middle case."""

    def level(tokens, B):
        order = sorted(range(len(tokens)), key=lambda i: tokens[i])
        k, pfx, best = len(tokens), 0, None
        for j, i in enumerate(order, start=1):
            cand = (B - pfx) // (k - j + 1)
            if cand < tokens[i]:
                best = cand if best is None else max(best, cand)
            pfx += tokens[i]
        return best if best is not None else max(tokens)

    assert level([1, 10], 5) == 4            # cover 1, cap 10 at 4
    assert level([5, 5], 20) == 5            # budget >= total: no cap
    assert level([4, 4, 4], 6) == 2          # uniform split
    assert level([1, 2, 100], 10) == 7
    assert level([3, 3, 3], 1) == 0          # tiny budget
    # the chosen level is maximal: one more would exceed the budget
    for toks, B in [([1, 10], 5), ([4, 4, 4], 6), ([1, 2, 100], 10)]:
        T = level(toks, B)
        assert sum(min(t, T) for t in toks) <= B
        assert sum(min(t, T + 1) for t in toks) > B


def test_drop_empty_blocks_public_fallback(ray_session):
    """VERDICT r3 #3: with the Ray-private iter_internal_ref_bundles
    path disabled, drop_empty_blocks must still feed joins safely via
    the public count+repartition fallback — identical join results,
    no zero-row block in the output."""
    import pyarrow.compute as pc

    from kgray import ops

    t = pa.table(
        {
            "k": pa.array(list(range(50)), pa.int64()),
            "v": pa.array([f"v{i}" for i in range(50)]),
        }
    )
    # a selective filter leaves empty blocks behind
    left = ray.data.from_arrow(t).repartition(10).filter(
        lambda r: r["k"] % 7 == 0
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(0, 50, 2)), pa.int64()),
                  "w": pa.array(list(range(25)), pa.int64())})
    ).repartition(8).filter(lambda r: r["k"] >= 14)

    def joined_rows():
        out = ops.normalize_blocks(
            ops.hash_join(
                ops.drop_empty_blocks(left),
                ops.drop_empty_blocks(right),
                on=("k",),
                num_partitions=4,
            ),
            pa.schema([("k", pa.int64()), ("v", pa.string()), ("w", pa.int64())]),
        )
        return sorted(map(tuple, out.to_pandas().itertuples(index=False)))

    base = joined_rows()
    ops._FORCE_PUBLIC_DROP_EMPTY = True
    try:
        # the fallback itself yields no empty block
        m = ops.drop_empty_blocks(left)
        sizes = [
            meta.num_rows
            for b in m.materialize().iter_internal_ref_bundles()
            for meta in b.metadata
        ]
        assert sizes and all(s is None or s > 0 for s in sizes)
        assert joined_rows() == base
    finally:
        ops._FORCE_PUBLIC_DROP_EMPTY = False
    assert len(base) > 0


def test_triangle_degree_orientation_star(ray_session):
    """VERDICT r3 #6: on a hub-skewed star graph the degree-rank
    orientation produces ZERO wedges (every edge points leaf->hub, all
    out-degrees are 1) while the legacy id orientation fans out O(d^2)
    wedges at the hub. Both count the same (zero) triangles."""
    from kgray import ops

    # hub id 60 in the MIDDLE of the leaf id range: under the legacy
    # a<b orientation the hub is upper endpoint for 60 edges and lower
    # for 60, fanning out 60*60 wedges at the hub; under degree rank
    # the hub sorts last, every edge points leaf->hub, zero wedges.
    hub, leaves = 60, [i for i in range(121) if i != 60]
    t = pa.table(
        {
            "src": pa.array([hub] * len(leaves), pa.int64()),
            "dst": pa.array(leaves, pa.int64()),
        }
    )
    edges = ray.data.from_arrow(t)
    by_deg = ops.triangle_count(edges, with_wedges=True).to_pandas()
    by_id = ops.triangle_count(
        edges, orient="id", with_wedges=True
    ).to_pandas()
    assert int(by_deg["n_triangles"].iloc[0]) == 0
    assert int(by_id["n_triangles"].iloc[0]) == 0
    assert int(by_deg["n_wedges"].iloc[0]) == 0
    assert int(by_id["n_wedges"].iloc[0]) == 60 * 60


def test_triangle_orientation_parity_random(ray_session):
    """Degree and id orientations agree with a brute-force triangle
    count on a random graph (including hub skew + ties in degree)."""
    import itertools

    import numpy as np

    from kgray import ops

    rng = np.random.default_rng(7)
    m = 300
    a = rng.integers(0, 40, m)
    b = rng.integers(0, 40, m)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())})
    )
    und = {tuple(sorted(p)) for p in zip(a.tolist(), b.tolist()) if p[0] != p[1]}
    adj = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want = sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    got_deg = ops.triangle_count(edges).to_pandas()["n_triangles"].iloc[0]
    got_id = ops.triangle_count(edges, orient="id").to_pandas()["n_triangles"].iloc[0]
    assert int(got_deg) == want == int(got_id)


def test_global_quantile_refine(ray_session):
    """Unbounded-domain exact quantile (bit-plane refinement) ==
    numpy's sorted-index value across block layouts, for continuous
    float64 (all-distinct), int64 with negatives, and with NULLs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(11)
    cases = [
        rng.normal(0.0, 1e6, 5_003),                      # continuous, signed
        rng.integers(-(10**12), 10**12, 5_003).astype("int64"),
    ]
    for vals in cases:
        t = pa.table({"x": vals})
        for nblocks in (1, 9):
            ds = rd.from_arrow(t).repartition(nblocks)
            for q in (0.0, 0.1, 0.5, 0.9, 1.0):
                want = np.sort(vals)[int(np.floor((len(vals) - 1) * q))]
                got = ops.global_quantile_refine(ds, "x", q)
                assert got == want, (vals.dtype, nblocks, q, got, want)
    # NULLs excluded (SQL semantics)
    v = np.arange(101, dtype="float64")
    t = pa.table({"x": pa.array(list(v) + [None] * 50, type=pa.float64())})
    ds = rd.from_arrow(t).repartition(4)
    assert ops.global_quantile_refine(ds, "x", 0.5) == 50.0


def test_global_quantiles_refine_shared_passes(ray_session):
    """The multi-quantile variant (one shared count pass + 4 shared
    refinement passes, unique-prefix deduped) returns exactly the
    per-quantile results of the single-quantile wrapper."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray import ops

    rng = np.random.default_rng(13)
    vals = rng.normal(0.0, 1e4, 4_001)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(7)
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    got = ops.global_quantiles_refine(ds, "x", qs)
    srt = np.sort(vals)
    want = [srt[int(np.floor((len(vals) - 1) * q))] for q in qs]
    assert got == want
    # duplicate quantiles collapse to identical answers (prefix dedup)
    assert ops.global_quantiles_refine(ds, "x", (0.5, 0.5)) == [want[2], want[2]]
    assert ops.global_quantiles_refine(ds, "x", ()) == []
