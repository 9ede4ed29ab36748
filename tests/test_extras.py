"""Tests for the large-scale extras: dedup family, ANN search, text
analysis, multimodal plumbing (task-brief components)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    """Synthetic doc set with KNOWN near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about rivers and mountains under a pale winter sky"
    )
    docs = {
        0: base,
        1: base.replace("quick", "quikc"),           # near-dup of 0
        2: base.replace("winter", "summer") + " ok", # near-dup of 0
        3: "completely different text about database shuffle partitions and arrow batches",
        4: "completely different text about database shuffle partitions and arrow batch",  # near-dup of 3
        5: "unrelated short poem of stars",
        6: base,                                      # exact dup of 0
    }
    tbl = pa.table(
        {"doc_id": pa.array(list(docs), type=pa.int64()),
         "text": pa.array(list(docs.values()), type=pa.string())}
    )
    return ray.data.from_arrow(tbl), docs


def test_exact_dedup(dup_corpus):
    from kgray.extras.dedup import exact_dedup

    ds, docs = dup_corpus
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert len(out) == 6  # 7 docs, one exact dup
    dup_row = out[out["n_copies"] == 2]
    assert len(dup_row) == 1 and dup_row["keep_id"].iloc[0] == 0


def test_minhash_lsh_finds_known_pairs(dup_corpus):
    from kgray.extras.dedup import minhash_lsh_pairs

    ds, docs = dup_corpus
    out = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert (0, 6) in pairs  # exact dup -> jaccard 1.0
    assert (0, 1) in pairs and (0, 2) in pairs and (3, 4) in pairs
    assert all(j >= 0.5 for j in out["jaccard"].to_pylist())
    # no cross-topic false positives
    assert not any({a, b} == {0, 3} or {a, b} == {0, 5} for a, b in pairs)


def test_simhash_pairs(dup_corpus):
    from kgray.extras.dedup import simhash_pairs, simhash64

    ds, docs = dup_corpus
    assert simhash64(docs[0]) == simhash64(docs[6])
    out = simhash_pairs(ds, "text", "doc_id", max_hamming=6)
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert (0, 6) in pairs
    assert (0, 1) in pairs  # one-word typo -> tiny hamming distance


def test_ngram_topk(dup_corpus):
    from kgray.extras.dedup import ngram_jaccard_topk

    ds, docs = dup_corpus
    out = ngram_jaccard_topk(ds, "text", "doc_id", k=5)
    assert len(out) >= 3
    top = (out["a"][0].as_py(), out["b"][0].as_py(), out["jaccard"][0].as_py())
    assert top[:2] == (0, 6) and top[2] == 1.0  # exact dup ranks first


SF = "/root/testdata/sf0.001"


def test_knn_brute_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from kgray.extras.annsearch import knn_brute, _to_matrix, _normalize

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(t)
    queries = t.slice(0, 3)
    out = knn_brute(ds, queries, k=5)
    # independent numpy reference
    m = _normalize(_to_matrix(t["embedding"]))
    ids = t["vec_id"].to_pylist()
    for qi in range(3):
        sims = m @ m[qi]
        order = sorted(range(len(ids)), key=lambda i: (-round(sims[i], 4), ids[i]))[:5]
        want = [ids[i] for i in order]
        got = [
            n for q, n in zip(out["query_id"].to_pylist(), out["neighbor_id"].to_pylist())
            if q == queries["vec_id"][qi].as_py()
        ]
        assert got == want


def test_knn_lsh_recall(ray_session):
    import pyarrow.parquet as pq

    from kgray.extras.annsearch import knn_brute, knn_lsh

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(t)
    queries = t.slice(0, 5)
    exact = knn_brute(ds, queries, k=10)
    stats: dict = {}
    approx = knn_lsh(ds, queries, k=10, stats=stats)
    # the rescore must be PRUNED, not a full-corpus pack+shuffle
    # (VERDICT r2 task 2): candidates ≪ corpus -> broadcast is_in path
    assert stats["path"] == "broadcast", stats
    assert 0 < stats["n_candidates"] < len(t), stats

    def sets(tbl):
        d = {}
        for q, n in zip(tbl["query_id"].to_pylist(), tbl["neighbor_id"].to_pylist()):
            d.setdefault(q, set()).add(n)
        return d

    e, a = sets(exact), sets(approx)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_knn_ivf_recall(ray_session):
    import pyarrow.parquet as pq

    from kgray.extras.annsearch import knn_brute, knn_ivf

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(t)
    queries = t.slice(0, 5)
    exact = knn_brute(ds, queries, k=10)
    approx = knn_ivf(ds, queries, k=10, ncells=8, nprobe=3)

    def sets(tbl):
        d = {}
        for q, n in zip(tbl["query_id"].to_pylist(), tbl["neighbor_id"].to_pylist()):
            d.setdefault(q, set()).add(n)
        return d

    e, a = sets(exact), sets(approx)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # determinism: same call -> same result
    again = knn_ivf(ds, queries, k=10, ncells=8, nprobe=3)
    assert approx.equals(again)


def test_cosine_dup_pairs(ray_session):
    from kgray.extras.annsearch import cosine_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    vecs = [base[i] for i in range(20)] + [base[i] + rng.standard_normal(16) * 0.01 for i in range(5)]
    t = pa.table(
        {
            "vec_id": pa.array(range(25), type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    out = cosine_dup_pairs(ray.data.from_arrow(t), threshold=0.98)
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    for i in range(5):
        assert (i, 20 + i) in pairs, (i, pairs)


def test_textstats(ray_session):
    from kgray.extras.textstats import langid, quality, fingerprint

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog sat in a house that is for sale, with a sign!",
                    "der Hund und die Katze sind nicht mit der Maus zu sehen",
                    "这是一个中文文档的示例文本 它应该被识别为中文",
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    preds = dict(zip(*[langid(ds).to_pandas()[c] for c in ("doc_id", "lang_pred")]))
    assert preds[0] == "en" and preds[1] == "de" and preds[2] == "zh"

    q = quality(ds).to_pandas().set_index("doc_id")
    assert q.loc[0, "n_words"] == len(t["text"][0].as_py().split())
    assert 0 < q.loc[0, "punct_ratio"] < 0.1
    assert q.loc[0, "stopword_ratio"] > 0.2

    f1 = fingerprint(ds).to_pandas()
    f2 = fingerprint(ds).to_pandas()
    assert (f1["fingerprint"] == f2["fingerprint"]).all()  # deterministic
    assert f1["fingerprint"].nunique() == 3


def test_minhash_batch_parity():
    """The chunked/vocab batched signature kernels must be
    bit-identical to the per-doc reference formulation."""
    from kgray.extras import dedup

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(50)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 50, size=int(n)))
        for n in rng.integers(1, 80, size=40)
    ]
    texts += ["", "ab", "abcd", "abcde", "x" * 3, "same text", "same text"]
    a, b = dedup._perm_params(64)
    ref = [dedup.minhash_signature(dedup.shingle_hashes(t, 5), a, b) for t in texts]
    vocab_sigs = dedup.minhash_signatures_vocab(texts, 5, a, b, {})
    batch_sigs = dedup.minhash_signatures_batch(
        [dedup.shingle_hashes(t, 5) for t in texts], a, b
    )
    for i in range(len(texts)):
        assert (ref[i] == vocab_sigs[i]).all(), texts[i]
        assert (ref[i] == batch_sigs[i]).all(), texts[i]


def test_simhash_batch_parity():
    """Batched SimHash == per-doc simhash64 (incl. the -2^63 int64
    offset convention), on varied and edge-case texts."""
    from kgray.extras import dedup

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 40, size=int(n)))
        for n in rng.integers(1, 60, size=30)
    ]
    texts += ["", "one", "one one one", "a b a b"]
    got = dedup.simhash_batch(texts, {})
    want = [dedup.simhash64(t) - (1 << 63) for t in texts]
    assert got.tolist() == want


def test_band_hashes_bucket_semantics():
    """Band hashes collide exactly when band chunks are equal."""
    from kgray.extras.dedup import band_hashes

    rng = np.random.default_rng(5)
    sigs = rng.integers(0, 2**63, size=(3, 64), dtype=np.uint64)
    sigs[1] = sigs[0]  # doc 1 identical to doc 0
    sigs[2, :4] = sigs[0, :4]  # doc 2 shares band 0 only (16 bands x 4 rows)
    h = band_hashes(sigs, 16, 4)
    assert (h[0] == h[1]).all()
    assert h[2][0] == h[0][0]
    assert (h[2][1:] != h[0][1:]).all()
    # deterministic across calls
    assert (band_hashes(sigs, 16, 4) == h).all()


def test_pair_payload_broadcast_vs_join_parity(ray_session, dup_corpus, monkeypatch):
    """The broadcast fast path and the hash-join scale path of the
    pair-verify payload attach must produce identical final pairs."""
    from kgray.extras import dedup

    ds, _ = dup_corpus
    bcast = dedup.minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
    monkeypatch.setattr(dedup, "PAYLOAD_BROADCAST_MAX_ROWS", 0)
    joined = dedup.minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
    assert bcast.equals(joined)


def test_r1_golden_equivalence(ray_session):
    """The distributed verify rewrite (round 2) must reproduce the
    round-1 driver outputs exactly (VERDICT.md next-round item 1)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from kgray import queries

    def canon(t):
        df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        return df.sort_values(list(df.columns), ignore_index=True)[sorted(df.columns)]

    # round-3: the same runs must also equal the INDEPENDENT
    # sequential references (reference_impl/sketch.py) via the
    # committed sf001_* goldens backing the DuckDB oracles.
    r3_gold = {
        "dedup_minhash_docs": "sf001_dedup_minhash",
        "dedup_simhash_docs": "sf001_dedup_simhash",
        "ngram_jaccard_topk": "sf001_ngram_topk",
        "embedding_dup_pairs": "sf001_embedding_dup_pairs",
        "knn_lsh": "sf001_knn_lsh",
        "knn_ivf": "sf001_knn_ivf",
    }
    sf = "/root/testdata/sf0.01"
    for name in [
        "dedup_minhash_docs",
        "dedup_simhash_docs",
        "ngram_jaccard_topk",
        "embedding_dup_pairs",
        "knn_lsh",
        "knn_ivf",
    ]:
        res = queries.QUERIES[name](sf)
        if not isinstance(res, pa.Table):
            res = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        if name != "knn_ivf":  # no r1 golden for knn_ivf
            gold = pq.read_table(f"tests/golden/r1_{name}.parquet")
            assert canon(res).equals(canon(gold)), name
        gold3 = pq.read_table(f"tests/golden/{r3_gold[name]}.parquet")
        a, b = canon(res), canon(gold3)
        assert list(a.columns) == list(b.columns), name
        assert a.astype(str).equals(b.astype(str)), f"{name} vs sketch reference"


def test_textstats_oracle_adversarial(ray_session):
    """doc_quality / langid / fingerprint must bit-match their DuckDB
    oracles on empty, short, and non-ASCII texts (ADVICE 2026-08-17:
    Python \\w vs RE2 \\w, division-by-zero NULL convention)."""
    import duckdb

    from kgray import queries
    from kgray.extras import textstats

    adv = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": [
                "",
                "ab",
                "exactly sixteen!",
                "Héllo wörld naïve café — ok!",
                "the and of to a in is that for with xyz.",
                "der hund und die katze sind nicht zu sehen",
            ],
        }
    )
    ds = ray.data.from_arrow(adv)
    con = duckdb.connect()
    con.register("documents_adv", adv)
    for name, eng_ds in [
        ("doc_quality", textstats.quality(ds)),
        ("langid_docs", textstats.langid(ds)),
        ("doc_fingerprint", textstats.fingerprint(ds)),
    ]:
        eng = eng_ds.to_pandas().sort_values("doc_id", ignore_index=True)
        sql = queries.ORACLE_SQL[name].replace("FROM documents", "FROM documents_adv")
        ora = con.execute(sql).fetchdf().sort_values("doc_id", ignore_index=True)
        assert eng.astype(str).equals(ora[list(eng.columns)].astype(str)), name


def test_multimodal_plumbing(ray_session):
    from kgray.extras import multimodal

    t = multimodal.make_image_table(40)
    ds = ray.data.from_arrow(t)
    meta = multimodal.image_metadata(ds).to_pandas().set_index("img_id")
    assert meta["header_ok"].all()
    src = t.to_pandas().set_index("img_id")
    assert (meta["parsed_width"] == src["width"]).all()
    assert (meta["parsed_height"] == src["height"]).all()

    feats = multimodal.featurize_images(ds, batch_size=16, concurrency=2).to_pandas()
    assert feats["decode_ok"].all()
    assert all(len(v) == multimodal.FEAT_DIM for v in feats["feature"])

    # undecodable payloads are flagged, not raised: a malformed PNG
    # (the stdlib codec raises ValueError) and a genuinely
    # unimplemented codec (NotImplementedError)
    bad = pa.table(
        {
            "img_id": pa.array([99], type=pa.int64()),
            "image": pa.array([b"\x89PNGxxxx"], type=pa.binary()),
            "format": pa.array(["png"]),
            "width": pa.array([1], type=pa.int32()),
            "height": pa.array([1], type=pa.int32()),
        }
    )
    out = multimodal.featurize_images(ray.data.from_arrow(bad), batch_size=4).to_pandas()
    assert not out["decode_ok"].iloc[0]
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNGxxxx", "png")
    # JPEG gained a real from-scratch codec in round 5 (X12d): a
    # malformed stream is now a ValueError like PNG's, and the
    # honest-stub NotImplementedError moved to codecs that genuinely
    # have no implementation in this container
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0jpegish", "jpeg")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFFxxxxWEBP", "webp")


def test_connected_components_and_dedup_remove(ray_session):
    """Union-find labels (root = component min) and the map-side
    removal filter built on them (dedup.minhash_dedup_docs)."""
    from kgray.extras import dedup

    # two components: {1,2,3} (a chain) and {10, 20}; 7 untouched
    pairs = pa.table(
        {
            "a": pa.array([2, 1, 10], type=pa.int64()),
            "b": pa.array([3, 2, 20], type=pa.int64()),
        }
    )
    labels = dedup.connected_components(pairs)
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 20: 10}

    # end-to-end removal on a corpus with exact near-dups: doc 0/1/2
    # share a text (one survivor: 0), 3 and 4 unique
    texts = ["the quick brown fox jumps over the lazy dog"] * 3 + [
        "completely different content here",
        "another unrelated document body",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = dedup.minhash_dedup_docs(ds, "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [0, 3, 4]

    # the at-scale path (pairs stay a Dataset; distributed min-label
    # components + size-gated anti_join) must agree with the driver
    # union-find path row for row
    out_d = dedup.minhash_dedup_docs(
        ds, "text", "doc_id", components="distributed"
    ).to_pandas()
    assert sorted(out_d["doc_id"]) == [0, 3, 4]
    # and auto with a zero gate must route to the distributed path
    out_a = dedup.minhash_dedup_docs(
        ds, "text", "doc_id", components="auto", driver_pairs_gate=0
    ).to_pandas()
    assert sorted(out_a["doc_id"]) == [0, 3, 4]


def test_knn_ivf_indexed_equals_unindexed(ray_session, tmp_path):
    """The cell-partitioned on-disk IVF index must return exactly the
    in-flight knn_ivf result while reading only probed cell dirs."""
    import os

    import pyarrow.parquet as pq

    from kgray.extras.annsearch import ivf_index_build, knn_ivf, knn_ivf_indexed

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(t)
    queries = t.slice(0, 5)
    idx = str(tmp_path / "ivf")
    info = ivf_index_build(ds, idx, ncells=8)
    assert info["ncells"] == 8
    stats: dict = {}
    indexed = knn_ivf_indexed(idx, queries, k=10, nprobe=3, stats=stats)
    plain = knn_ivf(ds, queries, k=10, ncells=8, nprobe=3)
    assert indexed.equals(plain)
    # physical pruning: fewer cell dirs read than exist on disk
    n_dirs = sum(1 for d in os.listdir(idx) if d.startswith("cell="))
    assert n_dirs == 8
    assert 0 < stats["n_cells_probed"] < n_dirs, stats


def test_kmeans_semdedup_matches_reference(ray_session):
    """X40/X41: distributed Lloyd + SemDeDup greedy must be bit-equal
    to the sequential reference twins at NON-default params (the
    defaults are pinned separately by the committed sf001 goldens),
    across different block layouts — the int64 quantization grid makes
    centroid sums exact regardless of how rows are partitioned."""
    import pyarrow.parquet as pq

    from kgray.extras import cluster
    from reference_impl import sketch

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    want_km = sketch.run_kmeans(t, k=7, iters=5, seed=3).to_pandas()
    want_sd = sketch.run_semdedup(t, k=7, iters=5, theta=0.3, seed=3).to_pandas()

    for nblocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        cents = cluster.kmeans_fit(ds, k=7, iters=5, seed=3)
        got_km = (
            cluster.kmeans_assign(ds, cents)
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )
        assert got_km.equals(want_km), f"kmeans mismatch at nblocks={nblocks}"
        got_sd = (
            cluster.semdedup(ds, k=7, iters=5, theta=0.3, seed=3)
            .to_pandas()
            .sort_values(["vec_id"], ignore_index=True)
        )
        assert got_sd.equals(
            want_sd.sort_values(["vec_id"], ignore_index=True)
        ), f"semdedup mismatch at nblocks={nblocks}"
    # the greedy pass must actually drop something at this theta
    assert len(want_sd) < t.num_rows


def test_knn_graph_matches_sequential_twin(ray_session):
    """cluster.knn_graph == the independent sequential reference on
    sf0.001 embeddings (data the committed golden does NOT cover),
    across block layouts."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from kgray.extras import cluster
    from reference_impl import sketch

    emb = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    want = (
        sketch.run_knn_graph(emb)
        .to_pandas()
        .sort_values(["query_id", "rn"], ignore_index=True)
    )
    for nblocks in (1, 5):
        got = (
            cluster.knn_graph(rd.from_arrow(emb).repartition(nblocks))
            .to_pandas()
            .sort_values(["query_id", "rn"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want), nblocks


def test_multimodal_corrupt_blobs_never_raise(ray_session):
    """ADVICE r3: truncated/corrupt blobs follow the M2 never-raise
    error-column convention — resize_images sets resize_ok=false, the
    featurizer sets decode_ok=false, sample_frames skips short videos
    instead of slicing short frames."""
    import struct

    import pyarrow as pa
    import ray.data as rd

    from kgray.extras import multimodal as mm

    good = mm.make_image_table(2)
    trunc = mm.MAGIC + struct.pack(">III", 16, 16, 3) + b"\x00" * 10
    t = pa.table(
        {
            "img_id": pa.array([0, 1, 2], pa.int64()),
            "image": pa.array(
                [good["image"][0].as_py(), trunc, b"\x89PNGnope"], pa.binary()
            ),
            "format": pa.array(["kgim", "kgim", "png"]),
        }
    )
    ds = rd.from_arrow(t)
    rz = mm.resize_images(ds, 4, 4).to_pandas().sort_values("img_id")
    assert rz["resize_ok"].tolist() == [True, False, False]
    ft = (
        ds.map_batches(
            mm.ImageFeaturizer,
            concurrency=1,
            batch_size=8,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("img_id")
    )
    assert ft["decode_ok"].tolist() == [True, False, False]

    vgood = mm.make_video_table(1)
    vtrunc = mm.VMAGIC + struct.pack(">IIII", 4, 8, 8, 3) + b"\x00" * 5
    vt = pa.table(
        {
            "vid_id": pa.array([0, 1], pa.int64()),
            "video": pa.array([vgood["video"][0].as_py(), vtrunc], pa.binary()),
        }
    )
    frames = mm.sample_frames(rd.from_arrow(vt)).to_pandas()
    assert set(frames["vid_id"]) == {0}  # truncated video skipped
    assert len(frames) > 0


def test_oversized_cell_split_parity(ray_session):
    """VERDICT r3 #5: a pathological corpus where ONE k-means cell
    captures ~90% of vectors. With max_cell_rows the oversized cell is
    re-clustered by a second deterministically-seeded Lloyd and no
    per-worker group exceeds ~max_cell_rows; output matches the
    sequential twin row for row for both semdedup and knn_graph."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray.extras import cluster
    from reference_impl import sketch

    rng = np.random.default_rng(0)
    n_big, n_rest, d = 270, 30, 6
    big = 0.9 + 0.01 * rng.standard_normal((n_big, d))  # one dense blob
    rest = rng.standard_normal((n_rest, d)) * 3.0
    V = np.vstack([big, rest])
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(V)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1)), d
            ),
        }
    )
    kw = dict(k=4, iters=4, seed=5, max_cell_rows=64)

    want_sd = (
        sketch.run_semdedup(emb, theta=0.9, **kw)
        .to_pandas()
        .sort_values(["vec_id"], ignore_index=True)
    )
    want_kg = (
        sketch.run_knn_graph(emb, k_neighbors=3, **kw)
        .to_pandas()
        .sort_values(["query_id", "rn"], ignore_index=True)
    )
    # the split must actually trigger: composite labels present, and
    # no final cell in the twin exceeds ~max_cell_rows (the sub-Lloyd
    # balances the dense blob; the bound we assert is the GROUP bound
    # the engine worker sees, allowing imbalance up to the blob size /
    # k_sub spread but requiring every label <= n_big rows strictly
    # split across >= 2 sub-cells)
    labels = want_sd["cell"].unique()
    assert (labels >= cluster.SPLIT_BASE).any(), "split did not trigger"
    for nblocks in (1, 7):
        ds = rd.from_arrow(emb).repartition(nblocks)
        got_sd = (
            cluster.semdedup(ds, theta=0.9, **kw)
            .to_pandas()
            .sort_values(["vec_id"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got_sd, want_sd)
        got_kg = (
            cluster.knn_graph(ds, k_neighbors=3, **kw)
            .to_pandas()
            .sort_values(["query_id", "rn"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got_kg, want_kg)
    # group-size bound: count rows per final label in the full
    # assignment — every group a worker holds is <= the blob split
    asg = cluster.assign_with_split(
        rd.from_arrow(emb), "embedding", "vec_id", **kw
    ).to_pandas()
    sizes = asg.groupby("cell").size()
    assert sizes.max() <= 64 * 2, sizes.max()  # sub-Lloyd imbalance slack
    assert (asg.groupby("cell").size().index >= cluster.SPLIT_BASE).any()


def test_png_roundtrip_all_filters():
    """Pure-stdlib PNG codec (VERDICT r3 #7): encode/decode round-trip
    is lossless for every scanline filter type (None/Sub/Up/Average/
    Paeth) and channel count (gray/RGB/RGBA). No Ray needed."""
    import numpy as np

    from kgray.extras import multimodal as mm

    rng = np.random.default_rng(3)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
        for ft in range(5):
            blob = mm.encode_png(img, filter_type=ft)
            out = mm.decode_png(blob)
            assert out.shape == img.shape, (c, ft)
            assert np.array_equal(out, img), (c, ft)
    # unsupported profile fails loudly as NotImplementedError
    import pytest
    import struct as st
    import zlib

    bad_ihdr = st.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)  # 16-bit depth

    def chunk(tag, data):
        return (
            st.pack(">I", len(data)) + tag + data
            + st.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    blob16 = mm.PNG_SIG + chunk(b"IHDR", bad_ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        mm.decode_png(blob16)


def test_featurizer_decodes_png(ray_session):
    """The actor-pool featurizer handles REAL PNG payloads end to end:
    the same pixels fed as kgim and as PNG produce identical feature
    vectors, with decode_ok true for both."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray.extras import multimodal as mm

    base = mm.make_image_table(4)
    imgs = [
        mm.decode_image(base["image"][i].as_py(), "kgim") for i in range(4)
    ]
    t = pa.table(
        {
            "img_id": pa.array(list(range(4)) + list(range(4, 8)), pa.int64()),
            "image": pa.array(
                [base["image"][i].as_py() for i in range(4)]
                + [mm.encode_png(img, filter_type=4) for img in imgs],
                pa.binary(),
            ),
            "format": pa.array(["kgim"] * 4 + ["png"] * 4),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            mm.ImageFeaturizer, concurrency=1, batch_size=8,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("img_id", ignore_index=True)
    )
    assert out["decode_ok"].all()
    for i in range(4):
        a = np.array(out["feature"][i])
        b = np.array(out["feature"][i + 4])
        assert np.array_equal(a, b), i


def test_bpe_train_encode_parity(ray_session):
    """BPE trainer path parity (driver loop vs distributed merge
    rounds) and encoder parity against the sequential twin
    (reference_impl/sketch.py), across block layouts."""
    from collections import Counter

    from kgray.extras import bpe
    from reference_impl import sketch

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "lower lowest newer newest wider widest",
        "low low low lower lower newest newest newest newest",
        "a ab abc abcd abcde the the the",
    ] * 3
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    freq = Counter(w for s in texts for w in s.split() if w)
    twin_merges = [tuple(p) for p in sketch._bpe_train(dict(freq), 40, 2)]
    for nblocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        m_local = bpe.train_bpe(ds, num_merges=40, min_count=2, distributed=False)
        m_dist = bpe.train_bpe(ds, num_merges=40, min_count=2, distributed=True)
        assert m_local == m_dist == twin_merges, nblocks
    # encode: actor-pool stage vs twin, bit-identical counts
    ds = ray.data.from_arrow(t).repartition(3)
    eng = (
        ds.map_batches(
            bpe.BpeEncoder, fn_constructor_args=(twin_merges,),
            concurrency=2, batch_size=4, batch_format="pyarrow",
        )
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    twin = (
        sketch.run_bpe_tokens(t, num_merges=40)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert eng.equals(twin)
    # EOW marker keeps whole-word tokens distinct: "low" as a word and
    # "low" as a prefix of "lower" must not collide
    enc = bpe.BpeEncoder(twin_merges)
    assert enc.encode_word("low") >= 1


def test_embed_corpus_layout_independent(ray_session):
    """The inference stage's output is a pure per-doc function:
    identical across block layouts, batch sizes, and actor counts
    (resumability at cluster scale), and equal to the sequential twin."""
    import pyarrow.parquet as pq

    from kgray.extras import inference
    from reference_impl import sketch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    twin = sketch.run_doc_embed(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    nws = np.sort(twin["n_words"].to_numpy())
    n = len(nws)
    thr = tuple(int(nws[(n - 1) * p // 4]) for p in (1, 2, 3))
    for nblocks, bs in ((1, 256), (5, 16)):
        ds = ray.data.from_arrow(docs).repartition(nblocks)
        eng = (
            inference.embed_corpus(ds, thr, batch_size=bs, concurrency=(1, 3))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert eng.equals(twin), (nblocks, bs)


def test_dropped_bucket_accounting(ray_session):
    """The max_bucket recall trade is counted, not silent (VERDICT r4
    #7): an over-limit bucket is skipped by pair-gen AND shows up in
    stats; with a permissive limit nothing is dropped."""
    from kgray.extras import dedup

    n = 12
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["same exact text for every document here"] * n),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    bands_ds = dedup.minhash_bands(ds, "text", "doc_id", num_perm=64, bands=16)

    stats: dict = {}
    pairs = dedup.pairs_from_buckets(bands_ds, "doc_id", max_bucket=5, stats=stats)
    assert pairs.count() == 0  # every bucket over the cap -> no pairs
    # identical docs: all 16 bands collapse to one 12-member bucket each
    assert stats["dropped_buckets"] == 16 and stats["dropped_bucket_rows"] == 16 * n
    assert stats["max_bucket"] == 5

    stats2: dict = {}
    pairs2 = dedup.pairs_from_buckets(
        dedup.minhash_bands(ds, "text", "doc_id", num_perm=64, bands=16),
        "doc_id", max_bucket=200, stats=stats2,
    )
    assert pairs2.count() == n * (n - 1) // 2
    assert stats2["dropped_buckets"] == 0 and stats2["dropped_bucket_rows"] == 0
    # the end-to-end entry point surfaces the same counter
    stats3: dict = {}
    out = dedup.minhash_lsh_pairs(ds, "text", "doc_id", stats=stats3)
    assert len(out) == n * (n - 1) // 2 and stats3["dropped_buckets"] == 0
    # ...and so does the REMOVAL entry point (regression: round 5
    # shipped a stats= forward in minhash_dedup_docs without the
    # parameter — NameError on every dedup_remove_docs call)
    stats4: dict = {}
    kept = dedup.minhash_dedup_docs(ds, "text", "doc_id", stats=stats4)
    assert kept.count() == 1 and stats4["dropped_buckets"] == 0
    assert dedup.minhash_dedup_docs(ds, "text", "doc_id").count() == 1


def test_jpeg_roundtrip_and_profile_gates():
    """From-scratch baseline JPEG codec (X12d). Lossy, so round-trip
    asserts bounded error on a smooth gradient (DCT-friendly) rather
    than equality; profile gates fail loudly. No Ray needed."""
    import struct as st

    import numpy as np
    import pytest

    from kgray.extras import jpeg

    grad = (
        np.add.outer(np.arange(24) * 3, np.arange(17) * 2)[..., None]
        + np.array([0, 40, 90])
    ).astype(np.uint8)
    prev_bytes = None
    for q in (95, 85, 50):
        blob = jpeg.encode_jpeg(grad, quality=q)
        out = jpeg.decode_jpeg(blob)
        assert out.shape == grad.shape
        err = np.abs(out.astype(int) - grad.astype(int)).max()
        assert err <= {95: 4, 85: 6, 50: 12}[q], (q, err)
        if prev_bytes is not None:  # lower quality never grows the stream
            assert len(blob) <= prev_bytes
        prev_bytes = len(blob)
    # grayscale single-component scan
    g = np.random.default_rng(3).integers(0, 256, (9, 13, 1), dtype=np.uint8)
    gout = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert gout.shape == g.shape
    # progressive (SOF2) rejected as NotImplementedError, not garbage
    blob = bytearray(jpeg.encode_jpeg(grad))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(blob))
    # truncated scan fails as ValueError
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(jpeg.encode_jpeg(grad)[:-30])
    # 4:2:0 (the real-world profile): decodes, bounded error on the
    # smooth gradient (chroma is nearly constant there)
    for sub_q in (95, 85):
        blob = jpeg.encode_jpeg(grad, quality=sub_q, subsample=True)
        out = jpeg.decode_jpeg(blob)
        err420 = np.abs(out.astype(int) - grad.astype(int)).max()
        assert out.shape == grad.shape and err420 <= 8, (sub_q, err420)
    # restart intervals: RSTn markers + DC-predictor resets must be
    # pixel-identical to the no-DRI stream (error resilience changes
    # the byte stream, never the decode)
    no_dri = jpeg.decode_jpeg(jpeg.encode_jpeg(grad, quality=90))
    with_dri = jpeg.decode_jpeg(
        jpeg.encode_jpeg(grad, quality=90, restart_interval=2)
    )
    assert np.array_equal(no_dri, with_dri)
    # 4:2:2-style sampling (not 4:4:4 nor 4:2:0) still gates
    blob = bytearray(jpeg.encode_jpeg(grad))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 11] = 0x21  # comp 1 sampling 2x1
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(blob))
    _ = st  # quiet linters


def test_jpeg_twin_bit_parity():
    """The engine decoder (numpy int64 matmuls) and the independent
    sequential twin (bitstring reader + four-loop IDCT) are bit-exact
    on the fixture corpus across all three bench qualities — the
    integer-IDCT contract that gives multimodal_jpeg_features its
    oracle."""
    import numpy as np

    from kgray.extras import jpeg, multimodal as mm
    from reference_impl.jpeg_twin import decode_jpeg_twin

    base = mm.make_image_table(24)
    for i in range(24):
        img = mm.decode_image(base["image"][i].as_py(), "kgim")
        blob = jpeg.encode_jpeg(
            img,
            quality=(95, 85, 75)[i % 3],
            subsample=(i % 2 == 1),
            restart_interval=(0, 2, 5)[i % 3],
        )
        assert np.array_equal(jpeg.decode_jpeg(blob), decode_jpeg_twin(blob)), i
    g = np.random.default_rng(5).integers(0, 256, (11, 19, 1), dtype=np.uint8)
    gb = jpeg.encode_jpeg(g, quality=85)
    assert np.array_equal(jpeg.decode_jpeg(gb), decode_jpeg_twin(gb))


def test_featurizer_decodes_jpeg(ray_session):
    """REAL JPEG payloads flow through the actor-pool featurizer end
    to end (decode_ok true, nonzero features); a corrupted payload
    takes the error-column convention instead of killing the task."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgray.extras import jpeg, multimodal as mm

    base = mm.make_image_table(4)
    blobs = [
        jpeg.encode_jpeg(
            mm.decode_image(base["image"][i].as_py(), "kgim"), quality=95
        )
        for i in range(4)
    ]
    blobs.append(blobs[0][:40])  # truncated
    t = pa.table(
        {
            "img_id": pa.array(list(range(5)), pa.int64()),
            "image": pa.array(blobs, pa.binary()),
            "format": pa.array(["jpeg"] * 5),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            mm.ImageFeaturizer, concurrency=1, batch_size=8,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("img_id", ignore_index=True)
    )
    assert out["decode_ok"][:4].all() and not out["decode_ok"][4]
    assert all(np.linalg.norm(np.array(out["feature"][i])) > 0 for i in range(4))


def test_jpeg_review_fixes():
    """Round-5 review regressions: (a) length-consistent-but-short
    segment bodies surface as ValueError (struct.error/IndexError
    would escape the featurizer's error-column catch and kill the Ray
    task); (b) the bit accumulators stay bounded (unmasked Python-int
    accumulators made entropy coding O(scan_bytes^2) on big images)."""
    import numpy as np
    import pytest

    from kgray.extras import jpeg

    grad = (
        np.add.outer(np.arange(24) * 3, np.arange(17) * 2)[..., None]
        + np.array([0, 40, 90])
    ).astype(np.uint8)
    blob = bytearray(jpeg.encode_jpeg(grad))
    sof = bytes(blob).find(b"\xff\xc0")
    blob[sof + 3] = 5  # SOF length 5: body shorter than the 6-byte header read
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(blob))
    # bounded accumulators: a 256x256 image round-trips in well under
    # a second (the quadratic version stalled for minutes here) and
    # the reader's live window never exceeds its byte loads
    big = np.random.default_rng(17).integers(0, 256, (256, 256, 3), dtype=np.uint8)
    import time

    t0 = time.monotonic()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(big, quality=85, subsample=True))
    assert out.shape == big.shape
    assert time.monotonic() - t0 < 5.0


def test_featurizer_passthrough_never_clobbers(ray_session):
    """A side column named like a computed output (stale upstream
    `decode_ok`) must NOT overwrite the featurizer's fresh values."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.extras import jpeg, multimodal as mm

    base = mm.make_image_table(2)
    blobs = [
        jpeg.encode_jpeg(mm.decode_image(base["image"][i].as_py(), "kgim"))
        for i in range(2)
    ]
    t = pa.table(
        {
            "img_id": pa.array([0, 1], pa.int64()),
            "image": pa.array(blobs, pa.binary()),
            "format": pa.array(["jpeg", "jpeg"]),
            "decode_ok": pa.array([False, False]),  # stale upstream flag
            "note": pa.array(["a", "b"]),  # genuine side column
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.ImageFeaturizer, concurrency=1, batch_size=4, batch_format="pyarrow")
        .to_pandas()
        .sort_values("img_id", ignore_index=True)
    )
    assert out["decode_ok"].all()  # computed True wins over stale False
    assert list(out["note"]) == ["a", "b"]  # real side column rides through
