"""Similarity search over an embedding column (task brief: brute-force
cosine top-k baseline + an LSH-bucketed scale path, and
embedding-cosine near-duplicate detection).

Scale design:
- Brute force: the query matrix is broadcast (`ray.put` once); each
  batch does one float64 GEMM against it and emits only its LOCAL
  top-k per query — exact after the tiny global merge (per-batch
  top-k union contains the global top-k). Local pruning uses the SAME
  (round(cos,4) desc, id asc) order as the global merge, so a
  4-decimal tie can never be pruned locally yet win globally.
- LSH: random-hyperplane signatures; the candidate id set stays a
  Dataset and semi-joins back to the vector table (hash join) — no
  driver round-trip of ids; candidates re-scored exactly.
  Approximate — recall measured in tests against brute force.
- Near-dup pairs: LSH-bucketed candidates, then DISTRIBUTED exact
  rescore: the pair set hash-joins to the embedding table on `a` then
  `b` and the cosine runs inside `map_batches` (the embeddings are
  never materialized on the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .. import ops


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(
    ds: Dataset,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k: (query_id, neighbor_id, cos) with
    deterministic ordering (round(cos,4) desc, neighbor_id asc)."""
    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = queries[id_col].to_pylist()
    qref = ray.put(qm)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = m @ q.T  # (n, nq)
        out_q, out_n, out_c = [], [], []
        kk = min(k, len(ids))
        for j in range(q.shape[0]):
            # local prune under the GLOBAL merge order (rounded score
            # desc, id asc) — a tie at 4 decimals with a smaller id is
            # never cut here only to be wanted by the merge
            col_r = np.round(sims[:, j], 4)
            order = np.lexsort((ids, -col_r))[:kk]
            for i in order:
                out_q.append(j)
                out_n.append(int(ids[i]))
                out_c.append(float(col_r[i]))
        return pa.table(
            {
                "qj": pa.array(out_q, type=pa.int32()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    cand = ops.collect_table(
        ds.map_batches(local_topk, batch_size=None, batch_format="pyarrow"),
        schema=pa.schema(
            [("qj", pa.int32()), ("neighbor_id", pa.int64()), ("cos", pa.float64())]
        ),
    )  # bounded: n_blocks x nq x k candidate rows
    qj = cand["qj"].to_numpy()
    nid = cand["neighbor_id"].to_numpy()
    cos = cand["cos"].to_numpy()
    rows_q, rows_n, rows_c = [], [], []
    for j, qid in enumerate(qids):
        sel = qj == j
        ids_j, cos_j = nid[sel], cos[sel]
        order = np.lexsort((ids_j, -cos_j))[:k]
        for i in order:
            rows_q.append(qid)
            rows_n.append(int(ids_j[i]))
            rows_c.append(float(cos_j[i]))
    return pa.table(
        {
            "query_id": pa.array(rows_q, type=pa.int64()),
            "neighbor_id": pa.array(rows_n, type=pa.int64()),
            "cos": pa.array(rows_c, type=pa.float64()),
        }
    )


def _hyperplanes(dim: int, nbits: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(1000 + table)
    return rng.standard_normal((nbits, dim))


# per-worker-process cache of the stacked hyperplane tensor: the
# planes are a deterministic function of (dim, nbits, ntables), so
# each worker draws them once instead of ntables RNG draws per batch
_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _planes_stacked(dim: int, nbits: int, ntables: int) -> np.ndarray:
    """(ntables, nbits, dim) hyperplane tensor, cached per process."""
    key = (dim, nbits, ntables)
    p = _PLANE_CACHE.get(key)
    if p is None:
        p = np.stack([_hyperplanes(dim, nbits, t) for t in range(ntables)])
        _PLANE_CACHE[key] = p
    return p


def knn_lsh(
    ds: Dataset,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nbits: int = 4,
    ntables: int = 16,
    stats: dict | None = None,
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets, exact rescore
    of bucket-mates. Only (table, bucket, vec_id) rows shuffle, and the
    rescore input is pruned BEFORE any shuffle (VERDICT r2 task 2):
    when the candidate id set is small (the point of LSH — typically
    ≪ corpus) it broadcasts once (`ray.put`) and the vector table is
    filtered map-side with `pc.is_in`, so only survivors are packed;
    above `ops.BROADCAST_MAX_KEYS` it falls back to a distributed
    ``left_semi`` hash join of the id column (still never the full
    vector payload). Pass `stats={}` to observe the chosen path
    (`path`, `n_candidates`) — asserted in tests."""
    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = queries[id_col].to_pylist()
    dim = qm.shape[1]
    planes = [_hyperplanes(dim, nbits, t) for t in range(ntables)]
    msb = 1 << np.arange(nbits - 1, -1, -1)
    # query buckets (tiny: nq x ntables codes), flattened to
    # table*2^nbits + code keys so membership is one vectorized isin
    qkeys = set()
    for t in range(ntables):
        codes = ((qm @ planes[t].T) > 0).dot(msb)
        for c in codes:
            qkeys.add(t * (1 << nbits) + int(c))
    kref = ray.put(np.fromiter(qkeys, dtype=np.int64, count=len(qkeys)))
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        qk = ray.get(kref)
        m = _normalize(_to_matrix(batch[vec_col]))
        keep = np.zeros(m.shape[0], dtype=bool)
        for t in range(len(pl)):
            codes = ((m @ pl[t].T) > 0).dot(msb)
            keep |= np.isin(t * (1 << nbits) + codes, qk)
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64())})
        return batch.select([id_col]).filter(pa.array(keep))

    # materialize the candidate ID set (ids only — bounded, narrow;
    # never the vectors) so the size gate and the consumer share one
    # execution of the bucketize plan instead of running it twice
    cand_ids = ops.distinct(
        ds.map_batches(bucketize, batch_size=None, batch_format="pyarrow"), [id_col]
    ).materialize()
    n_cand = cand_ids.count()

    if n_cand <= ops.BROADCAST_MAX_KEYS:
        # prune BEFORE any shuffle: broadcast the id set once and
        # filter the vector table map-side — no pack, no hash join,
        # no movement of non-candidate vectors at all
        id_tbl = ops.collect_table(
            cand_ids, schema=pa.schema([(id_col, pa.int64())])
        )
        idref = ray.put(id_tbl[id_col].combine_chunks())

        def keep_cands(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch[id_col], value_set=ray.get(idref)))

        sub = ds.map_batches(keep_cands, batch_size=None, batch_format="pyarrow")
        if stats is not None:
            stats.update({"path": "broadcast", "n_candidates": n_cand})
        return knn_brute(sub, queries, vec_col=vec_col, id_col=id_col, k=k)

    # degenerate-LSH fallback (candidate set itself is huge): semi-join
    # the id set against the vector table. pyarrow's hash join can't
    # carry list<float> payloads, so vectors ride the join packed as
    # raw float64 bytes and are unpacked after.
    def pack(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[vec_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "_embbin": pa.array(
                    [m[i].tobytes() for i in range(m.shape[0])], type=pa.binary()
                ),
            }
        )

    def unpack(batch: pa.Table) -> pa.Table:
        blobs = batch["_embbin"].to_pylist()
        if not blobs:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float64()))})
        flat = np.frombuffer(b"".join(blobs), dtype=np.float64)
        m = flat.reshape(len(blobs), -1)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: pa.array(m.tolist(), type=pa.list_(pa.float64())),
            }
        )

    joined = ops.normalize_blocks(
        ops.hash_join(
            ds.map_batches(pack, batch_format="pyarrow"),
            cand_ids,
            on=(id_col,),
            right_on=(id_col,),
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema([(id_col, pa.int64()), ("_embbin", pa.binary())]),
    )
    sub = joined.map_batches(unpack, batch_format="pyarrow")
    if stats is not None:
        stats.update({"path": "join", "n_candidates": n_cand})
    return knn_brute(sub, queries, vec_col=vec_col, id_col=id_col, k=k)


def _quantizer_sample(
    ds: Dataset, vec_col: str, id_col: str, sample_n: int
) -> np.ndarray:
    """Deterministic (sample_n, d) normalized quantizer input: the
    first sample_n rows BY ID. `collect_table` concatenates blocks in
    completion order, so collecting vectors alone makes the sample's
    row order — and therefore the seeded k-means — depend on the
    session's block layout (observed: a cold session produced a
    different knn_ivf top-k). Sorting by the id column pins it."""
    proj = ds.limit(sample_n).select_columns([id_col, vec_col])
    vec_type = proj.schema().base_schema.field(vec_col).type
    tbl = ops.collect_table(
        proj, schema=pa.schema([(id_col, pa.int64()), (vec_col, vec_type)])
    )
    order = pa.array(np.argsort(tbl[id_col].to_numpy(), kind="stable"))
    return _normalize(_to_matrix(tbl[vec_col].combine_chunks().take(order)))


def kmeans_centroids(
    sample: np.ndarray, ncells: int, *, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means on a (normalized) sample —
    the IVF coarse quantizer. Pure numpy; seeded init."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(ncells, len(sample)), replace=False)
    c = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (sample @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
        nonempty = counts > 0
        c[nonempty] = sums[nonempty] / counts[nonempty, None]
        c = _normalize(c)
    return c


def knn_ivf(
    ds: Dataset,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    sample_n: int = 2048,
) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index: a seeded
    spherical k-means coarse quantizer over a deterministic sample,
    cells probed per query, exact rescore of the probed cells only.

    Scale path: centroids are broadcast (`ray.put` once); every batch
    does one GEMM against them and forwards only rows whose cell is
    probed — the exact rescore sees ~nprobe/ncells of the corpus. At
    production scale the cell assignment would be precomputed and the
    table partitioned by cell; recall measured vs brute force in
    tests."""
    sample = _quantizer_sample(ds, vec_col, id_col, sample_n)
    cents = kmeans_centroids(sample, ncells)
    qm = _normalize(_to_matrix(queries[vec_col]))
    probe = set()
    for j in range(qm.shape[0]):
        sims = qm[j] @ cents.T
        for cell in np.argsort(-sims)[:nprobe]:
            probe.add(int(cell))
    cref = ray.put(cents)
    pref = ray.put(probe)

    def cell_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        pr = ray.get(pref)
        m = _normalize(_to_matrix(batch[vec_col]))
        assign = (m @ c.T).argmax(axis=1)
        keep = np.isin(assign, list(pr))
        if not keep.any():
            return batch.slice(0, 0)
        return batch.filter(pa.array(keep))

    sub = ds.map_batches(cell_filter, batch_size=None, batch_format="pyarrow")
    return knn_brute(sub, queries, vec_col=vec_col, id_col=id_col, k=k)


def ivf_index_build(
    ds: Dataset,
    out_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ncells: int = 16,
    nprobe: int = 4,  # recorded for the reader; search may override
    sample_n: int = 2048,
) -> dict:
    """Materialize the IVF production path `knn_ivf`'s docstring
    promises: the corpus written as parquet PARTITIONED BY CELL (one
    hive directory per coarse cell) plus the centroid matrix, so
    search reads ONLY the probed cells' files — pruning at the read
    instead of filtering a full scan. Same quantizer as `knn_ivf`
    (seeded spherical k-means over the first `sample_n` rows), so the
    two return identical results for the same parameters."""
    import os

    cents = kmeans_centroids(
        _quantizer_sample(ds, vec_col, id_col, sample_n), ncells
    )
    cref = ray.put(cents)

    def add_cell(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        assign = (m @ ray.get(cref).T).argmax(axis=1)
        return batch.append_column(
            "cell", pa.array(assign.astype(np.int32), type=pa.int32())
        )

    ds.map_batches(add_cell, batch_size=None, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(out_dir, "_centroids.npy"), cents)
    return {"out_dir": out_dir, "ncells": int(len(cents)), "nprobe": nprobe}


def knn_ivf_indexed(
    index_dir: str,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
    stats: dict | None = None,
) -> pa.Table:
    """Search a built IVF index: probe cells per query against the
    saved centroids, `read_parquet` ONLY the probed `cell=` directories
    (column-pruned), exact rescore. Equal to `knn_ivf` on the same
    corpus/parameters (asserted in tests) — the difference is purely
    physical: non-probed cells are never read from storage."""
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "_centroids.npy"))
    qm = _normalize(_to_matrix(queries[vec_col]))
    probe: set[int] = set()
    for j in range(qm.shape[0]):
        for cell in np.argsort(-(qm[j] @ cents.T))[:nprobe]:
            probe.add(int(cell))
    cell_dirs = [
        os.path.join(index_dir, f"cell={c}")
        for c in sorted(probe)
        if os.path.isdir(os.path.join(index_dir, f"cell={c}"))
    ]
    paths = [
        os.path.join(d, f)
        for d in cell_dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if stats is not None:
        stats.update({"n_cells_probed": len(cell_dirs), "n_cells_total": len(cents)})
    sub = rd.read_parquet(paths, columns=[id_col, vec_col])
    return knn_brute(sub, queries, vec_col=vec_col, id_col=id_col, k=k)


def cosine_dup_pairs(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nbits: int = 6,
    ntables: int = 12,
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (a, b, cos >= threshold):
    LSH-bucketed candidate generation + DISTRIBUTED exact rescore (the
    pair set joins back to the embedding table; cosine in
    map_batches). No quadratic scan, no driver materialization."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        """Fully vectorized (VERDICT r2 task 3): ONE GEMM against the
        cached (ntables*nbits, dim) plane tensor produces every table's
        code for every row; emission is repeat/tile, no per-row Python."""
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        n, dim = m.shape
        planes = _planes_stacked(dim, nbits, ntables)  # (T, B, D), cached
        bits = (m @ planes.reshape(ntables * nbits, dim).T) > 0  # (n, T*B)
        codes = bits.reshape(n, ntables, nbits) @ (1 << np.arange(nbits))  # (n, T)
        return pa.table(
            {
                "band_id": pa.array(
                    np.repeat(np.arange(ntables, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(
                    codes.T.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                id_col: pa.array(np.tile(ids, ntables), type=pa.int64()),
            }
        )

    from .dedup import join_pair_payload, pairs_from_buckets

    bucketed = ds.map_batches(bucket_rows, batch_size=None, batch_format="pyarrow")
    cand = pairs_from_buckets(bucketed, id_col, max_bucket=500)

    # pyarrow's hash join can't carry list<float> payload columns —
    # pack each embedding to raw float64 bytes for the join, unpack in
    # the distributed verify
    def pack(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[vec_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "_embbin": pa.array([m[i].tobytes() for i in range(m.shape[0])],
                                    type=pa.binary()),
            }
        )

    packed = ds.map_batches(pack, batch_format="pyarrow")
    withvec = join_pair_payload(
        cand, packed, id_col, "_embbin", payload_rows=ds.count()
    )

    def _unpack(col) -> np.ndarray:
        blobs = col.to_pylist()
        flat = np.frombuffer(b"".join(blobs), dtype=np.float64)
        return flat.reshape(len(blobs), -1)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        va = _normalize(_unpack(batch["_embbin_a"]))
        vb = _normalize(_unpack(batch["_embbin_b"]))
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table(
            {
                "a": batch["a"].filter(pa.array(keep)),
                "b": batch["b"].filter(pa.array(keep)),
                "cos": pa.array(np.round(cos[keep], 4), type=pa.float64()),
            }
        )

    out = withvec.map_batches(verify, batch_format="pyarrow")
    return ops.collect_table(
        out,
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())]),
        sort_by=["a", "b"],
    )
