"""Similarity search over an embedding column (task brief: brute-force
cosine top-k baseline + an LSH-bucketed scale path, and
embedding-cosine near-duplicate detection).

Scale design:
- Brute force: the query matrix is broadcast (`ray.put` once); each
  batch does one float64 GEMM against it and emits only its LOCAL
  top-k per query — exact after the tiny global merge (per-batch
  top-k union contains the global top-k).
- LSH: random-hyperplane signatures; only (table, bucket, vec_id)
  rows shuffle; candidates re-scored exactly. Approximate — recall
  measured in tests against brute force.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


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
            col = sims[:, j]
            part = np.argpartition(-col, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            for i in part:
                out_q.append(j)
                out_n.append(int(ids[i]))
                out_c.append(float(col[i]))
        return pa.table(
            {
                "qj": pa.array(out_q, type=pa.int32()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_size=None, batch_format="pyarrow").to_pandas()
    rows_q, rows_n, rows_c = [], [], []
    for j, qid in enumerate(qids):
        sub = cand[cand["qj"] == j].copy()
        sub["cos_r"] = sub["cos"].round(4)
        sub = sub.sort_values(["cos_r", "neighbor_id"], ascending=[False, True])
        for _, r in sub.head(k).iterrows():
            rows_q.append(qid)
            rows_n.append(int(r["neighbor_id"]))
            rows_c.append(float(r["cos_r"]))
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


def knn_lsh(
    ds: Dataset,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nbits: int = 4,
    ntables: int = 16,
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets, exact rescore
    of bucket-mates. Only (table, bucket, vec_id) rows shuffle."""
    qm = _normalize(_to_matrix(queries[vec_col]))
    qids = queries[id_col].to_pylist()
    dim = qm.shape[1]
    planes = [_hyperplanes(dim, nbits, t) for t in range(ntables)]
    # query buckets
    qbuckets = set()
    for t in range(ntables):
        bits = (qm @ planes[t].T) > 0
        for j in range(len(qids)):
            code = int("".join("1" if x else "0" for x in bits[j]), 2)
            qbuckets.add((t, code))
    bref = ray.put(qbuckets)
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        qb = ray.get(bref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_pylist()
        keep = set()
        for t in range(len(pl)):
            bits = (m @ pl[t].T) > 0
            for i in range(len(ids)):
                code = int("".join("1" if x else "0" for x in bits[i]), 2)
                if (t, code) in qb:
                    keep.add(i)
        if not keep:
            return pa.table({id_col: pa.array([], pa.int64())})
        idx = sorted(keep)
        return batch.select([id_col]).take(idx)

    cand_ids = ds.map_batches(bucketize, batch_size=None, batch_format="pyarrow").to_pandas()
    cand_set = sorted(set(cand_ids[id_col].tolist())) if len(cand_ids) else []
    if not cand_set:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}
        )
    import pyarrow.compute as pc

    sub = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=pa.array(cand_set))),
        batch_format="pyarrow",
    )
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
    LSH-bucketed candidate generation + exact rescore (no quadratic
    scan)."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_pylist()
        dim = m.shape[1]
        t_c, h_c, i_c = [], [], []
        for t in range(ntables):
            pl = _hyperplanes(dim, nbits, t)
            bits = (m @ pl.T) > 0
            codes = bits.dot(1 << np.arange(nbits))
            for i in range(len(ids)):
                t_c.append(t)
                h_c.append(int(codes[i]))
                i_c.append(ids[i])
        return pa.table(
            {
                "band_id": pa.array(t_c, type=pa.int32()),
                "band_hash": pa.array(h_c, type=pa.int64()),
                id_col: pa.array(i_c, type=pa.int64()),
            }
        )

    from .dedup import _pairs_from_buckets

    bucketed = ds.map_batches(bucket_rows, batch_size=None, batch_format="pyarrow")
    cand = _pairs_from_buckets(bucketed, id_col, max_bucket=500)
    vecs = {}
    for r in ds.select_columns([id_col, vec_col]).take_all():
        v = np.asarray(r[vec_col], dtype=np.float64)
        n = np.linalg.norm(v)
        vecs[r[id_col]] = v / n if n else v
    a_c, b_c, c_c = [], [], []
    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        c = float(vecs[a] @ vecs[b])
        if c >= threshold:
            a_c.append(a)
            b_c.append(b)
            c_c.append(round(c, 4))
    return pa.table(
        {
            "a": pa.array(a_c, type=pa.int64()),
            "b": pa.array(b_c, type=pa.int64()),
            "cos": pa.array(c_c, type=pa.float64()),
        }
    )
