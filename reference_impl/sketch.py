"""Sequential reference implementations of the sketch / ANN pipelines.

Single process, dict-and-loop shaped — the same role `oracle.py` plays
for the KG pipeline: an INDEPENDENT implementation of the semantic
spec each distributed pipeline in `kgray/extras/` commits to
(docs/PIPELINE_SPEC.md-style constants restated below), used to
produce committed golden parquets that back DuckDB oracles. No
pipeline code is shared with `kgray/`; only the spec constants
(hash/permutation seeds, banding shapes, caps, rounding) are the same
— they define WHAT the operator computes, exactly like the KG spec's
normalization rules.

The banding/bucketing structure (which pairs become candidates) is
part of each operator's spec: these are LSH algorithms, so the output
is defined by (hash family + banding + verify), not by "all true
near-duplicates". The reference builds the same candidate universe
with plain dicts, then verifies exactly — no joins, no blocks, no
distribution — so a bug in the engine's shuffle/join machinery cannot
cancel out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# -- spec constants (shared with kgray/extras by definition) -----------------

MERSENNE = (1 << 61) - 1
MASK64 = (1 << 64) - 1
SPLITMIX_INIT = 0x9E3779B97F4A7C15


def _h64(s: str) -> int:
    """blake2b-8 of the UTF-8 bytes, big-endian uint64 (spec hash)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _perms(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """The spec's permutation constants: numpy PCG64(seed) draws."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _splitmix(x: int) -> int:
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


def _to_i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


# -- shingles / signatures ---------------------------------------------------

def _sig_shingles(text: str, k: int) -> set[str]:
    """Shingle set used for SIGNATURES: empty doc -> empty set."""
    if not text:
        return set()
    if len(text) < k:
        return {text}
    return {text[i: i + k] for i in range(len(text) - k + 1)}


def _verify_shingles(text: str, k: int) -> set[str]:
    """Shingle set used by the exact-Jaccard VERIFY: an empty doc
    yields {''} (spec: range(max(1, len-k+1)))."""
    return {text[i: i + k] for i in range(max(1, len(text) - k + 1))}


def _signature(text: str, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """One doc's (num_perm,) uint64 MinHash signature. uint64
    wraparound multiply-add then mod 2^61-1, exactly the spec's
    arithmetic; empty doc -> all MERSENNE."""
    sh = _sig_shingles(text, k)
    if not sh:
        return np.full(len(a), MERSENNE, dtype=np.uint64)
    out = np.full(len(a), np.uint64(MERSENNE), dtype=np.uint64)
    m = np.uint64(MERSENNE)
    for s in sh:
        v = (a * np.uint64(_h64(s)) + b) % m
        out = np.minimum(out, v)
    return out


def _band_keys(sig: np.ndarray, bands: int) -> list[tuple[int, int]]:
    """(band_id, band_hash) keys: a sequential splitmix64 chain over
    each band's rows, int64 view."""
    rpb = len(sig) // bands
    keys = []
    for bi in range(bands):
        h = SPLITMIX_INIT
        for j in range(rpb):
            h = _splitmix(h ^ int(sig[bi * rpb + j]))
        keys.append((bi, _to_i64(h)))
    return keys


def _bucket_pairs(
    buckets: dict[tuple[int, int], list[int]], max_bucket: int
) -> set[tuple[int, int]]:
    """Candidate pairs a < b from buckets; buckets with fewer than 2
    or more than max_bucket distinct ids contribute nothing."""
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        u = sorted(set(ids))
        if len(u) < 2 or len(u) > max_bucket:
            continue
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                pairs.add((u[i], u[j]))
    return pairs


def _docs(table: pa.Table, text_col: str, id_col: str) -> list[tuple[int, str]]:
    return list(zip(table[id_col].to_pylist(), [t or "" for t in table[text_col].to_pylist()]))


# -- MinHash+LSH near-dup pairs ---------------------------------------------

def run_minhash_pairs(
    table: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 200,
) -> pa.Table:
    """Sequential reference of dedup.minhash_lsh_pairs: banded MinHash
    candidates + exact-Jaccard verify >= threshold."""
    a, b = _perms(num_perm)
    docs = _docs(table, text_col, id_col)
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, text in docs:
        for key in _band_keys(_signature(text, shingle_k, a, b), bands):
            buckets.setdefault(key, []).append(did)
    texts = dict(docs)
    rows = []
    for x, y in sorted(_bucket_pairs(buckets, max_bucket)):
        sx = _verify_shingles(texts[x], shingle_k)
        sy = _verify_shingles(texts[y], shingle_k)
        u = len(sx | sy)
        j = (len(sx & sy) / u) if u else 0.0
        if j >= threshold:
            rows.append((x, y, round(j, 4)))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# -- SimHash near-dup pairs --------------------------------------------------

def _simhash(text: str) -> int:
    """64-bit SimHash over whitespace tokens, weight = tf; stored as
    the spec's int64 (value - 2^63)."""
    toks = text.split()
    if not toks:
        return _to_i64(0 ^ (1 << 63))
    weights: dict[str, int] = {}
    for t in toks:
        weights[t] = weights.get(t, 0) + 1
    acc = [0] * 64
    for t, w in weights.items():
        h = _h64(t)
        for i in range(64):
            acc[i] += w if (h >> i) & 1 else -w
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return _to_i64(out ^ (1 << 63))


def run_simhash_pairs(
    table: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> pa.Table:
    """Sequential reference of dedup.simhash_pairs: 4x16-bit chunk
    buckets + exact Hamming verify <= max_hamming."""
    docs = _docs(table, text_col, id_col)
    stored = {did: _simhash(text) for did, text in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sh in stored.items():
        uh = (sh + (1 << 63)) & MASK64  # undo the -2^63 storage offset
        for bi in range(4):
            buckets.setdefault((bi, (uh >> (16 * bi)) & 0xFFFF), []).append(did)
    rows = []
    for x, y in sorted(_bucket_pairs(buckets, max_bucket)):
        d = bin((stored[x] ^ stored[y]) & MASK64).count("1")
        if d <= max_hamming:
            rows.append((x, y, d))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# -- n-gram Jaccard top-k ----------------------------------------------------

def run_ngram_topk(
    table: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 20,
    shingle_k: int = 4,
    num_perm: int = 64,
    bands: int = 32,
    max_bucket: int = 200,
) -> pa.Table:
    """Sequential reference of dedup.ngram_jaccard_topk: the same
    low-threshold banded candidate universe, exact Jaccard on ALL
    candidates (no estimate prefilter — the engine's prefilter keeps a
    provable superset of the top-k, so results must agree), global
    top-k by (jaccard desc, a asc, b asc)."""
    a, b = _perms(num_perm)
    docs = _docs(table, text_col, id_col)
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, text in docs:
        for key in _band_keys(_signature(text, shingle_k, a, b), bands):
            buckets.setdefault(key, []).append(did)
    texts = dict(docs)
    shingle_cache: dict[int, set] = {}

    def sh(i: int) -> set:
        s = shingle_cache.get(i)
        if s is None:
            s = shingle_cache[i] = _verify_shingles(texts[i], shingle_k)
        return s

    scored = []
    for x, y in _bucket_pairs(buckets, max_bucket):
        sx, sy = sh(x), sh(y)
        u = len(sx | sy)
        if u:
            scored.append((round(len(sx & sy) / u, 4), x, y))
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    top = scored[:k]
    return pa.table(
        {
            "a": pa.array([r[1] for r in top], pa.int64()),
            "b": pa.array([r[2] for r in top], pa.int64()),
            "jaccard": pa.array([r[0] for r in top], pa.float64()),
        }
    )


# -- embedding-space operators ----------------------------------------------

def _vecs(table: pa.Table, vec_col: str, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(table[id_col].to_pylist(), dtype=np.int64)
    m = np.array(table[vec_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


def _topk_rows(
    qids: list[int], qm: np.ndarray, ids: np.ndarray, m: np.ndarray, k: int
) -> pa.Table:
    """Exact cosine top-k per query over (ids, m): the spec's
    deterministic order (round(cos,4) desc, neighbor_id asc)."""
    rows_q, rows_n, rows_c = [], [], []
    for j, qid in enumerate(qids):
        cos = np.round(m @ qm[j], 4)
        order = np.lexsort((ids, -cos))[:k]
        for i in order:
            rows_q.append(qid)
            rows_n.append(int(ids[i]))
            rows_c.append(float(cos[i]))
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "cos": pa.array(rows_c, pa.float64()),
        }
    )


def run_knn_lsh(
    table: pa.Table,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nbits: int = 4,
    ntables: int = 16,
) -> pa.Table:
    """Sequential reference of annsearch.knn_lsh: random-hyperplane
    buckets (MSB-first bit code, per-table seed 1000+t), candidates =
    vectors sharing any query bucket, exact rescore."""
    ids, m = _vecs(table, vec_col, id_col)
    qids = queries[id_col].to_pylist()
    _, qm = _vecs(queries, vec_col, id_col)
    msb = 1 << np.arange(nbits - 1, -1, -1)
    keep = np.zeros(len(ids), dtype=bool)
    for t in range(ntables):
        planes = np.random.default_rng(1000 + t).standard_normal((nbits, m.shape[1]))
        qcodes = {int(c) for c in ((qm @ planes.T) > 0).dot(msb)}
        codes = ((m @ planes.T) > 0).dot(msb)
        keep |= np.isin(codes, list(qcodes))
    sel = np.flatnonzero(keep)
    return _topk_rows(qids, qm, ids[sel], m[sel], k)


def run_knn_ivf(
    table: pa.Table,
    queries: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 5,
) -> pa.Table:
    """Sequential reference of annsearch.knn_ivf: seeded spherical
    k-means over the first sample_n table rows RE-SORTED by id (the
    engine pins the collected quantizer sample to id order so it is
    block-layout-independent), probed-cell filter, exact rescore."""
    ids, m = _vecs(table, vec_col, id_col)
    qids = queries[id_col].to_pylist()
    _, qm = _vecs(queries, vec_col, id_col)
    head_ids = ids[:sample_n]
    sample = m[:sample_n][np.argsort(head_ids, kind="stable")]
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(ncells, len(sample)), replace=False)
    c = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (sample @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
        ne = counts > 0
        c[ne] = sums[ne] / counts[ne, None]
        norms = np.linalg.norm(c, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        c = c / norms
    probe: set[int] = set()
    for j in range(qm.shape[0]):
        for cell in np.argsort(-(qm[j] @ c.T))[:nprobe]:
            probe.add(int(cell))
    assign = (m @ c.T).argmax(axis=1)
    sel = np.flatnonzero(np.isin(assign, list(probe)))
    return _topk_rows(qids, qm, ids[sel], m[sel], k)


def run_cosine_dup_pairs(
    table: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nbits: int = 6,
    ntables: int = 12,
    max_bucket: int = 500,
) -> pa.Table:
    """Sequential reference of annsearch.cosine_dup_pairs: hyperplane
    buckets (LSB-first bit code), candidate pairs, exact cosine verify
    >= threshold."""
    ids, m = _vecs(table, vec_col, id_col)
    buckets: dict[tuple[int, int], list[int]] = {}
    lsb = 1 << np.arange(nbits)
    for t in range(ntables):
        planes = np.random.default_rng(1000 + t).standard_normal((nbits, m.shape[1]))
        codes = ((m @ planes.T) > 0).dot(lsb)
        for i, code in enumerate(codes):
            buckets.setdefault((t, int(code)), []).append(int(ids[i]))
    pos = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for x, y in sorted(_bucket_pairs(buckets, max_bucket)):
        cos = float(m[pos[x]] @ m[pos[y]])
        if cos >= threshold:
            rows.append((x, y, round(cos, 4)))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "cos": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# -- distributed-clustering twins (kgray/extras/cluster.py spec) --------------

KM_QSCALE = float(1 << 20)
KM_SEED_MIX = 0x9E3779B97F4A7C15


def _km_setup(
    table: pa.Table, vec_col: str, id_col: str, k: int, iters: int, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared sequential Lloyd run for the cluster-family references.

    Spec (= kgray/extras/cluster.py, same constants): embeddings
    quantized once to an int64 grid round(x * 2**20) so every centroid
    sum is an exact integer; init = vectors of the k ids with the
    smallest (splitmix64(id ^ (KM_SEED_MIX * seed)), id); `iters`
    fixed iterations; per-row assignment argmin_j sum_d (v - c)^2 in
    float64 with first-minimum (lowest-cell) tie-break; update
    sum / n / 2**20; empty cells keep their previous centroid. Returns
    (ids, Q, V, final_cells). Accumulation here is PYTHON-INT per row
    — a different code shape from the engine's np.add.at combiner, but
    exact on both sides, which is the point of the integer grid."""
    ids = np.asarray(table[id_col].to_pylist(), dtype=np.int64)
    m = np.array(table[vec_col].to_pylist(), dtype=np.float64)
    Q = np.rint(m * KM_QSCALE).astype(np.int64)
    V = Q / KM_QSCALE
    n, d = V.shape
    mixseed = (KM_SEED_MIX * seed) & MASK64
    ranked = sorted(
        (_splitmix((int(i) & MASK64) ^ mixseed), int(i), pos)
        for pos, i in enumerate(ids)
    )
    C = np.stack([V[pos] for _, _, pos in ranked[:k]])
    for _ in range(iters):
        acc = [[0] * d for _ in range(k)]
        cnt = [0] * k
        for i in range(n):
            c = int(((V[i] - C) ** 2).sum(axis=1).argmin())
            cnt[c] += 1
            row = Q[i]
            aj = acc[c]
            for j in range(d):
                aj[j] += int(row[j])
        for c in range(k):
            if cnt[c]:
                C[c] = np.array(acc[c], dtype=np.float64) / cnt[c] / KM_QSCALE
    cells = np.array(
        [int(((V[i] - C) ** 2).sum(axis=1).argmin()) for i in range(n)],
        dtype=np.int64,
    )
    return ids, Q, V, cells


KM_SPLIT_BASE = 1 << 20  # = kgray.extras.cluster.SPLIT_BASE
KM_SPLIT_SEED_MIX = 1000003  # = kgray.extras.cluster.SPLIT_SEED_MIX
KM_SPLIT_MAX_DEPTH = 2  # = kgray.extras.cluster.SPLIT_MAX_DEPTH


def _km_cells_split(
    table: pa.Table,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    seed: int,
    max_cell_rows: int | None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sequential twin of cluster.assign_with_split: top-level Lloyd,
    then up to KM_SPLIT_MAX_DEPTH rounds in which every cell holding
    more than max_cell_rows rows is re-clustered by a fresh Lloyd
    (k_sub = ceil(n_c/max_cell_rows), seed = seed*MIX + cell + 1) and
    relabelled (cell+1)*BASE + sub. Identical constants to the
    engine."""
    ids, Q, V, cells = _km_setup(table, vec_col, id_col, k, iters, seed)
    if max_cell_rows is None:
        return ids, Q, V, cells
    cells = cells.copy()
    for _depth in range(KM_SPLIT_MAX_DEPTH):
        oversized = [
            c
            for c in sorted(set(int(x) for x in cells))
            if (cells == c).sum() > max_cell_rows
        ]
        if not oversized:
            break
        for c in oversized:
            pos = np.flatnonzero(cells == c)
            k_sub = -(-len(pos) // max_cell_rows)
            sub_seed = seed * KM_SPLIT_SEED_MIX + c + 1
            sub_table = table.take(pa.array(pos))
            _, _, _, sub_cells = _km_setup(
                sub_table, vec_col, id_col, k_sub, iters, sub_seed
            )
            cells[pos] = (c + 1) * KM_SPLIT_BASE + sub_cells
    return ids, Q, V, cells


def run_kmeans(
    table: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    iters: int = 8,
    seed: int = 11,
) -> pa.Table:
    """Sequential reference of cluster.kmeans_fit + kmeans_assign:
    (vec_id, cell) under the final centroid table, sorted by vec_id."""
    ids, _, _, cells = _km_setup(table, vec_col, id_col, k, iters, seed)
    order = np.argsort(ids, kind="stable")
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "cell": pa.array(cells[order], pa.int64()),
        }
    )


def run_semdedup(
    table: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    iters: int = 8,
    theta: float = 0.35,
    seed: int = 11,
    max_cell_rows: int | None = None,
) -> pa.Table:
    """Sequential reference of cluster.semdedup: per final cell, in
    ascending id order, keep a vector only if its float64 cosine to
    every already-kept vector in the cell is < theta (zero vectors
    have cosine 0 to everything). Output = kept (vec_id, cell),
    sorted (cell, vec_id). `max_cell_rows` applies the
    oversized-cell split before the greedy (one Lloyd per split cell,
    same constants as the engine)."""
    ids, _, V, cells = _km_cells_split(
        table, vec_col, id_col, k, iters, seed, max_cell_rows
    )
    out_ids: list[int] = []
    out_cells: list[int] = []
    for c in sorted(set(int(x) for x in cells)):
        members = sorted(
            (int(ids[i]), i) for i in np.flatnonzero(cells == c)
        )
        kept: list[np.ndarray] = []
        for vid, i in members:
            v = V[i]
            nrm = float(np.sqrt((v * v).sum()))
            u = v / nrm if nrm != 0.0 else v
            if all(float(np.dot(w, u)) < theta for w in kept):
                kept.append(u)
                out_ids.append(vid)
                out_cells.append(c)
    return pa.table(
        {
            "vec_id": pa.array(out_ids, pa.int64()),
            "cell": pa.array(out_cells, pa.int64()),
        }
    )


def run_knn_graph(
    table: pa.Table,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k_neighbors: int = 5,
    k: int = 10,
    iters: int = 8,
    seed: int = 11,
    max_cell_rows: int | None = None,
) -> pa.Table:
    """Sequential reference of cluster.knn_graph: per final k-means
    cell, each vector's top `k_neighbors` cosine neighbors among the
    OTHER cell members, ordered (round(cos, 4) desc, id asc). Cosines
    in float64 on the dequantized grid; per-pair np.dot here vs the
    engine's one GEMM per cell — different accumulation shape, same
    spec. Output sorted (query_id, rn). `max_cell_rows` applies
    the oversized-cell split first (same constants as the engine)."""
    ids, _, V, cells = _km_cells_split(
        table, vec_col, id_col, k, iters, seed, max_cell_rows
    )
    out_q: list[int] = []
    out_n: list[int] = []
    out_r: list[int] = []
    for c in sorted(set(int(x) for x in cells)):
        members = sorted((int(ids[i]), i) for i in np.flatnonzero(cells == c))
        if len(members) < 2:
            continue
        units = {}
        for vid, i in members:
            v = V[i]
            nrm = float(np.sqrt((v * v).sum()))
            units[vid] = v / nrm if nrm != 0.0 else v
        for vid, i in members:
            scored = sorted(
                (-round(float(np.dot(units[vid], units[ovid])), 4), ovid)
                for ovid, _ in members
                if ovid != vid
            )
            for rn, (_, ovid) in enumerate(scored[:k_neighbors], start=1):
                out_q.append(vid)
                out_n.append(ovid)
                out_r.append(rn)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "rn": pa.array(out_r, pa.int64()),
        }
    )


# -- BPE tokenizer twin (kgray/extras/bpe.py spec) ---------------------------

BPE_EOW = "\x00"  # = kgray.extras.bpe.EOW


def _bpe_train(word_freq: dict, num_merges: int, min_count: int) -> list:
    """Sequential BPE trainer: Counter-over-tuples code shape (the
    engine trains over a distributed word-frequency table; same spec:
    chars + EOW marker, (count DESC, pair ASC) pick, left-to-right
    non-overlapping rewrite, stop below min_count)."""
    from collections import Counter

    seqs = {w: tuple(w) + (BPE_EOW,) for w in word_freq}
    merges = []
    for _ in range(num_merges):
        pc_: Counter = Counter()
        for w, s in seqs.items():
            f = word_freq[w]
            for a, b in zip(s, s[1:]):
                pc_[(a, b)] += f
        if not pc_:
            break
        best = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < min_count:
            break
        pair = best[0]
        merges.append(pair)
        nxt = {}
        for w, s in seqs.items():
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt[w] = tuple(out)
        seqs = nxt
    return merges


def _bpe_encode_len(w: str, rank: dict) -> int:
    """Greedy encode: repeatedly merge the lowest-rank adjacent pair
    (all its occurrences, left to right) until none remains; return
    the token count."""
    s = list(w) + [BPE_EOW]
    while len(s) > 1:
        cands = [(rank[p], p) for p in set(zip(s, s[1:])) if p in rank]
        if not cands:
            break
        _, pair = min(cands)
        out = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                out.append(s[i] + s[i + 1])
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return len(s)


def run_bpe_tokens(
    docs: pa.Table, *, num_merges: int = 80, min_count: int = 2
) -> pa.Table:
    """(doc_id, n_words, n_bpe_tokens) under a BPE vocabulary trained
    on the same corpus — golden for the `doc_bpe_tokens` query."""
    from collections import Counter

    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_pylist()
    freq: Counter = Counter()
    for t in texts:
        freq.update(w for w in t.split() if w)
    merges = _bpe_train(dict(freq), num_merges, min_count)
    rank = {p: i for i, p in enumerate(merges)}
    cache: dict = {}
    out_w, out_t = [], []
    for t in texts:
        words = [w for w in t.split() if w]
        tot = 0
        for w in words:
            if w not in cache:
                cache[w] = _bpe_encode_len(w, rank)
            tot += cache[w]
        out_w.append(len(words))
        out_t.append(tot)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(out_w, pa.int64()),
            "n_bpe_tokens": pa.array(out_t, pa.int64()),
        }
    )


# -- corpus-embedding twin (kgray/extras/inference.py spec) ------------------

EMB_HASH_DIM = 256
EMB_DIM = 16
EMB_SEED = 7


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
    return h


def run_doc_embed(docs: pa.Table) -> pa.Table:
    """Sequential hashed-BoW embed twin: per-doc Counter over hashed
    token slots, einsum projection (different code shape from the
    engine's batched GEMM), quartile length buckets with the
    sorted-index-(n-1)*p//4 threshold convention."""
    import re
    from collections import Counter

    tok_re = re.compile(r"[^ \t\n\r\f]+")
    rng = np.random.default_rng(EMB_SEED)
    proj = rng.standard_normal((EMB_HASH_DIM, EMB_DIM))

    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    toks = [tok_re.findall(t or "") for t in texts]
    nws = np.array([len(ts) for ts in toks], dtype=np.int64)
    s = np.sort(nws)
    n = len(s)
    thr = [int(s[(n - 1) * p // 4]) for p in (1, 2, 3)]

    out_b, out_n, out_l2, out_am, out_c0 = [], [], [], [], []
    for ts, nw in zip(toks, nws):
        bkt = 0 if nw <= thr[0] else 1 if nw <= thr[1] else 2 if nw <= thr[2] else 3
        c = Counter(_fnv1a64(t.encode("utf-8")) % EMB_HASH_DIM for t in ts)
        x = np.zeros(EMB_HASH_DIM, dtype=np.float64)
        for slot, k in c.items():
            x[slot] = k
        x /= max(1.0, x.sum())
        emb = np.einsum("i,ij->j", x, proj)
        l2 = float(np.sqrt(np.dot(emb, emb)))
        unit = emb / max(1e-12, l2)
        out_b.append(bkt)
        out_n.append(int(nw))
        out_l2.append(round(l2, 6))
        out_am.append(int(np.argmax(unit)))
        out_c0.append(round(float(unit[0]), 6))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "n_words": pa.array(out_n, pa.int64()),
            "emb_l2": pa.array(out_l2, pa.float64()),
            "emb_argmax": pa.array(out_am, pa.int64()),
            "emb_c0": pa.array(out_c0, pa.float64()),
        }
    )


COMPRESS_LEVEL = 6  # zlib level both sides pin (ratio is level-dependent)
COMPRESS_BPS_KEEP = 4000  # keep docs with zlib_bytes/raw_bytes >= 40.00%


def run_compress_ratio(docs: pa.Table) -> pa.Table:
    """Sequential compressibility-signal twin (doc_compress_ratio):
    per-doc zlib ratio in integer basis points — a repetition/quality
    filter (highly compressible text is boilerplate or repetition; the
    Gopher-family pipelines threshold on it). All output columns are
    integers/bools, so the golden comparison is bit-exact by
    construction; zlib is the shared stdlib kernel (determinism comes
    from the pinned level + identical library in-process), while the
    orchestration differs from the engine's batched Arrow path."""
    import zlib

    ids = docs["doc_id"].to_pylist()
    out_raw, out_z, out_bps, out_keep = [], [], [], []
    for t in docs["text"].to_pylist():
        raw = (t or "").encode("utf-8")
        z = zlib.compress(raw, COMPRESS_LEVEL)
        bps = (len(z) * 10000) // max(1, len(raw))
        out_raw.append(len(raw))
        out_z.append(len(z))
        out_bps.append(bps)
        out_keep.append(bps >= COMPRESS_BPS_KEEP)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "raw_bytes": pa.array(out_raw, type=pa.int64()),
            "zlib_bytes": pa.array(out_z, type=pa.int64()),
            "compress_bps": pa.array(out_bps, type=pa.int64()),
            "keep": pa.array(out_keep, type=pa.bool_()),
        }
    )
