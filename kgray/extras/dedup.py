"""Deduplication operators over a text column (SURVEY-extra; task
brief "Deduplication": exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — embedding-cosine lives in annsearch.py).

Scale design notes
------------------
- Exact: hash-partition on the text (or its sha) + per-partition
  first — one all-to-all of (key, id) pairs, never the texts twice.
- MinHash-LSH: signatures are computed per batch (ONE chunked
  (perms x shingles) vectorized pass per batch with per-worker shingle
  memoization — not per-doc np.outer), then ONLY the
  (band_id, band_hash, doc_id) rows shuffle — ~bands x 16 bytes per
  doc regardless of text size.
- Candidate VERIFICATION is fully distributed: candidate pairs stay a
  Dataset, are hash-joined back to the payload table (text / simhash /
  embedding) on `a` then on `b`, and the exact measure
  (Jaccard / Hamming / cosine) runs inside `map_batches`. Nothing
  corpus-sized ever reaches the driver — only the verified pair list
  (bounded output) is collected, via `ops.collect_table`.
- SimHash: one int64 per doc; near-dup candidates via banding the
  64-bit fingerprint into 4x16-bit chunks (Hamming distance <= 3 ==
  at least one identical chunk), same shuffle shape as LSH.
- All hashing is blake2b-derived (stable across processes; Python
  ``hash()`` is salted and must never partition data — SURVEY F7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from .. import ops

MERSENNE = (1 << 61) - 1

PAIR_JOIN_PARTITIONS = 8  # candidate-pair verify joins; ~2x cores at scale


def _stable64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingles -> uint64 hash array."""
    if len(text) < k:
        sh = {text} if text else set()
    else:
        sh = {text[i : i + k] for i in range(len(text) - k + 1)}
    return np.fromiter((_stable64(s) for s in sh), dtype=np.uint64, count=len(sh))


def _shingle_hashes_memo(text: str, k: int, memo: dict[str, int]) -> np.ndarray:
    """Same values as `shingle_hashes`, with the blake2b of each
    distinct shingle memoized across docs (near-dup corpora repeat
    shingles heavily; the memo lives per map task)."""
    if len(text) < k:
        sh = {text} if text else set()
    else:
        sh = {text[i : i + k] for i in range(len(text) - k + 1)}
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        h = memo.get(s)
        if h is None:
            h = _stable64(s)
            memo[s] = h
        out[i] = h
    return out


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature; empty doc -> all MERSENNE.
    (Reference per-doc form — the batched path below must produce
    identical values; parity-tested in tests/test_extras.py.)"""
    if len(hashes) == 0:
        return np.full(len(a), MERSENNE, dtype=np.uint64)
    # (p, m) broadcast; mod 2^61-1 keeps everything in uint64 range
    v = (np.outer(a, hashes) + b[:, None]) % MERSENNE
    return v.min(axis=1)


# Chunk sizes keep every temporary L2-resident: on this host a
# (64 x n) uint64 elementwise pass costs ~8 ns/elem while n <= 4096
# (2 MB) but ~800 ns/elem once the temporaries spill to shared L3/DRAM
# (measured) — chunking is a 100x lever, not a nicety.
_SIG_CHUNK = 4096


def minhash_signatures_batch(
    hash_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures in chunked vectorized
    passes: docs are grouped into ~_SIG_CHUNK-shingle runs, then one
    (perms x shingles) multiply-add-mod + per-doc segmented min
    (np.minimum.reduceat) per run. Bit-identical to mapping
    `minhash_signature` over the docs (same uint64 op order)."""
    n = len(hash_arrays)
    num_perm = len(a)
    out = np.full((n, num_perm), MERSENNE, dtype=np.uint64)
    group: list[int] = []
    group_len = 0

    def flush(group: list[int]) -> None:
        flat = np.concatenate([hash_arrays[i] for i in group])
        lens = np.array([len(hash_arrays[i]) for i in group])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        v = (a[:, None] * flat[None, :] + b[:, None]) % MERSENNE  # (P, m)
        mins = np.minimum.reduceat(v, starts, axis=1)  # (P, n_group)
        out[group, :] = mins.T

    for i in range(n):
        if len(hash_arrays[i]) == 0:
            continue  # stays all-MERSENNE
        group.append(i)
        group_len += len(hash_arrays[i])
        if group_len >= _SIG_CHUNK:
            flush(group)
            group, group_len = [], 0
    if group:
        flush(group)
    return out


def minhash_signatures_vocab(
    texts: list[str],
    k: int,
    a: np.ndarray,
    b: np.ndarray,
    memo: dict[str, int],
) -> np.ndarray:
    """Fast batched signatures via a per-batch shingle VOCABULARY:

    1. map each doc's windows to column ids in a batch-level vocab
       (one dict pass; duplicate windows are harmless — the min over
       repeated columns equals the min over the set),
    2. hash each DISTINCT shingle once (blake2b, memoized across
       batches per worker),
    3. compute the (perms x vocab) permutation matrix V once, in
       L2-sized column chunks,
    4. per doc, signature = column-gather of V + segmented min
       (np.minimum.reduceat), again in L2-sized runs.

    Corpora repeat shingles heavily, so |vocab| << total windows and
    the multiply-add-mod work collapses to the vocab size.
    Bit-identical to `minhash_signature` per doc (parity-tested)."""
    vocab: dict[str, int] = {}

    def build_idx(t: str) -> np.ndarray:
        n_t = len(t)
        if n_t == 0:
            return np.empty(0, dtype=np.int64)
        n_w = 1 if n_t < k else n_t - k + 1
        try:
            # steady-state fast path: C-level map over dict lookups
            # (a KeyError falls back to the populating loop below)
            return np.fromiter(
                map(vocab.__getitem__, (t[i : i + k] for i in range(n_w))),
                np.int64,
                n_w,
            )
        except KeyError:
            ids = np.empty(n_w, dtype=np.int64)
            for j in range(n_w):
                w = t[j : j + k]
                ci = vocab.get(w)
                if ci is None:
                    ci = vocab[w] = len(vocab)
                ids[j] = ci
            return ids

    doc_idx = [build_idx(t) for t in texts]

    num_perm = len(a)
    n_docs = len(texts)
    out = np.full((n_docs, num_perm), MERSENNE, dtype=np.uint64)
    if not vocab:
        return out
    u = np.empty(len(vocab), dtype=np.uint64)
    for w, ci in vocab.items():
        h = memo.get(w)
        if h is None:
            h = _stable64(w)
            memo[w] = h
        u[ci] = h
    # permutation matrix over the distinct shingles, chunked in-cache;
    # stored (vocab x perms) so the per-doc gather is a contiguous
    # ROW gather
    vt = np.empty((len(u), num_perm), dtype=np.uint64)
    for s in range(0, len(u), _SIG_CHUNK):
        e = min(s + _SIG_CHUNK, len(u))
        vt[s:e, :] = ((a[:, None] * u[None, s:e] + b[:, None]) % MERSENNE).T

    group: list[int] = []
    group_len = 0

    def flush(group: list[int]) -> None:
        big = np.concatenate([doc_idx[i] for i in group])
        lens = np.array([len(doc_idx[i]) for i in group])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        g = vt[big]  # (run, P) row gather, L2-resident
        out[group, :] = np.minimum.reduceat(g, starts, axis=0)

    for i in range(n_docs):
        if len(doc_idx[i]) == 0:
            continue
        group.append(i)
        group_len += len(doc_idx[i])
        if group_len >= _SIG_CHUNK:
            flush(group)
            group, group_len = [], 0
    if group:
        flush(group)
    return out


def exact_dedup(ds: Dataset, key_col: str, id_col: str) -> Dataset:
    """Exact dedup: one surviving id (the min) per distinct key."""
    return ds.groupby(key_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies")
    )


def minhash_bands(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> Dataset:
    """Stage 1: (band_id, band_hash, doc_id) rows — the only thing
    that shuffles. Signatures via the chunked batched kernel."""
    a, b = _perm_params(num_perm)
    rows_per_band = num_perm // bands
    memo: dict[str, int] = {}  # per-task shingle-hash memo

    def _sig(batch: pa.Table) -> pa.Table:
        if len(memo) > 4_000_000:  # bound per-worker memo growth
            memo.clear()
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        n = len(ids)
        sigs = minhash_signatures_vocab(
            [t or "" for t in texts], shingle_k, a, b, memo
        )  # (n, P)
        band_hash = band_hashes(sigs, bands, rows_per_band).reshape(-1)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_id = np.repeat(np.asarray(ids, dtype=np.int64), bands)
        return pa.table(
            {
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_hash": pa.array(band_hash, type=pa.int64()),
                id_col: pa.array(doc_id, type=pa.int64()),
            }
        )

    return ds.map_batches(_sig, batch_format="pyarrow")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound is the
    defined numpy behavior — deterministic across processes, unlike
    Python `hash()`)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def band_hashes(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n_docs, bands) int64 bucket keys: a vectorized sequential
    splitmix64 mix over each band's signature rows. Two docs share a
    bucket iff their band chunks are equal (modulo a ~2^-64 collision)
    — the same collision structure as any strong 64-bit chunk hash,
    with zero per-row Python."""
    n = sigs.shape[0]
    bv = sigs.reshape(n, bands, rows_per_band)
    h = np.full((n, bands), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for j in range(rows_per_band):
        h = _mix64(h ^ bv[:, :, j])
    return h.view(np.int64)


def _block_pairs(b: pa.Table, id_col: str, max_bucket: int) -> pa.Table:
    """Whole-block candidate-pair generation: the block holds complete
    (band_id, band_hash) groups (keyed repartition upstream); one
    lexsort finds group boundaries, np.triu_indices emits each
    bucket's pairs, a C++ group_by dedups within the block."""
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    bid = b["band_id"].combine_chunks().to_numpy()
    bh = b["band_hash"].combine_chunks().to_numpy()
    ids = b[id_col].combine_chunks().to_numpy()
    order = np.lexsort((ids, bh, bid))
    bid, bh, ids = bid[order], bh[order], ids[order]
    newgrp = np.flatnonzero((np.diff(bid) != 0) | (np.diff(bh) != 0)) + 1
    starts = np.concatenate([[0], newgrp, [len(ids)]])
    a_out, b_out = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        u = np.unique(ids[s:e])
        if len(u) < 2 or len(u) > max_bucket:
            continue
        iu, ju = np.triu_indices(len(u), k=1)
        a_out.append(u[iu])
        b_out.append(u[ju])
    if not a_out:
        return empty
    t = pa.table(
        {
            "a": pa.array(np.concatenate(a_out), type=pa.int64()),
            "b": pa.array(np.concatenate(b_out), type=pa.int64()),
        }
    )
    return t.group_by(["a", "b"]).aggregate([])


# The keyed-repartition fast path assumes hash-shuffle finalize emits
# ONE block per partition, so a (band_id, band_hash) group never
# straddles blocks. That holds in ray 2.49.x (verified; the Ray source
# carries a TODO to split finalized blocks to target size in some
# future version) — so the fast path is PINNED to 2.49 and any other
# version takes the groupby().map_groups plan, which owns
# group-boundary semantics regardless of block layout (ADVICE r2).
_ONE_BLOCK_PER_PARTITION_VERSIONS = ("2.49",)


def _hash_shuffle_active() -> bool:
    import ray as _ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    if not _ray.__version__.startswith(_ONE_BLOCK_PER_PARTITION_VERSIONS):
        return False
    return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE


def _shuffle_partitions() -> int:
    import ray as _ray

    return max(4, int(_ray.cluster_resources().get("CPU", 8)) // 2)


def dropped_bucket_stats(
    bucketed: Dataset, id_col: str, max_bucket: int
) -> dict:
    """Audit the `max_bucket` recall trade (VERDICT r4 #7): how many
    (band_id, band_hash) buckets the pair-gen will SKIP as degenerate,
    and how many member rows they held. One distinct + one combiner
    groupby over the band rows, then a per-block partial sum — the
    driver sees O(blocks) rows, never the buckets themselves."""
    distinct = ops.distinct(
        bucketed.select_columns(["band_id", "band_hash", id_col]),
        ["band_id", "band_hash", id_col],
    )
    sizes = ops.grouped_sum_count(
        distinct, keys=["band_id", "band_hash"], sums=[], count_alias="n"
    )

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False)
        big = n[n > max_bucket]
        return pa.table(
            {
                "k": pa.array([len(big)], pa.int64()),
                "rows": pa.array([int(big.sum())], pa.int64()),
            }
        )

    parts = sizes.map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    ).take_all()
    return {
        "max_bucket": max_bucket,
        "dropped_buckets": sum(int(r["k"]) for r in parts),
        "dropped_bucket_rows": sum(int(r["rows"]) for r in parts),
    }


def pairs_from_buckets(
    bucketed: Dataset, id_col: str, max_bucket: int = 200, stats: dict | None = None
) -> Dataset:
    """Stage 2: bucketed band rows -> distinct candidate pairs (a < b),
    all as a Dataset (the pair set shuffles; it never lands on the
    driver). Buckets larger than `max_bucket` are dropped (a
    degenerate bucket means the banding is too coarse — skip, don't
    explode quadratically). Pass `stats={}` to have the drop counted
    (`dropped_bucket_stats`) instead of silent: the band rows
    materialize once and the audit pass reuses them.

    Two physical plans, same rows (parity-tested):
    - under `pipeline.hash_shuffle_ctx()` (the whole graph, source
      read included, must be built inside it): keyed repartition +
      whole-block vectorized pair-gen + keyed block dedup — measured
      ~4x faster than the sort-based groupby at bench scale;
    - otherwise: sort-based groupby().map_groups + hash-agg distinct
      (works under the default context).

    The fast path's correctness rests on Ray's hash-shuffle finalize
    emitting ONE block per partition (so a (band_id, band_hash) group
    can never straddle the block-at-a-time `_block_pairs`). That is
    the verified 2.49 behavior (its source carries a TODO to split
    finalized blocks to target size); `_hash_shuffle_active` pins the
    fast path to verified versions (`_ONE_BLOCK_PER_PARTITION_VERSIONS`)
    and silently uses the groupby plan — which owns group-boundary
    semantics — on any other Ray."""
    if stats is not None:
        bucketed = bucketed.materialize()
        stats.update(dropped_bucket_stats(bucketed, id_col, max_bucket))
    if _hash_shuffle_active():
        n = _shuffle_partitions()
        pairs = bucketed.repartition(n, keys=["band_id", "band_hash"]).map_batches(
            lambda b: _block_pairs(b, id_col, max_bucket),
            batch_size=None,
            batch_format="pyarrow",
        )
        return pairs.repartition(n, keys=["a", "b"]).map_batches(
            lambda t: t.group_by(["a", "b"]).aggregate([]),
            batch_size=None,
            batch_format="pyarrow",
        )

    import pandas as pd

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    pairs = bucketed.groupby(["band_id", "band_hash"]).map_groups(
        per_group, batch_format="pandas"
    )
    return ops.distinct(pairs, ["a", "b"])


# Below this many payload rows the pair-verify attaches payloads from
# a broadcast map (ray.put once, read per task) instead of two hash
# joins — the dimension-sized fast path; the join path is the scale
# path (nothing corpus-sized ever reaches the driver when the corpus
# is actually large).
PAYLOAD_BROADCAST_MAX_ROWS = 200_000


def join_pair_payload(
    pairs: Dataset,
    payload: Dataset,
    id_col: str,
    payload_col: str,
    *,
    num_partitions: int = PAIR_JOIN_PARTITIONS,
    broadcast_max_rows: int | None = None,
    payload_rows: int | None = None,
) -> Dataset:
    """Attach `payload_col` for both pair members, producing
    (a, b, <payload>_a, <payload>_b).

    Size-gated like ops.semi_join: a dimension-sized payload table is
    broadcast once (`ray.put` of an id->payload dict) and attached
    map-side; above the gate it becomes two hash-partitioned
    equi-joins (pairs x payload on `a`, then `b`) — the payload
    shuffles by key and the driver never sees it."""
    if broadcast_max_rows is None:
        broadcast_max_rows = PAYLOAD_BROADCAST_MAX_ROWS
    proj = payload.select_columns([id_col, payload_col])
    # `payload_rows` lets callers pass a metadata-cheap row count (the
    # raw read's) so the gate doesn't execute a derived payload plan;
    # without it, materialize the projection ONCE so the gate's count
    # and the attach/joins below share an execution (ADVICE r2 —
    # previously a derived payload plan ran twice)
    if payload_rows is None:
        proj = proj.materialize()
    if (payload_rows if payload_rows is not None else proj.count()) <= broadcast_max_rows:
        import ray as _ray

        lookup: dict = {}
        for t in _ray.get(proj.to_arrow_refs()):
            lookup.update(zip(t[id_col].to_pylist(), t[payload_col].to_pylist()))
        ref = _ray.put(lookup)

        def attach(batch: pa.Table) -> pa.Table:
            lk = _ray.get(ref)
            a_ids = batch["a"].to_pylist()
            b_ids = batch["b"].to_pylist()
            return pa.table(
                {
                    "a": batch["a"],
                    "b": batch["b"],
                    f"{payload_col}_a": pa.array([lk.get(i) for i in a_ids]),
                    f"{payload_col}_b": pa.array([lk.get(i) for i in b_ids]),
                }
            )

        return pairs.map_batches(attach, batch_format="pyarrow")

    # rename the payload column BEFORE each join (renaming after a
    # join can leave mixed block schemas in ray 2.49 — observed
    # "different schema than the previous one" warnings + flaky
    # FieldRef errors)
    def side(suffix: str):
        return proj.map_batches(
            lambda b, s=suffix: b.rename_columns([id_col, f"{payload_col}{s}"]),
            batch_format="pyarrow",
        )

    # Two mitigations for ray 2.49 JoinOperator flakiness on empty /
    # zero-block partitions (reproduced ~1/15 runs at 7-doc scale:
    # "No match ... for FieldRef.Name(b) on left side"):
    # 1. size-adapt the partition count so no partition is key-starved
    #    (join keys are doc ids, so bound partitions by ~64 ids each —
    #    a partition that receives zero LEFT rows can hit a finalize
    #    race inside Ray's join, which no input normalization can fix);
    # 2. ops.normalize_blocks pins each join's OUTPUT schema so a
    #    malformed empty block can't poison the chained second join.
    n_ids = payload_rows if payload_rows is not None else proj.count()
    num_partitions = max(1, min(num_partitions, n_ids // 64))
    ptype = proj.schema().base_schema.field(payload_col).type
    sch1 = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), (f"{payload_col}_a", ptype)]
    )
    j1 = ops.normalize_blocks(
        ops.hash_join(
            pairs, side("_a"), on=("a",), right_on=(id_col,),
            num_partitions=num_partitions,
        ),
        sch1,
    )
    return ops.normalize_blocks(
        ops.hash_join(
            j1, side("_b"), on=("b",), right_on=(id_col,),
            num_partitions=num_partitions,
        ),
        sch1.append(pa.field(f"{payload_col}_b", ptype)),
    )


def _shingle_set(t: str, k: int) -> set:
    return set(t[x : x + k] for x in range(max(1, len(t) - k + 1)))


def minhash_lsh_pairs_ds(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    stats: dict | None = None,
) -> Dataset:
    """Near-duplicate pairs (a, b, jaccard) with exact-Jaccard verify,
    as a DATASET — nothing is collected to the driver. This is the
    at-scale form: downstream consumers (connected components, pair
    sinks) keep the pair set distributed.

    Verification is distributed: candidate pairs hash-join back to the
    text table on `a` then `b` (join_pair_payload) and the exact
    Jaccard runs inside `map_batches`."""
    n_docs = ds.count()  # metadata-cheap on a raw read
    bands_ds = minhash_bands(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    cand = pairs_from_buckets(bands_ds, id_col, stats=stats)
    withtext = join_pair_payload(cand, ds, id_col, text_col, payload_rows=n_docs)

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        ta = batch[f"{text_col}_a"].to_pylist()
        tb = batch[f"{text_col}_b"].to_pylist()
        a_c, b_c, j_c = [], [], []
        cache: dict[int, set] = {}
        for i in range(len(a_ids)):
            sa = cache.get(a_ids[i])
            if sa is None:
                sa = cache[a_ids[i]] = _shingle_set(ta[i] or "", shingle_k)
            sb = cache.get(b_ids[i])
            if sb is None:
                sb = cache[b_ids[i]] = _shingle_set(tb[i] or "", shingle_k)
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 0.0
            if j >= threshold:
                a_c.append(a_ids[i])
                b_c.append(b_ids[i])
                j_c.append(round(j, 4))
        return pa.table(
            {
                "a": pa.array(a_c, type=pa.int64()),
                "b": pa.array(b_c, type=pa.int64()),
                "jaccard": pa.array(j_c, type=pa.float64()),
            }
        )

    return withtext.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    stats: dict | None = None,
) -> pa.Table:
    """Collected form of `minhash_lsh_pairs_ds` — only the verified
    pairs (the bounded result, O(duplicates) not O(corpus)) reach the
    driver, sorted (a, b) for determinism."""
    out = minhash_lsh_pairs_ds(
        ds, text_col, id_col,
        threshold=threshold, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        stats=stats,
    )
    return ops.collect_table(
        out,
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ),
        sort_by=["a", "b"],
    )


def connected_components(pairs: pa.Table) -> dict[int, int]:
    """id -> component-minimum label via union-find over a verified
    near-dup pair table. The pair table is BOUNDED by construction
    (minhash_lsh_pairs collects only verified pairs — O(duplicates),
    not O(corpus)); the union-find is O(|pairs| α)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    a_ids = pairs["a"].to_pylist()
    b_ids = pairs["b"].to_pylist()
    nodes: set[int] = set(a_ids) | set(b_ids)
    for x, y in zip(a_ids, b_ids):
        rx, ry = find(x), find(y)
        if rx != ry:
            # attach the larger root under the smaller one, so every
            # root IS its component's minimum id
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    return {x: find(x) for x in nodes}


# Above this many verified pairs the removal step stops collecting
# them to the driver (union-find) and runs the distributed min-label
# propagation instead. 5M pairs ≈ 120 MB on the driver — comfortable
# below, corpus-dependent above (a 100-TB crawl with a 30% dup rate
# produces billions of pairs).
DRIVER_PAIRS_GATE = 5_000_000


def minhash_dedup_docs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    components: str = "auto",
    driver_pairs_gate: int = DRIVER_PAIRS_GATE,
    stats: dict | None = None,
) -> Dataset:
    """Near-duplicate REMOVAL (the training-data pipeline's actual
    dedup step, on top of the pair detector): MinHash+LSH pairs ->
    connected components -> keep only each component's minimum id.

    Scale shape: the expensive part (pair detection) is the existing
    distributed pipeline. Component labeling is size-gated
    (`components="auto"`): below `driver_pairs_gate` verified pairs
    the bounded pair set collects to a driver union-find and the
    removal-id set — only non-minimum members of dup clusters,
    ≪ corpus — broadcasts once (`ray.put`) with a map-side filter;
    above the gate (or `components="distributed"`) the pair set stays
    a Dataset end to end: `ops.connected_components_distributed`
    labels it by iterative min-label joins and the corpus is pruned
    with the size-gated `ops.anti_join`. Nothing corpus-sized ever
    leaves the workers on either path (parity-tested)."""
    import ray as _ray

    pairs_ds = minhash_lsh_pairs_ds(
        ds, text_col, id_col,
        threshold=threshold, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        stats=stats,
    ).materialize()  # executed once; reused by whichever path wins
    use_driver = components == "driver" or (
        components == "auto" and pairs_ds.count() <= driver_pairs_gate
    )
    if use_driver:
        pairs = ops.collect_table(
            pairs_ds,
            schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
            ),
            sort_by=["a", "b"],
        )
        labels = connected_components(pairs)
        drop = sorted(x for x, root in labels.items() if root != x)
        dropref = _ray.put(pa.array(drop, type=pa.int64()))

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch[id_col], value_set=_ray.get(dropref)))
            return batch.filter(mask)

        return ds.map_batches(keep, batch_size=None, batch_format="pyarrow")

    # distributed path: labels and drop ids stay Datasets
    labels_ds = ops.connected_components_distributed(pairs_ds, "a", "b")
    drop_ds = labels_ds.map_batches(
        lambda b: pa.table(
            {"node": b["node"].filter(pc.not_equal(b["node"], b["label"]))}
        ),
        batch_size=None,
        batch_format="pyarrow",
    )
    return ops.anti_join(ds, id_col, drop_ds, "node")


# ---------------------------------------------------------------------------
# SimHash


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weight = term frequency)."""
    acc = np.zeros(64, dtype=np.int64)
    toks = (text or "").split()
    if not toks:
        return 0
    from collections import Counter

    for tok, w in Counter(toks).items():
        h = _stable64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, w, -w)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


_BIT_POWERS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def simhash_batch(texts: list[str], memo: dict[str, int]) -> np.ndarray:
    """Batched SimHash, bit-identical to `simhash64` per doc
    (parity-tested): one token vocabulary per batch (blake2b per
    DISTINCT token, memoized across batches per worker), a (vocab, 64)
    ±1 sign matrix, and per-doc weighted segment sums via
    np.add.reduceat — no per-token Python in the hot path."""
    from collections import Counter

    vocab: dict[str, int] = {}
    idx_chunks: list[np.ndarray] = []
    w_chunks: list[np.ndarray] = []
    lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        c = Counter(toks)
        ids = np.fromiter(
            (vocab.setdefault(k, len(vocab)) for k in c), np.int64, len(c)
        )
        idx_chunks.append(ids)
        w_chunks.append(np.fromiter(c.values(), np.int64, len(c)))
        lens[i] = len(c)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not vocab:
        return (out ^ np.uint64(1 << 63)).view(np.int64)
    u = np.empty(len(vocab), dtype=np.uint64)
    for w, ci in vocab.items():
        h = memo.get(w)
        if h is None:
            h = _stable64(w)
            memo[w] = h
        u[ci] = h
    signs = (((u[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    ) * 2 - 1)  # (V, 64) of ±1
    nonempty = np.flatnonzero(lens > 0)
    ne_lens = lens[nonempty]
    # L2-sized runs (same 100x cache lever as the minhash kernel):
    # gather+multiply+reduceat over at most _SIG_CHUNK token rows
    pos = 0
    while pos < len(nonempty):
        end = pos
        run = 0
        while end < len(nonempty) and (run == 0 or run + ne_lens[end] <= _SIG_CHUNK):
            run += ne_lens[end]
            end += 1
        big_idx = np.concatenate(idx_chunks[pos:end])
        big_w = np.concatenate(w_chunks[pos:end])
        starts = np.concatenate([[0], np.cumsum(ne_lens[pos:end])[:-1]])
        contrib = signs[big_idx] * big_w[:, None]  # (run, 64)
        acc = np.add.reduceat(contrib, starts, axis=0)
        out[nonempty[pos:end]] = (acc > 0).astype(np.uint64) @ _BIT_POWERS
        pos = end
    # the stored column is simhash64(x) - 2^63 (int64); subtracting
    # 2^63 is exactly an XOR of the top bit in two's complement
    return (out ^ np.uint64(1 << 63)).view(np.int64)


def simhash_table(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    memo: dict[str, int] = {}

    def f(batch: pa.Table) -> pa.Table:
        if len(memo) > 4_000_000:
            memo.clear()
        hs = simhash_batch(batch[text_col].to_pylist(), memo)
        return pa.table(
            {id_col: batch[id_col], "simhash": pa.array(hs, type=pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy 1.x has no
    bitwise_count): unpack to bits bytewise and sum per word."""
    by = x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(by, axis=1).sum(axis=1).astype(np.int64)


def simhash_pairs(
    ds: Dataset, text_col: str, id_col: str, *, max_hamming: int = 3,
    stats: dict | None = None,
) -> pa.Table:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit chunks (Hamming <= 3 guarantees one identical chunk),
    bucket-join, verify exact Hamming distance — the verify is a
    distributed join of the pair set against the (id, simhash) table
    (never a driver materialization of the fingerprints)."""
    sims = simhash_table(ds, text_col, id_col)

    def to_bands(batch: pa.Table) -> pa.Table:
        """Vectorized banding (VERDICT r2 task 3, mirroring the MinHash
        twin in minhash_bands): the stored int64 is simhash - 2^63, so
        adding 2^63 back is an XOR of the top bit on the uint64 view;
        all 4 16-bit chunks come from one broadcast shift/mask."""
        ids = batch[id_col].combine_chunks().to_numpy()
        hs = batch["simhash"].combine_chunks().to_numpy()
        n = len(ids)
        uh = hs.view(np.uint64) ^ np.uint64(1 << 63)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        chunks = (uh[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)  # (n, 4)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(4, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(
                    chunks.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                id_col: pa.array(np.repeat(ids, 4), type=pa.int64()),
            }
        )

    n_docs = ds.count()  # metadata-cheap on a raw read
    bands_ds = sims.map_batches(to_bands, batch_format="pyarrow")
    cand = pairs_from_buckets(bands_ds, id_col)
    withsim = join_pair_payload(cand, sims, id_col, "simhash", payload_rows=n_docs)

    def verify(batch: pa.Table) -> pa.Table:
        ha = batch["simhash_a"].combine_chunks().to_numpy().astype(np.int64)
        hb = batch["simhash_b"].combine_chunks().to_numpy().astype(np.int64)
        d = _popcount64((ha ^ hb).view(np.uint64))
        keep = d <= max_hamming
        return pa.table(
            {
                "a": batch["a"].filter(pa.array(keep)),
                "b": batch["b"].filter(pa.array(keep)),
                "hamming": pa.array(d[keep], type=pa.int64()),
            }
        )

    out = withsim.map_batches(verify, batch_format="pyarrow")
    return ops.collect_table(
        out,
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]
        ),
        sort_by=["a", "b"],
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with cheap blocking


def minhash_sig_table(
    ds: Dataset, text_col: str, id_col: str, *, num_perm: int = 64, shingle_k: int = 5
) -> Dataset:
    """(id, signature bytes) table — the batched signature kernel with
    the raw (num_perm x uint64) signature packed to binary (so it can
    ride joins / broadcast maps)."""
    a, b = _perm_params(num_perm)
    memo: dict[str, int] = {}

    def f(batch: pa.Table) -> pa.Table:
        if len(memo) > 4_000_000:
            memo.clear()
        texts = [t or "" for t in batch[text_col].to_pylist()]
        sigs = minhash_signatures_vocab(texts, shingle_k, a, b, memo)
        return pa.table(
            {
                id_col: batch[id_col],
                "_sigbin": pa.array(
                    [sigs[i].tobytes() for i in range(sigs.shape[0])],
                    type=pa.binary(),
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def ngram_jaccard_topk(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int = 20,
    shingle_k: int = 4,
    prefilter_factor: int = 250,
) -> pa.Table:
    """Top-k most similar pairs by char-n-gram Jaccard.

    Candidates come from MinHash banding with a LOW threshold (more
    bands of fewer rows), so no quadratic scan. Low-threshold banding
    on a repetitive corpus yields MILLIONS of candidates, so the exact
    verify is two-staged: (1) a fully vectorized MinHash Jaccard
    ESTIMATE per candidate (signatures ride the pair set; matching
    permutations / num_perm), keeping the top `prefilter_factor * k`
    pairs — the 64-perm estimator's std is ~0.06, so the margin is
    hundreds of sigma around the top-k boundary; (2) exact Jaccard on
    that shortlist only, distributed, then global sort+limit."""
    n_docs = ds.count()  # metadata-cheap on a raw read
    bands_ds = minhash_bands(
        ds, text_col, id_col, num_perm=64, bands=32, shingle_k=shingle_k
    )
    cand = pairs_from_buckets(bands_ds, id_col)
    sigs = minhash_sig_table(ds, text_col, id_col, num_perm=64, shingle_k=shingle_k)
    n_keep = prefilter_factor * k

    def block_topk(batch: pa.Table, est: np.ndarray) -> pa.Table:
        """Per-BLOCK top-n_keep by estimate: the union of per-block
        tops is a superset of the global top — no global sort."""
        if len(est) > n_keep:
            idx = np.argpartition(-est, n_keep - 1)[:n_keep]
            return pa.table(
                {"a": batch["a"].take(pa.array(idx)), "b": batch["b"].take(pa.array(idx))}
            )
        return batch.select(["a", "b"])

    if n_docs <= PAYLOAD_BROADCAST_MAX_ROWS:
        # dimension-sized: broadcast the whole signature MATRIX once
        # (rows x 8*num_perm bytes) — attaching 2x512 B of signature
        # to each of millions of candidate pairs costs GBs of payload,
        # a vectorized searchsorted gather costs nothing
        import ray as _ray

        tbl = ops.collect_table(
            sigs, schema=pa.schema([(id_col, pa.int64()), ("_sigbin", pa.binary())])
        )
        ids_sorted = np.argsort(tbl[id_col].to_numpy())
        sid = tbl[id_col].to_numpy()[ids_sorted]
        mat = np.frombuffer(b"".join(
            tbl["_sigbin"].take(pa.array(ids_sorted)).to_pylist()
        ), dtype=np.uint64).reshape(len(sid), -1)
        ref = _ray.put((sid, mat))

        def estimate_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
                )
            sid_, mat_ = _ray.get(ref)
            ia = np.searchsorted(sid_, batch["a"].combine_chunks().to_numpy())
            ib = np.searchsorted(sid_, batch["b"].combine_chunks().to_numpy())
            est = np.empty(len(ia))
            # L2-sized gather runs — an unchunked 100k-row fancy-index
            # gather is ~200x slower on this host (see _SIG_CHUNK note)
            for s in range(0, len(ia), _SIG_CHUNK):
                e = min(s + _SIG_CHUNK, len(ia))
                est[s:e] = (mat_[ia[s:e]] == mat_[ib[s:e]]).mean(axis=1)
            return block_topk(batch, est)

        shortlist = cand.map_batches(
            estimate_bcast, batch_size=None, batch_format="pyarrow"
        )
    else:
        # scale path: signatures ride the pair join as packed bytes
        # (one signature row per doc, so the raw read's metadata count
        # gates without executing the signature plan)
        withsig = join_pair_payload(cand, sigs, id_col, "_sigbin", payload_rows=n_docs)

        def estimate_joined(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
                )
            sa = np.frombuffer(b"".join(batch["_sigbin_a"].to_pylist()), dtype=np.uint64
                               ).reshape(batch.num_rows, -1)
            sb = np.frombuffer(b"".join(batch["_sigbin_b"].to_pylist()), dtype=np.uint64
                               ).reshape(batch.num_rows, -1)
            est = np.empty(batch.num_rows)
            for s in range(0, batch.num_rows, _SIG_CHUNK):
                e = min(s + _SIG_CHUNK, batch.num_rows)
                est[s:e] = (sa[s:e] == sb[s:e]).mean(axis=1)
            return block_topk(batch, est)

        shortlist = withsig.map_batches(
            estimate_joined, batch_size=None, batch_format="pyarrow"
        )
    withtext = join_pair_payload(shortlist, ds, id_col, text_col, payload_rows=n_docs)

    def score(batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        ta = batch[f"{text_col}_a"].to_pylist()
        tb = batch[f"{text_col}_b"].to_pylist()
        a_c, b_c, j_c = [], [], []
        cache: dict[int, set] = {}
        for i in range(len(a_ids)):
            sa = cache.get(a_ids[i])
            if sa is None:
                sa = cache[a_ids[i]] = _shingle_set(ta[i] or "", shingle_k)
            sb = cache.get(b_ids[i])
            if sb is None:
                sb = cache[b_ids[i]] = _shingle_set(tb[i] or "", shingle_k)
            u = len(sa | sb)
            if u:
                a_c.append(a_ids[i])
                b_c.append(b_ids[i])
                j_c.append(round(len(sa & sb) / u, 4))
        return pa.table(
            {
                "a": pa.array(a_c, type=pa.int64()),
                "b": pa.array(b_c, type=pa.int64()),
                "jaccard": pa.array(j_c, type=pa.float64()),
            }
        )

    scored = withtext.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["jaccard", "a", "b"], descending=[True, False, False]).limit(k)
    return ops.collect_table(
        top,
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ),
        sort_by=[("jaccard", "descending"), ("a", "ascending"), ("b", "ascending")],
    )


def jaccard_prefix_join(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int = 4,
    theta_num: int = 6,
    theta_den: int = 10,
) -> Dataset:
    """X50: EXACT set-similarity self-join by prefix filtering (the
    PPJoin family) — every pair of docs whose word-k-gram Jaccard
    >= theta_num/theta_den, with NO sketch and no probabilistic
    recall: under a global rarest-first gram ordering, two qualifying
    sets must share a gram inside their first
    p = n - ceil(theta*n) + 1 grams, so joining ONLY on prefix grams
    is lossless while touching a tiny fraction of the inverted index
    (the rarest grams have the shortest postings). The exact-Jaccard
    check is the same rational-integer comparison on both sides
    (den*inter >= num*union) — no float threshold.

    Plan: gram explode (shared `_gram_batch` kernel) -> distinct
    (doc, gram) materialized once (feeds ranking AND verify sizes) ->
    global gram frequencies via combiner groupby -> ONE hash join
    attaches frequencies -> per-doc prefix via groupby.map_groups
    (groups are single docs; bounded) -> prefix self-join on gram ->
    distinct (a < b) candidates -> texts attach via the size-gated
    `join_pair_payload` and the integer check runs in map_batches.
    Returns (a, b, inter, uni) — all int64, fully SQL-exact. The
    brute-force oracle validates the losslessness claim itself."""
    from ..queries import _gram_batch  # lazy: queries imports extras lazily

    import pandas as pd

    n_docs = ds.count()  # metadata-cheap on a raw read
    grams = ds.map_batches(
        lambda b: _gram_batch(b, k=k), batch_size=None, batch_format="pyarrow"
    )
    dg = ops.distinct(grams, ["doc_id", "gram"]).materialize()
    gf = ops.grouped_sum_count(dg, keys=["gram"], sums=[], count_alias="gfreq")
    ranked = ops.normalize_blocks(
        ops.hash_join(
            dg,
            ops.drop_empty_blocks(gf).map_batches(
                lambda b: pa.table({"jg": b["gram"], "gfreq": b["gfreq"]}),
                batch_size=None,
                batch_format="pyarrow",
            ),
            on=("gram",),
            right_on=("jg",),
        ),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("gram", pa.string()),
                ("gfreq", pa.int64()),
            ]
        ),
    )

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        need = -(-theta_num * n // theta_den)  # ceil(theta*n)
        p = n - need + 1
        g = g.sort_values(["gfreq", "gram"], kind="mergesort").head(p)
        return pd.DataFrame({"gram": g["gram"], "doc_id": g["doc_id"]})

    pre = ops.drop_empty_blocks(
        ranked.groupby("doc_id").map_groups(prefix, batch_format="pandas")
    ).materialize()  # both sides of the candidate self-join

    cand = ops.distinct(
        ops.normalize_blocks(
            ops.hash_join(
                pre.map_batches(
                    lambda b: pa.table({"gram": b["gram"], "a": b["doc_id"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                ops.drop_empty_blocks(
                    pre.map_batches(
                        lambda b: pa.table(
                            {"jg": b["gram"], "b": b["doc_id"]}
                        ),
                        batch_size=None,
                        batch_format="pyarrow",
                    )
                ),
                on=("gram",),
                right_on=("jg",),
            ),
            pa.schema(
                [("gram", pa.string()), ("a", pa.int64()), ("b", pa.int64())]
            ),
        )
        .map_batches(
            lambda t: t.filter(pc.less(t["a"], t["b"])).select(["a", "b"]),
            batch_size=None,
            batch_format="pyarrow",
        ),
        ["a", "b"],
    )

    withtext = join_pair_payload(cand, ds, id_col, text_col, payload_rows=n_docs)

    def gram_set(text: str) -> set:
        toks = (text or "").split(" ")
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        ta = batch[f"{text_col}_a"].to_pylist()
        tb = batch[f"{text_col}_b"].to_pylist()
        cache: dict[int, set] = {}
        a_c, b_c, i_c, u_c = [], [], [], []
        for i in range(len(a_ids)):
            sa = cache.get(a_ids[i])
            if sa is None:
                sa = cache[a_ids[i]] = gram_set(ta[i])
            sb = cache.get(b_ids[i])
            if sb is None:
                sb = cache[b_ids[i]] = gram_set(tb[i])
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            if theta_den * inter >= theta_num * uni and uni > 0:
                a_c.append(a_ids[i])
                b_c.append(b_ids[i])
                i_c.append(inter)
                u_c.append(uni)
        return pa.table(
            {
                "a": pa.array(a_c, pa.int64()),
                "b": pa.array(b_c, pa.int64()),
                "inter": pa.array(i_c, pa.int64()),
                "uni": pa.array(u_c, pa.int64()),
            }
        )

    return withtext.map_batches(verify, batch_format="pyarrow")
