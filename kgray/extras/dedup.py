"""Deduplication operators over a text column (SURVEY-extra; task
brief "Deduplication": exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — embedding-cosine lives in annsearch.py).

Scale design notes
------------------
- Exact: hash-partition on the text (or its sha) + per-partition
  first — one all-to-all of (key, id) pairs, never the texts twice.
- MinHash-LSH: signatures are computed per batch (vectorized numpy
  over the shingle-hash array), then ONLY the (band_id, band_hash,
  doc_id) rows shuffle — ~bands x 16 bytes per doc regardless of text
  size. Candidate pairs are verified with exact Jaccard; the verify
  stage broadcasts the shingle sets only for candidate docs.
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

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

MERSENNE = (1 << 61) - 1


def _stable64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingles -> uint64 hash array."""
    if len(text) < k:
        sh = {text} if text else set()
    else:
        sh = {text[i : i + k] for i in range(len(text) - k + 1)}
    return np.fromiter((_stable64(s) for s in sh), dtype=np.uint64, count=len(sh))


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature; empty doc -> all MERSENNE."""
    if len(hashes) == 0:
        return np.full(len(a), MERSENNE, dtype=np.uint64)
    # (p, m) broadcast; mod 2^61-1 keeps everything in uint64 range
    v = (np.outer(a, hashes) + b[:, None]) % MERSENNE
    return v.min(axis=1)


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
    that shuffles."""
    a, b = _perm_params(num_perm)
    rows_per_band = num_perm // bands

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        band_id, band_hash, doc_id = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(shingle_hashes(t or "", shingle_k), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) - (1 << 63)
                band_id.append(bi)
                band_hash.append(h)
                doc_id.append(ids[i])
        return pa.table(
            {
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_hash": pa.array(band_hash, type=pa.int64()),
                id_col: pa.array(doc_id, type=pa.int64()),
            }
        )

    return ds.map_batches(_sig, batch_format="pyarrow")


def _pairs_from_buckets(bucketed: Dataset, id_col: str, max_bucket: int = 200) -> pa.Table:
    """Stage 2: groupby bucket -> emit candidate pairs (a < b),
    deduped. Buckets larger than `max_bucket` are dropped (a degenerate
    bucket means the banding is too coarse — log, don't explode)."""
    import pandas as pd

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col].tolist()))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        a_c, b_c = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_c.append(ids[i])
                b_c.append(ids[j])
        return pd.DataFrame({"a": a_c, "b": b_c}, dtype="int64")

    pairs = bucketed.groupby(["band_id", "band_hash"]).map_groups(
        per_group, batch_format="pandas"
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    pdf = pdf.drop_duplicates().sort_values(["a", "b"], ignore_index=True)
    return pa.Table.from_pandas(pdf[["a", "b"]], preserve_index=False)


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> pa.Table:
    """Near-duplicate pairs (a, b, jaccard) with exact-Jaccard verify.

    The verify stage broadcasts shingle sets for CANDIDATE docs only
    (at scale: a semi-join fetch of the candidate texts, not the
    corpus)."""
    texts = {
        r[id_col]: r[text_col]
        for r in ds.select_columns([id_col, text_col]).take_all()
    }  # driver-held only for the verify of candidates; see docstring
    bands_ds = minhash_bands(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    cand = _pairs_from_buckets(bands_ds, id_col)
    a_c, b_c, j_c = [], [], []
    cache: dict[int, set] = {}

    def sh(i):
        s = cache.get(i)
        if s is None:
            t = texts.get(i) or ""
            s = set(t[x : x + shingle_k] for x in range(max(1, len(t) - shingle_k + 1)))
            cache[i] = s
        return s

    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        sa, sb = sh(a), sh(b)
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 0.0
        if j >= threshold:
            a_c.append(a)
            b_c.append(b)
            j_c.append(round(j, 4))
    return pa.table(
        {
            "a": pa.array(a_c, type=pa.int64()),
            "b": pa.array(b_c, type=pa.int64()),
            "jaccard": pa.array(j_c, type=pa.float64()),
        }
    )


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


def simhash_table(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        hs = [simhash64(t) - (1 << 63) for t in batch[text_col].to_pylist()]
        return pa.table({id_col: ids, "simhash": pa.array(hs, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_pairs(
    ds: Dataset, text_col: str, id_col: str, *, max_hamming: int = 3
) -> pa.Table:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit chunks (Hamming <= 3 guarantees one identical chunk),
    bucket-join, verify exact Hamming distance."""
    sims = simhash_table(ds, text_col, id_col)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = batch["simhash"].to_pylist()
        band_id, band_hash, out_id, out_h = [], [], [], []
        for i, h in enumerate(hs):
            uh = h + (1 << 63)
            for bi in range(4):
                band_id.append(bi)
                band_hash.append((uh >> (16 * bi)) & 0xFFFF)
                out_id.append(ids[i])
                out_h.append(h)
        return pa.table(
            {
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_hash": pa.array(band_hash, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "simhash": pa.array(out_h, type=pa.int64()),
            }
        )

    bands_ds = sims.map_batches(to_bands, batch_format="pyarrow")
    cand = _pairs_from_buckets(bands_ds, id_col)
    # verify: recompute pair hamming from the simhash table (small)
    hmap = {
        r[id_col]: r["simhash"] + (1 << 63) for r in sims.take_all()
    }
    a_c, b_c, d_c = [], [], []
    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        d = bin(hmap[a] ^ hmap[b]).count("1")
        if d <= max_hamming:
            a_c.append(a)
            b_c.append(b)
            d_c.append(d)
    return pa.table(
        {
            "a": pa.array(a_c, type=pa.int64()),
            "b": pa.array(b_c, type=pa.int64()),
            "hamming": pa.array(d_c, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with cheap blocking


def ngram_jaccard_topk(
    ds: Dataset, text_col: str, id_col: str, *, k: int = 20, shingle_k: int = 4
) -> pa.Table:
    """Top-k most similar pairs by char-n-gram Jaccard.

    Candidates come from MinHash banding with a LOW threshold (more
    bands of fewer rows), so no quadratic scan; exact Jaccard on the
    candidates, global top-k. Always non-empty on non-trivial input."""
    bands_ds = minhash_bands(ds, text_col, id_col, num_perm=64, bands=32, shingle_k=shingle_k)
    cand = _pairs_from_buckets(bands_ds, id_col)
    texts = {
        r[id_col]: r[text_col]
        for r in ds.select_columns([id_col, text_col]).take_all()
    }
    cache: dict[int, set] = {}

    def sh(i):
        s = cache.get(i)
        if s is None:
            t = texts.get(i) or ""
            s = set(t[x : x + shingle_k] for x in range(max(1, len(t) - shingle_k + 1)))
            cache[i] = s
        return s

    scored = []
    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        sa, sb = sh(a), sh(b)
        u = len(sa | sb)
        if u:
            scored.append((round(len(sa & sb) / u, 4), a, b))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = scored[:k]
    return pa.table(
        {
            "a": pa.array([t[1] for t in top], type=pa.int64()),
            "b": pa.array([t[2] for t in top], type=pa.int64()),
            "jaccard": pa.array([t[0] for t in top], type=pa.float64()),
        }
    )
