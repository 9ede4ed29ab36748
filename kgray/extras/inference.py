"""Corpus-embedding inference stage (round 5, VERDICT r4 #5): the
shape a 100-TB training-data user runs daily — "embed every document
with a model" — composed from the repo's existing pieces:

- length buckets (the X59 quartile recipe: thresholds from ONE
  combiner word-count value-count table) so micro-batches are
  padding-homogeneous;
- map-side sorted batching: each block is sorted by (n_words, doc_id)
  BEFORE the model stage, the zero-shuffle industry idiom for
  length-homogeneous inference batches (a global sort would move the
  wide text column through an all-to-all for no extra win);
- an actor-pool model stage: weights built once per actor in
  ``__init__``, vectorized hashed-BoW encode per batch, small
  batch_size because rows carry full text.

The "model" is a deterministic stand-in with real-model structure (no
ML libs in the sealed env): hashed bag-of-words into HASH_DIM slots
(FNV-1a 64 over UTF-8 token bytes, mod HASH_DIM), count-normalized,
projected by a seeded Gaussian matrix to EMB_DIM, L2-normalized.
Deterministic per document — independent of batch layout, cluster
size, and actor count, so the stage is resumable and oracle-checkable
(sequential twin: reference_impl/sketch.py::run_doc_embed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .textstats import _TOKEN

HASH_DIM = 256
EMB_DIM = 16
MODEL_SEED = 7
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_M64 = (1 << 64) - 1


def token_slot(tok: str) -> int:
    """FNV-1a 64 of the token's UTF-8 bytes, mod HASH_DIM (pure-int
    Python: identical in the engine and the sequential twin)."""
    h = FNV_OFFSET
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) & _M64
    return h % HASH_DIM


def model_weights(seed: int = MODEL_SEED) -> np.ndarray:
    """The stub model's (HASH_DIM, EMB_DIM) projection."""
    return np.random.default_rng(seed).standard_normal((HASH_DIM, EMB_DIM))


class EmbedModel:
    """Actor-pool inference stage. __init__ = load weights once per
    actor (the expensive step for a real model); __call__ = one
    micro-batch forward pass. A per-actor token->slot cache amortizes
    the string hash to once per distinct token per actor."""

    def __init__(self, seed: int = MODEL_SEED):
        self.proj = model_weights(seed)
        self.slot_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache = self.slot_cache
        texts = batch["text"].to_pylist()
        counts = np.zeros((len(texts), HASH_DIM), dtype=np.float64)
        nw = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _TOKEN.findall(t or "")
            nw[i] = len(toks)
            for tok in toks:
                s = cache.get(tok)
                if s is None:
                    s = cache[tok] = token_slot(tok)
                counts[i, s] += 1.0
        x = counts / np.maximum(1.0, counts.sum(axis=1, keepdims=True))
        emb = x @ self.proj  # one GEMM per micro-batch
        l2 = np.sqrt((emb * emb).sum(axis=1))
        unit = emb / np.maximum(1e-12, l2)[:, None]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": batch["bucket"],
                "n_words": pa.array(nw),
                "emb_l2": pa.array(np.round(l2, 6)),
                "emb_argmax": pa.array(np.argmax(unit, axis=1).astype(np.int64)),
                "emb_c0": pa.array(np.round(unit[:, 0], 6)),
            }
        )


def embed_corpus(
    ds: Dataset,
    thresholds: tuple[int, int, int],
    *,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> Dataset:
    """bucketize -> map-side length sort -> actor-pool model."""
    t1, t2, t3 = thresholds

    def prep(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        nw = np.array([len(_TOKEN.findall(t or "")) for t in texts], dtype=np.int64)
        bkt = np.full(len(nw), 3, dtype=np.int64)
        bkt[nw <= t3] = 2
        bkt[nw <= t2] = 1
        bkt[nw <= t1] = 0
        t = pa.table(
            {"doc_id": b["doc_id"], "text": b["text"], "bucket": pa.array(bkt),
             "nw": pa.array(nw)}
        )
        # sorted batching: inside this block, adjacent rows now have
        # similar lengths, so each model micro-batch pads minimally
        t = t.sort_by([("nw", "ascending"), ("doc_id", "ascending")])
        return t.drop_columns(["nw"])

    prepped = ds.map_batches(prep, batch_size=None, batch_format="pyarrow")
    return prepped.map_batches(
        EmbedModel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
