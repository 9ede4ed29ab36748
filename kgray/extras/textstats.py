"""Text-analysis operators (task brief: language-ID, quality scoring,
token counting, document fingerprinting). All vectorized or
memo-light `map_batches` bodies over the `documents` table.
Token-counting queries live in kgray/queries.py (SQL-oracled)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# tiny per-language stopword profiles (public common-word lists)
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
}

_WORD = re.compile(r"[A-Za-z]+")
_PUNCT = re.compile(r"[^\w\s]")


def _detect(text: str) -> str:
    """n-gram/stopword heuristic language ID; CJK charset check first."""
    if not text:
        return "und"
    n_cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
    if n_cjk > len(text[:200]) * 0.2:
        return "zh"
    toks = set(t.lower() for t in _WORD.findall(text))
    best, best_n = "und", 0
    for lang, prof in _PROFILES.items():
        n = len(toks & prof)
        if n > best_n:
            best, best_n = lang, n
    return best


def langid(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        preds = [_detect(t or "") for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col], "lang_pred": pa.array(preds, type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Heuristic quality features: counts are exact ints; each ratio is
    ONE division of those ints (bit-deterministic vs a SQL oracle)."""

    def f(batch: pa.Table) -> pa.Table:
        n_chars, n_words, n_punct, n_stop = [], [], [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            words = t.split()
            n_chars.append(len(t))
            n_words.append(len(words))
            n_punct.append(len(_PUNCT.findall(t)))
            n_stop.append(sum(1 for w in words if w.lower() in _PROFILES["en"]))
        nc = np.asarray(n_chars, dtype=np.int64)
        nw = np.asarray(n_words, dtype=np.int64)
        np_ = np.asarray(n_punct, dtype=np.int64)
        ns = np.asarray(n_stop, dtype=np.int64)
        punct_ratio = np.where(nc > 0, np_ / np.maximum(nc, 1), 0.0)
        stop_ratio = np.where(nw > 0, ns / np.maximum(nw, 1), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(nc, type=pa.int64()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_punct": pa.array(np_, type=pa.int64()),
                "n_stopwords": pa.array(ns, type=pa.int64()),
                "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 16,
    base: int = 257,
    mod: int = (1 << 61) - 1,
) -> Dataset:
    """Document fingerprint: minimum Rabin-Karp rolling hash over all
    `window`-byte windows (winnowing-style representative), plus the
    full-text hash. Deterministic, vectorizable, O(len)."""

    def roll_min(t: str) -> int:
        data = t.encode("utf-8", "ignore")
        if not data:
            return 0
        if len(data) <= window:
            h = 0
            for c in data:
                h = (h * base + c) % mod
            return h
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        # vectorized rolling hash via cumulative powers
        h = 0
        for c in data[:window]:
            h = (h * base + c) % mod
        best = h
        top = pow(base, window - 1, mod)
        for i in range(window, len(data)):
            h = ((h - arr[i - window] * top) * base + arr[i]) % mod
            if h < best:
                best = int(h)
        return best

    def f(batch: pa.Table) -> pa.Table:
        import hashlib

        fps, full = [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            fps.append(roll_min(t) - (1 << 62))
            full.append(
                int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
                - (1 << 63)
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "fingerprint": pa.array(fps, type=pa.int64()),
                "text_hash": pa.array(full, type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
