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
# Explicit ASCII classes so the semantics are identical to a DuckDB
# RE2 oracle: Python's \w/\s are Unicode-aware, RE2's are ASCII —
# an accented letter must count the same on both sides. RE2's \s is
# [\t\n\f\r ], mirrored exactly here (ADVICE 2026-08-17).
_PUNCT = re.compile(r"[^0-9A-Za-z_ \t\n\r\f]")
_TOKEN = re.compile(r"[^ \t\n\r\f]+")


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
            words = _TOKEN.findall(t)
            n_chars.append(len(t))
            n_words.append(len(words))
            n_punct.append(len(_PUNCT.findall(t)))
            n_stop.append(sum(1 for w in words if w.lower() in _PROFILES["en"]))
        nc = np.asarray(n_chars, dtype=np.int64)
        nw = np.asarray(n_words, dtype=np.int64)
        np_ = np.asarray(n_punct, dtype=np.int64)
        ns = np.asarray(n_stop, dtype=np.int64)
        # a zero denominator yields NULL (the SQL division-by-zero
        # convention), not 0.0 — keeps empty docs oracle-identical
        punct_ratio = pa.array(
            [float(np_[i]) / nc[i] if nc[i] else None for i in range(len(nc))],
            type=pa.float64(),
        )
        stop_ratio = pa.array(
            [float(ns[i]) / nw[i] if nw[i] else None for i in range(len(nw))],
            type=pa.float64(),
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(nc, type=pa.int64()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_punct": pa.array(np_, type=pa.int64()),
                "n_stopwords": pa.array(ns, type=pa.int64()),
                "punct_ratio": punct_ratio,
                "stopword_ratio": stop_ratio,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


FP_WINDOW = 16
FP_BASE = 257
FP_MOD = (1 << 31) - 1
# PMW[j] = base^(window-1-j) mod m — the polynomial coefficients of a
# window. mod 2^31-1 keeps every product codepoint x coeff < 2^52 and
# every 16-term window sum < 2^56, so the whole rolling-min is one
# int64 numpy matmul per doc AND expressible as plain BIGINT
# arithmetic in a DuckDB oracle (no HUGEINT, no overflow).
_PMW = np.array([pow(FP_BASE, FP_WINDOW - 1 - j, FP_MOD) for j in range(FP_WINDOW)],
                dtype=np.int64)


def _roll_min(t: str) -> int:
    """Minimum polynomial hash over all `FP_WINDOW`-codepoint windows
    (winnowing-style representative); texts shorter than a window hash
    whole. Defined over CODEPOINTS (utf-32 decode, vectorized) so a
    SQL oracle's ord(substr(...)) sees identical values."""
    n = len(t)
    if n == 0:
        return 0
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if n <= FP_WINDOW:
        return int(cp.dot(_PMW[FP_WINDOW - n :]) % FP_MOD)
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(cp, FP_WINDOW)  # (n-15, 16) view, no copy
    return int((w @ _PMW % FP_MOD).min())


def fingerprint(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Document fingerprint: (doc_id, fingerprint, text_md5) —
    the rolling-min representative plus the full-text md5 hex.
    Deterministic, vectorized, O(len), DuckDB-oracle-able."""

    def f(batch: pa.Table) -> pa.Table:
        import hashlib

        fps, md5s = [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            fps.append(_roll_min(t))
            md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        return pa.table(
            {
                id_col: batch[id_col],
                "fingerprint": pa.array(fps, type=pa.int64()),
                "text_md5": pa.array(md5s, type=pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
