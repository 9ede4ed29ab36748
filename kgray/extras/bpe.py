"""From-scratch byte-pair-encoding tokenizer (train + encode) over a
Ray Dataset corpus (VERDICT r4 #4: every token budget in the repo was
whitespace/regex tokens; this makes the packing/mixing family
subword-aware with zero new dependencies).

Spec (Sennrich et al. 2016, classic BPE — shared with the sequential
twin `reference_impl/sketch.py::run_bpe_tokens`, same constants):

- a word's initial symbol sequence is its codepoints plus a final
  end-of-word marker symbol `EOW`;
- each merge round counts adjacent symbol pairs weighted by word
  frequency, picks the (count DESC, pair ASC) best pair, and rewrites
  every word left-to-right merging non-overlapping occurrences;
- training stops after `num_merges` rounds or when the best pair's
  count drops below `min_count`;
- encoding applies the learned merges greedily by rank (lowest-rank
  adjacent pair first, leftmost on rank ties) until no learned pair
  remains — equivalent to replaying the merge order.

Scale shape: BPE training never touches the corpus after ONE
word-frequency combiner groupby (shuffle bounded by distinct words).
Below `WORD_GATE` distinct words the merge loop runs on the collected
(word, n) table driver-side (the classic in-memory trainer); above
it, `_train_distributed` keeps the word table a Dataset and runs each
round as one pair-count combiner groupby + a per-block top-1 reduce +
one merge-apply pass — O(num_merges) bounded passes over the word
table, never the corpus. Both paths are parity-tested identical.

Encoding is an actor-pool stage (`BpeEncoder`): the merge ranks load
once per actor in ``__init__`` and a per-actor word cache makes the
per-word greedy loop amortize to once per DISTINCT word per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

EOW = "\x00"  # end-of-word marker (NUL: absent from real text, so
# merged symbols containing it never collide with raw codepoint runs)
WORD_GATE = 2_000_000  # distinct words: driver trainer below, distributed above


def word_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """(word, n) frequency table: one combiner groupby over the
    corpus — the only corpus-scale pass BPE training ever makes."""

    def wc(b: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern_regex(b[text_col].combine_chunks(), r"\s+")
        )
        t = pa.table({"word": words}).filter(pc.not_equal(words, ""))
        return (
            t.group_by(["word"])
            .aggregate([("word", "count")])
            .rename_columns(["word", "n"])
        )

    return (
        ds.map_batches(wc, batch_size=None, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n"))
    )


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """Rewrite one symbol sequence, merging non-overlapping
    occurrences of `pair` left to right."""
    a, b = pair
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_local(
    rows: list[tuple[str, int]], num_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Classic in-memory BPE trainer over the (word, n) table."""
    syms = {w: tuple(w) + (EOW,) for w, _ in rows}
    freq = dict(rows)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            n = freq[w]
            for j in range(len(s) - 1):
                p = (s[j], s[j + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append(best)
        syms = {
            w: (_merge_word(s, best) if best[0] in s else s)
            for w, s in syms.items()
        }
    return merges


def _train_distributed(
    wc: Dataset, num_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Distributed merge rounds over the word-frequency Dataset: per
    round one pair-count combiner groupby (shuffle bounded by distinct
    adjacent pairs), a per-block top-1 + driver pick over <= #blocks
    candidate rows, and one merge-apply pass. The word table (symbols
    as a list<string> column) materializes once per round."""

    def to_syms(b: pa.Table) -> pa.Table:
        words = b["word"].to_pylist()
        return pa.table(
            {
                "word": b["word"],
                "n": b["sum(n)"] if "sum(n)" in b.column_names else b["n"],
                "syms": pa.array(
                    [list(w) + [EOW] for w in words],
                    type=pa.list_(pa.string()),
                ),
            }
        )

    tbl = wc.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):

        def pair_partials(b: pa.Table) -> pa.Table:
            counts: dict[tuple[str, str], int] = {}
            ns = b["n"].to_pylist()
            for s, n in zip(b["syms"].to_pylist(), ns):
                for j in range(len(s) - 1):
                    p = (s[j], s[j + 1])
                    counts[p] = counts.get(p, 0) + n
            items = sorted(counts.items())
            return pa.table(
                {
                    "a": pa.array([p[0] for p, _ in items], pa.string()),
                    "b": pa.array([p[1] for p, _ in items], pa.string()),
                    "n": pa.array([c for _, c in items], pa.int64()),
                }
            )

        def block_best(b: pa.Table) -> pa.Table:
            rows = sorted(
                zip(
                    b["a"].to_pylist(),
                    b["b"].to_pylist(),
                    b["sum(n)"].to_pylist(),
                ),
                key=lambda r: (-r[2], r[0], r[1]),
            )[:1]
            return pa.table(
                {
                    "a": pa.array([r[0] for r in rows], pa.string()),
                    "b": pa.array([r[1] for r in rows], pa.string()),
                    "n": pa.array([r[2] for r in rows], pa.int64()),
                }
            )

        cand = (
            tbl.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("n"))
            .map_batches(block_best, batch_format="pyarrow")
            .take_all()
        )  # <= #blocks rows
        if not cand:
            break
        best_row = min(cand, key=lambda r: (-int(r["n"]), r["a"], r["b"]))
        best = (best_row["a"], best_row["b"])
        if int(best_row["n"]) < min_count:
            break
        merges.append(best)

        def apply_merge(b: pa.Table, _best=best) -> pa.Table:
            syms = [
                list(_merge_word(tuple(s), _best))
                if _best[0] in s
                else s
                for s in b["syms"].to_pylist()
            ]
            return pa.table(
                {
                    "word": b["word"],
                    "n": b["n"],
                    "syms": pa.array(syms, type=pa.list_(pa.string())),
                }
            )

        tbl = tbl.map_batches(apply_merge, batch_format="pyarrow").materialize()
    return merges


def train_bpe(
    ds: Dataset,
    *,
    text_col: str = "text",
    num_merges: int = 100,
    min_count: int = 2,
    distributed: bool | None = None,
) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus Dataset. `distributed=None`
    size-gates on distinct words (WORD_GATE); forcing either path is
    for tests (they are parity-identical)."""
    wc = word_counts(ds, text_col)
    if distributed is None:
        distributed = wc.count() > WORD_GATE
    if distributed:
        return _train_distributed(wc, num_merges, min_count)
    rows = [(r["word"], int(r["sum(n)"])) for r in wc.take_all()]
    rows.sort()  # deterministic trainer input order
    return _train_local(rows, num_merges, min_count)


class BpeEncoder:
    """Actor-pool encode stage: merges -> rank table once per actor in
    __init__, greedy lowest-rank merge per word with a per-actor
    distinct-word cache. Emits (doc_id, n_words, n_bpe_tokens)."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text"):
        self.rank = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def encode_word(self, w: str) -> int:
        got = self.cache.get(w)
        if got is not None:
            return got
        syms = list(w) + [EOW]
        rank = self.rank
        while len(syms) > 1:
            best_rank, best_j = None, -1
            for j in range(len(syms) - 1):
                r = rank.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_j = r, j
            if best_rank is None:
                break
            a, b = syms[best_j], syms[best_j + 1]
            syms = list(_merge_word(tuple(syms), (a, b)))
        n = len(syms)
        self.cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_words, n_tok = [], []
        for t in texts:
            words = [w for w in t.split() if w]
            n_words.append(len(words))
            n_tok.append(sum(self.encode_word(w) for w in words))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(np.asarray(n_words, dtype=np.int64)),
                "n_bpe_tokens": pa.array(np.asarray(n_tok, dtype=np.int64)),
            }
        )
