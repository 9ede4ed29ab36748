"""Entity linking against cached vocabulary indexes (SURVEY.md §2 L1/L3,
spec §4-5).

`Linker` is a callable class for `Dataset.map_batches(Linker,
concurrency=..., batch_size=...)` — an actor pool. The vocabulary index
is built ONCE per actor in `__init__` from a local Parquet path
(broadcast-small-side pattern: the vocab is a dimension table, never
shuffled). Link results are a pure function of `(mention_type, norm)`
and are memoized per actor across batches, so the similarity kernels
run once per unique normalized surface form — under the Zipfian
composer distribution that is orders of magnitude fewer calls than
rows.

Scale assumption (documented per SURVEY.md §2.10): the vocabulary fits
in worker memory (authority files are O(1e6-1e7) rows — token postings
+ name lists are a few GB worst case). For larger vocabularies the
stage would shard the index by first-token hash across a keyed actor
pool; not needed for the contract.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .normalize import normalize_for_type, slug, tokens
from .similarity import combined_score

VOCABS = ("dbpedia", "viaf", "europeana")  # priority order (spec §5)
THRESHOLD = 0.80
LINKABLE = ("agent", "work", "instrument")


class VocabIndex:
    """Token-postings blocking index over one vocabulary table."""

    def __init__(self, vocab_table: pa.Table):
        # entities[i] = (vocab, entity_id, names tuple)
        self.entities: list[tuple[str, str, tuple[str, ...]]] = []
        # per entity_type: token -> list[entity index]
        self.postings: dict[str, dict[str, list[int]]] = {t: {} for t in LINKABLE}
        # per entity_type: exact name -> {vocab: min entity_id}
        self.exact: dict[str, dict[str, dict[str, str]]] = {t: {} for t in LINKABLE}
        self.by_type: dict[str, list[int]] = {t: [] for t in LINKABLE}

        cols = vocab_table.select(["vocab", "entity_id", "norm_label", "aliases", "entity_type"])
        vocab = cols["vocab"].to_pylist()
        eid = cols["entity_id"].to_pylist()
        norm_label = cols["norm_label"].to_pylist()
        aliases = cols["aliases"].to_pylist()
        etype = cols["entity_type"].to_pylist()
        for i in range(len(eid)):
            t = etype[i]
            if t not in self.postings:
                continue
            names = []
            if norm_label[i]:
                names.append(norm_label[i])
            for a in aliases[i] or []:
                na = normalize_for_type(a, t)
                if na:
                    names.append(na)
            names = tuple(dict.fromkeys(names))
            if not names:
                continue
            idx = len(self.entities)
            self.entities.append((vocab[i], eid[i], names))
            self.by_type[t].append(idx)
            seen_tokens = set()
            for n in names:
                ex = self.exact[t].setdefault(n, {})
                prev = ex.get(vocab[i])
                if prev is None or eid[i] < prev:
                    ex[vocab[i]] = eid[i]
                for tok in tokens(n):
                    if (tok, idx) not in seen_tokens:
                        seen_tokens.add((tok, idx))
                        self.postings[t].setdefault(tok, []).append(idx)

    def link(self, mention_type: str, norm: str) -> dict:
        """-> {vocab: (entity_id, score) or None for each vocab,
        'canonical_uri': str, 'method': str}."""
        out: dict[str, tuple[str, float] | None] = {v: None for v in VOCABS}
        method = "none"
        if mention_type in self.postings and norm:
            toks = tokens(norm)
            exact = self.exact[mention_type].get(norm)
            exact_vocabs = set()
            if exact:
                for v, e in exact.items():
                    out[v] = (e, 1.0)
                    exact_vocabs.add(v)
            # fuzzy for vocabs without an exact hit
            if len(exact_vocabs) < len(VOCABS) and toks:
                cand: set[int] = set()
                post = self.postings[mention_type]
                for tok in toks:
                    lst = post.get(tok)
                    if lst:
                        cand.update(lst)
                best: dict[str, tuple[float, str]] = {}
                for ci in cand:
                    vocab, eid, names = self.entities[ci]
                    if vocab in exact_vocabs:
                        continue
                    s = max(combined_score(norm, n) for n in names)
                    if s < THRESHOLD:
                        continue
                    cur = best.get(vocab)
                    if cur is None or s > cur[0] or (s == cur[0] and eid < cur[1]):
                        best[vocab] = (s, eid)
                for v, (s, e) in best.items():
                    out[v] = (e, s)
        canonical = None
        for v in VOCABS:
            if out[v] is not None:
                canonical = out[v][0]
                method = "exact" if out[v][1] == 1.0 else "fuzzy"
                break
        if canonical is None:
            canonical = f"{mention_type}:{slug(norm)}"
        return {"links": out, "canonical_uri": canonical, "method": method}


class Linker:
    """Actor-pool stage: mentions batch in -> linked batch out."""

    def __init__(self, vocab_path: str):
        self.index = VocabIndex(pq.read_table(vocab_path))
        self.cache: dict[tuple[str, str], dict] = {}

    def _link(self, mention_type: str, norm: str) -> dict:
        key = (mention_type, norm)
        r = self.cache.get(key)
        if r is None:
            r = self.index.link(mention_type, norm)
            self.cache[key] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        mtypes = batch["mention_type"].to_pylist()
        norms = batch["norm"].to_pylist()
        n = len(norms)
        cols: dict[str, list] = {
            "dbpedia_id": [None] * n,
            "dbpedia_score": [None] * n,
            "viaf_id": [None] * n,
            "viaf_score": [None] * n,
            "europeana_id": [None] * n,
            "europeana_score": [None] * n,
            "canonical_uri": [None] * n,
            "method": [None] * n,
        }
        for i in range(n):
            r = self._link(mtypes[i], norms[i] or "")
            for v in VOCABS:
                lk = r["links"][v]
                if lk is not None:
                    cols[f"{v}_id"][i] = lk[0]
                    cols[f"{v}_score"][i] = lk[1]
            cols["canonical_uri"][i] = r["canonical_uri"]
            cols["method"][i] = r["method"]
        out = batch
        for name, vals in cols.items():
            typ = pa.float64() if name.endswith("_score") else pa.string()
            out = out.append_column(name, pa.array(vals, type=typ))
        return out
