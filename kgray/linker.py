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
                if t == "agent":  # postings only feed agent fuzzy search
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
            # fuzzy scoring is agent-only (spec §4); works/instruments
            # link by exact normalized match alone
            if mention_type == "agent" and len(exact_vocabs) < len(VOCABS) and toks:
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


def link_transform(index: VocabIndex, cache: dict, batch: pa.Table, emit: bool) -> pa.Table:
    """Shared vectorized link transform (used by both execution modes).

    Dictionary-encodes the (mention_type, norm) pairs (C++), runs the
    similarity machinery only on the unique pairs (memoized in
    `cache`), gathers per-row output columns with a C++ `take`, and
    optionally emits the triples in-process.
    """
    import pyarrow.compute as pc

    keys = pc.binary_join_element_wise(
        batch["mention_type"], pc.fill_null(batch["norm"], ""), SEP
    )
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = keys.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    results = []
    for k in uniq:
        r = cache.get(k)
        if r is None:
            mention_type, norm = k.split(SEP, 1)
            r = index.link(mention_type, norm)
            cache[k] = r
        results.append(r)

    small: dict[str, pa.Array] = {}
    for v in VOCABS:
        small[f"{v}_id"] = pa.array(
            [r["links"][v][0] if r["links"][v] else None for r in results],
            type=pa.string(),
        )
        small[f"{v}_score"] = pa.array(
            [r["links"][v][1] if r["links"][v] else None for r in results],
            type=pa.float64(),
        )
    small["canonical_uri"] = pa.array(
        [r["canonical_uri"] for r in results], type=pa.string()
    )
    small["method"] = pa.array([r["method"] for r in results], type=pa.string())

    idx = enc.indices
    out = batch
    for name, vals in small.items():
        out = out.append_column(name, pc.take(vals, idx))
    if emit:
        from . import stages

        return stages.emit_triples(out)
    return out


SEP = "\x1f"

# per-worker-process cache for broadcast-task mode: the VocabIndex is
# deserialized from the object store once per worker process, not once
# per task, and the link memo is shared across tasks on that worker
_TASK_STATE: dict[str, tuple[VocabIndex, dict]] = {}


def make_link_task(index_ref, emit: bool):
    """Broadcast-task execution mode: `ray.put(VocabIndex)` once on
    the driver; each worker process rehydrates it once. The idiomatic
    broadcast-small-side pattern — right when the vocabulary is a
    small dimension table. For vocabularies too big to deserialize
    per worker cheaply, use the actor-pool mode (Linker class)."""
    import ray

    def link_task(batch: pa.Table) -> pa.Table:
        key = index_ref.hex()
        st = _TASK_STATE.get(key)
        if st is None:
            st = (ray.get(index_ref), {})
            _TASK_STATE.clear()  # only ever one live vocab per worker
            _TASK_STATE[key] = st
        return link_transform(st[0], st[1], batch, emit)

    return link_task


class Linker:
    """Actor-pool stage: mentions batch in -> linked batch out.

    Vectorized: the (mention_type, norm) pairs of a batch are
    dictionary-encoded (C++), the similarity machinery runs only on
    the few unique pairs (memoized across batches in actor state),
    and per-row output columns come from a C++ `take` gather.

    With ``emit=True`` the actor also emits the (subj, pred, obj)
    triples in-process (stages.emit_triples), so the wide linked
    table never crosses the object store — the flagship's narrowest
    possible inter-stage traffic.
    """

    def __init__(self, vocab_path: str, emit: bool = False):
        self.index = VocabIndex(pq.read_table(vocab_path))
        self.cache: dict[str, dict] = {}
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        return link_transform(self.index, self.cache, batch, self.emit)
