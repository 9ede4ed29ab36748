"""Canonicalization aggregate (SURVEY.md §2 A1/A4, spec §7).

Two-phase, skew-aware by construction: a vectorized per-batch combiner
(`partial_canonical`, pyarrow `group_by`) collapses each batch to one
row per `(mention_type, norm)` BEFORE the shuffle, so a hot key
(Bach/Mozart head of the Zipfian distribution) contributes at most one
row per input batch to the exchange — the same bound explicit salting
gives, without a second shuffle. The final merge is a vectorized
`groupby().aggregate()` (no per-group Python).

A generic explicitly-salted two-phase groupby (A4) for arbitrary
aggregations lives in `kgray.ops.salted_groupby`.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Sum

_LINK_COLS = ["canonical_uri", "dbpedia_id", "viaf_id", "europeana_id"]


def partial_canonical(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (mention_type, norm) with a
    partial count. Link columns are a pure function of the key
    (spec §4), so any group member carries the group's values."""
    gb = batch.group_by(["mention_type", "norm"])
    aggs = [("doc_key", "count")] + [(c, "max") for c in _LINK_COLS]
    out = gb.aggregate(aggs)
    renames = {"doc_key_count": "n_partial"}
    renames.update({f"{c}_max": c for c in _LINK_COLS})
    return out.rename_columns([renames.get(c, c) for c in out.column_names])


def canonical_table(linked: Dataset) -> Dataset:
    """Linked mentions -> per-norm canonical records (CANONICAL schema)."""
    partials = linked.map_batches(partial_canonical, batch_format="pyarrow")
    merged = partials.groupby(["mention_type", "norm"]).aggregate(
        Sum("n_partial", alias_name="n_mentions"),
        *[Max(c, alias_name=c) for c in _LINK_COLS],
    )
    return merged


def canonical_table_salted(linked: Dataset, nsalt: int = 16) -> Dataset:
    """A4: the explicitly SALTED two-phase variant (north_star:
    "skew-aware shuffles (salting hot composers like Bach/Mozart)").

    Phase 1 shuffles on (mention_type, norm, salt): a hot key like
    `johann sebastian bach` (the Zipf head is ~15% of agent mentions)
    spreads over `nsalt` reducers instead of hammering one; phase 2
    merges the nsalt partials per key. Produces EXACTLY the same table
    as `canonical_table` (asserted in tests) — use this form when a
    single reducer cannot hold a hot key's partials; the combiner form
    when per-batch pre-aggregation already bounds them.
    """
    import numpy as np

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(len(batch), dtype=np.int64) % nsalt
        return batch.append_column("_salt", pa.array(salt, type=pa.int64()))

    phase1 = (
        linked.map_batches(partial_canonical, batch_format="pyarrow")
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby(["mention_type", "norm", "_salt"])
        .aggregate(
            Sum("n_partial", alias_name="n_salted"),
            *[Max(c, alias_name=c) for c in _LINK_COLS],
        )
    )
    return phase1.groupby(["mention_type", "norm"]).aggregate(
        Sum("n_salted", alias_name="n_mentions"),
        *[Max(c, alias_name=c) for c in _LINK_COLS],
    )


# ---------------------------------------------------------------------------
# U3 in-group fuzzy merge (SURVEY §2.7: canonicalization IS the
# near-dedup — "normalized-key blocking + in-group fuzzy merge")

FUZZY_THETA = 0.90


def _block_key(norm: str) -> str:
    """Blocking key for the fuzzy merge: the last token (surname for
    person names) — bounds each merge group to the distinct spellings
    sharing a surname, so the in-group O(variants x reps) scan never
    sees the corpus."""
    if not norm:
        return ""
    return norm.rsplit(" ", 1)[-1]


def _merge_block(g, theta: float):
    """Deterministic greedy merge of one (mention_type='agent', block)
    group of canonical rows.

    Members are visited by (-n_mentions, norm); each either joins the
    FIRST representative it is mergeable with (rep creation order) or
    becomes a new representative. Mergeable:
      - both linked to an authority -> same canonical_uri only
        (the authority says they are distinct otherwise);
      - otherwise -> combined_score(norms) >= theta.
    An unlinked representative adopts the links of the first linked
    variant merged into it. Output order inside the group is the rep
    creation order (deterministic under any partitioning)."""
    import pandas as pd

    from .similarity import combined_score

    g = g.sort_values(["n_mentions", "norm"], ascending=[False, True], kind="mergesort")
    reps: list[dict] = []
    for row in g.itertuples(index=False):
        r = row._asdict()
        linked_m = not r["canonical_uri"].startswith("agent:")
        target = None
        for rep in reps:
            if linked_m and rep["linked"]:
                if r["canonical_uri"] == rep["canonical_uri"]:
                    target = rep
                    break
            elif combined_score(r["norm"], rep["norm"]) >= theta:
                target = rep
                break
        if target is None:
            r["linked"] = linked_m
            r["n_variants"] = 1
            reps.append(r)
        else:
            target["n_mentions"] += r["n_mentions"]
            target["n_variants"] += 1
            if linked_m and not target["linked"]:
                # unlinked rep adopts the first linked variant's links
                target["linked"] = True
                for c in _LINK_COLS:
                    target[c] = r[c]
    out = pd.DataFrame(reps).drop(columns=["linked"])
    cols = ["mention_type", "block", "norm", "n_mentions", "n_variants"] + _LINK_COLS
    return out[cols]


def canonical_table_fuzzy(linked: Dataset, theta: float = FUZZY_THETA) -> Dataset:
    """Canonical records after the in-group fuzzy merge: agent rows
    are blocked by surname and greedily merged (typo'd or abbreviated
    spellings fold into the dominant spelling); non-agent types pass
    through exact-norm (their linking is exact-match only). One extra
    shuffle on (mention_type, block); group work is bounded by the
    block. Matches reference_impl.fuzzy_canonical exactly (tested)."""
    import pyarrow.compute as pc

    base = canonical_table(linked)

    def add_block(batch: pa.Table) -> pa.Table:
        blocks = [
            _block_key(n) if t == "agent" else (n or "")
            for t, n in zip(
                batch["mention_type"].to_pylist(), batch["norm"].to_pylist()
            )
        ]
        return batch.append_column("block", pa.array(blocks, type=pa.string()))

    blocked = base.map_batches(add_block, batch_format="pyarrow")
    agents = blocked.map_batches(
        lambda b: b.filter(pc.equal(b["mention_type"], "agent")),
        batch_format="pyarrow",
    )
    others = blocked.map_batches(
        lambda b: b.filter(pc.not_equal(b["mention_type"], "agent")),
        batch_format="pyarrow",
    )

    cols = ["mention_type", "block", "norm", "n_mentions", "n_variants"] + _LINK_COLS
    schema = pa.schema(
        [
            ("mention_type", pa.string()),
            ("block", pa.string()),
            ("norm", pa.string()),
            ("n_mentions", pa.int64()),
            ("n_variants", pa.int64()),
        ]
        + [(c, pa.string()) for c in _LINK_COLS]
    )

    merged = agents.groupby(["mention_type", "block"]).map_groups(
        lambda g: _merge_block(g, theta), batch_format="pandas"
    )
    merged_arrow = merged.map_batches(
        lambda df: pa.Table.from_pandas(df[cols], schema=schema, preserve_index=False),
        batch_format="pandas",
    )

    def passthrough(batch: pa.Table) -> pa.Table:
        n1 = pa.array([1] * len(batch), type=pa.int64())
        out = batch.append_column("n_variants", n1)
        return out.select(cols).cast(schema)

    return merged_arrow.union(others.map_batches(passthrough, batch_format="pyarrow"))
