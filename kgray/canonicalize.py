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
