"""Generic distributed operators (SURVEY.md §2.4-2.7) used by the
driver-checked queries and reusable by pipelines.

Scale notes (the point of each design):
- `broadcast_join`: the small side is `ray.put` ONCE and fetched
  zero-copy from the local object store inside each task — never a
  shuffle, never re-shipped per batch.
- `salted_groupby`: explicit two-phase skew-aware aggregation (A4) —
  partial aggregate on (key, salt) so a hot key's rows spread over
  `nsalt` reducers, then a tiny final merge on the key.
- `semi_join_filter` / `anti_join_filter`: broadcast key-set
  membership filter (J3) — the idiomatic semi/anti when the key side
  fits memory; fall back to `hash_join` otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def broadcast_join(
    ds: Dataset,
    small: pa.Table,
    keys: list[str],
    right_keys: list[str] | None = None,
    join_type: str = "inner",
) -> Dataset:
    """Map-side hash join against a broadcast dimension table.

    Uses pyarrow's C++ hash join per batch; the dimension table rides
    the object store (one copy per node)."""
    ref = ray.put(small)

    def _join(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        return batch.join(dim, keys=keys, right_keys=right_keys or keys, join_type=join_type)

    return ds.map_batches(_join, batch_format="pyarrow")


def semi_join_filter(ds: Dataset, key: str, values: set) -> Dataset:
    """Keep rows whose key is in the broadcast value set."""
    ref = ray.put(pa.array(sorted(values)))

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key], value_set=ray.get(ref)))

    return ds.map_batches(_f, batch_format="pyarrow")


def anti_join_filter(ds: Dataset, key: str, values: set) -> Dataset:
    ref = ray.put(pa.array(sorted(values)))

    def _f(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch[key], value_set=ray.get(ref)))
        return batch.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow")


def hash_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> Dataset:
    """J2: large-large hash-partitioned equi-join (Ray Data native)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def salted_groupby(
    ds: Dataset,
    keys: list[str],
    sums: list[tuple[str, str]],
    count_alias: str | None = None,
    nsalt: int = 16,
) -> Dataset:
    """A4: skew-aware two-phase aggregation.

    `sums` = [(column, alias)] summed per group; optional row count.
    Phase 1 shuffles on (keys + salt) — a hot key spreads across
    `nsalt` reducers; phase 2 merges the (tiny) partials on keys.
    """

    def _add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(len(batch), dtype=np.int64) % nsalt
        return batch.append_column("_salt", pa.array(salt, type=pa.int64()))

    aggs1 = [Sum(col, alias_name=f"_p_{alias}") for col, alias in sums]
    if count_alias:
        aggs1.append(Count(alias_name="_p_cnt"))
    partial = (
        ds.map_batches(_add_salt, batch_format="pyarrow")
        .groupby(keys + ["_salt"])
        .aggregate(*aggs1)
    )
    aggs2 = [Sum(f"_p_{alias}", alias_name=alias) for _, alias in sums]
    if count_alias:
        aggs2.append(Sum("_p_cnt", alias_name=count_alias))
    return partial.groupby(keys).aggregate(*aggs2)


def grouped_sum_count(
    ds: Dataset,
    keys: list[str],
    sums: list[tuple[str, str]],
    count_alias: str | None = None,
) -> Dataset:
    """A2 with the combiner pattern: per-batch partial aggregation
    (vectorized pyarrow group_by) BEFORE the shuffle, then a tiny
    global merge — the shuffle moves one row per (key, batch) instead
    of every input row."""

    def partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c, _ in sums]
        if count_alias:
            aggs.append((keys[0], "count"))
        g = b.group_by(keys).aggregate(aggs)
        renames = {f"{c}_sum": f"_p_{alias}" for c, alias in sums}
        if count_alias:
            renames[f"{keys[0]}_count"] = "_p_cnt"
        return g.rename_columns([renames.get(c, c) for c in g.column_names])

    merge = [Sum(f"_p_{alias}", alias_name=alias) for _, alias in sums]
    if count_alias:
        merge.append(Sum("_p_cnt", alias_name=count_alias))
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(*merge)
    )


def distinct(ds: Dataset, keys: list[str]) -> Dataset:
    """U2/A5: exact distinct rows on `keys`: per-batch vectorized
    dedup (combiner) then a global hash agg over the survivors."""
    pre = ds.map_batches(
        lambda b: b.group_by(keys).aggregate([]),
        batch_size=None,
        batch_format="pyarrow",
    )
    return pre.groupby(keys).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


def topk(ds: Dataset, keys: list[str], k: int, descending=True) -> Dataset:
    """O2: global top-k = sort + limit (Ray's sort is a range-partition
    shuffle; limit prunes early)."""
    return ds.sort(keys, descending=descending).limit(k)


def cents(col, scale: float = 100.0) -> pa.Array:
    """Exact-integer money: floor(x*scale + 0.5) as int64. Used so SUMs
    are integer-exact and bit-identical to the DuckDB oracle regardless
    of summation order (floating sums are order-dependent; floor+0.5
    avoids the half-even vs half-away rounding divergence)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    v = np.floor(arr.to_numpy(zero_copy_only=False) * scale + 0.5)
    return pa.array(v.astype(np.int64), type=pa.int64())


AGGS = {"sum": Sum, "count": Count, "min": Min, "max": Max}
