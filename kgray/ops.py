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


# Above this many right-side rows the broadcast key-set form of
# semi/anti/intersect/except switches to a distributed hash join
# (left_semi / left_anti): a broadcast value set must fit every
# worker's heap, a hash join only ever holds one partition per task.
BROADCAST_MAX_KEYS = 2_000_000


def _drop_null_keys(ds: Dataset, key: str) -> Dataset:
    return ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[key])),
        batch_size=None,
        batch_format="pyarrow",
    )


def _arrow_schema_or_none(ds: Dataset):
    """Best-effort pa.Schema of a dataset (may execute a small plan
    fragment; used only on size-gated production paths)."""
    try:
        sch = ds.schema()
        return sch.base_schema if sch is not None else None
    except Exception:
        return None


def semi_join(
    left: Dataset,
    key: str,
    right: Dataset,
    right_key: str,
    *,
    num_partitions: int | None = None,
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
) -> Dataset:
    """J3 semi join with an automatic large-side fallback: when the
    right side is dimension-sized its distinct keys broadcast once
    (`ray.put`) and the filter is a map-side `pc.is_in`; above the
    threshold it becomes a distributed ``left_semi`` hash join (no
    driver materialization). Both paths produce identical rows
    (tested in tests/test_queries.py).

    NULL semantics (explicit, so both paths agree — ADVICE r2): a NULL
    left key never matches and is dropped; NULL right keys are ignored.
    The projected right side is materialized once (a single narrow
    column; spills if huge) so the size gate and the consumer share one
    execution of a derived right-side plan instead of running it twice
    (count + unique/join — ADVICE r2)."""
    keys_ds = _drop_null_keys(right.select_columns([right_key]), right_key).materialize()
    left_nn = _drop_null_keys(left, key)
    if keys_ds.count() <= broadcast_max_keys:
        return semi_join_filter(left_nn, key, set(keys_ds.unique(right_key)))
    out = left_nn.join(
        keys_ds,
        join_type="left_semi",
        num_partitions=num_partitions or default_join_partitions(),
        on=(key,),
        right_on=(right_key,),
    )
    # pin block schemas: ray 2.49's join can finalize an empty
    # partition as a zero-column block (see normalize_blocks)
    sch = _arrow_schema_or_none(left)
    return normalize_blocks(out, sch) if sch is not None else out


def anti_join(
    left: Dataset,
    key: str,
    right: Dataset,
    right_key: str,
    *,
    num_partitions: int | None = None,
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
) -> Dataset:
    """J3 anti join; same size gate, NULL normalization and single
    right-side execution as `semi_join` (broadcast set below the
    threshold, distributed ``left_anti`` hash join above). NULL-key
    left rows are dropped on BOTH paths (`pc.is_in` nulls filter out
    on the broadcast path; Ray's left_anti would keep them)."""
    keys_ds = _drop_null_keys(right.select_columns([right_key]), right_key).materialize()
    left_nn = _drop_null_keys(left, key)
    if keys_ds.count() <= broadcast_max_keys:
        return anti_join_filter(left_nn, key, set(keys_ds.unique(right_key)))
    out = left_nn.join(
        keys_ds,
        join_type="left_anti",
        num_partitions=num_partitions or default_join_partitions(),
        on=(key,),
        right_on=(right_key,),
    )
    sch = _arrow_schema_or_none(left)
    return normalize_blocks(out, sch) if sch is not None else out


def default_join_partitions() -> int:
    """Partition count derived from the live cluster (VERDICT r3 #9):
    max(8, CPUs/4), overridable via KGRAY_JOIN_PARTITIONS. Scales with
    the cluster instead of a fixed constant (a 256-node/8k-CPU cluster
    gets ~2k partitions, bounding per-partition data), but stays small
    on one node: every hash-shuffle partition spawns an aggregator
    actor whose fixed startup dominates small joins — measured on the
    sf0.1 bench join, 8/16/32/64 partitions = 2.6/3.1/4.6/8.5 s for
    identical results. Evaluated lazily per call so module import
    never touches Ray; operators take num_partitions= for callers that
    know their data volume."""
    import os

    env = os.environ.get("KGRAY_JOIN_PARTITIONS")
    if env:
        return max(1, int(env))
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(8, cpus // 4)


def hash_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> Dataset:
    """J2: large-large hash-partitioned equi-join (Ray Data native)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or default_join_partitions(),
        on=on,
        right_on=right_on,
    )


def normalize_blocks(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Pin every block to `schema` (column set + order).

    Ray 2.49's JoinOperator OCCASIONALLY finalizes an empty partition
    as a ZERO-COLUMN block (observed ~1/15 runs at small scale:
    "No match ... for FieldRef.Name(b) on left side" when such a
    block feeds a second join, or KeyError in a downstream
    map_batches). Empty blocks are replaced with a correctly-typed
    empty table; non-empty blocks are column-projected to the expected
    order (metadata-only). An outer join can also emit one-sided
    blocks carrying only the left (or right) columns — missing columns
    are appended as typed nulls."""
    empty = schema.empty_table()

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        for name in schema.names:
            if name not in b.column_names:
                b = b.append_column(
                    name, pa.nulls(b.num_rows, type=schema.field(name).type)
                )
        return b.select(schema.names)

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


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


def collect_table(
    ds: Dataset, schema: pa.Schema, sort_by: list[str] | None = None
) -> pa.Table:
    """Driver collect of a BOUNDED result Dataset (verified pair
    lists, top-k outputs — never corpus-sized data) into a pyarrow
    Table with an explicit schema (empty Datasets lose their schema;
    an explicit cast keeps possibly-empty query results
    driver-comparable)."""
    batches = ds.to_arrow_refs()
    import ray as _ray

    tables = [t for t in _ray.get(batches) if t is not None and t.num_rows >= 0]
    if tables:
        out = pa.concat_tables(
            [t.select(schema.names).cast(schema) for t in tables if t.num_rows]
            or [schema.empty_table()]
        )
    else:
        out = schema.empty_table()
    if sort_by and out.num_rows:
        out = out.sort_by(
            [(c, "ascending") if isinstance(c, str) else c for c in sort_by]
        )
    return out


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


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    *,
    right_suffix: str = "_r",
    direction: str = "backward",
) -> Dataset:
    """As-of join (J-extra; Ray Data has none natively): for each left
    row, the right row with the same key and the nearest `ts` at or
    before it (direction="backward").

    Implementation: tagged union of both sides -> ONE hash shuffle on
    the key -> per-key pandas merge_asof over the sorted group. The
    partitioning assumption: a single key's rows fit one worker (true
    for per-user/per-entity event streams; salt the key upstream if a
    single entity's history is outsized). The map-side preps are
    zero-copy Arrow column ops (VERDICT r3 #8) — pandas appears only
    inside the bounded per-key merges."""
    import pandas as pd

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    rcols = list(rsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    # align schemas: left keeps its columns; right's non-key/ts columns
    # are carried through with a suffix; the tagged union shares ONE
    # column layout: [key, ts] + lrest + rsuf + [_side]
    rv = [c for c in rcols if c not in (key, ts)]
    rsuf = [f"{c}{right_suffix}" for c in rv]
    lrest = [c for c in lcols if c not in (key, ts)]

    def prep_l(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], ts: t[ts]}
        for c in lrest:
            cols[c] = t[c]
        for c in rv:
            cols[f"{c}{right_suffix}"] = pa.nulls(n, rtypes[c])
        cols["_side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def prep_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], ts: t[ts]}
        for c in lrest:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in rv:
            cols[f"{c}{right_suffix}"] = t[c]
        cols["_side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(prep_l, batch_size=None, batch_format="pyarrow")
    rt = right.map_batches(prep_r, batch_size=None, batch_format="pyarrow")
    both = lt.union(rt)

    merged_cols = [key, ts] + lrest + [f"{ts}{right_suffix}"] + rsuf
    # output rows are ALL left rows, so left columns are never null in
    # the result — undo the float64 coercion the padded nulls caused
    # during the group's arrow->pandas conversion
    l_pd = {c: ltypes[c].to_pandas_dtype() for c in lrest}

    def _restore_left_dtypes(df: pd.DataFrame) -> pd.DataFrame:
        for c in lrest:
            try:
                df[c] = df[c].astype(l_pd[c])
            except (ValueError, TypeError):
                pass  # genuine nulls in the left input: keep as-is
        return df

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].sort_values(ts, kind="mergesort")
        rg = g[g["_side"] == 1].sort_values(ts, kind="mergesort")
        if len(lg) == 0:
            # emit the exact merged output schema (merge_asof's column
            # set) so group-output schemas never drift between empty
            # and non-empty key groups
            dtypes = {c: g[c].dtype for c in [key, ts] + rsuf}
            dtypes.update(l_pd)
            dtypes[f"{ts}{right_suffix}"] = g[ts].dtype
            return pd.DataFrame(columns=merged_cols).astype(dtypes)
        l_part = lg[[key, ts] + lrest]
        r_part = rg[[ts] + rsuf].rename(columns={ts: f"{ts}{right_suffix}"})
        merged = pd.merge_asof(
            l_part,
            r_part,
            left_on=ts,
            right_on=f"{ts}{right_suffix}",
            direction=direction,
        )
        return _restore_left_dtypes(merged)

    return both.groupby(key).map_groups(per_key, batch_format="pandas")


def asof_join_salted(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    *,
    bucket_seconds: float,
    right_suffix: str = "_r",
) -> Dataset:
    """Hot-key-salted backward as-of join (the scale path `asof_join`'s
    docstring promises): the shuffle key is (key, time-bucket), so one
    entity's outsized history spreads across `bucket_seconds`-wide
    buckets instead of landing on one worker.

    Correctness: every (key, bucket) group must see, besides its own
    left and right rows, the LATEST right row from any earlier bucket
    (the match for left rows preceding the bucket's first right row).
    That carry is computed per key over the per-bucket LAST right rows
    only — O(active buckets) per key, never O(rows) — and a carry is
    emitted only into buckets where the left side is active. Output ==
    `asof_join` row for row (parity-tested); same right-side
    uniqueness convention on (key, ts) ties as merge_asof."""
    import pandas as pd

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    rcols = list(rsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    rv = [c for c in rcols if c not in (key, ts)]
    rsuf = [f"{c}{right_suffix}" for c in rv]
    lrest = [c for c in lcols if c not in (key, ts)]
    usec = int(bucket_seconds * 1_000_000)

    def _bucket_of(t: pa.Table) -> pa.Array:
        # epoch-us // bucket width (ts is timestamp[us]; int64 cast is
        # the epoch value in the column's own unit). FLOOR division in
        # numpy: Arrow pc.divide truncates toward zero, which would
        # merge (-width, +width) into one double-width bucket 0 on
        # pre-1970 timestamps (ADVICE r4).
        e = pc.cast(pc.cast(t[ts], pa.timestamp("us")), pa.int64())
        return pa.array(e.to_numpy(zero_copy_only=False) // usec, type=pa.int64())

    # side 0 = left row, 1 = in-bucket right row; carries become side 1
    # rows re-tagged into a later bucket (their ts precedes everything
    # in that bucket by construction). Map-side preps are Arrow column
    # ops (VERDICT r3 #8); both sides share ONE column layout.
    def prep_l(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], ts: t[ts]}
        for c in lrest:
            cols[c] = t[c]
        for c in rv:
            cols[f"{c}{right_suffix}"] = pa.nulls(n, rtypes[c])
        cols["_bkt"] = _bucket_of(t)
        cols["_side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def prep_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], ts: t[ts]}
        for c in lrest:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in rv:
            cols[f"{c}{right_suffix}"] = t[c]
        cols["_bkt"] = _bucket_of(t)
        cols["_side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(prep_l, batch_size=None, batch_format="pyarrow")
    rt = right.map_batches(prep_r, batch_size=None, batch_format="pyarrow")

    # per-(key, bucket) LAST right row (merge_asof's pick among ties:
    # the last in stable ts order) — one row per active right bucket
    def last_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        return g.tail(1)

    r_last = rt.groupby([key, "_bkt"]).map_groups(last_per_bucket, batch_format="pandas")

    # left-active buckets per key (bounded by left rows, one row each);
    # per-batch Arrow group_by is the map-side combiner
    def lb_partial(t: pa.Table) -> pa.Table:
        return t.select([key, "_bkt"]).group_by([key, "_bkt"]).aggregate([])

    l_buckets = distinct(
        lt.map_batches(lb_partial, batch_size=None, batch_format="pyarrow"),
        [key, "_bkt"],
    )

    # per key: forward-carry each bucket's last right row into every
    # LATER left-active bucket up to the next right-active bucket —
    # an as-of join over buckets, O(active buckets) per key
    def tag_lb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_is_left"] = np.int8(1)
        for c in [ts] + rsuf:
            df[c] = None
        return df

    def tag_rl(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, "_bkt", ts] + rsuf].copy()
        df["_is_left"] = np.int8(0)
        return df

    lb_t = l_buckets.map_batches(tag_lb, batch_format="pandas")
    rl_t = r_last.map_batches(tag_rl, batch_format="pandas")

    def carries(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["_is_left"] == 1][[key, "_bkt"]].sort_values("_bkt", kind="mergesort")
        rl = g[g["_is_left"] == 0].sort_values("_bkt", kind="mergesort")
        if len(lb) == 0 or len(rl) == 0:
            return pd.DataFrame(columns=[key, "_bkt", ts] + rsuf)
        # for each left bucket, the latest right bucket STRICTLY before
        # it (same-bucket right rows are already in the group)
        idx = np.searchsorted(rl["_bkt"].to_numpy(), lb["_bkt"].to_numpy(), side="left") - 1
        keep = idx >= 0
        if not keep.any():
            return pd.DataFrame(columns=[key, "_bkt", ts] + rsuf)
        out = rl.iloc[idx[keep]][[key, ts] + rsuf].reset_index(drop=True)
        out["_bkt"] = lb["_bkt"].to_numpy()[keep]
        return out[[key, "_bkt", ts] + rsuf]

    carry = lb_t.union(rl_t).groupby(key).map_groups(carries, batch_format="pandas")

    def carry_to_side(df: pd.DataFrame) -> pa.Table:
        # bounded input (one row per left-active bucket); emit the SAME
        # Arrow layout as lt/rt — a union may not mix block formats
        n = len(df)
        cols = {
            key: pa.Array.from_pandas(df[key], type=ltypes[key]),
            ts: pa.Array.from_pandas(
                df[ts].astype("datetime64[us]"), type=ltypes[ts]
            ),
        }
        for c in lrest:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in rv:
            cols[f"{c}{right_suffix}"] = pa.Array.from_pandas(
                df[f"{c}{right_suffix}"], type=rtypes[c]
            )
        cols["_bkt"] = pa.Array.from_pandas(df["_bkt"], type=pa.int64())
        cols["_side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    both = lt.union(rt).union(
        carry.map_batches(carry_to_side, batch_format="pandas")
    )

    merged_cols = [key, ts] + lrest + [f"{ts}{right_suffix}"] + rsuf
    l_pd = {c: ltypes[c].to_pandas_dtype() for c in lrest}

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].sort_values(ts, kind="mergesort")
        rg = g[g["_side"] == 1].sort_values(ts, kind="mergesort")
        if len(lg) == 0:
            dtypes = {c: g[c].dtype for c in [key, ts] + rsuf}
            dtypes.update(l_pd)
            dtypes[f"{ts}{right_suffix}"] = g[ts].dtype
            return pd.DataFrame(columns=merged_cols).astype(dtypes)
        l_part = lg[[key, ts] + lrest]
        r_part = rg[[ts] + rsuf].rename(columns={ts: f"{ts}{right_suffix}"})
        merged = pd.merge_asof(
            l_part,
            r_part,
            left_on=ts,
            right_on=f"{ts}{right_suffix}",
            direction="backward",
        )
        for c in lrest:  # output rows are all left rows: undo the
            try:  # padded-null float64 coercion (parity with asof_join)
                merged[c] = merged[c].astype(l_pd[c])
            except (ValueError, TypeError):
                pass
        return merged

    return both.groupby([key, "_bkt"]).map_groups(per_group, batch_format="pandas")


def sessionize(
    ds: Dataset,
    key: str,
    ts: str,
    *,
    gap_seconds: float,
    agg_cols: list[str] | None = None,
) -> Dataset:
    """Session windows (streaming-shaped op per the Ray guide): events
    sorted per key; a gap > gap_seconds starts a new session. Emits one
    row per session: (key, session_idx, n_events, t_start, t_end).
    One shuffle on the key; ordering done inside the group."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        gaps = g[ts].diff().dt.total_seconds().fillna(float("inf"))
        session = (gaps > gap_seconds).cumsum() - 1
        out = (
            g.assign(_s=session)
            .groupby("_s")
            .agg(n_events=(ts, "size"), t_start=(ts, "min"), t_end=(ts, "max"))
            .reset_index()
        )
        out[key] = g[key].iloc[0]
        out = out.rename(columns={"_s": "session_idx"})
        out["session_idx"] = out["session_idx"].astype("int64")
        return out[[key, "session_idx", "n_events", "t_start", "t_end"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def frequent_items(ds: Dataset, col: str, k: int, count_alias: str = "n") -> Dataset:
    """Exact top-k most frequent values (heavy hitters) with a
    deterministic tie-break (count desc, value asc): per-batch
    combiner counts (one row per value per batch crosses the
    exchange), a global merge, then sort+limit. Fully streaming —
    no sketch needed for exactness because the combiner already
    bounds the shuffle to the distinct-value count."""
    counts = grouped_sum_count(ds.select_columns([col]), keys=[col], sums=[],
                               count_alias=count_alias)
    return topk(counts, [count_alias, col], k, descending=[True, False])


def _group_median_hist(ds: Dataset, key: str, col: str, out_col: str) -> Dataset:
    """Counting-quantile median (the large-group scale path): pass 1
    is a combiner-bounded groupby on (key, value) — the shuffle moves
    one row per distinct value per batch, never the group's rows; pass
    2 computes the weighted median per key over the (value, count)
    histogram. A group's ROW count can exceed any worker; only its
    DISTINCT-value count must fit (true for cents/codes/buckets — for
    continuous doubles quantize first or keep the exact path).
    Matches np.median's (lo+hi)/2 convention exactly (parity-tested
    against the exact path)."""
    import pandas as pd

    counts = grouped_sum_count(
        ds.select_columns([key, col]), keys=[key, col], sums=[], count_alias="_n"
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[col].to_numpy()
        cnts = g["_n"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        lo = vals[np.searchsorted(cum, (n - 1) // 2 + 1)]
        hi = vals[np.searchsorted(cum, n // 2 + 1)]
        return pd.DataFrame(
            {key: [g[key].iloc[0]], out_col: [(float(lo) + float(hi)) / 2.0]}
        )

    return counts.groupby(key).map_groups(per_key, batch_format="pandas")


# above this many input rows the auto mode assumes some group may not
# fit a single worker and takes the histogram path
MEDIAN_EXACT_MAX_ROWS = 2_000_000


def group_median(
    ds: Dataset,
    key: str,
    col: str,
    out_col: str,
    *,
    mode: str = "auto",
    rows: int | None = None,
) -> Dataset:
    """Per-group median, (lo+hi)/2 on even counts (== SQL MEDIAN on
    identical operands). Two physical plans, identical output
    (parity-tested):

    - ``exact``: one shuffle on the key, numpy median per group —
      assumes a group's rows fit one worker.
    - ``hist``: two-pass counting quantile (`_group_median_hist`) —
      group rows unbounded, only distinct values per group bounded.
    - ``auto``: exact below MEDIAN_EXACT_MAX_ROWS input rows, hist
      above. Pass `rows` (e.g. the raw read's metadata count) to keep
      the gate metadata-cheap; otherwise the input plan is counted.
    """
    import pandas as pd

    if mode == "auto":
        n = rows if rows is not None else ds.count()
        mode = "hist" if n > MEDIAN_EXACT_MAX_ROWS else "exact"
    if mode == "hist":
        return _group_median_hist(ds, key, col, out_col)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key: [g[key].iloc[0]], out_col: [float(np.median(g[col].to_numpy()))]}
        )

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sliding_window_count(
    ds: Dataset,
    key: str,
    ts: str,
    *,
    window_seconds: float,
    carry: list[str] | None = None,
    out_col: str = "n_window",
) -> Dataset:
    """Per-row sliding-window count: for every row, how many same-key
    rows have `ts` in [row.ts - window, row.ts] — the value-based
    (RANGE) frame semantics of SQL window functions, peers included.
    One shuffle on the key; inside each group the counts come from two
    vectorized np.searchsorted passes over the sorted timestamps."""
    import pandas as pd

    carry = carry or []

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        sorted_ts = np.sort(g[ts].to_numpy())
        vals = g[ts].to_numpy()
        lo = np.searchsorted(sorted_ts, vals - np.timedelta64(int(window_seconds * 1e6), "us"), side="left")
        hi = np.searchsorted(sorted_ts, vals, side="right")
        out = g[[key, ts] + carry].copy()
        out[out_col] = (hi - lo).astype("int64")
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def intersect_keys(
    left: Dataset,
    left_col: str,
    right: Dataset,
    right_col: str,
    *,
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
) -> Dataset:
    """U4 INTERSECT on single key columns: distinct left keys present
    in the right key set (broadcast below the size gate, distributed
    semi hash join above)."""
    sel = semi_join(
        left.select_columns([left_col]), left_col, right, right_col,
        broadcast_max_keys=broadcast_max_keys,
    )
    return distinct(sel, [left_col])


def except_keys(
    left: Dataset,
    left_col: str,
    right: Dataset,
    right_col: str,
    *,
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
) -> Dataset:
    """U4 EXCEPT on single key columns; same size gate as
    `intersect_keys`."""
    sel = anti_join(
        left.select_columns([left_col]), left_col, right, right_col,
        broadcast_max_keys=broadcast_max_keys,
    )
    return distinct(sel, [left_col])


def group_topk(
    ds: Dataset, group_key: str, order_cols: list[str], k: int, ascending: list[bool]
) -> Dataset:
    """O2 per-group top-k: one shuffle on the group key, vectorized
    sort+head inside each group."""
    import pandas as pd

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(order_cols, ascending=ascending, kind="mergesort").head(k)
        out = out.reset_index(drop=True)
        out["rn"] = (out.index + 1).astype("int64")
        return out

    return ds.groupby(group_key).map_groups(per_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# O3 (scale form): deterministic content-hash sampling

SAMPLE_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized uint64; numpy wraparound is
    the defined behavior — deterministic across processes)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def seeded_sample(
    ds: Dataset, key_col: str, *, num: int = 1, den: int = 20, seed: int = 42
) -> Dataset:
    """Deterministic hash sampling: keep a row iff
    splitmix64(key XOR seed) < (num/den) * 2^64.

    Unlike ``ds.random_sample`` (whose membership depends on the
    session's block layout), the sample is a pure function of the key:
    identical across cluster sizes and re-runs (resumable — a restart
    keeps exactly the same rows), and exactly expressible in SQL
    (DuckDB HUGEINT splitmix64), so the operator is oracle-checkable.
    The threshold is exact integer arithmetic — no float rate."""
    thresh = np.uint64((1 << 64) * num // den)
    sd = np.uint64(seed)

    def f(batch: pa.Table) -> pa.Table:
        k = batch[key_col].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        keep = _mix64(k ^ sd) < thresh
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


def seeded_sample_sql(
    table_sql: str, key_col: str, out_cols: list[str],
    *, num: int = 1, den: int = 20, seed: int = 42,
) -> str:
    """The DuckDB-equivalent of `seeded_sample` (HUGEINT splitmix64 —
    bit-identical to the numpy kernel; prototype-verified). Delegates
    the hash pipeline to `splitmix64_sql` so the bit-exact arithmetic
    lives in exactly one place."""
    thresh = (1 << 64) * num // den
    cols = ", ".join(out_cols)
    return f"""
SELECT {cols} FROM (
{splitmix64_sql(table_sql, key_col, out_cols, seed=seed)}
) WHERE h < {thresh}::UBIGINT
"""


def splitmix64_sql(table_sql: str, key_col: str, out_cols: list[str], *, seed: int = 42) -> str:
    """A SELECT returning `out_cols` plus `h` = splitmix64(key XOR
    seed) as UBIGINT — the hash-exposing sibling of
    `seeded_sample_sql` (same bit-exact HUGEINT arithmetic), for
    oracles that need the hash value itself (KMV approx-distinct)."""
    cols = ", ".join(out_cols)

    def mul64(expr: str, const: int) -> str:
        lo = f"(({expr} % 4294967296::UBIGINT)::HUGEINT * {const}::HUGEINT)"
        hi = f"((({expr} >> 32)::HUGEINT * {const}::HUGEINT) % 4294967296::HUGEINT)"
        return (
            f"((({lo} % 18446744073709551616::HUGEINT) + {hi} * 4294967296::HUGEINT)"
            " % 18446744073709551616::HUGEINT)::UBIGINT"
        )

    m1 = mul64("xor(x0, x0 >> 30)", 0xBF58476D1CE4E5B9)
    m2 = mul64("xor(x1, x1 >> 27)", 0x94D049BB133111EB)
    return f"""
SELECT {cols}, xor(x2, x2 >> 31) AS h FROM (
  SELECT *, {m2} AS x2 FROM (
    SELECT *, {m1} AS x1 FROM (
      SELECT {cols}, xor({key_col}::UBIGINT, {seed}::UBIGINT) AS x0 FROM {table_sql}
    )
  )
)
"""


# ---------------------------------------------------------------------------
# O4: distributed prefix sum / global row index (zipWithIndex)


def with_global_index(
    ds: Dataset,
    sort_keys: list[str],
    *,
    index_col: str = "seq_pos",
    cumsum_of: str | None = None,
    cumsum_col: str = "running_before",
    sort_partitions: int | None = None,
) -> Dataset:
    """Global row index (and optional EXCLUSIVE running sum of
    `cumsum_of`) in `sort_keys` order — the distributed prefix-sum /
    zipWithIndex primitive behind global ROW_NUMBER and LLM sequence
    packing. `sort_keys` must be a unique key so the total order (and
    therefore the index) is deterministic.

    Plan: sort (the one unavoidable all-to-all), then exactly ONE
    (rows, sum) pair per block is computed by parallel remote tasks
    and exchanged; the driver holds only that per-block offset table
    (two ints per block — never data), and the offset add-back runs
    as parallel remote tasks over the already-materialized sorted
    blocks (zero-copy object-store reads). Raw Ray tasks are the
    documented drop-down here: a map_batches UDF has no notion of its
    block's global position.

    `sort_partitions` caps the range-partition count of the sort
    (Ray's sort cost tracks the input block count: a narrow 4M-row
    input in 200 tiny blocks sorts 2x slower than in 2-blocks-per-CPU
    — measured 28s -> 13s at 1M docs). The input is materialized (the
    sort would anyway), and coalesced ONLY if its block count exceeds
    the cap, so already-coarse inputs pay nothing. Default cap: 2 x
    cluster CPUs, floor 16 — right for inputs up to ~memory scale; at
    larger scale pass a count that tracks data volume so each
    partition stays worker-sized."""
    import ray.data as rd

    if sort_partitions is None:
        sort_partitions = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    m = ds.materialize()
    if m.num_blocks() > sort_partitions:
        m = m.repartition(sort_partitions)
    refs = m.sort(sort_keys).to_arrow_refs()

    @ray.remote
    def _stats(t: pa.Table):
        s = 0
        if cumsum_of is not None:
            s = int(pc.sum(t[cumsum_of]).as_py() or 0)
        return t.num_rows, s

    stats = ray.get([_stats.remote(r) for r in refs])
    offsets, r0, s0 = [], 0, 0
    for n, s in stats:
        offsets.append((r0, s0))
        r0 += n
        s0 += s

    @ray.remote
    def _add(t: pa.Table, row_off: int, sum_off: int) -> pa.Table:
        idx = np.arange(row_off, row_off + t.num_rows, dtype=np.int64)
        t = t.append_column(index_col, pa.array(idx))
        if cumsum_of is not None:
            v = t[cumsum_of].combine_chunks().to_numpy().astype(np.int64)
            t = t.append_column(
                cumsum_col, pa.array(sum_off + np.cumsum(v) - v)
            )
        return t

    return rd.from_arrow_refs(
        [_add.remote(r, ro, so) for r, (ro, so) in zip(refs, offsets)]
    )


def group_lag(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    lag_cols: dict[str, str],
) -> Dataset:
    """W1: per-key LAG — for each row, the previous row's values in
    `order_cols` order within its key partition (None for the first
    row). `lag_cols` maps source column -> output alias. One shuffle
    on the key; the per-group sort+shift is vectorized inside the
    worker. Assumes a key's rows fit one worker (same contract as
    `sessionize`/`sliding_window_count`; salt or range-split outsized
    keys upstream)."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ignore_index=True)
        out = g.copy()
        for src, alias in lag_cols.items():
            shifted = g[src].shift(1)
            if pd.api.types.is_integer_dtype(g[src]):
                # plain shift widens int64 to float64 (silent value
                # corruption above 2^53); keep exact via nullable Int64
                shifted = g[src].astype("Int64").shift(1)
            out[alias] = shifted
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def group_running_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    val_col: str,
    out_col: str,
) -> Dataset:
    """W2: per-key running (inclusive) sum in `order_cols` order —
    SUM(val) OVER (PARTITION BY key ORDER BY ...). Use an integer
    value column (cents) for bit-exact parity with SQL; same
    key-fits-worker contract as `group_lag`."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ignore_index=True)
        g[out_col] = g[val_col].cumsum()
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def group_quantile_disc(
    ds: Dataset,
    key: str,
    col: str,
    q: float,
    out_col: str,
    *,
    mode: str = "auto",
    rows: int | None = None,
) -> Dataset:
    """Per-group DISCRETE quantile — the sorted group's value at index
    ceil(q*n)-1, exactly SQL QUANTILE_DISC's convention (no
    interpolation, so integer columns stay exact end-to-end). Same
    two physical plans and auto gate as `group_median`:

    - ``exact``: key shuffle + per-group numpy partition (group fits a
      worker);
    - ``hist``: combiner-bounded (key, value) counts + cumulative walk
      (group rows unbounded, distinct values bounded) — identical
      output, parity-tested."""
    import pandas as pd

    if mode == "auto":
        n = rows if rows is not None else ds.count()
        mode = "hist" if n > MEDIAN_EXACT_MAX_ROWS else "exact"

    if mode == "hist":
        counts = grouped_sum_count(
            ds.select_columns([key, col]), keys=[key, col], sums=[], count_alias="_n"
        )

        def per_key_h(g: pd.DataFrame) -> pd.DataFrame:
            vals = g[col].to_numpy()
            cnts = g["_n"].to_numpy()
            order = np.argsort(vals, kind="mergesort")
            vals, cnts = vals[order], cnts[order]
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            rank = max(int(np.ceil(q * n)), 1)  # 1-based
            v = vals[np.searchsorted(cum, rank)]
            return pd.DataFrame({key: [g[key].iloc[0]], out_col: [v]})

        return counts.groupby(key).map_groups(per_key_h, batch_format="pandas")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[col].to_numpy())
        idx = max(int(np.ceil(q * len(v))) - 1, 0)
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [v[idx]]})

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def drop_empty_blocks(
    ds: Dataset, *, empty_schema: pa.Schema | None = None
) -> Dataset:
    """Compact away zero-row blocks (metadata-only; data never moves
    or leaves the object store).

    Why this exists: Ray 2.49's hash-shuffle join broadcasts each
    input's schema to the aggregator actors only from the FIRST
    shuffle task of that side — and `_shuffle_block` returns early,
    WITHOUT broadcasting, when its block has zero rows
    (hash_shuffle.py:223), while the submit-time
    `_has_schemas_broadcasted` flag is already set. A join input whose
    first block is empty therefore never delivers its schema, and any
    hash partition that receives no rows finalizes as a ZERO-COLUMN
    table, crashing pyarrow's join with ArrowInvalid ("No match ...
    on left/right side"). Deterministic repro (empty first block +
    any partition with no matching keys); this is the likely root
    cause of the intermittent flake `normalize_blocks` guards
    downstream consumers against. Run join INPUTS through this helper
    when they may contain empty blocks (e.g. outputs of a groupby
    over few keys, or of a selective filter).

    Version-proofing (VERDICT r3 #3): the fast path uses Ray-private
    `iter_internal_ref_bundles` (zero data movement). If a Ray upgrade
    removes it, the public-API fallback below keeps every join-shaped
    query working: count + even `repartition`, which by construction
    yields no empty block when rows >= blocks.

    ``empty_schema``: schema to synthesize a typed 1-block empty
    Dataset from when EVERY block is empty. Empty map outputs carry
    ZERO columns (map_batches never invokes the UDF on empty blocks,
    so not even `normalize_blocks` can repair them) — without this, an
    all-empty input poisons a downstream join exactly like the
    partial-empty case."""
    import ray.data as rd

    m = ds.materialize()
    if _FORCE_PUBLIC_DROP_EMPTY:
        return _drop_empty_blocks_public(m, empty_schema)
    try:
        bundles = list(m.iter_internal_ref_bundles())
        keep = [
            ref
            for bundle in bundles
            for ref, meta in zip(bundle.block_refs, bundle.metadata)
            if meta.num_rows is None or meta.num_rows > 0
        ]
    except AttributeError:  # private API gone in a future Ray
        return _drop_empty_blocks_public(m, empty_schema)
    if not keep:
        if empty_schema is not None:
            return rd.from_arrow(empty_schema.empty_table())
        return m  # all-empty: keep as-is (schema unknowable here)
    total = sum(len(b.block_refs) for b in bundles)
    if len(keep) == total:
        return m
    return rd.from_arrow_refs(keep)


_FORCE_PUBLIC_DROP_EMPTY = False  # tests flip this to force the fallback


def _drop_empty_blocks_public(
    m: Dataset, empty_schema: pa.Schema | None = None
) -> Dataset:
    """Public-API empty-block compaction: an even repartition of n rows
    into nb <= n blocks leaves no block empty. Costs one pass of data
    movement (the private path costs none) — acceptable as the
    upgrade-survival path, not the default."""
    import ray.data as rd

    n = m.count()
    if n == 0:
        if empty_schema is not None:
            return rd.from_arrow(empty_schema.empty_table())
        return m
    nb = max(1, min(256, -(-n // 65536), n))
    return m.repartition(nb).materialize()


def connected_components_distributed(
    edges: Dataset,
    src: str = "a",
    dst: str = "b",
    *,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> Dataset:
    """G1: distributed connected components by iterative min-label
    propagation — the at-scale replacement for a driver-side
    union-find when the edge set itself no longer fits one machine
    (near-dup clustering over billions of pairs). Returns one row per
    node appearing in `edges`: (node, label) with label = the
    component's minimum node id.

    Per iteration: ONE hash join pushes each node's current label to
    its neighbors and a combiner groupby takes the min. Convergence
    needs NO second join: labels decrease monotonically over a fixed
    node set, so a round changed nothing iff the exact int64 SUM of
    labels is unchanged — one cheap aggregate over the materialized
    label table (convergence in O(component diameter) min-propagation
    rounds; near-dup clusters are near-cliques, so 2-3 in practice).
    Everything stays a Dataset; the driver sees only the per-round
    label-sum. (Bound: the sum must not wrap int64 — fine up to ~3e9
    nodes with dense ids; beyond that, re-key nodes first or restore a
    per-round changed-count join.) Label tables are compacted with
    `drop_empty_blocks` before each join (see its docstring for the
    Ray 2.49 empty-first-block join hazard)."""

    def sym(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [b[src].combine_chunks(), b[dst].combine_chunks()]
        )
        v = pa.concat_arrays(
            [b[dst].combine_chunks(), b[src].combine_chunks()]
        )
        return pa.table({"u": u, "v": v})

    E = drop_empty_blocks(
        edges.map_batches(sym, batch_size=None, batch_format="pyarrow")
    )

    labels = drop_empty_blocks(
        distinct(E.select_columns(["u"]), ["u"]).map_batches(
            lambda b: pa.table({"node": b["u"], "label": b["u"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
    )
    lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    prev_sum = labels.sum("label")

    for _ in range(max_iters):
        nb = labels.map_batches(
            lambda b: pa.table({"jn": b["node"], "nl": b["label"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
        # neighbor label push: edge (u, v) receives v's current label
        cand = normalize_blocks(
            E.join(
                nb,
                join_type="inner",
                num_partitions=num_partitions or default_join_partitions(),
                on=("v",),
                right_on=("jn",),
            ),
            pa.schema([("u", pa.int64()), ("v", pa.int64()), ("nl", pa.int64())]),
        ).map_batches(
            lambda b: pa.table({"node": b["u"], "label": b["nl"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
        merged = cand.union(labels)
        # compact: the aggregate leaves empty blocks on sparse
        # partitions; an empty block leading either join input would
        # suppress Ray's schema broadcast (see drop_empty_blocks).
        new = drop_empty_blocks(
            normalize_blocks(
                merged.map_batches(  # combiner: per-block min before the shuffle
                    lambda b: b.group_by(["node"]).aggregate([("label", "min")])
                    .rename_columns(["node", "label"]),
                    batch_size=None,
                    batch_format="pyarrow",
                )
                .groupby("node")
                .aggregate(Min("label"))
                .map_batches(
                    lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                lbl_schema,
            )
        )
        new_sum = new.sum("label")
        labels = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return normalize_blocks(labels, lbl_schema)


def global_quantile_disc(ds: Dataset, col: str, q: float = 0.5) -> int:
    """Exact GLOBAL discrete quantile — the value at index
    floor((n-1)*q) of the ascending sort — without sorting the corpus:
    a per-batch value-count combiner, one `groupby(col).sum` over the
    distinct values, and a driver-side cumulative walk over the
    bounded distinct-value table. Boundedness assumption (documented):
    the column has ≪ corpus distinct values (ints, scores, bucketed
    floats); an unbounded-domain column should be bucketed first
    (same move as `group_quantile_disc`'s hist plan). Shuffle volume
    is O(distinct values), driver memory likewise."""

    def vc(b: pa.Table) -> pa.Table:
        return (
            b.select([col])
            .group_by([col])
            .aggregate([(col, "count")])
            .rename_columns([col, "n"])
        )

    counts = (
        ds.map_batches(vc, batch_size=None, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("n"))
    )
    rows = sorted((r[col], int(r["sum(n)"])) for r in counts.take_all())
    n = sum(c for _, c in rows)
    if n == 0:
        raise ValueError("global_quantile_disc over an empty dataset")
    target = int(np.floor((n - 1) * q))
    cum = 0
    for v, c in rows:
        cum += c
        if cum > target:
            return v
    return rows[-1][0]


# --- unbounded-domain exact global quantile (VERDICT r4 #5) ----------------
# `global_quantile_disc` assumes the column has combiner-bounded
# distinct values. The refinement variant below drops that assumption:
# it finds the value at rank floor((n-1)*q) of ANY int64/float64
# column in a FIXED number of passes with FIXED memory, by bit-plane
# bucket refinement over an order-preserving uint64 mapping — each
# pass histograms the next REFINE_BITS bits of the rows still inside
# the candidate prefix (a 2^REFINE_BITS-bounded combiner groupby),
# the driver walks the <= 2^REFINE_BITS cumulative counts to pick the
# bucket containing the rank, and recurses into it. 64/REFINE_BITS
# passes total, shuffle volume O(blocks * 2^REFINE_BITS) per pass,
# driver memory O(2^REFINE_BITS) — independent of row count AND of
# distinct-value count.

REFINE_BITS = 16  # bits resolved per pass -> 4 passes over 64 bits


def _ordered_u64(x: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 image of int64 or float64 values.

    int64: flip the sign bit. float64 (IEEE total order, no NaN): flip
    the sign bit of non-negatives, complement negatives — ascending
    unsigned order == ascending numeric order."""
    if x.dtype == np.int64:
        return x.view(np.uint64) ^ np.uint64(1 << 63)
    if x.dtype == np.float64:
        b = x.view(np.uint64)
        neg = (b >> np.uint64(63)).astype(bool)
        return np.where(neg, ~b, b | np.uint64(1 << 63))
    raise TypeError(f"unsupported dtype {x.dtype}")


def _from_ordered_u64(u: int, dtype: np.dtype):
    u = np.uint64(u)
    if dtype == np.int64:
        return int((u ^ np.uint64(1 << 63)).view(np.int64))
    bits = (u ^ np.uint64(1 << 63)) if u >> np.uint64(63) else ~u
    return float(np.uint64(bits).view(np.float64))


def global_quantile_refine(ds: Dataset, col: str, q: float = 0.5):
    """Exact global discrete quantile (value at ascending-sort index
    floor((n-1)*q), the `global_quantile_disc` definition) over an
    UNBOUNDED-domain int64/float64 column — see
    `global_quantiles_refine`, of which this is the one-quantile
    wrapper."""
    return global_quantiles_refine(ds, col, (q,))[0]


def global_quantiles_refine(ds: Dataset, col: str, qs) -> list:
    """Exact global discrete quantiles over an UNBOUNDED-domain
    int64/float64 column: 1 count pass + 4 bit-plane refinement
    passes SHARED across all requested quantiles (a p50+p90 request
    costs the same 5 corpus scans as a lone median — each pass
    histograms every UNIQUE candidate prefix once, and early passes
    are shared by construction: all quantiles start at prefix 0).
    Never a corpus sort, never an O(distinct) collect. NULLs are
    excluded (as SQL quantiles do); NaNs are not supported (IEEE
    total-order caveat, documented).

    Scale shape: each pass is a map-side np.bincount over the 2^16
    bucket space of the rows matching each resolved prefix, merged by
    a combiner groupby bounded at (unique prefixes) x 65,536 rows."""
    qs = list(qs)
    if not qs:
        return []
    npass = 64 // REFINE_BITS
    mask = np.uint64((1 << REFINE_BITS) - 1)

    def _count(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks().drop_null()
        return pa.table({"n": pa.array([len(arr)], type=pa.int64())})

    n = sum(
        r["n"]
        for r in ds.map_batches(
            _count, batch_size=None, batch_format="pyarrow"
        ).take_all()
    )
    if n == 0:
        raise ValueError("global_quantiles_refine over an empty column")
    targets = [int(np.floor((n - 1) * q)) for q in qs]

    # pin the numpy dtype once from the schema (ray Schema wrapper
    # exposes parallel names/types lists)
    s = ds.schema()
    t = dict(zip(s.names, s.types))[col]
    np_dtype = np.dtype(np.int64) if pa.types.is_integer(t) else np.dtype(np.float64)

    # per-quantile resolved high bits (right-aligned) and the count of
    # rows strictly below each candidate range
    prefixes = [np.uint64(0)] * len(qs)
    belows = [0] * len(qs)
    for p in range(npass):
        shift = np.uint64(64 - REFINE_BITS * (p + 1))
        known = np.uint64(REFINE_BITS * p)
        uniq = sorted({int(pf) for pf in prefixes})

        def hist(
            b: pa.Table, _shift=shift, _known=known, _uniq=tuple(uniq)
        ) -> pa.Table:
            arr = b[col].combine_chunks().drop_null()
            x = arr.to_numpy(zero_copy_only=False)
            x = x.astype(np.int64) if x.dtype.kind in "iu" else x.astype(np.float64)
            u = _ordered_u64(x)
            pfx_out, bkt_out, n_out = [], [], []
            for pf in _uniq:
                uu = (
                    u[(u >> (_shift + np.uint64(REFINE_BITS))) == np.uint64(pf)]
                    if _known
                    else u
                )
                bucket = ((uu >> _shift) & mask).astype(np.int64)
                cnt = np.bincount(bucket, minlength=1 << REFINE_BITS)
                nz = np.flatnonzero(cnt)
                pfx_out.append(np.full(len(nz), pf, dtype=np.int64))
                bkt_out.append(nz.astype(np.int64))
                n_out.append(cnt[nz].astype(np.int64))
            return pa.table(
                {
                    "pfx": pa.array(np.concatenate(pfx_out)),
                    "bucket": pa.array(np.concatenate(bkt_out)),
                    "n": pa.array(np.concatenate(n_out)),
                }
            )

        agg = (
            ds.map_batches(hist, batch_size=None, batch_format="pyarrow")
            .groupby(["pfx", "bucket"])
            .aggregate(Sum("n"))
        )
        by_pfx: dict[int, list] = {pf: [] for pf in uniq}
        for r in agg.take_all():  # <= uniq x 2^REFINE_BITS rows
            by_pfx[int(r["pfx"])].append((int(r["bucket"]), int(r["sum(n)"])))
        for qi in range(len(qs)):
            cum = belows[qi]
            for bkt, c in sorted(by_pfx[int(prefixes[qi])]):
                if cum + c > targets[qi]:
                    prefixes[qi] = (prefixes[qi] << np.uint64(REFINE_BITS)) | np.uint64(bkt)
                    belows[qi] = cum
                    break
                cum += c
    return [_from_ordered_u64(int(pf), np_dtype) for pf in prefixes]


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter (round 3): the scale path for a
# semi join whose right side's KEYS are too many to broadcast exactly
# (semi_join's is_in gate) but whose BITS fit — n-gram decontamination
# against a large test set, URL blocklists, seen-id filters.

BLOOM_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def hash_strings(col: pa.Array) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a NON-NULL string
    column: pandas' fixed-key siphash (`pd.util.hash_array`) — stable
    across processes and machines, unlike Python ``hash()`` (F7
    rule). One cython pass, no per-row Python in the caller."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(col.to_pandas(), dtype=object))


def _bloom_positions(h1: np.ndarray, i: int, m_bits: np.uint64) -> np.ndarray:
    """i-th double-hash probe position: (h1 + i*h2) mod m_bits with an
    ODD stride h2 (m_bits is a power of two — an even stride would
    cycle through a subgroup and waste probes)."""
    h2 = _mix64(h1 ^ BLOOM_H2_SALT) | np.uint64(1)
    return (h1 + np.uint64(i) * h2) % m_bits


def bloom_build(
    keys_ds: Dataset, key: str, *, m_bits: int = 1 << 20, nhash: int = 4
) -> np.ndarray:
    """Build a Bloom bitmap over a key column, distributed: each block
    contributes a fixed-size partial bitmap (map_batches combiner, no
    shuffle); the driver ORs the O(blocks) partials — constant driver
    memory (m_bits/8 bytes per partial), never the keys themselves.
    Size m_bits/nhash for the wanted false-positive rate; FPs only
    cost extra downstream work because `bloom_prefilter` is a
    SUPERSET filter that must be composed with an exact verify."""
    nwords = m_bits // 64
    mb = np.uint64(m_bits)

    def partial(b: pa.Table) -> pa.Table:
        words = np.zeros(nwords, dtype=np.uint64)
        if b.num_rows:
            h1 = hash_strings(b[key].combine_chunks())
            for i in range(nhash):
                idx = _bloom_positions(h1, i, mb)
                np.bitwise_or.at(
                    words,
                    (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        return pa.table({"bloom": pa.array([words.tobytes()], pa.large_binary())})

    import ray as _ray

    acc = np.zeros(nwords, dtype=np.uint64)
    parts = keys_ds.map_batches(partial, batch_size=None, batch_format="pyarrow")
    # ray.get ONE partial at a time so driver residency stays at a
    # single bitmap (ADVICE r3: getting all refs at once made transient
    # memory O(num_blocks * m_bits/8) on wide inputs)
    for ref in parts.to_arrow_refs():
        t = _ray.get(ref)
        if t is not None and t.num_rows:
            for buf in t["bloom"].to_pylist():
                acc |= np.frombuffer(buf, dtype=np.uint64)
        del t
    return acc


def bloom_prefilter(
    ds: Dataset, key: str, bloom_ref, *, m_bits: int = 1 << 20, nhash: int = 4
) -> Dataset:
    """Map-side candidate filter against a broadcast Bloom bitmap
    (`ray.put(bloom_build(...))` once, read per task from the local
    object store): keeps a SUPERSET of the matching rows (negatives
    are exact, positives may be false), so compose with an exact
    `semi_join` on the survivors — the exact join then runs on the
    pruned set instead of the corpus."""
    import ray as _ray

    mb = np.uint64(m_bits)

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        words = _ray.get(bloom_ref)
        h1 = hash_strings(b[key].combine_chunks())
        keep = np.ones(len(h1), dtype=bool)
        for i in range(nhash):
            idx = _bloom_positions(h1, i, mb)
            bit = (
                words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))
            ) & np.uint64(1)
            keep &= bit.astype(bool)
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Skew-aware equi-join (round 3): the J2 hash join's hot-key escape
# hatch. A hash join sends every row of a key to ONE partition — a
# Zipf-head key (the Bach/Mozart problem, §4.3) turns that partition
# into the straggler. Here the hot keys never enter the shuffle.


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    *,
    hot_threshold: int,
    num_partitions: int | None = None,
) -> Dataset:
    """Skew-aware inner equi-join: left keys hotter than
    `hot_threshold` rows are joined MAP-SIDE against a broadcast of
    their right-side rows (`ray.put` once — the hot tuples never
    shuffle), the cold remainder goes through the normal hash join,
    and the two streams union. Identical rows to `hash_join`
    (parity-tested across thresholds).

    Finding the hot keys is cheap: a combiner count per key (shuffle
    O(distinct keys per block)), filtered on the driver — the hot
    list is small by definition (few keys exceed a meaningful
    threshold). Documented assumption: the right side is
    dimension-like on the hot keys (few rows per hot key), so their
    broadcast table stays small; a hot-hot join (both sides huge on
    one key) is a cross-product blowup no join strategy fixes."""
    rkey = right_on or on
    sch_l = _arrow_schema_or_none(left)
    sch_r = _arrow_schema_or_none(right)
    if sch_l is None or sch_r is None:
        raise ValueError("skew_join requires schema-typed inputs")
    counts = grouped_sum_count(
        left.select_columns([on]), keys=[on], sums=[], count_alias="n"
    )
    hot = {r[on] for r in counts.filter(expr=f"n > {hot_threshold}").take_all()}
    out_schema = pa.schema(
        list(sch_l)
        + [f for f in sch_r if f.name != rkey]
    )
    if not hot:
        return normalize_blocks(
            hash_join(
                drop_empty_blocks(left),
                drop_empty_blocks(right),
                on=(on,),
                right_on=(rkey,),
                num_partitions=num_partitions or default_join_partitions(),
            ),
            out_schema,
        )
    r_hot = collect_table(
        semi_join_filter(right, rkey, hot), sch_r
    )
    hot_joined = broadcast_join(
        semi_join_filter(left, on, hot), r_hot, keys=[on], right_keys=[rkey]
    )
    l_cold = drop_empty_blocks(anti_join_filter(left, on, hot))
    if l_cold.count() == 0:  # metadata-cheap: drop_empty_blocks materialized
        return normalize_blocks(hot_joined, out_schema)
    cold_joined = hash_join(
        l_cold,
        drop_empty_blocks(right),
        on=(on,),
        right_on=(rkey,),
        num_partitions=num_partitions or default_join_partitions(),
    )
    return normalize_blocks(hot_joined, out_schema).union(
        normalize_blocks(cold_joined, out_schema)
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters over an UNBOUNDED value domain (round 3): the
# scale path for `frequent_items`, whose combiner bounds the shuffle
# to DISTINCT values — fine for event types, unbounded for n-grams /
# URLs. Classic two-pass candidate+recount: per-block top-m candidate
# generation (bounded), exact recount of the candidate union, and a
# runtime guarantee check instead of silent approximation.


def exact_heavy_hitters(
    ds: Dataset,
    col: str,
    k: int,
    *,
    sketch_k: int = 1024,
    count_alias: str = "n",
) -> pa.Table:
    """EXACT deterministic top-k (count desc, value asc) with bounded
    memory everywhere: pass 1 keeps each block's top-`sketch_k` values
    by in-block count (a value absent from a block's top-m has
    in-block count ≤ n_i/m, so absent-from-every-block ⇒ total count
    ≤ n/m — the candidate union is a superset of every value with
    count > n/m); pass 2 recounts ONLY the candidates exactly
    (broadcast `is_in` + combiner) and takes the global top-k. The
    sketch can only FAIL LOUDLY: if the final k-th count does not
    clear the n/sketch_k bound the guarantee is void and a ValueError
    asks for a wider sketch — never a silently wrong set.

    Two passes over `ds` by design (the input plan re-executes; cheap
    projections recompute, heavyweight upstreams should be
    materialized by the caller). Driver holds the DISTINCT candidate
    union (≤ blocks × sketch_k, typically far less) and the final k
    rows — never the value domain."""
    cnt_col = f"{col}_count"

    def block_top(b: pa.Table) -> pa.Table:
        g = b.select([col]).group_by([col]).aggregate([(col, "count")])
        idx = pc.sort_indices(
            g, sort_keys=[(cnt_col, "descending"), (col, "ascending")]
        )
        top = g.take(idx[:sketch_k])[col]
        vals = pa.concat_arrays(
            [top.combine_chunks(), pa.nulls(1, type=top.type)]
        )
        bn = np.zeros(len(top) + 1, dtype=np.int64)
        bn[-1] = b.num_rows
        tr = np.zeros(len(top) + 1, dtype=np.int64)
        tr[-1] = int(g.num_rows > sketch_k)  # did this block truncate?
        return pa.table({"v": vals, "bn": pa.array(bn), "tr": pa.array(tr)})

    pass1 = ds.map_batches(
        block_top, batch_size=None, batch_format="pyarrow"
    ).materialize()  # bounded: blocks x (sketch_k + 1) rows
    total = int(pass1.sum("bn"))
    truncated = int(pass1.sum("tr") or 0) > 0
    vtype = pass1.schema().base_schema.field("v").type  # materialized: no exec
    cand = set(
        _drop_null_keys(pass1.select_columns(["v"]), "v").unique("v")
    )
    if not cand:
        return pa.schema(
            [(col, vtype), (count_alias, pa.int64())]
        ).empty_table()

    counts = grouped_sum_count(
        semi_join_filter(ds.select_columns([col]), col, cand),
        keys=[col],
        sums=[],
        count_alias=count_alias,
    )
    top = collect_table(
        topk(counts, [count_alias, col], k, descending=[True, False]),
        pa.schema([(col, vtype), (count_alias, pa.int64())]),
    )
    # If NO block ever truncated its in-block top list, the candidate
    # union is the complete value domain and the top-k is exact by
    # construction — the n/sketch_k bound is irrelevant (ADVICE r3:
    # previously this fired spuriously on small domains where kth
    # defaulted to 1).
    if truncated:
        kth = int(top[count_alias][-1].as_py()) if top.num_rows == k else 1
        if kth * sketch_k <= total:
            raise ValueError(
                f"exact_heavy_hitters guarantee void: kth count {kth} <= "
                f"total/sketch_k = {total}/{sketch_k}; widen sketch_k"
            )
    return top


def pagerank(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    num_partitions: int | None = None,
    dangling: str = "drop",
) -> Dataset:
    """G2: deterministic fixed-point PageRank over a directed edge
    Dataset — the weighted-push sibling of
    `connected_components_distributed` (G1 pushes min labels; G2
    pushes rank mass). Returns one row per node appearing in `edges`:
    (node, rank_fp) with rank in fixed-point units of 1/`scale`.

    All arithmetic is int64 so the result is bit-identical on any
    block layout / cluster size AND exactly reproducible in SQL:
    r0 = scale; per edge u->v the pushed mass is
    floor(damp_num * r(u) / (damp_den * outdeg(u))); r'(v) =
    scale*(damp_den-damp_num)//damp_den + sum(in-pushes).

    ``dangling`` (VERDICT r3 #4): with the default ``"drop"``, nodes
    with no out-edges simply drop their mass — the fast variant (ONE
    join + ONE combiner groupby per iteration). With
    ``"redistribute"`` (the mass-conserving variant users expect),
    each iteration adds one global int64 sum D of the dangling nodes'
    rank, and every node receives floor(damp_num*D/(damp_den*|V|)) —
    a per-iteration CONSTANT, so it folds into the base term with no
    extra shuffle. Overflow bound: damp_num*D <= damp_num*|V|*scale
    must fit int64 (|V| <= ~1e11 at the defaults).

    Per iteration: hash-join the O(nodes) rank table to the static
    (src, dst, outdeg) edge table on src (both stay Datasets — no
    driver materialization), a per-block combiner sums pushes before
    the groupby shuffle, and a left-outer join back to the node table
    re-seats nodes with no in-edges at the base rank. The edge+outdeg
    table and each iteration's rank table are materialized once so
    the static sub-plan never re-executes (iters is a small constant;
    total work O(iters * |E|)). Overflow bound: sum of all ranks is
    <= |V|*scale per iteration, far inside int64 for any |V| that
    fits storage. Inputs are compacted with `drop_empty_blocks` (Ray
    2.49 empty-first-block join hazard, see its docstring)."""
    e = drop_empty_blocks(
        edges.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b[src], pa.int64()),
                    "dst": pc.cast(b[dst], pa.int64()),
                }
            ),
            batch_size=None,
            batch_format="pyarrow",
        )
    ).materialize()

    # static out-degree rides the edge table: one join, ever
    # (materialized: the redistribute variant consumes it twice)
    deg = grouped_sum_count(
        e, keys=["src"], sums=[], count_alias="deg"
    ).materialize()
    e3_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
    )
    e3 = (
        normalize_blocks(
            hash_join(
                e,
                drop_empty_blocks(deg).map_batches(
                    lambda b: pa.table({"jsrc": b["src"], "deg": b["deg"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("src",),
                right_on=("jsrc",),
                num_partitions=num_partitions or default_join_partitions(),
            ),
            e3_schema,
        )
        .materialize()
    )

    nodes = drop_empty_blocks(
        distinct(
            e.map_batches(
                lambda b: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [
                                b["src"].combine_chunks(),
                                b["dst"].combine_chunks(),
                            ]
                        )
                    }
                ),
                batch_size=None,
                batch_format="pyarrow",
            ),
            ["node"],
        )
    ).materialize()

    base = scale * (damp_den - damp_num) // damp_den
    rank_schema = pa.schema([("node", pa.int64()), ("rank_fp", pa.int64())])
    ranks = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "rank_fp": pa.array(
                    np.full(b.num_rows, scale, dtype=np.int64)
                ),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
    ).materialize()

    dang = None
    n_nodes = 0
    if dangling == "redistribute":
        # static dangling set: nodes never appearing as src. Carried as
        # a broadcast-able small Dataset? No — it can be |V|-sized, so
        # it stays a Dataset and D is computed by a left_anti semi
        # structure: ranks ⟕ deg, sum rank where deg missing. Cheaper:
        # materialize the dangling NODE set once as a Dataset and per
        # iteration sum the rank of nodes in it via one hash join +
        # global sum (one scalar to the driver).
        dang = (
            normalize_blocks(
                hash_join(
                    nodes,
                    drop_empty_blocks(deg).map_batches(
                        lambda b: pa.table(
                            {"jsrc": b["src"], "deg": b["deg"]}
                        ),
                        batch_size=None,
                        batch_format="pyarrow",
                    ),
                    on=("node",),
                    right_on=("jsrc",),
                    join_type="left_outer",
                    num_partitions=num_partitions or default_join_partitions(),
                ),
                pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
            )
            .map_batches(
                lambda b: b.filter(pc.is_null(b["deg"])).select(["node"]),
                batch_size=None,
                batch_format="pyarrow",
            )
            .materialize()
        )
        # the selective filter leaves empty blocks behind; compact once
        # here (dang is static) so the per-iteration join never sees them
        dang = drop_empty_blocks(
            normalize_blocks(dang, pa.schema([("node", pa.int64())]))
        )
        if dang.count() == 0:
            dang = None  # no dangling nodes: D == 0 every iteration
        n_nodes = nodes.count()

    dn, dd = damp_num, damp_den

    def push(b: pa.Table) -> pa.Table:
        r = b["rank_fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = (dn * r) // (dd * d)
        # combiner: per-block partial sum per dst before the shuffle
        t = pa.table({"dst": b["dst"], "s": pa.array(contrib)})
        return (
            t.group_by(["dst"]).aggregate([("s", "sum")])
            .rename_columns(["dst", "s"])
        )

    for _ in range(iters):
        extra = 0
        if dang is not None:
            # one global int64 sum of the dangling nodes' current rank;
            # the redistribution is a per-iteration CONSTANT per node
            d_mass = normalize_blocks(
                hash_join(
                    dang,
                    drop_empty_blocks(ranks).map_batches(
                        lambda b: pa.table(
                            {"jn": b["node"], "rank_fp": b["rank_fp"]}
                        ),
                        batch_size=None,
                        batch_format="pyarrow",
                    ),
                    on=("node",),
                    right_on=("jn",),
                    num_partitions=num_partitions or default_join_partitions(),
                ),
                pa.schema([("node", pa.int64()), ("rank_fp", pa.int64())]),
            ).sum("rank_fp")
            extra = (dn * int(d_mass or 0)) // (dd * n_nodes)
        rj = ranks.map_batches(
            lambda b: pa.table({"jn": b["node"], "rank_fp": b["rank_fp"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
        pushed = (
            normalize_blocks(
                hash_join(
                    e3,
                    drop_empty_blocks(rj),
                    on=("src",),
                    right_on=("jn",),
                    num_partitions=num_partitions or default_join_partitions(),
                ),
                pa.schema(
                    [
                        ("src", pa.int64()),
                        ("dst", pa.int64()),
                        ("deg", pa.int64()),
                        ("rank_fp", pa.int64()),
                    ]
                ),
            )
            .map_batches(push, batch_size=None, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("s", alias_name="s"))
        )
        merged = normalize_blocks(
            hash_join(
                nodes,
                drop_empty_blocks(pushed).map_batches(
                    lambda b: pa.table({"jd": b["dst"], "s": b["s"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("node",),
                right_on=("jd",),
                join_type="left_outer",
                num_partitions=num_partitions or default_join_partitions(),
            ),
            pa.schema([("node", pa.int64()), ("s", pa.int64())]),
        )
        ranks = drop_empty_blocks(
            normalize_blocks(
                merged.map_batches(
                    lambda b, _add=base + extra: pa.table(
                        {
                            "node": b["node"],
                            "rank_fp": pc.add(
                                pc.fill_null(pc.cast(b["s"], pa.int64()), 0),
                                _add,
                            ),
                        }
                    ),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                rank_schema,
            )
        ).materialize()
    return ranks


def cms_build(
    ds: Dataset,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> np.ndarray:
    """X46: Count-Min sketch of an int64 key column — the mergeable
    bounded-memory frequency summary (Cormode & Muthukrishnan 2005).
    Returns the dense (depth, width) int64 counter array; estimates
    come from `cms_estimate`. Row j hashes keys with
    splitmix64(key XOR (seed+j)) % width, so the whole sketch is a
    pure function of the data — deterministic across block layouts /
    cluster sizes AND exactly reconstructable in SQL (the oracle
    rebuilds the identical counters via `splitmix64_sql`).

    Distribution: one `map_batches` pass emits each block's NONZERO
    (j, bucket, n) partial counters (np.bincount per row — at most
    depth*width rows leave a worker per block, usually far fewer), a
    combiner groupby sums them, and the driver collects only the
    <= depth*width final rows — never the keys. Use when even the
    distinct-key table of `exact_heavy_hitters` is too wide and an
    overestimate bounded by eps*n (eps = e/width) is acceptable."""

    def partial(b: pa.Table) -> pa.Table:
        k = (
            b[key_col]
            .combine_chunks()
            .to_numpy()
            .astype(np.int64)
            .view(np.uint64)
        )
        js, buckets, ns = [], [], []
        for j in range(depth):
            cnt = np.bincount(
                (_mix64(k ^ np.uint64(seed + j)) % np.uint64(width)).astype(
                    np.int64
                ),
                minlength=width,
            )
            nz = np.flatnonzero(cnt)
            js.append(np.full(len(nz), j, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            ns.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "j": np.concatenate(js),
                "bucket": np.concatenate(buckets),
                "n": np.concatenate(ns),
            }
        )

    rows = (
        ds.map_batches(partial, batch_size=None, batch_format="pyarrow")
        .groupby(["j", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # bounded: <= depth * width rows
    sk = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        sk[int(r["j"]), int(r["bucket"])] = int(r["n"])
    return sk


def cms_estimate(
    keys: np.ndarray, sketch: np.ndarray, *, seed: int = 7
) -> np.ndarray:
    """Point-frequency estimates from a `cms_build` sketch: the min
    over rows of the counter each key hashes to (vectorized; never
    underestimates, overestimate <= eps*n w.h.p.)."""
    depth, width = sketch.shape
    k = np.asarray(keys).astype(np.int64).view(np.uint64)
    est = np.full(len(k), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        b = (_mix64(k ^ np.uint64(seed + j)) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[j, b])
    return est


def cube_from_finest(
    fine: pa.Table,
    dims: list[str],
    metrics: list[str],
    *,
    sentinel: str = "ALL",
) -> pa.Table:
    """A16: CUBE / arbitrary grouping sets derived from the
    FINEST-level aggregate — every coarser of the 2^d levels is a
    re-aggregation of the bounded (|dim-combos|-row) finest table,
    never of the input, so a full cube costs exactly ONE distributed
    groupby regardless of corpus size (the same plan shape as the
    ROLLUP query, generalized). `fine` must carry `dims` (any type —
    cast to string here so the sentinel can slot in) and additive
    int64 `metrics` (counts / cents sums). Rows for a level where a
    dim is aggregated away carry `sentinel` in that column."""
    from itertools import combinations

    base = pa.table(
        {
            **{d: pc.cast(fine[d], pa.string()) for d in dims},
            **{m: fine[m] for m in metrics},
        }
    )
    out = []
    for r in range(len(dims), -1, -1):
        for keep in combinations(dims, r):
            if keep:
                g = base.group_by(list(keep)).aggregate(
                    [(m, "sum") for m in metrics]
                )
                cols = {}
                for d in dims:
                    cols[d] = (
                        g[d]
                        if d in keep
                        else pa.array([sentinel] * g.num_rows)
                    )
                for m in metrics:
                    cols[m] = pc.cast(g[f"{m}_sum"], pa.int64())
                out.append(pa.table(cols))
            else:
                cols = {d: pa.array([sentinel]) for d in dims}
                for m in metrics:
                    cols[m] = pa.array(
                        [pc.sum(base[m]).as_py() or 0], type=pa.int64()
                    )
                out.append(pa.table(cols))
    return pa.concat_tables(out)


def profile_columns(ds: Dataset, cols: list[str]) -> pa.Table:
    """X48: one-shot data-quality profile — per column: row count,
    null count, exact distinct count, min and max (stringified so
    mixed int/string columns share one schema). Two bounded passes:
    (1) per-block (col, n, nulls, min, max) partials merged by a
    combiner groupby on the column name — O(#cols) rows ever shuffle;
    (2) per-block-deduped (col, value) pairs through the distinct
    combiner, counted per column — shuffle bounded by distinct values
    (the profile's only data-sized term; bucket first for unbounded
    domains). The driver assembles #cols rows. Input plan executes
    twice by design (pruned read; materialize upstream if derived)."""

    def stats(b: pa.Table) -> pa.Table:
        # min/max partials stay in NATIVE type (an int min merged as
        # a string would order "150" < "9"): int columns ride min_i/
        # max_i, string columns ride min_s/max_s, the other pair is
        # null and ignored by the Min/Max merge.
        names, ns, nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in cols:
            a = b[c]
            mm = pc.min_max(a)
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(a.null_count)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if pa.types.is_integer(a.type):
                min_i.append(mn), max_i.append(mx)
                min_s.append(None), max_s.append(None)
            else:
                min_s.append(mn), max_s.append(mx)
                min_i.append(None), max_i.append(None)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n_rows": pa.array(ns, pa.int64()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "min_i": pa.array(min_i, pa.int64()),
                "max_i": pa.array(max_i, pa.int64()),
                "min_s": pa.array(min_s, pa.string()),
                "max_s": pa.array(max_s, pa.string()),
            }
        )

    agg = collect_table(
        ds.map_batches(stats, batch_size=None, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_i", alias_name="min_i"),
            Max("max_i", alias_name="max_i"),
            Min("min_s", alias_name="min_s"),
            Max("max_s", alias_name="max_s"),
        ),
        pa.schema(
            [
                ("col_name", pa.string()),
                ("n_rows", pa.int64()),
                ("n_nulls", pa.int64()),
                ("min_i", pa.int64()),
                ("max_i", pa.int64()),
                ("min_s", pa.string()),
                ("max_s", pa.string()),
            ]
        ),
    )
    min_str = [
        (s if s is not None else (None if i is None else str(i)))
        for s, i in zip(agg["min_s"].to_pylist(), agg["min_i"].to_pylist())
    ]
    max_str = [
        (s if s is not None else (None if i is None else str(i)))
        for s, i in zip(agg["max_s"].to_pylist(), agg["max_i"].to_pylist())
    ]
    agg = (
        agg.drop_columns(["min_i", "max_i", "min_s", "max_s"])
        .append_column("min_str", pa.array(min_str, pa.string()))
        .append_column("max_str", pa.array(max_str, pa.string()))
    )

    def pairs(b: pa.Table) -> pa.Table:
        ks, vs = [], []
        for c in cols:
            u = pc.unique(pc.drop_null(b[c]))
            ks.append(pa.array([c] * len(u), pa.string()))
            vs.append(pc.cast(u, pa.string()))
        return pa.table(
            {
                "col_name": pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in ks]),
                "val": pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vs]),
            }
        )

    nd = collect_table(
        grouped_sum_count(
            distinct(
                ds.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
                ["col_name", "val"],
            ),
            keys=["col_name"],
            sums=[],
            count_alias="n_distinct",
        ),
        pa.schema([("col_name", pa.string()), ("n_distinct", pa.int64())]),
    )
    dmap = dict(
        zip(nd["col_name"].to_pylist(), nd["n_distinct"].to_pylist())
    )
    order = {c: i for i, c in enumerate(cols)}
    idx = pc.sort_indices(
        pa.table({"o": pa.array([order[c] for c in agg["col_name"].to_pylist()])}),
        sort_keys=[("o", "ascending")],
    )
    agg = agg.take(idx)
    return agg.append_column(
        "n_distinct",
        pa.array([dmap.get(c, 0) for c in agg["col_name"].to_pylist()], pa.int64()),
    )


def triangle_count(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    num_partitions: int | None = None,
    orient: str = "degree",
    with_wedges: bool = False,
) -> Dataset:
    """G3: exact global triangle count over an UNDIRECTED graph given
    as a directed edge Dataset (orientation/duplicates/self-loops are
    normalized away). Two-join plan: orient every edge low→high by a
    TOTAL node order, self-join on the source to form wedges (each
    triangle appears as exactly ONE wedge, at its lowest-ranked
    corner), then a composite-key hash join verifies the closing edge
    — counted once, no division by 3/6.

    ``orient`` (VERDICT r3 #6): the default ``"degree"`` ranks nodes
    by (degree, id), so hubs sort LAST and every node's out-degree is
    bounded by O(sqrt(|E|)) — wedge volume is O(|E|^1.5) even on
    hub-skewed graphs (a star graph yields ZERO wedges instead of
    O(d²)). Costs one extra degree groupby + two degree-attach joins
    over the plain ``"id"`` orientation (kept for parity testing).
    Returns a 1-row Dataset (n_triangles; plus n_wedges when
    ``with_wedges``)."""

    def canon(b: pa.Table) -> pa.Table:
        s = pc.cast(b[src], pa.int64())
        d = pc.cast(b[dst], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    nparts = num_partitions or default_join_partitions()
    e = drop_empty_blocks(
        distinct(
            edges.map_batches(canon, batch_size=None, batch_format="pyarrow"),
            ["a", "b"],
        )
    ).materialize()  # feeds the degree pass + three join sides

    if orient == "degree":
        # undirected degree per node: one combiner-bounded groupby
        ends = e.map_batches(
            lambda t: pa.table({"v": t["a"]}),
            batch_size=None,
            batch_format="pyarrow",
        ).union(
            e.map_batches(
                lambda t: pa.table({"v": t["b"]}),
                batch_size=None,
                batch_format="pyarrow",
            )
        )
        deg = drop_empty_blocks(
            grouped_sum_count(ends, keys=["v"], sums=[], count_alias="deg")
        ).materialize()  # consumed by two attach joins
        ea = normalize_blocks(
            hash_join(
                e,
                deg.map_batches(
                    lambda t: pa.table({"va": t["v"], "da": t["deg"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("a",),
                right_on=("va",),
                num_partitions=nparts,
            ),
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("da", pa.int64())]
            ),
        )
        eab = normalize_blocks(
            hash_join(
                drop_empty_blocks(ea),
                deg.map_batches(
                    lambda t: pa.table({"vb": t["v"], "db": t["deg"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("b",),
                right_on=("vb",),
                num_partitions=nparts,
            ),
            pa.schema(
                [
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("da", pa.int64()),
                    ("db", pa.int64()),
                ]
            ),
        )

        def orient_deg(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            da = t["da"].to_numpy(zero_copy_only=False)
            db = t["db"].to_numpy(zero_copy_only=False)
            a_first = (da < db) | ((da == db) & (a < b))
            return pa.table(
                {
                    "u": pa.array(np.where(a_first, a, b), pa.int64()),
                    "v": pa.array(np.where(a_first, b, a), pa.int64()),
                    "dv": pa.array(np.where(a_first, db, da), pa.int64()),
                }
            )

        oriented = drop_empty_blocks(
            eab.map_batches(
                orient_deg, batch_size=None, batch_format="pyarrow"
            )
        ).materialize()

        def rank_lt(t: pa.Table) -> pa.Table:
            # keep wedge pairs with rank(v) < rank(w) under (deg, id)
            keep = pc.or_(
                pc.less(t["dv"], t["dw"]),
                pc.and_(pc.equal(t["dv"], t["dw"]), pc.less(t["v"], t["w"])),
            )
            f = t.filter(keep)
            return pa.table({"a": f["v"], "c": f["w"]})

        wedges = normalize_blocks(
            hash_join(
                oriented,
                oriented.map_batches(
                    lambda t: pa.table(
                        {"u2": t["u"], "w": t["v"], "dw": t["dv"]}
                    ),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("u",),
                right_on=("u2",),
                num_partitions=nparts,
            ),
            pa.schema(
                [
                    ("u", pa.int64()),
                    ("v", pa.int64()),
                    ("dv", pa.int64()),
                    ("w", pa.int64()),
                    ("dw", pa.int64()),
                ]
            ),
        ).map_batches(rank_lt, batch_size=None, batch_format="pyarrow")
        close_right = oriented.map_batches(
            lambda t: pa.table({"ja": t["u"], "jc": t["v"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
    else:  # orient == "id": legacy a<b orientation (parity baseline)
        wedges = normalize_blocks(
            hash_join(
                e,
                e.map_batches(
                    lambda t: pa.table({"a2": t["a"], "b2": t["b"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("b",),
                right_on=("a2",),
                num_partitions=nparts,
            ),
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("b2", pa.int64())]
            ),
        ).map_batches(
            lambda t: pa.table({"a": t["a"], "c": t["b2"]}),
            batch_size=None,
            batch_format="pyarrow",
        )
        close_right = e.map_batches(
            lambda t: pa.table({"ja": t["a"], "jc": t["b"]}),
            batch_size=None,
            batch_format="pyarrow",
        )

    # drop_empty_blocks materializes, so the count below is
    # metadata-only. The rank filter can leave ZERO wedges total (e.g.
    # a star graph under degree orientation) and Ray 2.49's hash join
    # cannot take a fully-empty side (every partition would finalize
    # zero-column) — short-circuit instead of joining.
    wedge_schema = pa.schema([("a", pa.int64()), ("c", pa.int64())])
    wedges = drop_empty_blocks(wedges, empty_schema=wedge_schema)
    n_wedges = wedges.count()
    if n_wedges == 0:
        total = 0
    else:
        closed = normalize_blocks(
            hash_join(
                wedges,
                close_right,
                on=("a", "c"),
                right_on=("ja", "jc"),
                num_partitions=nparts,
            ),
            pa.schema([("a", pa.int64()), ("c", pa.int64())]),
        )
        counted = closed.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
            batch_size=None,
            batch_format="pyarrow",
        )
        total = counted.sum("n")  # None only if closed had zero blocks
    import ray.data as _rd

    cols = {"n_triangles": pa.array([int(total or 0)], pa.int64())}
    if with_wedges:
        cols["n_wedges"] = pa.array([int(n_wedges)], pa.int64())
    return _rd.from_arrow(pa.table(cols))


def group_rolling_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    val_col: str,
    out_col: str,
    *,
    window: int,
) -> Dataset:
    """W6: per-key ROLLING sum over the trailing `window` rows —
    SUM(val) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW). Vectorized in-group
    (pandas C rolling over the sorted group); integer value columns
    stay exact end-to-end. Same key-fits-worker contract as
    `group_lag`/`group_running_sum` — salt upstream for outsized
    keys."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ignore_index=True)
        g[out_col] = (
            g[val_col].rolling(window, min_periods=1).sum().astype("int64")
        )
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
