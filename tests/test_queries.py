"""Driver-style oracle checks: run each QUERIES[name] on Ray and its
ORACLE_SQL[name] on DuckDB over the same parquet, compare row count,
schema (column names) and EXACT values after canonical ordering —
stricter than the driver's order-insensitive value-hash."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _compare(name, ray_df, sql_df):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                av.astype(float), bv.astype(float), check_names=False, check_exact=True
            )
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), f"{name}.{col}"


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", [
    "pricing_summary", "region_stats", "segment_orders", "custs_with_orders",
    "custs_without_orders", "top_orders", "distinct_user_event", "string_funcs",
    "orders_by_year", "json_props", "salted_events_agg", "union_names",
    "events_tumbling_hour", "doc_token_counts", "distinct_texts", "doc_regex_tokens",
    "dedup_exact_docs", "knn_search", "doc_quality",
    "langid_docs", "doc_fingerprint",
    "events_asof", "events_sessionize", "events_sliding_1h", "users_with_custkey",
    "custkeys_without_events", "priority_top3_orders", "priority_price_median",
    "top_users_by_events", "events_hopping",
    "docs_above_median_words", "funnel_view_purchase", "events_value_stats",
    "user_distinct_types", "user_top_type", "docs_global_sample",
    "events_user_zscore", "doc_dup_ngrams", "contaminated_train_bloom",
    "cust_orders_skew", "docs_mixture_epochs", "hour_top_types",
    "doc_dup_spans", "orders_percent_rank", "term_postings",
    "part_name_lev", "events_by_dow", "doc_bigrams_top20_sketch",
    "video_frame_features", "user_value_extremes",
])
def test_query_vs_duckdb(ray_session, con, name):
    import __ray_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    assert name in queries and name in oracles
    ray_df = _to_df(queries[name](SF_DIR))
    sql_df = con.execute(oracles[name]).fetchdf()
    _compare(name, ray_df, sql_df)


def test_semi_anti_join_fallback_parity(ray_session):
    """The broadcast key-set path and the distributed left_semi /
    left_anti hash-join path must produce identical rows (VERDICT
    next-round item 4: the large-side fallback is wired and tested)."""
    import ray.data

    from kgray import ops

    cust = ray.data.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ev = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])

    def rows(ds):
        return sorted(map(tuple, _to_df(ds).itertuples(index=False)))

    for fn in (ops.semi_join, ops.anti_join):
        bcast = fn(cust, "c_custkey", ev, "user_id", broadcast_max_keys=10**9)
        joined = fn(cust, "c_custkey", ev, "user_id", broadcast_max_keys=0)
        assert rows(bcast) == rows(joined), fn.__name__
    for fn in (ops.intersect_keys, ops.except_keys):
        bcast = fn(cust, "c_custkey", ev, "user_id", broadcast_max_keys=10**9)
        joined = fn(cust, "c_custkey", ev, "user_id", broadcast_max_keys=0)
        assert rows(bcast) == rows(joined), fn.__name__


def test_every_oracle_has_query():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o.keys()) <= set(q.keys())


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count()
    assert n > 0
    assert {"subj", "pred", "obj", "bucket"} <= set(ds.schema().names)


def test_kg_queries_run(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    assert q["kg_mentions"](SF_DIR).count() > 0
    assert q["kg_canonical"](SF_DIR).count() > 0


def test_rows_only_queries_run(ray_session):
    """Every non-oracled query must at least run and return a typed,
    possibly-empty result (the driver records a rows-only check)."""
    import pyarrow as pa

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    rows_only = sorted(
        set(q) - set(o) - {"kg_triples", "kg_mentions", "kg_canonical", "kg_stats"}
    )
    for name in rows_only:
        res = q[name](SF_DIR)
        df = _to_df(res)
        assert df is not None, name
        if isinstance(res, pa.Table):
            assert res.schema.names, name  # typed even when empty


def test_group_median_hist_parity(ray_session):
    """The two-pass counting-quantile path (large-group scale path)
    must equal the exact numpy path row for row, including even-count
    (lo+hi)/2 interpolation (VERDICT r2 task 5)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kgray import ops

    # sf orders: real data parity across both plans
    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"k": b["o_orderpriority"], "v": ops.cents(b["o_totalprice"])}
        )

    prepped = orders.map_batches(prep, batch_format="pyarrow")
    exact = _to_df(ops.group_median(prepped, "k", "v", "m", mode="exact"))
    hist = _to_df(ops.group_median(prepped, "k", "v", "m", mode="hist"))
    key = ["k"]
    exact = exact.sort_values(key, ignore_index=True)
    hist = hist.sort_values(key, ignore_index=True)
    assert exact.equals(hist)

    # synthetic outsized group with heavy value repetition (the regime
    # the histogram path exists for) + both parities vs numpy, odd/even
    rng = np.random.default_rng(3)
    for n in (4999, 5000):
        vals = rng.integers(0, 50, size=n).astype("int64")  # few distinct
        t = pa.table({"k": pa.array(["g"] * n), "v": pa.array(vals)})
        out = _to_df(
            ops.group_median(
                ray.data.from_arrow(t), "k", "v", "m", mode="hist"
            )
        )
        assert out["m"].iloc[0] == float(np.median(vals)), n
    # auto mode takes the hist path above the row gate
    t = pa.table({"k": pa.array(["g"] * 10), "v": pa.array(range(10), type=pa.int64())})
    out = _to_df(
        ops.group_median(ray.data.from_arrow(t), "k", "v", "m", rows=10**9)
    )
    assert out["m"].iloc[0] == 4.5


def test_asof_join_salted_parity(ray_session):
    """The hot-key-salted as-of join (shuffle on (key, time-bucket) +
    per-key carry of the last earlier right row) must equal the
    unsalted per-key merge_asof row for row (VERDICT r2 task 5)."""
    import pyarrow.compute as pc
    import ray.data

    from kgray import ops

    ev = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )

    def split(et):
        return ev.map_batches(
            lambda b, et=et: b.filter(pc.equal(b["event_type"], et)).drop_columns(
                ["event_type"]
            ),
            batch_format="pyarrow",
        )

    left, right = split("click"), split("purchase")
    base = _to_df(ops.asof_join(left, right, key="user_id", ts="ts"))
    # small bucket (1h) => many buckets per user => carries exercised
    salted = _to_df(
        ops.asof_join_salted(
            split("click"), split("purchase"), key="user_id", ts="ts",
            bucket_seconds=3600,
        )
    )
    cols = sorted(base.columns)
    assert sorted(c for c in salted.columns if c != "_bkt") == cols
    a = base[cols].sort_values(cols, ignore_index=True).astype(str)
    b = salted[cols].sort_values(cols, ignore_index=True).astype(str)
    assert a.equals(b), (len(a), len(b))


def test_kg_stats_matches_reference(ray_session, oracle_result):
    """kg_stats (triples per predicate over the flagship output) ==
    the independent sequential reference's per-predicate triple counts
    (VERDICT r2 task 7: evidence beyond rows>=0 for kg_stats)."""
    from collections import Counter

    import __ray_entry__ as e

    stats = _to_df(e.queries()["kg_stats"](SF_DIR))
    golden_preds = oracle_result["triples"]["pred"].to_pylist()
    want = dict(Counter(golden_preds))
    got = dict(zip(stats["pred"], stats["n"]))
    assert got == want


def test_multimodal_matches_independent_expected(ray_session, con):
    """multimodal_features == the independent sequential expected table
    (its new DuckDB oracle — VERDICT r2 task 7): via the real SQL at
    the driver scale (n=500), and directly at the test scale (n=100)."""
    import __ray_entry__ as e

    sqls = e.oracle_sql()  # writes the expected parquet
    ray_df = _to_df(e.queries()["multimodal_features"]("/root/testdata/sf0.01"))
    sql_df = con.execute(sqls["multimodal_features"]).fetchdf()
    _compare("multimodal_features", ray_df, sql_df)

    from kgray.extras import multimodal

    ray_small = _to_df(e.queries()["multimodal_features"](SF_DIR))
    exp_small = multimodal.expected_features_table(100).to_pandas()
    _compare("multimodal_features@100", ray_small, exp_small)


def test_group_quantile_disc_hist_parity(ray_session):
    """group_quantile_disc's histogram scale path must equal the exact
    per-group path, and both must follow QUANTILE_DISC's
    ceil(q*n)-1 index convention."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kgray import ops

    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"k": b["o_orderpriority"], "v": ops.cents(b["o_totalprice"])}
        )

    prepped = orders.map_batches(prep, batch_format="pyarrow")
    for q in (0.25, 0.5, 0.9):
        exact = _to_df(
            ops.group_quantile_disc(prepped, "k", "v", q, "p", mode="exact")
        ).sort_values(["k"], ignore_index=True)
        hist = _to_df(
            ops.group_quantile_disc(prepped, "k", "v", q, "p", mode="hist")
        ).sort_values(["k"], ignore_index=True)
        assert exact.equals(hist), q

    # index convention vs a sequential definition, incl. tiny groups
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 30, size=4999).astype("int64")
    t = pa.table({"k": pa.array(["g"] * len(vals)), "v": pa.array(vals)})
    for q in (0.1, 0.9):
        want = np.sort(vals)[int(np.ceil(q * len(vals))) - 1]
        for mode in ("exact", "hist"):
            out = _to_df(
                ops.group_quantile_disc(
                    ray.data.from_arrow(t), "k", "v", q, "p", mode=mode
                )
            )
            assert out["p"].iloc[0] == want, (q, mode)


def test_event_type_guard():
    """The pivot-family static-column guard fails loudly on unknown
    types and tolerates nulls/known values (no Ray needed)."""
    import pyarrow as pa
    import pytest

    from kgray.queries import _assert_known_event_types

    _assert_known_event_types(pa.array(["click", "view", None]))
    with pytest.raises(ValueError, match="login"):
        _assert_known_event_types(pa.array(["click", "login"]))
