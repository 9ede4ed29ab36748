"""Driver-checked operator queries (SURVEY.md §2) + DuckDB oracles.

Every SQL-expressible operator has a `QUERIES[name](sf_dir)` callable
returning a Dataset / pyarrow Table and a matching `ORACLE_SQL[name]`
string; column names match exactly (the driver sorts columns by name
and value-hashes). Non-SQL ops (the KG pipeline itself, sketch-based
dedup, …) have no oracle entry → rows-only check.

Float determinism: aggregate money as exact int64 cents
(`ops.cents`), keep sums integer, and derive any ratio with a single
identical division on both sides — floating SUM order differs between
Ray and DuckDB, integer SUM does not.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Sum

from . import ops

# join partition counts are derived from the live cluster at call time:
# ops.default_join_partitions() = max(8, CPUs // 4), env-overridable via
# KGRAY_JOIN_PARTITIONS (VERDICT r3 #9; 2x-CPUs measured 3.3x slower on
# small joins — aggregator actor startup dominates)


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _one_row(**cols) -> pa.Table:
    return pa.table({k: pa.array([v], type=pa.int64()) for k, v in cols.items()})


# ---------------------------------------------------------------------------
# A2/A3: grouped aggregate with per-batch combiner semantics (TPC-H Q1 shape)

def q_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        disc_cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": b["l_quantity"],
                "base_cents": ops.cents(b["l_extendedprice"]),
                "disc_cents": pa.array(disc_cents, type=pa.int64()),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sums=[("qty", "sum_qty"), ("base_cents", "sum_base_cents"), ("disc_cents", "sum_disc_cents")],
        count_alias="count_order",
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# J1: broadcast dimension join customer x nation x region

def q_region_stats(sf_dir: str):
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"c_nationkey": b["c_nationkey"], "bal_cents": ops.cents(b["c_acctbal"])}
        )

    joined = ops.broadcast_join(
        cust.map_batches(prep, batch_format="pyarrow"),
        dim.select(["n_nationkey", "r_name"]),
        keys=["c_nationkey"],
        right_keys=["n_nationkey"],
    )
    return ops.grouped_sum_count(
        joined,
        keys=["r_name"],
        sums=[("bal_cents", "sum_bal_cents")],
        count_alias="n_customers",
    )


SQL_REGION_STATS = """
SELECT r_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_bal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# J2: large-large hash-partitioned join (Ray Data native Dataset.join)

def q_segment_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "total_cents": ops.cents(b["o_totalprice"])}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = ops.normalize_blocks(
        ops.hash_join(
            orders.map_batches(prep, batch_format="pyarrow"),
            cust,
            on=("o_custkey",),
            right_on=("c_custkey",),
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("total_cents", pa.int64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    return ops.grouped_sum_count(
        joined,
        keys=["c_mktsegment"],
        sums=[("total_cents", "sum_total_cents")],
        count_alias="n_orders",
    )


def q_orders_nation_leftjoin(sf_dir: str):
    """J2 outer variant: LEFT OUTER hash join — big orders kept even
    when their customer's nation is filtered out of the right side
    (unmatched rows carry NULL n_name). Distributed Ray-native join;
    per-nation counts so the result is small and NULL-bearing."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 400000.0)).drop_columns(
            ["o_totalprice"]
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    nation = nation.map_batches(
        lambda b: b.filter(pc.less(b["n_nationkey"], 10)), batch_format="pyarrow"
    )
    j1 = ops.normalize_blocks(
        ops.hash_join(
            orders, cust, on=("o_custkey",), right_on=("c_custkey",),
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
            ]
        ),
    )
    j2 = ops.normalize_blocks(
        ops.hash_join(
            j1, nation, on=("c_nationkey",), right_on=("n_nationkey",),
            join_type="left_outer", num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
                ("n_name", pa.string()),
            ]
        ),
    )
    # Ray's sort-based groupby cannot sort a NULL key (the whole point
    # of the outer join) — use the per-batch combiner + bounded merge
    # pattern instead (<= 26 groups; arrow's group_by handles nulls)
    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_name"]).aggregate([("o_orderkey", "count")])
        return pa.table({"n_name": g["n_name"], "cnt": g["o_orderkey_count"]})

    parts = ops.collect_table(
        j2.map_batches(partial, batch_size=None, batch_format="pyarrow"),
        schema=pa.schema([("n_name", pa.string()), ("cnt", pa.int64())]),
    )
    merged = parts.group_by(["n_name"]).aggregate([("cnt", "sum")])
    return pa.table({"n_name": merged["n_name"], "n_orders": merged["cnt_sum"]})


SQL_ORDERS_NATION_LEFTJOIN = """
SELECT n_name, COUNT(*) AS n_orders
FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 400000.0) o
JOIN customer ON o_custkey = c_custkey
LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10) n
  ON c_nationkey = n_nationkey
GROUP BY n_name
"""


SQL_SEGMENT_ORDERS = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# J3: semi / anti joins (auto: broadcast key set below the size gate,
# distributed left_semi/left_anti hash join above — ops.semi_join)

def q_custs_with_orders(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    sel = ops.semi_join(cust, "c_custkey", orders, "o_custkey")
    return ops.grouped_sum_count(sel, keys=["c_mktsegment"], sums=[], count_alias="n")


SQL_CUSTS_WITH_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q_custs_without_orders(sf_dir: str):
    """Anti join: customers with no high-value (>350k) order."""
    import pyarrow.compute as _pc

    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(_pc.greater(b["o_totalprice"], 350000.0)),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    sel = ops.anti_join(cust, "c_custkey", big, "o_custkey")
    return ops.grouped_sum_count(sel, keys=["c_mktsegment"], sums=[], count_alias="n")


SQL_CUSTS_WITHOUT_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
GROUP BY c_mktsegment
"""


# O2: global top-k

def q_top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ops.topk(ds, ["o_totalprice", "o_orderkey"], 10, descending=[True, False])


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# A5/U2: distinct

def q_distinct_user_event(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return ops.distinct(ds, ["user_id", "event_type"])


SQL_DISTINCT_USER_EVENT = "SELECT DISTINCT user_id, event_type FROM events"


# F1/M6: vectorized string functions

def q_string_funcs(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def f(b: pa.Table) -> pa.Table:
        name = b["c_name"]
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "name_lower": pc.utf8_lower(name),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "digits": pc.replace_substring_regex(name, pattern="[^0-9]", replacement=""),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_STRING_FUNCS = """
SELECT c_custkey, LOWER(c_name) AS name_lower,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       REGEXP_REPLACE(c_name, '[^0-9]', '', 'g') AS digits
FROM customer
"""


# F3: date functions + grouped agg

def q_orders_by_year(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                "total_cents": ops.cents(b["o_totalprice"]),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(f, batch_format="pyarrow"),
        keys=["year"],
        sums=[("total_cents", "sum_total_cents")],
        count_alias="n_orders",
    )


SQL_ORDERS_BY_YEAR = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders GROUP BY 1
"""


# F6: json extraction

def q_json_props(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def f(b: pa.Table) -> pa.Table:
        ks = []
        for p in b["props"].to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except Exception:
                v = None
            ks.append(v if isinstance(v, int) else None)
        return pa.table({"event_type": b["event_type"], "k": pa.array(ks, type=pa.int64())})

    return ops.grouped_sum_count(
        ds.map_batches(f, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("k", "sum_k")],
        count_alias="n",
    )


SQL_JSON_PROPS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# A4: explicit salted two-phase aggregation (skew-aware)

def q_salted_events_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "value_cents": ops.cents(b["value"])}
        )

    return ops.salted_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("value_cents", "sum_value_cents")],
        count_alias="n",
        nsalt=16,
    )


SQL_SALTED_EVENTS_AGG = """
SELECT event_type,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# U1: union

def q_union_names(sf_dir: str):
    c = _read(sf_dir, "customer", ["c_name"]).rename_columns(["name"])
    s = _read(sf_dir, "supplier", ["s_name"]).rename_columns(["name"])
    return _one_row(n=c.union(s).count())


SQL_UNION_NAMES = """
SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
(SELECT c_name AS name FROM customer UNION ALL SELECT s_name FROM supplier)
"""


# streaming-shaped: tumbling window counts (groupby on truncated ts)

def q_events_tumbling_hour(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(b["ts"], unit="hour"),
                "event_type": b["event_type"],
                "value_cents": ops.cents(b["value"]),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(f, batch_format="pyarrow"),
        keys=["window_start", "event_type"],
        sums=[("value_cents", "sum_value_cents")],
        count_alias="n",
    )


SQL_EVENTS_TUMBLING_HOUR = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


# M3/F5: explode (flat map) + re-aggregate

def q_doc_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        mask = pc.greater(pc.utf8_length(flat), 3)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(parent.filter(mask)),
                "tok": flat.filter(mask),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(explode, batch_format="pyarrow"),
        keys=["doc_id"],
        sums=[],
        count_alias="n_tokens",
    )


SQL_DOC_TOKEN_COUNTS = """
SELECT doc_id, CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 3)) AS BIGINT) AS n_tokens
FROM documents
WHERE LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 3)) > 0
"""


# exact text dedup count

def q_distinct_texts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["text"])
    return _one_row(n_unique=ops.distinct(ds, ["text"]).count())


SQL_DISTINCT_TEXTS = "SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique FROM documents"


# token counting via regex (BPE-ish word/number split)

def q_doc_regex_tokens(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            b["text"].combine_chunks(), "[A-Za-z]+|[0-9]+"
        )
        return pa.table(
            {"doc_id": b["doc_id"], "n_word_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_DOC_REGEX_TOKENS = """
SELECT doc_id, CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+')) AS BIGINT) AS n_word_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# KG pipeline queries (non-SQL -> rows-only driver check)

def _kg_scale(sf_dir: str) -> str:
    if "0.001" in sf_dir:
        return "tiny"
    if "0.1" in sf_dir:
        return "bench"
    return "smoke"


def _kg_blocks() -> int:
    import ray

    return 4 * max(4, int(ray.cluster_resources().get("CPU", 8)))


def q_kg_triples(sf_dir: str):
    from . import fixtures, pipeline

    return pipeline.flagship(
        fixtures.corpus_path(_kg_scale(sf_dir)),
        fixtures.vocab_path(),
        override_num_blocks=_kg_blocks(),
    )


def q_kg_mentions(sf_dir: str):
    from . import fixtures, pipeline

    corpus = pipeline.read_corpus(
        fixtures.corpus_path(_kg_scale(sf_dir)), override_num_blocks=_kg_blocks()
    )
    return pipeline.build_mentions(corpus, with_sha=False)


def q_kg_canonical(sf_dir: str):
    from . import fixtures, pipeline
    from .canonicalize import canonical_table

    corpus = pipeline.read_corpus(
        fixtures.corpus_path(_kg_scale(sf_dir)), override_num_blocks=_kg_blocks()
    )
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), fixtures.vocab_path()
    )
    return canonical_table(linked)


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "region_stats": q_region_stats,
    "segment_orders": q_segment_orders,
    "orders_nation_leftjoin": q_orders_nation_leftjoin,
    "custs_with_orders": q_custs_with_orders,
    "custs_without_orders": q_custs_without_orders,
    "top_orders": q_top_orders,
    "distinct_user_event": q_distinct_user_event,
    "string_funcs": q_string_funcs,
    "orders_by_year": q_orders_by_year,
    "json_props": q_json_props,
    "salted_events_agg": q_salted_events_agg,
    "union_names": q_union_names,
    "events_tumbling_hour": q_events_tumbling_hour,
    "doc_token_counts": q_doc_token_counts,
    "distinct_texts": q_distinct_texts,
    "doc_regex_tokens": q_doc_regex_tokens,
    "kg_triples": q_kg_triples,
    "kg_mentions": q_kg_mentions,
    "kg_canonical": q_kg_canonical,
}

ORACLE_SQL = {
    "pricing_summary": SQL_PRICING,
    "region_stats": SQL_REGION_STATS,
    "segment_orders": SQL_SEGMENT_ORDERS,
    "orders_nation_leftjoin": SQL_ORDERS_NATION_LEFTJOIN,
    "custs_with_orders": SQL_CUSTS_WITH_ORDERS,
    "custs_without_orders": SQL_CUSTS_WITHOUT_ORDERS,
    "top_orders": SQL_TOP_ORDERS,
    "distinct_user_event": SQL_DISTINCT_USER_EVENT,
    "string_funcs": SQL_STRING_FUNCS,
    "orders_by_year": SQL_ORDERS_BY_YEAR,
    "json_props": SQL_JSON_PROPS,
    "salted_events_agg": SQL_SALTED_EVENTS_AGG,
    "union_names": SQL_UNION_NAMES,
    "events_tumbling_hour": SQL_EVENTS_TUMBLING_HOUR,
    "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
    "distinct_texts": SQL_DISTINCT_TEXTS,
    "doc_regex_tokens": SQL_DOC_REGEX_TOKENS,
}


# ---------------------------------------------------------------------------
# Deduplication / similarity / text-analysis / multimodal operators
# (task-brief extras; SQL oracles where bit-determinism is achievable)


def q_dedup_exact_docs(sf_dir: str):
    from .extras import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.exact_dedup(ds, "text", "doc_id")


SQL_DEDUP_EXACT_DOCS = """
SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


# The near-dup queries build their whole graph (source read included)
# under the hash-shuffle context: pairs_from_buckets then uses keyed
# repartition + whole-block pair generation (~4x over the sort-based
# groupby at bench scale); outside the ctx the same functions fall
# back to the sort-based plan (both paths parity-tested).

def q_dedup_minhash_docs(sf_dir: str):
    from . import pipeline
    from .extras import dedup

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return dedup.minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)


def q_dedup_simhash_docs(sf_dir: str):
    from . import pipeline
    from .extras import dedup

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return dedup.simhash_pairs(ds, "text", "doc_id", max_hamming=3)


def q_ngram_jaccard_topk(sf_dir: str):
    from . import pipeline
    from .extras import dedup

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return dedup.ngram_jaccard_topk(ds, "text", "doc_id", k=20)


def _query_vectors(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as _pc

    ids = t["vec_id"].to_numpy()
    import numpy as _np

    mask = pa.array(_np.asarray(ids) % 100 == 0)
    return t.filter(mask)


def q_knn_search(sf_dir: str):
    from .extras import annsearch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = annsearch.knn_brute(ds, _query_vectors(sf_dir), k=10)
    return out.select(["query_id", "neighbor_id"])


SQL_KNN_SEARCH = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 100 = 0)
SELECT query_id, neighbor_id FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY ROUND(list_cosine_similarity(q.embedding, e.embedding), 4) DESC,
                     e.vec_id ASC) AS rn
  FROM q CROSS JOIN embeddings e
) WHERE rn <= 10
"""


def q_knn_lsh(sf_dir: str):
    from .extras import annsearch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return annsearch.knn_lsh(ds, _query_vectors(sf_dir), k=10)


def q_knn_ivf(sf_dir: str):
    from .extras import annsearch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return annsearch.knn_ivf(ds, _query_vectors(sf_dir), k=10)


def q_knn_ivf_indexed(sf_dir: str):
    """X21 production path made physical: build the cell-partitioned
    IVF index under /tmp, then search by reading ONLY the probed
    `cell=` directories (prune at the read). Identical results to
    `knn_ivf` by construction — the oracle is the same independent
    sketch-reference golden."""
    import tempfile

    from .extras import annsearch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    idx = tempfile.mkdtemp(prefix="kgray_ivf_", dir="/tmp")
    annsearch.ivf_index_build(ds, idx)
    return annsearch.knn_ivf_indexed(idx, _query_vectors(sf_dir))


def q_embedding_dup_pairs(sf_dir: str):
    from . import pipeline
    from .extras import annsearch

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        return annsearch.cosine_dup_pairs(ds, threshold=0.95)


def q_langid_docs(sf_dir: str):
    from .extras import textstats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.langid(ds)


def q_doc_quality(sf_dir: str):
    from .extras import textstats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.quality(ds)


# explicit ASCII character classes mirror the engine's compiled
# patterns exactly (Python \w/\s are Unicode-aware, RE2's are not);
# a zero denominator divides to NULL on both sides
SQL_DOC_QUALITY = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^ \\t\\n\\r\\f]+')) AS BIGINT) AS n_words,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^0-9A-Za-z_ \\t\\n\\r\\f]')) AS BIGINT) AS n_punct,
       CAST(LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(LOWER(text), '[^ \\t\\n\\r\\f]+'),
            x -> x IN ('the','and','of','to','a','in','is','that','for','with'))) AS BIGINT) AS n_stopwords,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^0-9A-Za-z_ \\t\\n\\r\\f]')) AS DOUBLE) / LENGTH(text) AS punct_ratio,
       CAST(LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(LOWER(text), '[^ \\t\\n\\r\\f]+'),
            x -> x IN ('the','and','of','to','a','in','is','that','for','with'))) AS DOUBLE)
         / LEN(REGEXP_EXTRACT_ALL(text, '[^ \\t\\n\\r\\f]+')) AS stopword_ratio
FROM documents
"""


# language-ID oracle: replicates _detect's sequential argmax (first
# profile reaching the max wins; dict order en, de, es, fr; strict >
# to replace) over DISTINCT lowercase [a-z]+ tokens. The CJK charset
# branch is unreachable on the ASCII testdata (verified) and is
# intentionally not mirrored in SQL.
def _langid_sql(table: str = "documents") -> str:
    profiles = {
        "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
        "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
        "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
        "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    }
    counts = ",\n    ".join(
        f"LEN(LIST_FILTER(toks, x -> x IN {p})) AS n_{lang}"
        for lang, p in profiles.items()
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS toks
  FROM {table}
), cnt AS (
  SELECT doc_id,
    {counts}
  FROM tok
)
SELECT doc_id,
  CASE WHEN n_fr > n_en AND n_fr > n_de AND n_fr > n_es THEN 'fr'
       WHEN n_es > n_en AND n_es > n_de THEN 'es'
       WHEN n_de > n_en THEN 'de'
       WHEN n_en > 0 THEN 'en'
       ELSE 'und' END AS lang_pred
FROM cnt
"""


SQL_LANGID_DOCS = _langid_sql()


def q_doc_fingerprint(sf_dir: str):
    from .extras import textstats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.fingerprint(ds)


# rolling-min fingerprint oracle: the same polynomial window hash
# (mod 2^31-1 over codepoints) written out as plain BIGINT arithmetic;
# md5 for the full-text hash. Coefficients match textstats._PMW.
def _fingerprint_sql() -> str:
    from .extras.textstats import FP_MOD, FP_WINDOW, _PMW

    win_terms = " + ".join(
        f"CAST(ORD(SUBSTR(text, i+{j}, 1)) AS BIGINT) * {int(_PMW[j])}"
        for j in range(FP_WINDOW)
    )
    # short texts (n <= window) hash whole: coefficient for 1-based
    # position j is base^(n-j) mod m = pmrev[n-j+1] (1-based list)
    pmrev = [int(p) for p in _PMW[::-1]]
    return f"""
SELECT doc_id,
  CAST(
    CASE
      WHEN LENGTH(text) = 0 THEN 0
      WHEN LENGTH(text) <= {FP_WINDOW} THEN
        LIST_SUM([CAST(ORD(SUBSTR(text, j, 1)) AS BIGINT) * ({pmrev}[LENGTH(text) - j + 1])
                  for j in RANGE(1, LENGTH(text) + 1)]) % {FP_MOD}
      ELSE
        LIST_MIN([({win_terms}) % {FP_MOD}
                  for i in RANGE(1, LENGTH(text) - {FP_WINDOW - 2})])
    END AS BIGINT) AS fingerprint,
  MD5(text) AS text_md5
FROM documents
"""


SQL_DOC_FINGERPRINT = _fingerprint_sql()


def q_multimodal_features(sf_dir: str):
    """Binary-column plumbing demo: deterministic fake-image fixture ->
    metadata peek + actor-pool featurize (decode stubbed for real
    codecs; see extras/multimodal.py)."""
    import ray.data as _rd

    from .extras import multimodal

    n = 500 if "0.01" in sf_dir else (2000 if "0.1" in sf_dir else 100)
    ds = _rd.from_arrow(multimodal.make_image_table(n))
    feats = multimodal.featurize_images(ds, batch_size=64)

    def flatten(b: pa.Table) -> pa.Table:
        import numpy as _np

        norms = [
            round(float(_np.linalg.norm(_np.asarray(v))), 4) if v is not None else 0.0
            for v in b["feature"].to_pylist()
        ]
        return pa.table(
            {
                "img_id": b["img_id"],
                "decode_ok": b["decode_ok"],
                "feat_norm": pa.array(norms, type=pa.float64()),
            }
        )

    meta = multimodal.image_metadata(ds)
    # distributed merge (hash join on img_id), not a driver-side
    # pandas merge — only the final bounded result is collected
    joined = ops.hash_join(
        meta,
        feats.map_batches(flatten, batch_format="pyarrow"),
        on=("img_id",),
        num_partitions=ops.default_join_partitions(),
    )
    return ops.collect_table(
        joined,
        schema=pa.schema(
            [
                ("img_id", pa.int64()),
                ("parsed_width", pa.int32()),
                ("parsed_height", pa.int32()),
                ("header_ok", pa.bool_()),
                ("payload_bytes", pa.int64()),
                ("decode_ok", pa.bool_()),
                ("feat_norm", pa.float64()),
            ]
        ),
        sort_by=["img_id"],
    )


# multimodal oracle: the metadata + feature columns are a
# deterministic function of the seeded fixture, so the query gets a
# real DuckDB oracle — an INDEPENDENT sequential implementation
# (multimodal.expected_features_table) writes the expected table to a
# parquet that the SQL reads. `__ray_entry__.oracle_sql()` calls
# `write_multimodal_expected()` so the file exists whenever the driver
# holds the SQL. n=500 matches q_multimodal_features at sf0.01 (the
# driver's correctness scale).
MULTIMODAL_ORACLE_PATH = "/tmp/kgray_oracle/multimodal_expected_500.parquet"


def write_multimodal_expected(n: int = 500) -> str:
    import os

    import pyarrow.parquet as pq

    from .extras import multimodal

    os.makedirs(os.path.dirname(MULTIMODAL_ORACLE_PATH), exist_ok=True)
    pq.write_table(multimodal.expected_features_table(n), MULTIMODAL_ORACLE_PATH)
    return MULTIMODAL_ORACLE_PATH


SQL_MULTIMODAL_FEATURES = (
    "SELECT img_id, parsed_width, parsed_height, header_ok, payload_bytes, "
    f"decode_ok, feat_norm FROM read_parquet('{MULTIMODAL_ORACLE_PATH}')"
)


def q_multimodal_png_features(sf_dir: str):
    """X52c: REAL-codec multimodal path (VERDICT r3 #7) — the seeded
    fixture images re-encoded as baseline PNG by the pure-stdlib
    encoder (filter type rotates img_id % 5 so every PNG scanline
    filter is exercised end to end), then decoded by the stdlib PNG
    decoder inside the actor-pool featurizer. Features are a function
    of the PIXELS only, so the oracle reuses the independent
    expected-features parquet that backs `multimodal_features`."""
    import ray.data as _rd

    from .extras import multimodal

    n = 500 if "0.01" in sf_dir else (2000 if "0.1" in sf_dir else 100)
    base = multimodal.make_image_table(n)

    def to_png(b: pa.Table) -> pa.Table:
        ids = b["img_id"].to_pylist()
        blobs = [
            multimodal.encode_png(
                multimodal.decode_image(blob, fmt), filter_type=i % 5
            )
            for i, blob, fmt in zip(
                ids, b["image"].to_pylist(), b["format"].to_pylist()
            )
        ]
        return pa.table(
            {
                "img_id": b["img_id"],
                "image": pa.array(blobs, pa.binary()),
                "format": pa.array(["png"] * len(blobs)),
            }
        )

    ds = _rd.from_arrow(base).map_batches(
        to_png, batch_size=64, batch_format="pyarrow"
    )
    feats = multimodal.featurize_images(ds, batch_size=64)

    def flatten(b: pa.Table) -> pa.Table:
        import numpy as _np

        norms = [
            round(float(_np.linalg.norm(_np.asarray(v))), 4)
            if v is not None
            else 0.0
            for v in b["feature"].to_pylist()
        ]
        return pa.table(
            {
                "img_id": b["img_id"],
                "decode_ok": b["decode_ok"],
                "feat_norm": pa.array(norms, type=pa.float64()),
            }
        )

    return ops.collect_table(
        feats.map_batches(flatten, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("img_id", pa.int64()),
                ("decode_ok", pa.bool_()),
                ("feat_norm", pa.float64()),
            ]
        ),
        sort_by=["img_id"],
    )


SQL_MULTIMODAL_PNG = (
    "SELECT img_id, decode_ok, feat_norm "
    f"FROM read_parquet('{MULTIMODAL_ORACLE_PATH}')"
)


QUERIES.update(
    {
        "dedup_exact_docs": q_dedup_exact_docs,
        "dedup_minhash_docs": q_dedup_minhash_docs,
        "dedup_simhash_docs": q_dedup_simhash_docs,
        "ngram_jaccard_topk": q_ngram_jaccard_topk,
        "knn_search": q_knn_search,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "knn_ivf_indexed": q_knn_ivf_indexed,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "langid_docs": q_langid_docs,
        "doc_quality": q_doc_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "multimodal_features": q_multimodal_features,
        "multimodal_png_features": q_multimodal_png_features,
    }
)

ORACLE_SQL.update(
    {
        "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
        "knn_search": SQL_KNN_SEARCH,
        "doc_quality": SQL_DOC_QUALITY,
        "langid_docs": SQL_LANGID_DOCS,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "multimodal_features": SQL_MULTIMODAL_FEATURES,
        "multimodal_png_features": SQL_MULTIMODAL_PNG,
    }
)


# ---------------------------------------------------------------------------
# Advanced relational operators: as-of join, session windows, set ops,
# per-group top-k, seeded sampling


def q_events_asof(sf_dir: str):
    """For each click event, the same user's most recent purchase at or
    before it (ops.asof_join: tagged union + per-key merge_asof)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])

    def split(et):
        return ev.map_batches(
            lambda b, et=et: b.filter(pc.equal(b["event_type"], et)).drop_columns(
                ["event_type"]
            ),
            batch_format="pyarrow",
        )

    left = split("click")
    right = split("purchase")
    out = ops.asof_join(left, right, key="user_id", ts="ts", right_suffix="_r")
    return out.map_batches(
        lambda b: b.rename_columns(
            [
                {"event_id": "click_id", "event_id_r": "purchase_id", "ts_r": "purchase_ts"}.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_ASOF = """
SELECT a.user_id, a.ts, a.event_id AS click_id,
       b.ts AS purchase_ts, b.event_id AS purchase_id
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def q_events_sessionize(sf_dir: str):
    """Session windows per user (gap > 4 hours starts a new session)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return ops.sessionize(ev, key="user_id", ts="ts", gap_seconds=4 * 3600)


SQL_EVENTS_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 4 HOUR OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
FROM sess GROUP BY user_id, session_idx
"""


def q_users_with_custkey(sf_dir: str):
    """U4 INTERSECT: distinct event users that are customer keys."""
    ev = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return ops.intersect_keys(ev, "user_id", cust, "c_custkey")


SQL_USERS_WITH_CUSTKEY = """
SELECT user_id FROM events INTERSECT SELECT c_custkey FROM customer
"""


def q_custkeys_without_events(sf_dir: str):
    """U4 EXCEPT: customer keys with no events."""
    ev = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return ops.except_keys(cust, "c_custkey", ev, "user_id")


SQL_CUSTKEYS_WITHOUT_EVENTS = """
SELECT c_custkey FROM customer EXCEPT SELECT user_id FROM events
"""


def q_priority_top3_orders(sf_dir: str):
    """O2 per-group top-k: top 3 orders by totalprice per priority."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    return ops.group_topk(
        ds, "o_orderpriority", ["o_totalprice", "o_orderkey"], 3, ascending=[False, True]
    )


SQL_PRIORITY_TOP3 = """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_events_sliding_1h(sf_dir: str):
    """Sliding-window aggregate (value-based RANGE frame): per event,
    the same user's event count in the trailing hour."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    return ops.sliding_window_count(
        ev, key="user_id", ts="ts", window_seconds=3600, carry=["event_id"]
    )


SQL_EVENTS_SLIDING_1H = """
SELECT user_id, ts, event_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS n_window
FROM events
"""


def q_priority_price_median(sf_dir: str):
    """Per-group median over integer cents (ops.group_median; auto
    mode — exact per-group numpy at this scale, two-pass counting
    quantile above the row gate; the raw read's footer count keeps the
    gate metadata-cheap)."""
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    n_rows = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": b["o_orderpriority"], "cents": ops.cents(b["o_totalprice"])}
        )

    return ops.group_median(
        ds.map_batches(prep, batch_format="pyarrow"),
        "o_orderpriority",
        "cents",
        "median_cents",
        rows=n_rows,
    )


SQL_PRIORITY_PRICE_MEDIAN = """
SELECT o_orderpriority,
       MEDIAN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS median_cents
FROM orders GROUP BY o_orderpriority
"""


def q_top_users_by_events(sf_dir: str):
    """Exact heavy hitters: top-20 users by event count
    (ops.frequent_items — combiner counts, global merge, sort+limit)."""
    ev = _read(sf_dir, "events", ["user_id"])
    return ops.frequent_items(ev, "user_id", 20)


SQL_TOP_USERS_BY_EVENTS = """
SELECT user_id, n FROM
  (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
ORDER BY n DESC, user_id ASC LIMIT 20
"""


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate (size 1 h, hop 15 min): each event
    belongs to 4 overlapping windows — vectorized explode (4 shifted
    copies of the 15-min-floored ts) + the standard combiner groupby.
    The overlap factor is constant, so the shuffle stays bounded."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def explode(b: pa.Table) -> pa.Table:
        base = pc.floor_temporal(b["ts"], multiple=15, unit="minute")
        parts = []
        for i in range(4):
            ws = pc.subtract(
                base, pa.scalar(15 * 60 * 1_000_000 * i, type=pa.duration("us"))
            )
            parts.append(
                pa.table(
                    {
                        "window_start": ws,
                        "event_type": b["event_type"],
                        "value_cents": ops.cents(b["value"]),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ops.grouped_sum_count(
        ds.map_batches(explode, batch_format="pyarrow"),
        keys=["window_start", "event_type"],
        sums=[("value_cents", "sum_value_cents")],
        count_alias="n",
    )


SQL_EVENTS_HOPPING = """
SELECT window_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS window_start,
         event_type, value
  FROM events, range(4) t(i)
)
GROUP BY 1, 2
"""


def q_sample_orders(sf_dir: str):
    """O3: seeded random sample (rows-only — RNG differs from SQL)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.random_sample(0.05, seed=42)


def q_sample_orders_det(sf_dir: str):
    """O3 scale form: deterministic content-hash 5% sample
    (ops.seeded_sample) — membership is a pure function of the key, so
    the sample is identical across cluster sizes / re-runs (resumable)
    and exactly SQL-expressible (HUGEINT splitmix64 oracle)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ops.seeded_sample(ds, "o_orderkey", num=1, den=20, seed=42)


def q_kg_stats(sf_dir: str):
    """A2 over the KG output: triples per predicate (statistics.py
    parity, SURVEY §2.5). The predicate vocabulary is tiny (6 values),
    so the right plan is a per-block combiner + a driver-side merge of
    the bounded (pred, count) partials — no shuffle at all. (A
    groupby here would also inherit the flagship plan's HASH_SHUFFLE
    context snapshot and spawn an aggregator fleet for 6 groups —
    observed stalling on small CPU budgets.)"""
    from . import fixtures, pipeline

    triples = pipeline.flagship(
        fixtures.corpus_path(_kg_scale(sf_dir)),
        fixtures.vocab_path(),
        override_num_blocks=_kg_blocks(),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["pred"]).aggregate([("subj", "count")])
        return g.select(["pred", "subj_count"])

    parts = ops.collect_table(
        triples.map_batches(partial, batch_size=None, batch_format="pyarrow"),
        schema=pa.schema([("pred", pa.string()), ("subj_count", pa.int64())]),
    )  # bounded: n_preds x n_blocks rows
    merged = parts.group_by(["pred"]).aggregate([("subj_count", "sum")])
    out = pa.table(
        {"pred": merged["pred"], "n": merged["subj_count_sum"]}
    ).sort_by("pred")
    return out


QUERIES.update(
    {
        "events_asof": q_events_asof,
        "events_sessionize": q_events_sessionize,
        "events_sliding_1h": q_events_sliding_1h,
        "priority_price_median": q_priority_price_median,
        "top_users_by_events": q_top_users_by_events,
        "events_hopping": q_events_hopping,
        "users_with_custkey": q_users_with_custkey,
        "custkeys_without_events": q_custkeys_without_events,
        "priority_top3_orders": q_priority_top3_orders,
        "sample_orders": q_sample_orders,
        "sample_orders_det": q_sample_orders_det,
        "kg_stats": q_kg_stats,
    }
)

ORACLE_SQL["sample_orders_det"] = ops.seeded_sample_sql(
    "orders", "o_orderkey", ["o_orderkey", "o_totalprice"], num=1, den=20, seed=42
)

ORACLE_SQL.update(
    {
        "events_asof": SQL_EVENTS_ASOF,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_sliding_1h": SQL_EVENTS_SLIDING_1H,
        "priority_price_median": SQL_PRIORITY_PRICE_MEDIAN,
        "top_users_by_events": SQL_TOP_USERS_BY_EVENTS,
        "events_hopping": SQL_EVENTS_HOPPING,
        "users_with_custkey": SQL_USERS_WITH_CUSTKEY,
        "custkeys_without_events": SQL_CUSTKEYS_WITHOUT_EVENTS,
        "priority_top3_orders": SQL_PRIORITY_TOP3,
    }
)


def q_kg_canonical_salted(sf_dir: str):
    """A4: the explicitly salted two-phase canonicalization (north_star
    skew handling); same output as kg_canonical by construction."""
    from . import fixtures, pipeline
    from .canonicalize import canonical_table_salted

    corpus = pipeline.read_corpus(
        fixtures.corpus_path(_kg_scale(sf_dir)), override_num_blocks=_kg_blocks()
    )
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), fixtures.vocab_path()
    )
    return canonical_table_salted(linked, nsalt=16)


QUERIES["kg_canonical_salted"] = q_kg_canonical_salted


def q_kg_canonical_fuzzy(sf_dir: str):
    """U3 near-dedup in full: normalized-key blocking + in-group fuzzy
    merge (variant spellings fold into the dominant one; engine ==
    independent sequential reference, tested)."""
    from . import fixtures, pipeline
    from .canonicalize import canonical_table_fuzzy

    corpus = pipeline.read_corpus(
        fixtures.corpus_path(_kg_scale(sf_dir)), override_num_blocks=_kg_blocks()
    )
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), fixtures.vocab_path()
    )
    return canonical_table_fuzzy(linked)


QUERIES["kg_canonical_fuzzy"] = q_kg_canonical_fuzzy


# ---------------------------------------------------------------------------
# Golden-parquet DuckDB oracles for the KG pipeline (shrinks the
# no_oracle tail, VERDICT r2 task 7). The goldens are produced by the
# INDEPENDENT sequential implementation (reference_impl/oracle.py —
# different code shape from the engine) over the deterministic seeded
# smoke fixture, which is exactly what `_kg_scale` maps the driver's
# correctness scale (sf0.01) to. Committed at tests/golden/ and
# regenerable with `python tools/make_goldens.py` (asserts bit-
# stability against the committed files).

_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)

SQL_KG_TRIPLES = (
    "SELECT subj, pred, obj, bucket "
    f"FROM read_parquet('{_GOLDEN_DIR}/smoke_triples.parquet')"
)

SQL_KG_STATS = (
    "SELECT pred, COUNT(*) AS n "
    f"FROM read_parquet('{_GOLDEN_DIR}/smoke_triples.parquet') "
    "GROUP BY pred ORDER BY pred"
)

SQL_KG_CANONICAL_FUZZY = (
    "SELECT mention_type, block, norm, n_mentions, n_variants, "
    "canonical_uri, dbpedia_id, viaf_id, europeana_id "
    f"FROM read_parquet('{_GOLDEN_DIR}/smoke_canonical_fuzzy.parquet')"
)

SQL_KG_MENTIONS = (
    "SELECT doc_key, work_uri, mention_type, surface, norm "
    f"FROM read_parquet('{_GOLDEN_DIR}/smoke_mentions.parquet')"
)

# kg_canonical_salted produces EXACTLY the same table as kg_canonical
# (two-phase salted vs combiner groupby; parity-asserted in pytest),
# so both share the one reference golden.
SQL_KG_CANONICAL = (
    "SELECT mention_type, norm, n_mentions, canonical_uri, "
    "dbpedia_id, viaf_id, europeana_id "
    f"FROM read_parquet('{_GOLDEN_DIR}/smoke_canonical.parquet')"
)

ORACLE_SQL.update(
    {
        "kg_triples": SQL_KG_TRIPLES,
        "kg_stats": SQL_KG_STATS,
        "kg_canonical_fuzzy": SQL_KG_CANONICAL_FUZZY,
        "kg_mentions": SQL_KG_MENTIONS,
        "kg_canonical": SQL_KG_CANONICAL,
        "kg_canonical_salted": SQL_KG_CANONICAL,
    }
)


def q_dedup_remove_docs(sf_dir: str):
    """Near-duplicate REMOVAL over documents: MinHash+LSH pairs ->
    connected components -> keep each component's minimum doc_id
    (dedup.minhash_dedup_docs). The oracle computes the components in
    SQL (recursive CTE min-label propagation) from the independent
    sequential reference's pair golden."""
    from . import pipeline
    from .extras import dedup

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        out = dedup.minhash_dedup_docs(ds, "text", "doc_id", threshold=0.5)
        return out.select_columns(["doc_id", "n_chars"])


QUERIES["dedup_remove_docs"] = q_dedup_remove_docs


def q_doc_salient_terms(sf_dir: str):
    """X26: per-doc salient terms (a TF-IDF variant): tf over
    whitespace tokens, global document frequency, score = tf/df —
    rational arithmetic whose IEEE division rounds identically in
    numpy/arrow and DuckDB, so the oracle bit-matches with no cents
    trick — top-3 terms per doc by (score desc, token asc).

    Plan shape (scale-first): vectorized explode
    (utf8_split_whitespace + list_flatten/parent_indices; a doc never
    spans batches so tf is exact in-batch), two-phase df groupby
    (per-batch partial counts, then a vocab-sized merge), the df table
    broadcast once below ops.BROADCAST_MAX_KEYS (hash join above),
    per-group top-k via ops.group_topk."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_batch(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(b["text"].combine_chunks())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        t = pa.table({"i": parent, "token": flat}).filter(pc.not_equal(flat, ""))
        g = t.group_by(["i", "token"]).aggregate([("i", "count")])
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(g["i"]),
                "token": g["token"],
                "tf": g["i_count"],
            }
        )

    tf_ds = ds.map_batches(tf_batch, batch_format="pyarrow")

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("token").aggregate([("doc_id", "count")])
        return pa.table({"token": g["token"], "df_part": g["doc_id_count"]})

    df_ds = (
        tf_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("df_part", alias_name="df"))
        .materialize()  # vocab-sized, reused by the gate and the join
    )
    n_vocab = df_ds.count()

    if n_vocab <= ops.BROADCAST_MAX_KEYS:
        vocab_tbl = ops.collect_table(
            df_ds, schema=pa.schema([("token", pa.string()), ("df", pa.int64())])
        )
        vref = _ray.put(
            (vocab_tbl["token"].combine_chunks(), vocab_tbl["df"].combine_chunks())
        )

        def score_bcast(b: pa.Table) -> pa.Table:
            vtok, vdf = _ray.get(vref)
            pos = pc.index_in(b["token"].combine_chunks(), value_set=vtok)
            dfv = vdf.take(pos)
            score = pc.divide(
                pc.cast(b["tf"], pa.float64()), pc.cast(dfv, pa.float64())
            )
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "token": b["token"],
                    "tf": b["tf"],
                    "df": dfv,
                    "score": score,
                }
            )

        scored = tf_ds.map_batches(score_bcast, batch_format="pyarrow")
    else:
        joined = ops.normalize_blocks(
            ops.hash_join(tf_ds, df_ds, on=("token",), right_on=("token",)),
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("token", pa.string()),
                    ("tf", pa.int64()),
                    ("df", pa.int64()),
                ]
            ),
        )

        def score_joined(b: pa.Table) -> pa.Table:
            score = pc.divide(
                pc.cast(b["tf"], pa.float64()), pc.cast(b["df"], pa.float64())
            )
            return b.select(["doc_id", "token", "tf", "df"]).append_column(
                "score", score
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")

    top = ops.group_topk(scored, "doc_id", ["score", "token"], 3, [False, True])
    return top.select_columns(["doc_id", "token", "tf", "df", "score", "rn"])


SQL_DOC_SALIENT_TERMS = """
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t(tok)
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df, tf.tf / df.df AS score,
         ROW_NUMBER() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf / df.df DESC, tf.token ASC) AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df, score, rn FROM scored WHERE rn <= 3
"""

QUERIES["doc_salient_terms"] = q_doc_salient_terms
ORACLE_SQL["doc_salient_terms"] = SQL_DOC_SALIENT_TERMS


# The sketch/ANN family's goldens come from reference_impl/sketch.py —
# sequential dict-and-loop implementations of each operator's spec
# (hash family + banding + exact verify) over the driver's sf0.01
# tables, no kgray pipeline code. The ngram reference additionally
# verifies ALL banded candidates (no estimate prefilter), so it checks
# the engine's prefilter-superset claim, not just its arithmetic.
ORACLE_SQL.update(
    {
        "dedup_minhash_docs": "SELECT a, b, jaccard "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_minhash.parquet')",
        "dedup_simhash_docs": "SELECT a, b, hamming "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_simhash.parquet')",
        "ngram_jaccard_topk": "SELECT a, b, jaccard "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_ngram_topk.parquet')",
        "knn_lsh": "SELECT query_id, neighbor_id, cos "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_knn_lsh.parquet')",
        "knn_ivf": "SELECT query_id, neighbor_id, cos "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_knn_ivf.parquet')",
        # the indexed variant returns identical results by construction
        "knn_ivf_indexed": "SELECT query_id, neighbor_id, cos "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_knn_ivf.parquet')",
        "embedding_dup_pairs": "SELECT a, b, cos "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_embedding_dup_pairs.parquet')",
        # components computed IN SQL (recursive min-label propagation)
        # from the reference pair golden; removal joins the live view
        "dedup_remove_docs": f"""
WITH RECURSIVE sym AS (
  SELECT a AS src, b AS tgt
  FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_minhash.parquet')
  UNION ALL
  SELECT b, a FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_minhash.parquet')
),
comp(id, lbl) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT s.tgt, c.lbl FROM comp c JOIN sym s ON s.src = c.id
),
drops AS (SELECT id FROM comp GROUP BY id HAVING MIN(lbl) < id)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM drops)
""",
    }
)


# X40/X41: distributed full-corpus k-means (Lloyd) and SemDeDup-style
# semantic near-dedup (kgray/extras/cluster.py). Deterministic by an
# int64 quantization grid (exact centroid sums regardless of block
# layout); goldens from the sequential twins reference_impl/sketch.py
# run_kmeans / run_semdedup (parity is bit-exact, tested).


def q_kmeans_embeddings(sf_dir: str):
    from .extras import cluster

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = cluster.kmeans_fit(ds, k=10, iters=8)
    return cluster.kmeans_assign(ds, cents)


def q_semdedup_embeddings(sf_dir: str):
    from .extras import cluster

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cluster.semdedup(ds, k=10, iters=8, theta=0.35)


QUERIES["kmeans_embeddings"] = q_kmeans_embeddings
QUERIES["semdedup_embeddings"] = q_semdedup_embeddings


# X42: global-quantile filter — keep documents at or above the exact
# global median word count. Composition: narrow score projection ->
# ops.global_quantile_disc (value-count combiner, O(distinct) shuffle,
# NO corpus sort) -> threshold broadcast into a map-side filter. The
# scored projection is materialized once (2 int64 columns) so the
# quantile pass and the filter pass don't recompute the split kernel.


def q_docs_above_median_words(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        nw = pc.list_value_length(
            pc.split_pattern(b["text"].combine_chunks(), " ")
        ).cast(pa.int64())
        return pa.table({"doc_id": b["doc_id"], "n_words": nw})

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    thr = ops.global_quantile_disc(scored, "n_words", q=0.5)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_words"], pa.scalar(thr)))

    return scored.map_batches(keep, batch_size=None, batch_format="pyarrow")


QUERIES["docs_above_median_words"] = q_docs_above_median_words


# X43: event-sequence funnel (view -> purchase within 1 hour). The
# MATCH_RECOGNIZE-ish sequence analytic: per user, how many 'view'
# events were followed by a 'purchase' of the SAME user within the
# window. Pre-filter to the two event types at the read (the groupby
# shuffles only the funnel-relevant rows), then one vectorized
# searchsorted pass per user group — no self-join explosion.


def q_funnel_view_purchase(sf_dir: str):
    import pandas as pd

    H_NS = 3_600 * 10**9

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
        lambda b: b.filter(
            pc.is_in(b["event_type"], value_set=pa.array(["view", "purchase"]))
        ),
        batch_size=None,
        batch_format="pyarrow",
    )

    def per_user(df: "pd.DataFrame") -> "pd.DataFrame":
        ts = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        is_view = (df["event_type"] == "view").to_numpy()
        vts = ts[is_view]
        if len(vts) == 0:
            return pd.DataFrame({"user_id": [], "n_views": [], "n_conv": []})
        pur = np.sort(ts[~is_view])
        lo = np.searchsorted(pur, vts, side="right")  # first purchase > v.ts
        hi = np.searchsorted(pur, vts + H_NS, side="right")  # <= v.ts + 1h
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "n_views": [len(vts)],
                "n_conv": [int((hi > lo).sum())],
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    return out.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "n_views": b["n_views"].cast(pa.int64()),
                "n_conv": b["n_conv"].cast(pa.int64()),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
    )


QUERIES["funnel_view_purchase"] = q_funnel_view_purchase


# A12: grouped variance — the "custom mergeable aggregate" shape (a
# UDAF): per-batch partials (n, Σc, Σc²) over exact int64 cents merge
# associatively through grouped_sum_count's combiner, and variance is
# ONE final float64 division of two exact integers — bit-identical to
# SQL regardless of summation order (the cents pattern, extended to
# second moments; int64 bound: n·Σc² < 2⁶³, i.e. ~10¹⁰ rows per group
# at 10⁴-cent values — re-scale or widen to decimal beyond that).


def q_events_value_stats(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        c = ops.cents(b["value"])
        return pa.table(
            {"event_type": b["event_type"], "c": c, "c2": pc.multiply(c, c)}
        )

    agg = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("c", "sum_cents"), ("c2", "sum_c2")],
        count_alias="n",
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.int64)
        s = b["sum_cents"].to_numpy().astype(np.int64)
        ss = b["sum_c2"].to_numpy().astype(np.int64)
        num = (n * ss - s * s).astype(np.float64)
        den = (n * n * 10_000).astype(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
                "variance": pa.array(num / den, pa.float64()),
            }
        )

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


QUERIES["events_value_stats"] = q_events_value_stats

ORACLE_SQL["events_value_stats"] = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS sum_cents,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM c GROUP BY event_type
)
SELECT event_type, n, sum_cents,
       CAST(n * sum_c2 - sum_cents * sum_cents AS DOUBLE)
         / CAST(n * n * 10000 AS DOUBLE) AS variance
FROM a
"""

ORACLE_SQL["funnel_view_purchase"] = """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT DISTINCT v.user_id, v.ts
  FROM v JOIN p ON p.user_id = v.user_id
   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT v.user_id, COUNT(*) AS n_views, COUNT(conv.ts) AS n_conv
FROM v LEFT JOIN conv ON conv.user_id = v.user_id AND conv.ts = v.ts
GROUP BY v.user_id
"""

ORACLE_SQL["docs_above_median_words"] = """
WITH s AS (
  SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words
  FROM documents
),
thr AS (
  SELECT n_words AS t FROM s ORDER BY n_words
  LIMIT 1 OFFSET (SELECT (COUNT(*) - 1) // 2 FROM s)
)
SELECT s.doc_id, s.n_words FROM s, thr WHERE s.n_words >= thr.t
"""
ORACLE_SQL.update(
    {
        "kmeans_embeddings": "SELECT vec_id, cell "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_kmeans.parquet')",
        "semdedup_embeddings": "SELECT vec_id, cell "
        f"FROM read_parquet('{_GOLDEN_DIR}/sf001_semdedup.parquet')",
    }
)


# ---------------------------------------------------------------------------
# Training-data prep operators (round 3 widening): sliding-window
# document chunking, regex redaction (PII-shaped scrubbing), per-stratum
# deterministic sampling, ROLLUP aggregate, FULL OUTER join coverage.

CHUNK_W, CHUNK_S = 32, 16  # window / stride (tokens)


def _chunk_batch_fn(with_text: bool = True):
    """Per-batch chunking kernel shared by q_doc_chunks and the
    sequence-packing query (which drops the text BEFORE the sort
    shuffle so only 3 int64 columns move in the all-to-all)."""
    W, S = CHUNK_W, CHUNK_S

    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        offs = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.values
        n = np.diff(offs)  # tokens per doc (>= 1: split of "" is [""])
        nch = (n + S - 1) // S
        doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), nch)
        cid = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            np.cumsum(nch) - nch, nch
        )
        starts = offs[:-1][doc_idx] + cid * S
        ends = np.minimum(starts + W, offs[1:][doc_idx])
        lens = ends - starts
        cols = {
            "doc_id": b["doc_id"].combine_chunks().take(pa.array(doc_idx)),
            "chunk_id": pa.array(cid, type=pa.int64()),
            "n_tokens": pa.array(lens, type=pa.int64()),
        }
        if with_text:
            total = int(lens.sum())
            cum = np.cumsum(lens) - lens
            gidx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(cum, lens)
                + np.repeat(starts, lens)
            )
            chunk_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            la = pa.LargeListArray.from_arrays(
                pa.array(chunk_offsets, type=pa.int64()), flat.take(pa.array(gidx))
            )
            cols["chunk_text"] = pc.binary_join(la, " ")
        return pa.table(cols)

    return f


def q_doc_chunks(sf_dir: str):
    """X27: sliding-window document chunking (training-sample prep):
    whitespace tokens -> overlapping windows of CHUNK_W tokens at
    stride CHUNK_S (last windows may be short; every doc yields
    ceil(n/S) chunks). Fully vectorized: one split kernel, numpy
    window arithmetic, one gather, one binary_join — no per-row loop.
    Embarrassingly parallel (per-batch), so it streams at any scale."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_chunk_batch_fn(True), batch_format="pyarrow")


SQL_DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks, UNNEST(RANGE(0, LEN(toks), {CHUNK_S})) AS s FROM t)
SELECT doc_id, CAST(s // {CHUNK_S} AS BIGINT) AS chunk_id,
       CAST(LEAST(s + {CHUNK_W}, LEN(toks)) - s AS BIGINT) AS n_tokens,
       ARRAY_TO_STRING(toks[s + 1 : LEAST(s + {CHUNK_W}, LEN(toks))], ' ') AS chunk_text
FROM c
"""


def q_props_redact(sf_dir: str):
    """X28: regex scrubbing (the PII-redaction shape: the pattern is a
    config knob — digit runs here, an email/phone class in production):
    replace every match with a placeholder and count redactions per
    record. Both kernels are vectorized RE2 (pyarrow) and match
    DuckDB's RE2 semantics exactly."""
    ds = _read(sf_dir, "events", ["event_id", "props"])
    pat = "[0-9]+"

    def f(b: pa.Table) -> pa.Table:
        props = b["props"].combine_chunks()
        return pa.table(
            {
                "event_id": b["event_id"],
                "props_redacted": pc.replace_substring_regex(
                    props, pattern=pat, replacement="<NUM>"
                ),
                "n_redactions": pc.cast(
                    pc.count_substring_regex(props, pat), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_PROPS_REDACT = """
SELECT event_id,
       REGEXP_REPLACE(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
       CAST(LEN(REGEXP_EXTRACT_ALL(props, '[0-9]+')) AS BIGINT) AS n_redactions
FROM events
"""


# per-stratum sampling rates (num, den); types not listed are dropped
STRATA_RATES = {"click": (1, 4), "view": (1, 8), "purchase": (3, 4), "signup": (1, 16)}
STRATA_SEED = 42


def q_events_stratified_sample(sf_dir: str):
    """X29: stratified deterministic sampling — a different keep-rate
    per stratum (event_type), membership a pure splitmix64 function of
    the key so the sample is identical across cluster sizes / re-runs
    and exactly SQL-expressible (the ops.seeded_sample contract,
    per-stratum thresholds). Types outside STRATA_RATES are dropped."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    sd = np.uint64(STRATA_SEED)

    def f(b: pa.Table) -> pa.Table:
        et = b["event_type"].combine_chunks()
        k = b["event_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        h = ops._mix64(k ^ sd)
        thresh = np.zeros(len(k), dtype=np.uint64)
        for t, (num, den) in STRATA_RATES.items():
            # fill_null: a null event_type must yield a bool mask, not
            # an object-dtype array (null rows fall in no stratum)
            m = pc.fill_null(pc.equal(et, t), False).to_numpy(zero_copy_only=False)
            thresh[m] = np.uint64((1 << 64) * num // den)
        return b.filter(pa.array(h < thresh))

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_STRATIFIED = "\nUNION ALL\n".join(
    "SELECT * FROM ("
    + ops.seeded_sample_sql(
        f"(SELECT event_id, event_type FROM events WHERE event_type = '{t}')",
        "event_id",
        ["event_id", "event_type"],
        num=num,
        den=den,
        seed=STRATA_SEED,
    )
    + ")"
    for t, (num, den) in STRATA_RATES.items()
)


def q_orders_rollup(sf_dir: str):
    """A6: ROLLUP / grouping-sets aggregate — (year, priority)
    subtotals, per-year subtotals, grand total, with 'ALL' sentinels.
    Plan: the per-batch combiner + shuffle computes the FINEST level
    (bounded: |years| x |priorities| rows); the coarser levels are
    derived from that tiny aggregate, never from the input — the
    rollup costs one groupby regardless of input size."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                "pri": b["o_orderpriority"],
                "cents": ops.cents(b["o_totalprice"]),
            }
        )

    base = ops.grouped_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["yr", "pri"],
        sums=[("cents", "sum_cents")],
        count_alias="n",
    )
    fine = ops.collect_table(
        base,
        schema=pa.schema(
            [
                ("yr", pa.int64()),
                ("pri", pa.string()),
                ("sum_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    yr_s = pc.cast(fine["yr"], pa.string())
    lvl0 = pa.table(
        {"o_year": yr_s, "priority": fine["pri"], "n": fine["n"], "sum_cents": fine["sum_cents"]}
    )
    g1 = fine.group_by(["yr"]).aggregate([("n", "sum"), ("sum_cents", "sum")])
    lvl1 = pa.table(
        {
            "o_year": pc.cast(g1["yr"], pa.string()),
            "priority": pa.array(["ALL"] * g1.num_rows),
            "n": g1["n_sum"],
            "sum_cents": g1["sum_cents_sum"],
        }
    )
    lvl2 = pa.table(
        {
            "o_year": pa.array(["ALL"]),
            "priority": pa.array(["ALL"]),
            # COUNT over empty input is 0 (SUM stays NULL) — match
            # DuckDB's empty-ROLLUP grand-total row exactly
            "n": pa.array([pc.sum(fine["n"]).as_py() or 0], type=pa.int64()),
            "sum_cents": pa.array([pc.sum(fine["sum_cents"]).as_py()], type=pa.int64()),
        }
    )
    return pa.concat_tables([lvl0, lvl1, lvl2])


SQL_ORDERS_ROLLUP = """
SELECT COALESCE(CAST(yr AS VARCHAR), 'ALL') AS o_year,
       COALESCE(pri, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             o_orderpriority AS pri,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
GROUP BY ROLLUP (yr, pri)
"""


def q_users_customers_full(sf_dir: str):
    """J2 full_outer variant: distinct event users FULL OUTER JOIN
    customers; per-batch combiner counts the match pattern (both /
    left-only / right-only) so only three integers leave the join.
    Ray's join coalesces the key columns into one, so each side
    carries a constant marker column whose null-ness identifies which
    side(s) produced the row."""

    def mark(name):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                name, pa.array(np.ones(b.num_rows, dtype=np.int8))
            )

        return f

    users = ops.distinct(_read(sf_dir, "events", ["user_id"]), ["user_id"]).map_batches(
        mark("in_u"), batch_size=None, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        mark("in_c"), batch_size=None, batch_format="pyarrow"
    )
    j = ops.normalize_blocks(
        users.join(
            cust,
            join_type="full_outer",
            num_partitions=ops.default_join_partitions(),
            on=("user_id",),
            right_on=("c_custkey",),
        ),
        pa.schema(
            [("user_id", pa.int64()), ("in_u", pa.int8()), ("in_c", pa.int8())]
        ),
    )

    def cnt(b: pa.Table) -> pa.Table:
        u = pc.is_valid(b["in_u"])
        c = pc.is_valid(b["in_c"])
        return pa.table(
            {
                "n_both": pa.array(
                    [pc.sum(pc.and_(u, c)).as_py() or 0], type=pa.int64()
                ),
                "n_left_only": pa.array(
                    [pc.sum(pc.invert(c)).as_py() or 0], type=pa.int64()
                ),
                "n_right_only": pa.array(
                    [pc.sum(pc.invert(u)).as_py() or 0], type=pa.int64()
                ),
            }
        )

    parts = ops.collect_table(
        j.map_batches(cnt, batch_size=None, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("n_both", pa.int64()),
                ("n_left_only", pa.int64()),
                ("n_right_only", pa.int64()),
            ]
        ),
    )
    return _one_row(
        n_both=pc.sum(parts["n_both"]).as_py() or 0,
        n_left_only=pc.sum(parts["n_left_only"]).as_py() or 0,
        n_right_only=pc.sum(parts["n_right_only"]).as_py() or 0,
    )


SQL_USERS_CUSTOMERS_FULL = """
SELECT CAST(SUM(CASE WHEN user_id IS NOT NULL AND c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_only,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_only
FROM (SELECT DISTINCT user_id FROM events) u FULL JOIN customer ON u.user_id = customer.c_custkey
"""


QUERIES.update(
    {
        "doc_chunks": q_doc_chunks,
        "props_redact": q_props_redact,
        "events_stratified_sample": q_events_stratified_sample,
        "orders_rollup": q_orders_rollup,
        "users_customers_full": q_users_customers_full,
    }
)

ORACLE_SQL.update(
    {
        "doc_chunks": SQL_DOC_CHUNKS,
        "props_redact": SQL_PROPS_REDACT,
        "events_stratified_sample": SQL_EVENTS_STRATIFIED,
        "orders_rollup": SQL_ORDERS_ROLLUP,
        "users_customers_full": SQL_USERS_CUSTOMERS_FULL,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 2: distributed prefix-sum (sequence packing / global
# row_number), KMV approx-distinct (deterministic sketch with an EXACT
# SQL oracle), pivot aggregate, vectorized grouped string_agg, and an
# interval/range self-join.

PACK_BUDGET = 128  # tokens per packed training sequence


def q_doc_chunks_packed(sf_dir: str):
    """X30: LLM sequence packing — doc chunks streamed in (doc_id,
    chunk_id) order into fixed token-budget bins: each chunk gets a
    global position (`seq_pos`), the exclusive running token total
    (`tok_before`), and `bin_id = tok_before // PACK_BUDGET`
    (contiguous-stream packing). Built on `ops.with_global_index`,
    the distributed prefix-sum primitive: after the sort all that is
    exchanged is ONE (rows, sum) pair per block — the driver never
    sees data. The chunk text is dropped BEFORE the sort so the
    all-to-all moves 3 int64 columns, not strings; at train time the
    text re-attaches by an equi-join on (doc_id, chunk_id)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = ds.map_batches(_chunk_batch_fn(False), batch_format="pyarrow")
    idx = ops.with_global_index(
        chunks,
        ["doc_id", "chunk_id"],
        index_col="seq_pos",
        cumsum_of="n_tokens",
        cumsum_col="tok_before",
    )

    def fin(b: pa.Table) -> pa.Table:
        bin_id = b["tok_before"].combine_chunks().to_numpy() // PACK_BUDGET
        return b.append_column("bin_id", pa.array(bin_id.astype(np.int64)))

    return idx.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_DOC_CHUNKS_PACKED = f"""
WITH chunks AS ({SQL_DOC_CHUNKS}),
w AS (
  SELECT doc_id, chunk_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY doc_id, chunk_id) - 1 AS seq_pos,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
  FROM chunks)
SELECT doc_id, chunk_id, n_tokens,
       CAST(seq_pos AS BIGINT) AS seq_pos,
       CAST(tok_before AS BIGINT) AS tok_before,
       CAST(tok_before // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM w
"""


KMV_K = 64
KMV_SEED = 7


def q_events_kmv_distinct(sf_dir: str):
    """X31: KMV (k-minimum-values) approximate COUNT DISTINCT of
    users per event_type. The sketch is the k smallest splitmix64
    hashes of the key — a mergeable bounded-size summary (combiner
    emits <= k rows per group per batch, so the shuffle is O(groups*k)
    regardless of input size). Because the hash is a pure function of
    the key, the estimate is DETERMINISTIC and reproduced exactly in
    SQL (UBIGINT splitmix64 + ROW_NUMBER) — an approx operator with an
    exact oracle. Estimate: distinct count if < k seen, else
    floor((k-1) * 2^64 / h_(k))."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    sd, K = np.uint64(KMV_SEED), KMV_K

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].combine_chunks()
        h = ops._mix64(
            b["user_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
            ^ sd
        )
        types, hs = [], []
        for t in pc.unique(et).to_pylist():
            if t is None:
                continue  # null-typed rows belong to no group
            # fill_null keeps the mask bool-dtype when et has nulls
            m = pc.fill_null(pc.equal(et, t), False).to_numpy(zero_copy_only=False)
            u = np.unique(h[m])[:K]
            types.extend([t] * len(u))
            hs.append(u)
        return pa.table(
            {
                "event_type": pa.array(types),
                "h": pa.array(np.concatenate(hs) if hs else np.array([], np.uint64)),
            }
        )

    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["h"].to_numpy())
        if len(u) < K:
            est = len(u)
        else:
            est = ((K - 1) << 64) // int(u[K - 1])
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "approx_distinct": [est]}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


SQL_EVENTS_KMV = f"""
WITH s AS ({{hash_cte}}),
d AS (SELECT DISTINCT event_type, h FROM s),
r AS (SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM d),
k AS (SELECT event_type, MAX(h) AS hk, COUNT(*) AS kk
      FROM r WHERE rn <= {KMV_K} GROUP BY event_type)
SELECT event_type,
       CAST(CASE WHEN kk < {KMV_K} THEN kk::HUGEINT
                 ELSE ({KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT)
                      // hk::HUGEINT END AS BIGINT) AS approx_distinct
FROM k
""".format(
    hash_cte=ops.splitmix64_sql(
        "events", "user_id", ["event_type"], seed=KMV_SEED
    )
)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _assert_known_event_types(et: pa.Array) -> None:
    """The pivot/string-agg/unpivot/grid family pins its column set to
    EVENT_TYPES at plan-build time — a value outside the list would
    silently vanish from the output (and diverge from the SQL oracle),
    so fail loudly per batch instead (unique() per batch is cheap)."""
    bad = [
        t
        for t in pc.unique(et).to_pylist()
        if t is not None and t not in EVENT_TYPES
    ]
    if bad:
        raise ValueError(
            f"unexpected event_type values {bad!r}: extend EVENT_TYPES"
        )


def q_user_event_pivot(sf_dir: str):
    """A7: pivot / wide aggregate — one row per user, one count column
    per event_type plus the total. The pivot happens INSIDE the
    per-batch combiner (each type becomes an int64 indicator column),
    so the shuffle carries one already-wide partial row per (batch,
    user): a pivot costs exactly one narrow groupby at any scale."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def ind(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        et = b["event_type"].combine_chunks()
        _assert_known_event_types(et)
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        return pa.table(cols)

    return ops.grouped_sum_count(
        ds.map_batches(ind, batch_format="pyarrow"),
        keys=["user_id"],
        sums=[(f"n_{t}", f"n_{t}") for t in EVENT_TYPES],
        count_alias="n_events",
    )


SQL_USER_EVENT_PIVOT = """
SELECT user_id,
       {cols},
       COUNT(*) AS n_events
FROM events GROUP BY user_id
""".format(
    cols=",\n       ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in EVENT_TYPES
    )
)


def q_user_event_types(sf_dir: str):
    """F8: grouped ordered string_agg — per user, the alphabetically
    sorted comma-joined set of event types. No per-group sort at all:
    distinct (user, type) -> per-type presence indicators via the
    pivot combiner -> `binary_join_element_wise(..., skip nulls)`
    assembles the ordered concatenation fully vectorized (the order is
    the static EVENT_TYPES order, which IS the sort order)."""
    ds = ops.distinct(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id", "event_type"],
    )

    def ind(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        et = b["event_type"].combine_chunks()
        _assert_known_event_types(et)
        for t in EVENT_TYPES:
            cols[f"p_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        return pa.table(cols)

    agg = ops.grouped_sum_count(
        ds.map_batches(ind, batch_format="pyarrow"),
        keys=["user_id"],
        sums=[(f"p_{t}", f"p_{t}") for t in EVENT_TYPES],
    )

    def join_str(b: pa.Table) -> pa.Table:
        parts = [
            pc.if_else(
                pc.greater(b[f"p_{t}"], 0),
                pa.scalar(t),
                pa.scalar(None, type=pa.string()),
            )
            for t in EVENT_TYPES
        ]
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_types": pc.binary_join_element_wise(
                    *parts, ",", null_handling="skip"
                ),
            }
        )

    return agg.map_batches(join_str, batch_size=None, batch_format="pyarrow")


SQL_USER_EVENT_TYPES = """
SELECT user_id,
       STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
FROM events GROUP BY user_id
"""


def q_signup_click_24h(sf_dir: str):
    """J4: interval/range join (event-sequence analysis): for every
    signup event, how many clicks by the same user within the next 24
    hours. The range predicate rides an equi-join on the user key
    (partition by user, filter the time window inside the batch) —
    the standard way to run a range join as a hash shuffle; unmatched
    signups survive via left_outer + null-safe indicator, so zeros
    are counted too."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def typed(t):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["event_type"], t)).drop_columns(
                ["event_type"]
            )

        return f

    sign = ev.map_batches(typed("signup"), batch_format="pyarrow")
    clicks = ev.map_batches(typed("click"), batch_format="pyarrow").map_batches(
        lambda b: pa.table({"ru": b["user_id"], "c_ts": b["ts"]}),
        batch_size=None,
        batch_format="pyarrow",
    )

    j = ops.normalize_blocks(
        sign.join(
            clicks,
            join_type="left_outer",
            num_partitions=ops.default_join_partitions(),
            on=("user_id",),
            right_on=("ru",),
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("c_ts", pa.timestamp("us")),
            ]
        ),
    )

    DAY_US = 24 * 3600 * 1_000_000

    def cnt(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.int64())
        c = pc.cast(b["c_ts"], pa.int64())
        diff = pc.subtract(c, s)
        hit = pc.fill_null(
            pc.and_(pc.greater_equal(diff, 0), pc.less(diff, DAY_US)), False
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "hit": pc.cast(hit, pa.int64()),
            }
        )

    return ops.grouped_sum_count(
        j.map_batches(cnt, batch_size=None, batch_format="pyarrow"),
        keys=["event_id"],
        sums=[("hit", "n_clicks_24h")],
    )


SQL_SIGNUP_CLICK_24H = """
SELECT s.event_id,
       CAST(COUNT(CASE WHEN c.ts >= s.ts AND c.ts < s.ts + INTERVAL 24 HOUR
                       THEN 1 END) AS BIGINT) AS n_clicks_24h
FROM (SELECT * FROM events WHERE event_type = 'signup') s
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = s.user_id
GROUP BY s.event_id
"""


QUERIES.update(
    {
        "doc_chunks_packed": q_doc_chunks_packed,
        "events_kmv_distinct": q_events_kmv_distinct,
        "user_event_pivot": q_user_event_pivot,
        "user_event_types": q_user_event_types,
        "signup_click_24h": q_signup_click_24h,
    }
)

ORACLE_SQL.update(
    {
        "doc_chunks_packed": SQL_DOC_CHUNKS_PACKED,
        "events_kmv_distinct": SQL_EVENTS_KMV,
        "user_event_pivot": SQL_USER_EVENT_PIVOT,
        "user_event_types": SQL_USER_EVENT_TYPES,
        "signup_click_24h": SQL_SIGNUP_CLICK_24H,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 3: per-key window functions (LAG / running sum),
# fixed-width histogram, corpus bigram heavy hitters.


def q_events_user_lag(sf_dir: str):
    """W1: LAG window function — for every event, the previous event id
    and the gap in microseconds for the same user in (ts, event_id)
    order (NULL for each user's first event). `ops.group_lag`: one key
    shuffle, vectorized sort+shift per group."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    lagged = ops.group_lag(
        ds,
        "user_id",
        ["ts", "event_id"],
        {"event_id": "prev_event_id", "ts": "prev_ts"},
    )

    def fin(b: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(b["ts"], pa.int64()), pc.cast(b["prev_ts"], pa.int64())
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "prev_event_id": pc.cast(b["prev_event_id"], pa.int64()),
                "gap_us": gap,
            }
        )

    return lagged.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_USER_LAG = """
SELECT event_id,
       LAG(event_id) OVER w AS prev_event_id,
       CAST(EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS BIGINT) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_user_running(sf_dir: str):
    """W2: per-key running sum — cumulative event value (exact integer
    cents) per user in (ts, event_id) order. `ops.group_running_sum`;
    the cents pattern makes the cumulative bit-exact vs SQL."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "cents": ops.cents(b["value"]),
            }
        )

    run = ops.group_running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "cents",
        "run_cents",
    )
    return run.select_columns(["event_id", "run_cents"])


SQL_EVENTS_USER_RUNNING = """
SELECT event_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS run_cents
FROM events
"""


HIST_BIN_CENTS = 2_500_000  # $25,000-wide price bins


def q_orders_price_histogram(sf_dir: str):
    """A9: fixed-width histogram (distribution profiling): order total
    prices bucketed into $25k bins, count + exact cents sum per bin.
    Pure combiner aggregate — the shuffle moves one row per (batch,
    bin), the output is O(bins)."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = ops.cents(b["o_totalprice"])
        return pa.table(
            {
                "bin_id": pc.cast(
                    pc.divide(cents, HIST_BIN_CENTS), pa.int64()
                ),
                "cents": cents,
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["bin_id"],
        sums=[("cents", "sum_cents")],
        count_alias="n",
    )


SQL_ORDERS_PRICE_HISTOGRAM = f"""
SELECT CAST(cents // {HIST_BIN_CENTS} AS BIGINT) AS bin_id,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       COUNT(*) AS n
FROM (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
GROUP BY 1
"""


BIGRAM_TOPK = 20


def q_doc_bigrams_top20(sf_dir: str):
    """X32: corpus-wide bigram heavy hitters — adjacent-token pairs
    built fully vectorized from the split ListArray's offsets (the
    pair (flat[i], flat[i+1]) for every i that is not a document
    boundary), then `ops.frequent_items`: combiner counts bound the
    shuffle to distinct bigrams, deterministic (count desc, bigram
    asc) top-20."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigrams(b: pa.Table) -> pa.Table:
        g = _gram_batch(b, k=2)
        return pa.table({"bg": g["gram"]})

    bg = ds.map_batches(bigrams, batch_format="pyarrow")
    return ops.frequent_items(bg, "bg", BIGRAM_TOPK)


SQL_DOC_BIGRAMS_TOP20 = f"""
WITH t AS (SELECT STRING_SPLIT(text, ' ') AS toks FROM documents),
b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bg
      FROM t, UNNEST(RANGE(1, LEN(toks))) AS u(i))
SELECT bg, COUNT(*) AS n FROM b
GROUP BY bg ORDER BY n DESC, bg LIMIT {BIGRAM_TOPK}
"""


QUERIES.update(
    {
        "events_user_lag": q_events_user_lag,
        "events_user_running": q_events_user_running,
        "orders_price_histogram": q_orders_price_histogram,
        "doc_bigrams_top20": q_doc_bigrams_top20,
    }
)

ORACLE_SQL.update(
    {
        "events_user_lag": SQL_EVENTS_USER_LAG,
        "events_user_running": SQL_EVENTS_USER_RUNNING,
        "orders_price_histogram": SQL_ORDERS_PRICE_HISTOGRAM,
        "doc_bigrams_top20": SQL_DOC_BIGRAMS_TOP20,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 4: grouped discrete quantile, composite-key window
# count, NTILE on the prefix-sum primitive, unpivot/melt.


def q_priority_price_p90(sf_dir: str):
    """X33: grouped P90 (discrete quantile) of order price cents per
    priority — `ops.group_quantile_disc`, QUANTILE_DISC convention
    (sorted index ceil(q*n)-1: no interpolation, integers stay exact).
    The auto gate picks the combiner-bounded histogram plan for huge
    groups; both plans parity-tested."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "cents": ops.cents(b["o_totalprice"]),
            }
        )

    return ops.group_quantile_disc(
        ds.map_batches(prep, batch_format="pyarrow"),
        "o_orderpriority",
        "cents",
        0.9,
        "p90_cents",
    )


SQL_PRIORITY_PRICE_P90 = """
SELECT o_orderpriority,
       CAST(QUANTILE_DISC(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), 0.9) AS BIGINT)
         AS p90_cents
FROM orders GROUP BY o_orderpriority
"""


def q_event_group_size(sf_dir: str):
    """W3: COUNT(*) OVER (PARTITION BY user_id, event_type) — the
    grouped window count, via the join-back plan: a combiner groupby
    produces the per-(user, type) sizes (bounded by distinct pairs,
    never input rows), then a composite-key hash join attaches the
    size to every event. Also exercises Ray's multi-column join."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    sizes = ops.grouped_sum_count(
        ev.select_columns(["user_id", "event_type"]),
        keys=["user_id", "event_type"],
        sums=[],
        count_alias="grp_n",
    ).map_batches(
        lambda b: pa.table(
            {"su": b["user_id"], "st": b["event_type"], "grp_n": b["grp_n"]}
        ),
        batch_size=None,
        batch_format="pyarrow",
    )
    j = ops.normalize_blocks(
        ev.join(
            sizes,
            join_type="inner",
            num_partitions=ops.default_join_partitions(),
            on=("user_id", "event_type"),
            right_on=("su", "st"),
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("grp_n", pa.int64()),
            ]
        ),
    )
    return j.select_columns(["event_id", "grp_n"])


SQL_EVENT_GROUP_SIZE = """
SELECT event_id,
       COUNT(*) OVER (PARTITION BY user_id, event_type) AS grp_n
FROM events
"""


NTILE_K = 4


def q_orders_ntile(sf_dir: str):
    """O5: global NTILE(4) over order price — the second consumer of
    the distributed prefix-sum primitive: global position from
    `ops.with_global_index` (sorted by (cents, key): unique, so the
    order is total and deterministic), then DuckDB's NTILE fill
    convention (first n%k tiles get the extra row) applied
    vectorized."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "cents": ops.cents(b["o_totalprice"])}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    idx = ops.with_global_index(prepped, ["cents", "o_orderkey"], index_col="_pos")
    n = _read(sf_dir, "orders", ["o_orderkey"]).count()
    base, rem = divmod(n, NTILE_K)
    boundary = rem * (base + 1)

    def fin(b: pa.Table) -> pa.Table:
        p = b["_pos"].combine_chunks().to_numpy()
        if base > 0:
            tile = np.where(
                p < boundary, p // (base + 1), rem + (p - boundary) // base
            )
        else:
            tile = p  # n < k: one row per tile
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "ntile": pa.array((tile + 1).astype(np.int64)),
            }
        )

    return idx.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_ORDERS_NTILE = f"""
SELECT o_orderkey,
       CAST(NTILE({NTILE_K}) OVER (
         ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey
       ) AS BIGINT) AS ntile
FROM orders
"""


def q_user_event_unpivot(sf_dir: str):
    """A10: unpivot/melt — the wide per-user pivot back to long
    (user_id, event_type, n) form, zeros kept (UNPIVOT semantics:
    the columns always exist). Vectorized: np.repeat the keys, tile
    the static type list, one concat of the count columns — applied
    per batch of the already-aggregated pivot, so it streams."""
    wide = q_user_event_pivot(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        k = len(EVENT_TYPES)
        nrow = b.num_rows
        uid = b["user_id"].combine_chunks().to_numpy()
        counts = np.stack(
            [b[f"n_{t}"].combine_chunks().to_numpy() for t in EVENT_TYPES],
            axis=1,
        ).reshape(-1)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(uid, k)),
                "event_type": pa.array(np.tile(np.array(EVENT_TYPES), nrow)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return wide.map_batches(melt, batch_size=None, batch_format="pyarrow")


SQL_USER_EVENT_UNPIVOT = """
UNPIVOT (
  SELECT user_id,
         {cols}
  FROM events GROUP BY user_id
) ON {oncols} INTO NAME event_type VALUE n
""".format(
    cols=",\n         ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES
    ),
    oncols=", ".join(EVENT_TYPES),
)


QUERIES.update(
    {
        "priority_price_p90": q_priority_price_p90,
        "event_group_size": q_event_group_size,
        "orders_ntile": q_orders_ntile,
        "user_event_unpivot": q_user_event_unpivot,
    }
)

ORACLE_SQL.update(
    {
        "priority_price_p90": SQL_PRIORITY_PRICE_P90,
        "event_group_size": SQL_EVENT_GROUP_SIZE,
        "orders_ntile": SQL_ORDERS_NTILE,
        "user_event_unpivot": SQL_USER_EVENT_UNPIVOT,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 5: grouped argmax, multi-join revenue pipeline.


def q_user_biggest_event(sf_dir: str):
    """A11: grouped argmax — per user, the event_id of the
    highest-value event (tie -> smallest event_id). Combiner plan:
    each batch is vector-sorted by (user, value desc, id) and reduced
    to one candidate row per user BEFORE the shuffle; the global merge
    re-applies the same rule over the tiny candidate set, so the
    exchange carries one row per (batch, user)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def best_per_block(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b,
            sort_keys=[
                ("user_id", "ascending"),
                ("value", "descending"),
                ("event_id", "ascending"),
            ],
        )
        s = b.take(idx)
        u = s["user_id"].combine_chunks().to_numpy()
        first = np.concatenate([[True], u[1:] != u[:-1]]) if len(u) else np.array([], bool)
        return s.filter(pa.array(first))

    partial = ds.map_batches(best_per_block, batch_format="pyarrow")

    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["value", "event_id"], ascending=[False, True], ignore_index=True
        )
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "best_event_id": [g["event_id"].iloc[0]],
            }
        )

    return partial.groupby("user_id").map_groups(merge, batch_format="pandas")


SQL_USER_BIGGEST_EVENT = """
SELECT user_id, event_id AS best_event_id FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY value DESC, event_id) = 1
"""


def q_nation_year_revenue(sf_dir: str):
    """P1: three-table join pipeline (TPC-H-flavored): orders ⋈
    customer (distributed hash join — both sides scale) ⋈ nation
    (25 rows: broadcast, never a shuffle), then a combiner rollup of
    exact cents revenue per (nation, year). The join order and
    physical choice per join size is the point: big-big shuffles
    once, dimension rides the object store."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep_o(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                "cents": ops.cents(b["o_totalprice"]),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j1 = ops.normalize_blocks(
        orders.map_batches(prep_o, batch_format="pyarrow").join(
            cust,
            join_type="inner",
            num_partitions=ops.default_join_partitions(),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ),
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_year", pa.int64()),
                ("cents", pa.int64()),
                ("c_nationkey", pa.int32()),
            ]
        ),
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j2 = ops.broadcast_join(j1, nation, keys=["c_nationkey"], right_keys=["n_nationkey"])
    return ops.grouped_sum_count(
        j2,
        keys=["n_name", "o_year"],
        sums=[("cents", "revenue_cents")],
        count_alias="n_orders",
    )


SQL_NATION_YEAR_REVENUE = """
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name, o_year
"""


QUERIES.update(
    {
        "user_biggest_event": q_user_biggest_event,
        "nation_year_revenue": q_nation_year_revenue,
    }
)

ORACLE_SQL.update(
    {
        "user_biggest_event": SQL_USER_BIGGEST_EVENT,
        "nation_year_revenue": SQL_NATION_YEAR_REVENUE,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 6: deterministic training shuffle + split assignment.

SHUFFLE_SEED = 2024


def q_doc_shuffle_pos(sf_dir: str):
    """X34: deterministic corpus shuffle (training-epoch order): each
    doc's position is its rank under splitmix64(doc_id ^ seed) — a
    pure key function, so the permutation is identical on any cluster
    size / re-run (resumable epochs) and exactly SQL-expressible,
    unlike random_shuffle. Third consumer of `ops.with_global_index`
    (the hash becomes the sort key; id breaks 128-bit-unlikely ties
    deterministically)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    sd = np.uint64(SHUFFLE_SEED)

    def h(b: pa.Table) -> pa.Table:
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        # store as int64 bit pattern; order preserved by shifting the
        # sign: h_signed = h - 2^63 maps uint64 order to int64 order
        hs = (ops._mix64(k ^ sd) - np.uint64(1 << 63)).view(np.int64)
        return pa.table({"doc_id": b["doc_id"], "h": pa.array(hs)})

    idx = ops.with_global_index(
        ds.map_batches(h, batch_format="pyarrow"),
        ["h", "doc_id"],
        index_col="shuffle_pos",
    )
    return idx.select_columns(["doc_id", "shuffle_pos"])


SQL_DOC_SHUFFLE_POS = """
WITH s AS ({hash_cte})
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM s
""".format(
    hash_cte=ops.splitmix64_sql("documents", "doc_id", ["doc_id"], seed=SHUFFLE_SEED)
)


SPLIT_SEED = 77
# cumulative integer thresholds out of 2^64: 80% train / 10% val / 10% test
SPLIT_TRAIN_END = (1 << 64) * 8 // 10
SPLIT_VAL_END = (1 << 64) * 9 // 10


def q_doc_split_assign(sf_dir: str):
    """X35: deterministic train/val/test split — the split is a pure
    splitmix64 function of the key (80/10/10 via exact integer
    thresholds), so membership is stable across cluster sizes,
    re-runs and resumes, and a doc can never leak between splits when
    the corpus grows (new keys hash independently). Embarrassingly
    parallel; exact SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    sd = np.uint64(SPLIT_SEED)
    t1, t2 = np.uint64(SPLIT_TRAIN_END), np.uint64(SPLIT_VAL_END)

    def f(b: pa.Table) -> pa.Table:
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        h = ops._mix64(k ^ sd)
        split = np.select([h < t1, h < t2], ["train", "val"], default="test")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "split": pa.array(split),
            }
        )

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_DOC_SPLIT_ASSIGN = """
WITH s AS ({hash_cte})
SELECT doc_id, lang,
       CASE WHEN h < {t1}::UBIGINT THEN 'train'
            WHEN h < {t2}::UBIGINT THEN 'val'
            ELSE 'test' END AS split
FROM s
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "lang"], seed=SPLIT_SEED
    ),
    t1=SPLIT_TRAIN_END,
    t2=SPLIT_VAL_END,
)


QUERIES.update(
    {
        "doc_shuffle_pos": q_doc_shuffle_pos,
        "doc_split_assign": q_doc_split_assign,
    }
)

ORACLE_SQL.update(
    {
        "doc_shuffle_pos": SQL_DOC_SHUFFLE_POS,
        "doc_split_assign": SQL_DOC_SPLIT_ASSIGN,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 7: repetition quality signal + train/test
# decontamination by n-gram overlap.


def q_doc_repetition(sf_dir: str):
    """X36: repetition quality signal (Gopher-style): per doc, total
    bigrams, the most-repeated bigram's count, and its fraction. One
    row = one doc, so the whole computation is in-batch (two arrow
    group_bys per batch, no shuffle at all); the fraction is a single
    IEEE division, bit-matching SQL. Docs with < 2 tokens have no
    bigrams and drop out (same in the oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rep(b: pa.Table) -> pa.Table:
        t = _gram_batch(b, k=2).rename_columns(["doc_id", "bg"])
        c = t.group_by(["doc_id", "bg"]).aggregate([("bg", "count")])
        a = c.group_by("doc_id").aggregate(
            [("bg_count", "sum"), ("bg_count", "max")]
        )
        top = pc.cast(a["bg_count_max"], pa.int64())
        tot = pc.cast(a["bg_count_sum"], pa.int64())
        return pa.table(
            {
                "doc_id": a["doc_id"],
                "n_bigrams": tot,
                "top_bigram_n": top,
                "top_frac": pc.divide(
                    pc.cast(top, pa.float64()), pc.cast(tot, pa.float64())
                ),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


SQL_DOC_REPETITION = """
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
b AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
      FROM t, UNNEST(RANGE(1, LEN(toks))) u(i)),
c AS (SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(MAX(n) AS BIGINT) AS top_bigram_n,
       MAX(n)::DOUBLE / SUM(n)::DOUBLE AS top_frac
FROM c GROUP BY doc_id
"""


DECON_K = 4  # n-gram order for contamination matching


def _gram_batch(
    b: pa.Table, mask: np.ndarray | None = None, k: int = DECON_K
) -> pa.Table:
    """(doc_id, gram) rows of k-grams for the (optionally masked) docs
    of a batch — all offset arithmetic, k shifted takes and one
    element-wise join; no per-row loop. The ONE copy of the
    doc-boundary window arithmetic (bigram heavy hitters, repetition
    stats and decontamination all consume it)."""
    K = k
    sub = b if mask is None else b.filter(pa.array(mask))
    toks = pc.split_pattern(sub["text"].combine_chunks(), " ")
    offs = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values
    doc_np = sub["doc_id"].combine_chunks().to_numpy()
    m = np.maximum(np.diff(offs) - (K - 1), 0)  # grams per doc
    total = int(m.sum())
    base = np.repeat(offs[:-1], m)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    idx = base + within
    parts = [flat.take(pa.array(idx + k)) for k in range(K)]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_np, m)),
            "gram": pc.binary_join_element_wise(*parts, " "),
        }
    )


def q_contaminated_train(sf_dir: str):
    """X37: train/test decontamination — distinct TRAIN-split docs
    sharing at least one DECON_K-gram with any TEST-split doc (the
    X35 hash split defines the sides). Plan: both sides explode to
    (doc_id, gram) with zero per-row loops; the test side is
    dimension-sized (10% of the corpus, distinct grams), so
    `ops.semi_join`'s size gate broadcasts it as an `is_in` filter —
    above the gate it becomes a distributed left_semi hash join.
    Output: the contaminated train doc ids (the removal set a real
    pipeline would anti-join against its training corpus)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sd = np.uint64(SPLIT_SEED)
    t1, t2 = np.uint64(SPLIT_TRAIN_END), np.uint64(SPLIT_VAL_END)

    def split_masks(b: pa.Table):
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        return ops._mix64(k ^ sd)

    def train_grams(b: pa.Table) -> pa.Table:
        return _gram_batch(b, split_masks(b) < t1)

    def test_grams(b: pa.Table) -> pa.Table:
        return _gram_batch(b, split_masks(b) >= t2)

    tg = ds.map_batches(train_grams, batch_format="pyarrow")
    qg = ds.map_batches(test_grams, batch_format="pyarrow").select_columns(["gram"])
    hit = ops.semi_join(tg, "gram", qg, "gram")
    return ops.distinct(hit.select_columns(["doc_id"]), ["doc_id"])


SQL_CONTAMINATED_TRAIN = """
WITH s AS ({hash_cte}),
tr AS (SELECT doc_id, text FROM s WHERE h < {t1}::UBIGINT),
te AS (SELECT text FROM s WHERE h >= {t2}::UBIGINT),
gt AS (SELECT doc_id, ARRAY_TO_STRING(toks[i:i+{km1}], ' ') AS gram
       FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM tr),
            UNNEST(RANGE(1, LEN(toks) - {km2})) u(i)),
gq AS (SELECT DISTINCT ARRAY_TO_STRING(toks[i:i+{km1}], ' ') AS gram
       FROM (SELECT STRING_SPLIT(text, ' ') AS toks FROM te),
            UNNEST(RANGE(1, LEN(toks) - {km2})) u(i))
SELECT DISTINCT gt.doc_id FROM gt JOIN gq USING (gram)
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "text"], seed=SPLIT_SEED
    ),
    t1=SPLIT_TRAIN_END,
    t2=SPLIT_VAL_END,
    km1=DECON_K - 1,
    km2=DECON_K - 2,
)


QUERIES.update(
    {
        "doc_repetition": q_doc_repetition,
        "contaminated_train": q_contaminated_train,
    }
)

ORACLE_SQL.update(
    {
        "doc_repetition": SQL_DOC_REPETITION,
        "contaminated_train": SQL_CONTAMINATED_TRAIN,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 8: cross join (dense grid) — completes the join family.


def q_nation_event_grid(sf_dir: str):
    """J5: cross join for a dense grid — every (nation, event_type)
    combination with the count of events whose user maps to that
    nation, ZEROS KEPT (the cross join's purpose: downstream
    consumers want the full matrix). Plan: the fact side aggregates
    FIRST (events ⋈ customer hash join, nation broadcast, combiner
    count — bounded by |nations| x |types|), then the tiny dense grid
    (25 x 5, built in-memory: both sides are dimensions) left-joins
    the aggregate via one pyarrow hash join per batch. The cross join
    itself never touches fact-table scale."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j1 = ops.normalize_blocks(
        ev.join(
            cust,
            join_type="inner",
            num_partitions=ops.default_join_partitions(),
            on=("user_id",),
            right_on=("c_custkey",),
        ),
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("c_nationkey", pa.int32()),
            ]
        ),
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j2 = ops.broadcast_join(
        j1, nation, keys=["c_nationkey"], right_keys=["n_nationkey"]
    )
    counts = ops.collect_table(
        ops.grouped_sum_count(
            j2.select_columns(["n_name", "event_type"]),
            keys=["n_name", "event_type"],
            sums=[],
            count_alias="n",
        ),
        schema=pa.schema(
            [("n_name", pa.string()), ("event_type", pa.string()), ("n", pa.int64())]
        ),
    )
    _assert_known_event_types(counts["event_type"])
    names = nation["n_name"].to_pylist()
    grid = pa.table(
        {
            "n_name": pa.array(np.repeat(names, len(EVENT_TYPES))),
            "event_type": pa.array(np.tile(np.array(EVENT_TYPES), len(names))),
        }
    )
    out = grid.join(counts, keys=["n_name", "event_type"], join_type="left outer")
    return pa.table(
        {
            "n_name": out["n_name"],
            "event_type": out["event_type"],
            "n": pc.fill_null(out["n"], 0),
        }
    )


SQL_NATION_EVENT_GRID = """
WITH grid AS (
  SELECT n_name, event_type
  FROM nation CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
c AS (
  SELECT n_name, event_type, COUNT(*) AS n
  FROM events
  JOIN customer ON c_custkey = user_id
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
)
SELECT grid.n_name, grid.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN c USING (n_name, event_type)
"""


QUERIES.update({"nation_event_grid": q_nation_event_grid})
ORACLE_SQL.update({"nation_event_grid": SQL_NATION_EVENT_GRID})


# ---------------------------------------------------------------------------
# Round-3 batch 9: quality-weighted sampling + per-source cap
# (training-data curation: sample by score, enforce source quotas).

WSAMPLE_SEED = 99


def q_events_weighted_sample(sf_dir: str):
    """X38: weighted (quality-score) sampling — keep each row with
    probability p = clip(value/100, 0, 1), membership = splitmix64
    hash < floor(p * 2^64): deterministic (pure function of key and
    score), resumable, identical across cluster sizes, and the float
    arithmetic is a single division+multiply+floor on both sides so
    the oracle is EXACT. The p >= 1 rows are kept outright (2^64
    itself does not fit the threshold integer)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    sd = np.uint64(WSAMPLE_SEED)
    TWO64 = float(1 << 64)

    def f(b: pa.Table) -> pa.Table:
        k = b["event_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        h = ops._mix64(k ^ sd)
        v = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        p = np.clip(v / 100.0, 0.0, 1.0)
        full = p >= 1.0
        thresh = np.floor(p * TWO64)
        # cast via float64 -> uint64 is exact for thresh < 2^64
        keep = full | (h < np.where(full, 0.0, thresh).astype(np.uint64))
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_WEIGHTED_SAMPLE = """
WITH s AS ({hash_cte})
SELECT event_id, event_type, value FROM s
WHERE LEAST(GREATEST(value / 100.0, 0.0), 1.0) >= 1.0
   OR h < CAST(FLOOR(LEAST(GREATEST(value / 100.0, 0.0), 1.0)
               * 18446744073709551616.0) AS UBIGINT)
""".format(
    hash_cte=ops.splitmix64_sql(
        "events", "event_id", ["event_id", "event_type", "value"],
        seed=WSAMPLE_SEED,
    )
)


SOURCE_CAP = 12
CAP_SEED = 31


def q_docs_source_capped(sf_dir: str):
    """X39: per-source cap enforcement (source quota / domain
    balancing): keep at most SOURCE_CAP docs per source, chosen by
    splitmix64 hash rank — a deterministic uniform-without-replacement
    sample per group (the C4/RefinedWeb 'cap each domain' step).
    One shuffle on source; `ops.group_topk` sorts (h, doc_id) inside
    each group, so the kept set is a pure function of the doc ids."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    sd = np.uint64(CAP_SEED)

    def h(b: pa.Table) -> pa.Table:
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        return b.append_column("h", pa.array(ops._mix64(k ^ sd)))

    ranked = ops.group_topk(
        ds.map_batches(h, batch_size=None, batch_format="pyarrow"),
        "source",
        ["h", "doc_id"],
        SOURCE_CAP,
        ascending=[True, True],
    )
    return ranked.select_columns(["doc_id", "source"])


SQL_DOCS_SOURCE_CAPPED = """
WITH s AS ({hash_cte})
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM s)
WHERE rn <= {cap}
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "source"], seed=CAP_SEED
    ),
    cap=SOURCE_CAP,
)


QUERIES.update(
    {
        "events_weighted_sample": q_events_weighted_sample,
        "docs_source_capped": q_docs_source_capped,
    }
)

ORACLE_SQL.update(
    {
        "events_weighted_sample": SQL_EVENTS_WEIGHTED_SAMPLE,
        "docs_source_capped": SQL_DOCS_SOURCE_CAPPED,
    }
)


# ---------------------------------------------------------------------------
# G1: distributed connected components (round 3). The driver-side
# union-find in dedup.minhash_dedup_docs assumes the verified pair set
# fits the driver; ops.connected_components_distributed is the
# at-scale replacement (iterative min-label propagation — the whole
# label table stays a Dataset). This query runs it over the same
# MinHash pair detector; the oracle computes the identical labels in
# SQL with a recursive min-label CTE over the independent sequential
# reference's pair golden.


def q_dedup_components_docs(sf_dir: str):
    from . import pipeline
    from .extras import dedup

    with pipeline.hash_shuffle_ctx():
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        # pair set stays a Dataset end to end — no driver round-trip
        pairs_ds = dedup.minhash_lsh_pairs_ds(ds, "text", "doc_id", threshold=0.5)
        cc = ops.connected_components_distributed(
            pairs_ds, "a", "b", num_partitions=ops.default_join_partitions()
        )
        return cc


QUERIES["dedup_components_docs"] = q_dedup_components_docs

ORACLE_SQL["dedup_components_docs"] = f"""
WITH RECURSIVE sym AS (
  SELECT a AS src, b AS tgt
  FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_minhash.parquet')
  UNION ALL
  SELECT b, a FROM read_parquet('{_GOLDEN_DIR}/sf001_dedup_minhash.parquet')
),
comp(id, lbl) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT s.tgt, c.lbl FROM comp c JOIN sym s ON s.src = c.id
)
SELECT id AS node, MIN(lbl) AS label FROM comp GROUP BY id
"""


# ---------------------------------------------------------------------------
# Round-3 batch 12: exact grouped count-distinct, grouped mode,
# fixed-size deterministic global sample, per-row z-score
# normalization (stats join-back), cross-document duplicate n-gram
# fraction, and the Bloom-prefiltered decontamination scale path.


def q_user_distinct_types(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): two-phase — distinct
    (user, type) pairs first (per-batch combiner dedup bounds the
    shuffle to distinct combos, not events), then a combiner count
    per user. The KMV sketch (`events_kmv_distinct`) is the
    approximate sibling; this is the exact one."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    pairs = ops.distinct(ds, ["user_id", "event_type"])
    return ops.grouped_sum_count(
        pairs, keys=["user_id"], sums=[], count_alias="n_types"
    )


SQL_USER_DISTINCT_TYPES = """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


def q_user_top_type(sf_dir: str):
    """Grouped MODE (most frequent value per key, tie -> smallest):
    combiner counts per (user, type) bound the shuffle to distinct
    pairs, then a per-user argmax over that tiny table
    (`ops.group_topk`, k=1, mergesort-stable tie-break)."""
    counts = ops.grouped_sum_count(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        keys=["user_id", "event_type"],
        sums=[],
        count_alias="n",
    )
    ranked = ops.group_topk(
        counts, "user_id", ["n", "event_type"], 1, ascending=[False, True]
    )
    return ranked.select_columns(["user_id", "event_type", "n"])


SQL_USER_TOP_TYPE = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


GSAMPLE_K = 64
GSAMPLE_SEED = 4242


def q_docs_global_sample(sf_dir: str):
    """Fixed-size deterministic global sample — exactly K rows,
    uniform without replacement: the K smallest splitmix64(key^seed)
    hashes win (the deterministic cousin of reservoir sampling; same
    rows on any cluster size / re-run, resumable). Combiner: each
    block keeps its local top-K smallest (h, id) — the global
    sort+limit then sees O(blocks*K) rows, never the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    sd = np.uint64(GSAMPLE_SEED)

    def local_topk(b: pa.Table) -> pa.Table:
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        t = b.append_column("h", pa.array(ops._mix64(k ^ sd)))
        idx = pc.sort_indices(
            t, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        return t.take(idx[:GSAMPLE_K])

    part = ds.map_batches(local_topk, batch_size=None, batch_format="pyarrow")
    top = ops.topk(part, ["h", "doc_id"], GSAMPLE_K, descending=False)
    return top.select_columns(["doc_id", "source"])


SQL_DOCS_GLOBAL_SAMPLE = """
WITH s AS ({hash_cte})
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rn FROM s)
WHERE rn <= {k}
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "source"], seed=GSAMPLE_SEED
    ),
    k=GSAMPLE_K,
)


def q_events_user_zscore(sf_dir: str):
    """Per-row z-score normalization (the ML feature-standardization
    shape): per-user moments (n, Σc, Σc²) via the combiner aggregate,
    hash-joined back to the rows (stats side is bounded by distinct
    users; both sides scale). zdev = (n·c − S) / √(n·Q − S²) — all
    integer arithmetic up to ONE correctly-rounded sqrt and ONE
    division, so the oracle is bit-exact; NULL when the group is
    constant or a singleton (denominator 0). int64 bound: n·Σc² < 2⁶³
    (~10⁹ rows/group at 10⁴-cent values — rescale beyond)."""
    cols = ["event_id", "user_id", "value"]

    def prep(b: pa.Table) -> pa.Table:
        c = ops.cents(b["value"])
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "c": c,
                "c2": pc.multiply(c, c),
            }
        )

    # one narrow prep, materialized once: the stats plan and the join's
    # row side share it instead of re-running the read+prep (the
    # ADVICE-r2 double-execution pattern)
    rows = (
        _read(sf_dir, "events", cols)
        .map_batches(prep, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    stats = ops.grouped_sum_count(
        rows.select_columns(["user_id", "c", "c2"]),
        keys=["user_id"],
        sums=[("c", "s"), ("c2", "q")],
        count_alias="n",
    )
    joined = ops.normalize_blocks(
        ops.hash_join(
            ops.drop_empty_blocks(rows.drop_columns(["c2"])),
            ops.drop_empty_blocks(stats),
            on=("user_id",),
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("c", pa.int64()),
                ("s", pa.int64()),
                ("q", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.int64)
        c = b["c"].to_numpy().astype(np.int64)
        s = b["s"].to_numpy().astype(np.int64)
        qq = b["q"].to_numpy().astype(np.int64)
        num = (n * c - s).astype(np.float64)
        d = (n * qq - s * s).astype(np.float64)
        ok = d > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            z = num / np.sqrt(d)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "zdev": pa.array(np.where(ok, z, np.nan), pa.float64(), mask=~ok),
            }
        )

    return joined.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_USER_ZSCORE = """
WITH c AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
a AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM c GROUP BY user_id
)
SELECT c.event_id, c.user_id,
       CAST(a.n * c.c - a.s AS DOUBLE)
         / SQRT(CAST(NULLIF(a.n * a.q - a.s * a.s, 0) AS DOUBLE)) AS zdev
FROM c JOIN a USING (user_id)
"""


def q_doc_dup_ngrams(sf_dir: str):
    """Cross-document duplicate n-gram fraction (the RefinedWeb /
    Gopher 'dup n-gram' quality signal, corpus-wide): per doc, the
    fraction of its DISTINCT 4-grams that also occur in at least one
    other doc. Plan: vectorized gram explode (shared `_gram_batch`
    kernel) → distinct (doc, gram) → docs-per-gram combiner count →
    grams with count ≥ 2 feed a size-gated semi join back over the
    (doc, gram) table → the totals and the dup hits UNION with 0/1
    weight columns into ONE combiner groupby (no join for the final
    merge). Single final division — oracle exact. Docs shorter than
    K tokens have no grams and no row (matches SQL, which also
    groups over gram rows)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    grams = ds.map_batches(
        lambda b: _gram_batch(b), batch_format="pyarrow"
    )
    # three consumers (per-gram counts, the semi join's left side, the
    # totals tagging) — materialize the distinct table once instead of
    # re-running the explode+dedup per consumer; the object store
    # spills if it outgrows memory
    dg = ops.distinct(grams, ["doc_id", "gram"]).materialize()
    per_gram = ops.grouped_sum_count(dg, keys=["gram"], sums=[], count_alias="nd")
    dup = per_gram.filter(expr="nd >= 2").select_columns(["gram"])
    hit = ops.semi_join(dg, "gram", dup, "gram")

    def tag(one: int, dupw: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "one": pa.array(np.full(n, one, dtype=np.int64)),
                    "dup": pa.array(np.full(n, dupw, dtype=np.int64)),
                }
            )

        return f

    tagged = dg.map_batches(
        tag(1, 0), batch_size=None, batch_format="pyarrow"
    ).union(hit.map_batches(tag(0, 1), batch_size=None, batch_format="pyarrow"))
    agg = ops.grouped_sum_count(
        tagged, keys=["doc_id"], sums=[("one", "n_grams"), ("dup", "n_dup")]
    )

    def fin(b: pa.Table) -> pa.Table:
        ng = b["n_grams"].to_numpy().astype(np.float64)
        nd = b["n_dup"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_grams": b["n_grams"],
                "n_dup": b["n_dup"],
                "dup_frac": pa.array(nd / ng, pa.float64()),
            }
        )

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_DOC_DUP_NGRAMS = """
WITH g AS (
  SELECT DISTINCT doc_id, ARRAY_TO_STRING(toks[i:i+{km1}], ' ') AS gram
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
       UNNEST(RANGE(1, LEN(toks) - {km2})) u(i)
),
d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2)
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM d)) AS BIGINT)
         AS n_dup,
       CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM d)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM g GROUP BY doc_id
""".format(km1=DECON_K - 1, km2=DECON_K - 2)


DECON_BLOOM_BITS = 1 << 20
DECON_BLOOM_NHASH = 4


def q_contaminated_train_bloom(sf_dir: str):
    """X37's Bloom-filter scale path — SAME semantics and oracle as
    `contaminated_train`: the test-side gram set is folded into a
    fixed-size Bloom bitmap (per-block partial bitmaps OR-reduced on
    the driver — the driver never sees the keys), broadcast once via
    `ray.put`, and the train grams are pruned MAP-SIDE before the
    exact semi join verifies the survivors (Bloom negatives are
    exact, so pruning loses nothing; false positives are removed by
    the verify). Use over `semi_join`'s is_in gate when the test
    grams outgrow the broadcastable-keys budget but their BITS fit:
    the bitmap is O(m_bits) regardless of key count."""
    import ray as _ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sd = np.uint64(SPLIT_SEED)
    t1, t2 = np.uint64(SPLIT_TRAIN_END), np.uint64(SPLIT_VAL_END)

    def split_hash(b: pa.Table):
        k = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        return ops._mix64(k ^ sd)

    def train_grams(b: pa.Table) -> pa.Table:
        return _gram_batch(b, split_hash(b) < t1)

    def test_grams(b: pa.Table) -> pa.Table:
        return _gram_batch(b, split_hash(b) >= t2)

    tg = ds.map_batches(train_grams, batch_format="pyarrow")
    qg = ds.map_batches(test_grams, batch_format="pyarrow").select_columns(["gram"])
    qg = qg.materialize()  # bloom build + exact verify share one execution
    bloom = ops.bloom_build(
        qg, "gram", m_bits=DECON_BLOOM_BITS, nhash=DECON_BLOOM_NHASH
    )
    cand = ops.bloom_prefilter(
        tg,
        "gram",
        _ray.put(bloom),
        m_bits=DECON_BLOOM_BITS,
        nhash=DECON_BLOOM_NHASH,
    )
    hit = ops.semi_join(cand, "gram", qg, "gram")
    return ops.distinct(hit.select_columns(["doc_id"]), ["doc_id"])


QUERIES.update(
    {
        "user_distinct_types": q_user_distinct_types,
        "user_top_type": q_user_top_type,
        "docs_global_sample": q_docs_global_sample,
        "events_user_zscore": q_events_user_zscore,
        "doc_dup_ngrams": q_doc_dup_ngrams,
        "contaminated_train_bloom": q_contaminated_train_bloom,
    }
)

ORACLE_SQL.update(
    {
        "user_distinct_types": SQL_USER_DISTINCT_TYPES,
        "user_top_type": SQL_USER_TOP_TYPE,
        "docs_global_sample": SQL_DOCS_GLOBAL_SAMPLE,
        "events_user_zscore": SQL_EVENTS_USER_ZSCORE,
        "doc_dup_ngrams": SQL_DOC_DUP_NGRAMS,
        # identical semantics by construction: Bloom prefilter is a
        # superset filter, the exact semi join removes its FPs
        "contaminated_train_bloom": SQL_CONTAMINATED_TRAIN,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 13: skew-aware join, deterministic data-mixture
# epoch replication, per-window trending top-k.


SKEW_HOT_THRESHOLD = 15  # orders per custkey; sf skew tops out ~25


def q_cust_orders_skew(sf_dir: str):
    """J6: skew-aware equi-join — orders ⋈ customer through
    `ops.skew_join`: custkeys with > SKEW_HOT_THRESHOLD orders are
    joined map-side against a broadcast of their customer rows (the
    hot tuples never shuffle — the Zipf-head straggler fix), the
    cold tail goes through the normal hash join. Identical rows to
    the plain join, so the oracle is plain SQL; the threshold is set
    low enough that BOTH paths carry rows at every test sf."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "total_cents": ops.cents(b["o_totalprice"])}
        )

    joined = ops.skew_join(
        orders.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        on="o_custkey",
        right_on="c_custkey",
        hot_threshold=SKEW_HOT_THRESHOLD,
        num_partitions=ops.default_join_partitions(),
    )
    out = ops.grouped_sum_count(
        joined,
        keys=["c_nationkey"],
        sums=[("total_cents", "revenue_cents")],
        count_alias="n_orders",
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("c_nationkey"),
            "c_nationkey",
            pc.cast(b["c_nationkey"], pa.int64()),
        ),
        batch_size=None,
        batch_format="pyarrow",
    )


SQL_CUST_ORDERS_SKEW = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_nationkey
"""


MIX_FACTORS = {"src0": 2.5, "src1": 0.25, "src2": 1.75}  # others 1.0
MIX_SEED = 1337


def q_docs_mixture_epochs(sf_dir: str):
    """X46: deterministic data-mixture epoch replication (the LLaMA/
    DoReMi 'source X gets 2.5 epochs' step): each doc is emitted
    floor(r) times plus one more iff splitmix64(doc_id^seed) <
    floor(frac(r)·2⁶⁴) — a pure key function, so the materialized
    mixture is identical on any cluster size, resumable, and
    embarrassingly parallel (np.repeat per batch, no shuffle).
    Factors are exact binary fractions so the one float multiply+floor
    reproduces bit-exactly in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    sd = np.uint64(MIX_SEED)
    TWO64 = float(1 << 64)

    def f(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"].combine_chunks().to_pandas(), dtype=object)
        r = np.full(len(src), 1.0)
        for k, v in MIX_FACTORS.items():
            r[src == k] = v
        base = np.floor(r)
        frac = r - base
        key = b["doc_id"].combine_chunks().to_numpy().astype(np.int64).view(np.uint64)
        h = ops._mix64(key ^ sd)
        extra = h < np.floor(frac * TWO64).astype(np.uint64)
        copies = base.astype(np.int64) + extra
        doc_idx = np.repeat(np.arange(len(copies), dtype=np.int64), copies)
        cid = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            np.cumsum(copies) - copies, copies
        )
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(pa.array(doc_idx)),
                "source": b["source"].combine_chunks().take(pa.array(doc_idx)),
                "copy_id": pa.array(cid, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_DOCS_MIXTURE_EPOCHS = """
WITH s AS ({hash_cte}),
f AS (
  SELECT doc_id, source, h,
         CASE source {cases} ELSE 1.0 END AS r
  FROM s
),
c AS (
  SELECT doc_id, source,
         CAST(FLOOR(r) AS BIGINT)
         + CASE WHEN h < CAST(FLOOR((r - FLOOR(r)) * 18446744073709551616.0)
                             AS UBIGINT)
                THEN 1 ELSE 0 END AS copies
  FROM f
)
SELECT doc_id, source, CAST(i AS BIGINT) AS copy_id
FROM c, UNNEST(RANGE(0, copies)) u(i)
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "source"], seed=MIX_SEED
    ),
    cases=" ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_FACTORS.items()),
)


TREND_TOPK = 3


def q_hour_top_types(sf_dir: str):
    """X47: per-window trending top-k — the top event types per
    tumbling hour with their rank. Combiner counts per (hour, type)
    bound the shuffle to distinct pairs; `ops.group_topk` ranks
    inside each window (stable tie-break on type)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(b["ts"], unit="hour"),
                "event_type": b["event_type"],
            }
        )

    counts = ops.grouped_sum_count(
        ds.map_batches(f, batch_size=None, batch_format="pyarrow"),
        keys=["window_start", "event_type"],
        sums=[],
        count_alias="n",
    )
    return ops.group_topk(
        counts, "window_start", ["n", "event_type"], TREND_TOPK,
        ascending=[False, True],
    )


SQL_HOUR_TOP_TYPES = f"""
SELECT window_start, event_type, n, rn FROM (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY date_trunc('hour', ts)
           ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY 1, 2)
WHERE rn <= {TREND_TOPK}
"""


QUERIES.update(
    {
        "cust_orders_skew": q_cust_orders_skew,
        "docs_mixture_epochs": q_docs_mixture_epochs,
        "hour_top_types": q_hour_top_types,
    }
)

ORACLE_SQL.update(
    {
        "cust_orders_skew": SQL_CUST_ORDERS_SKEW,
        "docs_mixture_epochs": SQL_DOCS_MIXTURE_EPOCHS,
        "hour_top_types": SQL_HOUR_TOP_TYPES,
    }
)


# ---------------------------------------------------------------------------
# X48: kNN-graph construction (round 3 batch 13b) — every vector's
# top-5 cosine neighbors searched within its k-means cell (the scale
# recipe: no corpus broadcast, no driver collect, one shuffle on
# cell). Oracled against the independent sequential twin's committed
# golden (reference_impl/sketch.py run_knn_graph — per-pair np.dot
# loops vs the engine's per-cell GEMM).


def q_knn_graph(sf_dir: str):
    from .extras import cluster

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cluster.knn_graph(ds, k_neighbors=5, k=10, iters=8)


QUERIES["knn_graph"] = q_knn_graph

ORACLE_SQL["knn_graph"] = (
    "SELECT query_id, neighbor_id, rn "
    f"FROM read_parquet('{_GOLDEN_DIR}/sf001_knn_graph.parquet')"
)


# ---------------------------------------------------------------------------
# X49: duplicated-span token coverage (fixed-window exact-substring
# dedup signal, Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better" — fixed L-token windows instead of the
# suffix array; the detection side of substring dedup). A token
# position counts as duplicated when ANY L-gram occurrence covering
# it has >= 2 occurrences corpus-wide (within- or cross-doc).

DUPSPAN_L = 8


def _gram_pos_batch(b: pa.Table, k: int) -> pa.Table:
    """(doc_id, pos, gram) rows — `_gram_batch` plus the 0-based token
    position of each gram (same offset arithmetic, no per-row loop)."""
    toks = pc.split_pattern(b["text"].combine_chunks(), " ")
    offs = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values
    doc_np = b["doc_id"].combine_chunks().to_numpy()
    m = np.maximum(np.diff(offs) - (k - 1), 0)
    total = int(m.sum())
    base = np.repeat(offs[:-1], m)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    idx = base + within
    parts = [flat.take(pa.array(idx + j)) for j in range(k)]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_np, m)),
            "pos": pa.array(within, pa.int64()),
            "gram": pc.binary_join_element_wise(*parts, " "),
        }
    )


def q_doc_dup_spans(sf_dir: str):
    """X49 plan: positional gram explode (materialized once — two
    consumers) → occurrence count per gram (combiner) → grams with
    count ≥ 2 semi-join back (size-gated) → vectorized coverage
    explode (each hit covers pos..pos+L−1) → distinct (doc, token)
    → per-doc combiner count, left-joined to per-doc token totals
    (docs shorter than L tokens are out of scope on both sides).
    Output: (doc_id, n_tokens, n_dup_tokens, dup_token_frac) with one
    final division. At removal time the distinct (doc, token) table
    is exactly the mask a cleaner would anti-join against."""
    L = DUPSPAN_L
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    g = ds.map_batches(
        lambda b: _gram_pos_batch(b, L), batch_format="pyarrow"
    ).materialize()
    per_gram = ops.grouped_sum_count(
        g.select_columns(["gram"]), keys=["gram"], sums=[], count_alias="n"
    )
    dup = per_gram.filter(expr="n >= 2").select_columns(["gram"])
    hits = ops.semi_join(g, "gram", dup, "gram")

    def cover(b: pa.Table) -> pa.Table:
        pos = b["pos"].to_numpy().astype(np.int64)
        n = len(pos)
        idx = np.repeat(np.arange(n, dtype=np.int64), L)
        tok = np.repeat(pos, L) + np.tile(np.arange(L, dtype=np.int64), n)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(pa.array(idx)),
                "tok": pa.array(tok, pa.int64()),
            }
        )

    cov = ops.distinct(
        hits.map_batches(cover, batch_size=None, batch_format="pyarrow"),
        ["doc_id", "tok"],
    )
    ndup = ops.grouped_sum_count(
        cov, keys=["doc_id"], sums=[], count_alias="n_dup_tokens"
    )

    def totals(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        n = np.diff(toks.offsets.to_numpy().astype(np.int64))
        keep = n >= L
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().filter(pa.array(keep)),
                "n_tokens": pa.array(n[keep], pa.int64()),
            }
        )

    tot = ds.map_batches(totals, batch_size=None, batch_format="pyarrow")
    j = ops.normalize_blocks(
        ops.hash_join(
            ops.drop_empty_blocks(tot),
            ops.drop_empty_blocks(ndup),
            on=("doc_id",),
            join_type="left_outer",
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_dup_tokens", pa.int64()),
            ]
        ),
    )

    def fin(b: pa.Table) -> pa.Table:
        nd = pc.fill_null(b["n_dup_tokens"], 0)
        frac = nd.to_numpy().astype(np.float64) / b["n_tokens"].to_numpy().astype(
            np.float64
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": b["n_tokens"],
                "n_dup_tokens": nd,
                "dup_token_frac": pa.array(frac, pa.float64()),
            }
        )

    return j.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_DOC_DUP_SPANS = """
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, i AS pos, ARRAY_TO_STRING(toks[i:i+{lm1}], ' ') AS gram
      FROM t, UNNEST(RANGE(1, LEN(toks) - {lm2})) u(i)),
d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
cov AS (SELECT DISTINCT doc_id, pos + j AS tok
        FROM g JOIN d USING (gram), UNNEST(RANGE(0, {l})) v(j)),
tot AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_tokens
        FROM t WHERE LEN(toks) >= {l}),
c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_tokens
      FROM cov GROUP BY doc_id)
SELECT tot.doc_id, tot.n_tokens,
       COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
       CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE)
         / CAST(tot.n_tokens AS DOUBLE) AS dup_token_frac
FROM tot LEFT JOIN c USING (doc_id)
""".format(l=DUPSPAN_L, lm1=DUPSPAN_L - 1, lm2=DUPSPAN_L - 2)


QUERIES["doc_dup_spans"] = q_doc_dup_spans
ORACLE_SQL["doc_dup_spans"] = SQL_DOC_DUP_SPANS


# ---------------------------------------------------------------------------
# Round-3 batch 14: global PERCENT_RANK (fourth consumer of the O4
# prefix-sum primitive) and inverted-index / postings-list build.


def q_orders_percent_rank(sf_dir: str):
    """W5: global PERCENT_RANK over price — (rank−1)/(n−1) with a
    unique (cents, key) sort order, so rank == row_number and the
    0-based `seq_pos` from `ops.with_global_index` IS rank−1. n comes
    from parquet metadata (no extra pass); ONE final division, oracle
    written with the same explicit arithmetic (not the built-in
    PERCENT_RANK) so both sides share the exact formula."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n = ds.count()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "cents": ops.cents(b["o_totalprice"])}
        )

    idx = ops.with_global_index(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        ["cents", "o_orderkey"],
    )
    denom = float(n - 1)

    def fin(b: pa.Table) -> pa.Table:
        pr = b["seq_pos"].to_numpy().astype(np.float64) / denom
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "pct_rank": pa.array(pr, pa.float64())}
        )

    return idx.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_ORDERS_PERCENT_RANK = """
WITH c AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
n AS (SELECT COUNT(*) AS total FROM c)
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) - 1 AS DOUBLE)
         / CAST(n.total - 1 AS DOUBLE) AS pct_rank
FROM c, n
"""


POSTINGS_SHARD = 128  # doc-id range width per postings shard row


def q_term_postings(sf_dir: str):
    """X50: inverted-index (postings-list) build, SHARDED — per
    (term, shard) its posting sub-list, plus the term's global
    document frequency. A shard is a fixed doc-id range
    (``doc_id // POSTINGS_SHARD``): deterministic, layout-independent,
    and it bounds EVERY group a worker must hold to at most
    POSTINGS_SHARD doc ids — a stopword appearing in all N docs
    becomes N/POSTINGS_SHARD bounded rows instead of one corpus-sized
    group + multi-GB string cell (the round-3 weak spot). Plan: token
    explode (the `_gram_batch` kernel at k=1 — zero per-row loops) →
    distinct (term, doc) combiner-dedup → vectorized shard-key add →
    one shuffle on (term, shard) with bounded groups → combiner df
    count per term → hash join of df onto the shard rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # materialized: both the shard build and the df count consume it
    # (unmaterialized branches re-execute the explode+distinct twice)
    pairs = ops.distinct(
        ds.map_batches(lambda b: _gram_batch(b, k=1), batch_format="pyarrow"),
        ["doc_id", "gram"],
    ).materialize()
    sharded = pairs.map_batches(
        lambda b: b.append_column(
            "shard_id",
            pa.array(
                b["doc_id"].to_numpy(zero_copy_only=False) // POSTINGS_SHARD,
                pa.int64(),
            ),
        ),
        batch_size=None,
        batch_format="pyarrow",
    )

    import pandas as pd

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            {
                "term": [g["gram"].iloc[0]],
                "shard_id": np.array([g["shard_id"].iloc[0]], dtype=np.int64),
                "postings": [",".join(str(i) for i in ids)],
            }
        )

    shards = sharded.groupby(["gram", "shard_id"]).map_groups(
        per_shard, batch_format="pandas"
    )
    df = ops.grouped_sum_count(
        pairs, keys=["gram"], sums=[], count_alias="df"
    ).rename_columns({"gram": "term"})
    return ops.normalize_blocks(
        ops.hash_join(
            ops.drop_empty_blocks(shards),
            ops.drop_empty_blocks(df),
            on=("term",),
            num_partitions=ops.default_join_partitions(),
        ),
        pa.schema(
            [
                ("term", pa.string()),
                ("shard_id", pa.int64()),
                ("postings", pa.string()),
                ("df", pa.int64()),
            ]
        ),
    )


SQL_TERM_POSTINGS = f"""
WITH p AS (
  SELECT DISTINCT doc_id, tok AS term
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
),
d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term)
SELECT p.term,
       CAST(doc_id // {POSTINGS_SHARD} AS BIGINT) AS shard_id,
       STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings,
       d.df
FROM p JOIN d USING (term)
GROUP BY p.term, shard_id, d.df
"""


QUERIES.update(
    {
        "orders_percent_rank": q_orders_percent_rank,
        "term_postings": q_term_postings,
    }
)

ORACLE_SQL.update(
    {
        "orders_percent_rank": SQL_ORDERS_PERCENT_RANK,
        "term_postings": SQL_TERM_POSTINGS,
    }
)


# ---------------------------------------------------------------------------
# Round-3 batch 15: the from-scratch Levenshtein kernel under a real
# DuckDB oracle (L2 was property-tested only — DuckDB ships
# levenshtein(), fuzz-checked identical on 300 random pairs; its
# jaro_winkler_similarity is a DIFFERENT variant, so JW stays
# property-tested), and ISO day-of-week grouping (F3 family).


def q_part_name_lev(sf_dir: str):
    """Edit-distance scoring as a relational operator: per part, the
    Levenshtein distance between its name and its type string —
    kgray/similarity.py's from-scratch kernel vs DuckDB's built-in.
    The per-pair DP is the kernel itself (no vectorized form exists);
    embarrassingly parallel per batch, kernel-bound by design."""
    from .similarity import levenshtein

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def f(b: pa.Table) -> pa.Table:
        names = b["p_name"].to_pylist()
        types = b["p_type"].to_pylist()
        d = [levenshtein(a or "", t or "") for a, t in zip(names, types)]
        return pa.table(
            {"p_partkey": b["p_partkey"], "lev": pa.array(d, pa.int64())}
        )

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_PART_NAME_LEV = """
SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev
FROM part
"""


def q_events_by_dow(sf_dir: str):
    """F3: ISO day-of-week grouped aggregate — Arrow's day_of_week
    (Mon=0) shifted to ISODOW (Mon=1..Sun=7); combiner count + exact
    cents sum per weekday."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def f(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b["ts"]), 1)
        return pa.table(
            {
                "isodow": pc.cast(dow, pa.int64()),
                "value_cents": ops.cents(b["value"]),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(f, batch_size=None, batch_format="pyarrow"),
        keys=["isodow"],
        sums=[("value_cents", "sum_value_cents")],
        count_alias="n",
    )


SQL_EVENTS_BY_DOW = """
SELECT CAST(ISODOW(ts) AS BIGINT) AS isodow,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1
"""


QUERIES.update(
    {"part_name_lev": q_part_name_lev, "events_by_dow": q_events_by_dow}
)
ORACLE_SQL.update(
    {"part_name_lev": SQL_PART_NAME_LEV, "events_by_dow": SQL_EVENTS_BY_DOW}
)


# X51: the unbounded-domain scale path of X32 — same result, same
# oracle, bounded memory everywhere (ops.exact_heavy_hitters: per-block
# top-m candidates + exact recount + loud guarantee check). Two passes
# over the bigram explode by design.


def q_doc_bigrams_top20_sketch(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigrams(b: pa.Table) -> pa.Table:
        g = _gram_batch(b, k=2)
        return pa.table({"bg": g["gram"]})

    bg = ds.map_batches(bigrams, batch_format="pyarrow")
    return ops.exact_heavy_hitters(bg, "bg", BIGRAM_TOPK, sketch_k=1024)


QUERIES["doc_bigrams_top20_sketch"] = q_doc_bigrams_top20_sketch
ORACLE_SQL["doc_bigrams_top20_sketch"] = SQL_DOC_BIGRAMS_TOP20


# ---------------------------------------------------------------------------
# X52: video frame-sample → resize → per-frame aggregate (the two
# multimodal stages the brief names beyond decode/featurize), oracled
# like multimodal_features: an independent sequential twin writes the
# expected parquet that the SQL reads.

VIDEO_ORACLE_PATH = "/tmp/kgray_oracle/video_expected_100.parquet"
VIDEO_N, VIDEO_STRIDE, VIDEO_WH = 100, 4, 8


def write_video_expected() -> str:
    import pyarrow.parquet as _pq

    from .extras import multimodal

    os.makedirs(os.path.dirname(VIDEO_ORACLE_PATH), exist_ok=True)
    _pq.write_table(
        multimodal.expected_video_table(VIDEO_N, VIDEO_STRIDE, VIDEO_WH),
        VIDEO_ORACLE_PATH,
    )
    return VIDEO_ORACLE_PATH


def q_video_frame_features(sf_dir: str):
    """X52: fixture videos → `sample_frames` (flat-map, every 4th
    frame re-wrapped as an image blob) → `resize_images` (8×8 integer
    nearest-neighbor) → vectorized per-frame pixel sum (exact int64).
    The frame table is bounded (n·frames/stride rows) so the final
    collect is small; the stages themselves stream."""
    import ray.data as _rd

    from .extras import multimodal

    vids = _rd.from_arrow(multimodal.make_video_table(VIDEO_N))
    frames = multimodal.resize_images(
        multimodal.sample_frames(vids, stride=VIDEO_STRIDE), VIDEO_WH, VIDEO_WH
    )

    def px_sum(b: pa.Table) -> pa.Table:
        blobs = b["image"].to_pylist()
        sums = [
            int(np.frombuffer(bl[16:], dtype=np.uint8).sum(dtype=np.int64))
            for bl in blobs
        ]
        return pa.table(
            {
                "vid_id": b["vid_id"],
                "frame_idx": b["frame_idx"],
                "px_sum": pa.array(sums, type=pa.int64()),
            }
        )

    out = frames.map_batches(px_sum, batch_size=None, batch_format="pyarrow")
    return ops.collect_table(
        out,
        schema=pa.schema(
            [("vid_id", pa.int64()), ("frame_idx", pa.int64()), ("px_sum", pa.int64())]
        ),
        sort_by=["vid_id", "frame_idx"],
    )


SQL_VIDEO_FRAME_FEATURES = (
    "SELECT vid_id, frame_idx, px_sum "
    f"FROM read_parquet('{VIDEO_ORACLE_PATH}')"
)

QUERIES["video_frame_features"] = q_video_frame_features
ORACLE_SQL["video_frame_features"] = SQL_VIDEO_FRAME_FEATURES


# ---------------------------------------------------------------------------
# A15: grouped MIN/MAX extremes (the combiner pattern with order
# statistics instead of sums — min/max merge associatively, so the
# shuffle still carries one partial row per (key, batch)).


def q_user_value_extremes(sf_dir: str):
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "c": ops.cents(b["value"]),
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate(
            [("c", "min"), ("c", "max"), ("ts_us", "min"), ("ts_us", "max")]
        )
        return g.rename_columns(["user_id", "_cmin", "_cmax", "_tmin", "_tmax"])

    agg = (
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow")
        .map_batches(partial, batch_size=None, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Min("_cmin", alias_name="min_cents"),
            Max("_cmax", alias_name="max_cents"),
            Min("_tmin", alias_name="first_ts_us"),
            Max("_tmax", alias_name="last_ts_us"),
        )
    )
    return agg


SQL_USER_VALUE_EXTREMES = """
SELECT user_id,
       MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS min_cents,
       MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS max_cents,
       CAST(EPOCH_US(MIN(ts)) AS BIGINT) AS first_ts_us,
       CAST(EPOCH_US(MAX(ts)) AS BIGINT) AS last_ts_us
FROM events GROUP BY user_id
"""

QUERIES["user_value_extremes"] = q_user_value_extremes
ORACLE_SQL["user_value_extremes"] = SQL_USER_VALUE_EXTREMES


def q_orders_pagerank(sf_dir: str):
    """G2: deterministic integer PageRank (3 fixed-point push rounds)
    over the customer->order-bucket digraph (dst = o_orderkey % 1500,
    a constant so every scale factor runs the same rule). Exercises
    the iterative join+combiner machinery of `ops.pagerank`; the
    oracle unrolls the identical integer recurrence in SQL."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges(b: pa.Table) -> pa.Table:
        dst = b["o_orderkey"].to_numpy(zero_copy_only=False) % 1500
        return pa.table(
            {"src": b["o_custkey"], "dst": pa.array(dst.astype(np.int64))}
        )

    e = ops.distinct(
        ds.map_batches(edges, batch_size=None, batch_format="pyarrow"),
        ["src", "dst"],
    )
    return ops.pagerank(e, "src", "dst", iters=3)


def _pagerank_sql() -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % 1500 AS dst FROM orders
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, 4):
        steps.append(
            f""",
p{i} AS (SELECT e.dst AS node, SUM((85 * r{i-1}.r) // (100 * d.deg)) AS s
       FROM edges e
       JOIN deg d ON e.src = d.src
       JOIN r{i-1} ON e.src = r{i-1}.node
       GROUP BY e.dst),
r{i} AS (SELECT n.node, CAST(150000 + COALESCE(p{i}.s, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN p{i} ON n.node = p{i}.node)"""
        )
    return head + "".join(steps) + "\nSELECT node, r AS rank_fp FROM r3"


SQL_ORDERS_PAGERANK = _pagerank_sql()

QUERIES["orders_pagerank"] = q_orders_pagerank
ORACLE_SQL["orders_pagerank"] = SQL_ORDERS_PAGERANK


def q_orders_pagerank_mass(sf_dir: str):
    """G2b (VERDICT r3 #4): the MASS-CONSERVING PageRank variant —
    dangling nodes' rank is redistributed evenly to all nodes each
    iteration (one extra global int64 sum; the per-node share is a
    constant folded into the base term, so no extra shuffle). Same
    customer->order-bucket digraph as `orders_pagerank`; the oracle
    unrolls the identical integer recurrence including the dangling
    term."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges(b: pa.Table) -> pa.Table:
        dst = b["o_orderkey"].to_numpy(zero_copy_only=False) % 1500
        return pa.table(
            {"src": b["o_custkey"], "dst": pa.array(dst.astype(np.int64))}
        )

    e = ops.distinct(
        ds.map_batches(edges, batch_size=None, batch_format="pyarrow"),
        ["src", "dst"],
    )
    return ops.pagerank(e, "src", "dst", iters=3, dangling="redistribute")


def _pagerank_mass_sql() -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % 1500 AS dst FROM orders
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
v AS (SELECT COUNT(*) AS nv FROM nodes),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, 4):
        steps.append(
            f""",
dm{i} AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r{i-1}
        WHERE node NOT IN (SELECT src FROM deg)),
p{i} AS (SELECT e.dst AS node, SUM((85 * r{i-1}.r) // (100 * d.deg)) AS s
       FROM edges e
       JOIN deg d ON e.src = d.src
       JOIN r{i-1} ON e.src = r{i-1}.node
       GROUP BY e.dst),
r{i} AS (SELECT n.node,
              CAST(150000 + (85 * dm{i}.dm) // (100 * v.nv)
                   + COALESCE(p{i}.s, 0) AS BIGINT) AS r
       FROM nodes n CROSS JOIN dm{i} CROSS JOIN v
       LEFT JOIN p{i} ON n.node = p{i}.node)"""
        )
    return head + "".join(steps) + "\nSELECT node, r AS rank_fp FROM r3"


QUERIES["orders_pagerank_mass"] = q_orders_pagerank_mass
ORACLE_SQL["orders_pagerank_mass"] = _pagerank_mass_sql()


def q_user_cms_counts(sf_dir: str):
    """X80: Count-Min-sketch estimated event count per user. The
    sketch is built in one combiner-bounded pass (<= depth*width rows
    ever reach the driver), broadcast ONCE via ray.put, and the
    distinct-user table is estimated map-side. Deterministic hashes
    make the ESTIMATE itself oracle-checkable: the SQL rebuilds the
    identical counters and takes the same row-wise minimum."""
    import numpy as np
    import ray as _ray

    ds = _read(sf_dir, "events", ["user_id"])
    sketch = ops.cms_build(ds, "user_id", depth=4, width=1024, seed=7)
    sk_ref = _ray.put(sketch)
    users = ops.distinct(ds, ["user_id"])

    def est(b: pa.Table) -> pa.Table:
        sk = _ray.get(sk_ref)
        u = b["user_id"].combine_chunks().to_numpy()
        return pa.table(
            {"user_id": b["user_id"], "est_n": ops.cms_estimate(u, sk, seed=7)}
        )

    return users.map_batches(est, batch_size=None, batch_format="pyarrow")


def _cms_sql(depth: int = 4, width: int = 1024, seed: int = 7) -> str:
    parts = ["WITH keys AS (SELECT DISTINCT user_id FROM events)"]
    ests = []
    for j in range(depth):
        hj = ops.splitmix64_sql("events", "user_id", ["user_id"], seed=seed + j)
        kj = ops.splitmix64_sql("keys", "user_id", ["user_id"], seed=seed + j)
        parts.append(
            f""",
c{j} AS (SELECT h % {width}::UBIGINT AS bucket, COUNT(*) AS n
        FROM ({hj}) GROUP BY bucket),
e{j} AS (SELECT k.user_id, c{j}.n
        FROM (SELECT user_id, h % {width}::UBIGINT AS bucket FROM ({kj})) k
        JOIN c{j} USING (bucket))"""
        )
        ests.append(f"e{j}.n")
    joins = "".join(f" JOIN e{j} USING (user_id)" for j in range(1, depth))
    return (
        "".join(parts)
        + f"""
SELECT e0.user_id, CAST(LEAST({', '.join(ests)}) AS BIGINT) AS est_n
FROM e0{joins}"""
    )


SQL_USER_CMS_COUNTS = _cms_sql()

QUERIES["user_cms_counts"] = q_user_cms_counts
ORACLE_SQL["user_cms_counts"] = SQL_USER_CMS_COUNTS


def q_events_cube(sf_dir: str):
    """A16: full CUBE over (event_type, isodow) — all four grouping
    sets with 'ALL' sentinels. One distributed combiner groupby
    computes the finest level; every coarser level re-aggregates that
    bounded table via `ops.cube_from_finest` (cube cost is independent
    of corpus size)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "isodow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1), pa.int64()),
                "cents": ops.cents(b["value"]),
            }
        )

    fine = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["event_type", "isodow"],
        sums=[("cents", "sum_cents")],
        count_alias="n",
    )
    fine_t = ops.collect_table(
        fine,
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("isodow", pa.int64()),
                ("sum_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    return ops.cube_from_finest(
        fine_t, ["event_type", "isodow"], ["n", "sum_cents"]
    )


SQL_EVENTS_CUBE = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(isodow AS VARCHAR), 'ALL') AS isodow,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM (SELECT event_type, CAST(ISODOW(ts) AS BIGINT) AS isodow,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)
GROUP BY CUBE (event_type, isodow)
"""

QUERIES["events_cube"] = q_events_cube
ORACLE_SQL["events_cube"] = SQL_EVENTS_CUBE


def q_user_retention_cohorts(sf_dir: str):
    """X81: cohort retention — users grouped by first-active day,
    counted at each later active-day offset (the standard
    training-telemetry retention triangle). Plan: combiner-distinct
    (user, day) pairs bound the shuffle to active pairs; the cohort
    (per-user min day) is a combiner groupby over that table; ONE
    hash join attaches cohorts back and a final combiner groupby
    counts — the distinct pair table materializes once and feeds both
    sides (no double execution)."""
    from ray.data.aggregate import Min as _Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86400 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table(
            {
                "user_id": b["user_id"],
                "wk": pc.divide(us, DAY_US),
            }
        )

    weeks = ops.distinct(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        ["user_id", "wk"],
    ).materialize()  # feeds both the cohort aggregate and the join
    cohort = (
        weeks.map_batches(
            lambda b: b.group_by(["user_id"]).aggregate([("wk", "min")])
            .rename_columns(["jid", "cw"]),
            batch_size=None,
            batch_format="pyarrow",
        )
        .groupby("jid")
        .aggregate(_Min("cw", alias_name="cw"))
    )
    joined = ops.normalize_blocks(
        ops.hash_join(
            weeks,
            ops.drop_empty_blocks(cohort),
            on=("user_id",),
            right_on=("jid",),
        ),
        pa.schema(
            [("user_id", pa.int64()), ("wk", pa.int64()), ("cw", pa.int64())]
        ),
    )

    def offs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": b["cw"],
                "day_offset": pc.subtract(b["wk"], b["cw"]),
            }
        )

    return ops.grouped_sum_count(
        joined.map_batches(offs, batch_size=None, batch_format="pyarrow"),
        keys=["cohort_day", "day_offset"],
        sums=[],
        count_alias="n_users",
    )


SQL_USER_RETENTION = """
WITH w AS (SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS wk
           FROM events),
c AS (SELECT user_id, MIN(wk) AS cw FROM w GROUP BY user_id)
SELECT CAST(c.cw AS BIGINT) AS cohort_day,
       CAST(w.wk - c.cw AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM w JOIN c USING (user_id) GROUP BY 1, 2
"""

QUERIES["user_retention_cohorts"] = q_user_retention_cohorts
ORACLE_SQL["user_retention_cohorts"] = SQL_USER_RETENTION


def q_orders_profile(sf_dir: str):
    """X82: data-quality column profile of the orders table — row /
    null / exact-distinct counts and native-typed min/max per column
    (see `ops.profile_columns` for the two bounded passes)."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    ds = _read(sf_dir, "orders", cols)
    return ops.profile_columns(ds, cols)


def _profile_sql() -> str:
    parts = []
    for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]:
        parts.append(
            f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


SQL_ORDERS_PROFILE = _profile_sql()

QUERIES["orders_profile"] = q_orders_profile
ORACLE_SQL["orders_profile"] = SQL_ORDERS_PROFILE


def q_graph_triangles(sf_dir: str):
    """G3: exact triangle count of the undirected customer/order-
    bucket graph (same edge rule as `orders_pagerank` so the two
    graph operators share one corpus-derived graph)."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges(b: pa.Table) -> pa.Table:
        dst = b["o_orderkey"].to_numpy(zero_copy_only=False) % 1500
        return pa.table(
            {"src": b["o_custkey"], "dst": pa.array(dst.astype(np.int64))}
        )

    e = ds.map_batches(edges, batch_size=None, batch_format="pyarrow")
    return ops.triangle_count(e, "src", "dst")


SQL_GRAPH_TRIANGLES = """
WITH e AS (
  SELECT DISTINCT LEAST(o_custkey, o_orderkey % 1500) AS a,
                  GREATEST(o_custkey, o_orderkey % 1500) AS b
  FROM orders WHERE o_custkey <> o_orderkey % 1500
)
SELECT COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""

QUERIES["graph_triangles"] = q_graph_triangles
ORACLE_SQL["graph_triangles"] = SQL_GRAPH_TRIANGLES


def q_events_winsorized(sf_dir: str):
    """X83: per-group winsorized (P10/P90-clipped) mean — the robust
    aggregate used to keep outliers from dominating quality scores.
    ONE combiner groupby bounds the shuffle to distinct (type, cents)
    pairs; both clip bounds come from a single cumulative walk per
    group over that table (QUANTILE_DISC convention, rank ceil(q*n));
    the tiny (group, lo, hi) table broadcasts into a map-side clip and
    a second combiner groupby sums exact clipped cents. One final
    float64 division per group — bit-identical to SQL."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "c": ops.cents(b["value"])}
        )

    prepped = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).materialize()  # feeds the quantile plan AND the clip pass

    counts = ops.grouped_sum_count(
        prepped, keys=["event_type", "c"], sums=[], count_alias="_n"
    )

    def bounds(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["c"].to_numpy()
        cnts = g["_n"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        pick = lambda q: vals[
            np.searchsorted(cum, max(int(np.ceil(q * n)), 1))
        ]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "lo": [pick(0.1)],
                "hi": [pick(0.9)],
            }
        )

    bt = (
        counts.groupby("event_type")
        .map_groups(bounds, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per group
    lo = dict(zip(bt.event_type, bt.lo))
    hi = dict(zip(bt.event_type, bt.hi))

    def clip(b: pa.Table) -> pa.Table:
        t = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        l = np.array([lo[x] for x in t], dtype=np.int64)
        h = np.array([hi[x] for x in t], dtype=np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "w": np.minimum(np.maximum(c, l), h),
            }
        )

    agg = ops.grouped_sum_count(
        prepped.map_batches(clip, batch_size=None, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("w", "sum_winsorized_cents")],
        count_alias="n",
    )

    def fin(b: pa.Table) -> pa.Table:
        s = b["sum_winsorized_cents"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "winsorized_mean_cents", pa.array(s.astype(np.float64) / n)
        )

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_WINSORIZED = """
WITH b AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
q AS (SELECT event_type, QUANTILE_DISC(c, 0.1) AS lo,
             QUANTILE_DISC(c, 0.9) AS hi
      FROM b GROUP BY event_type)
SELECT b.event_type, COUNT(*) AS n,
       CAST(SUM(LEAST(GREATEST(b.c, q.lo), q.hi)) AS BIGINT)
         AS sum_winsorized_cents,
       CAST(SUM(LEAST(GREATEST(b.c, q.lo), q.hi)) AS BIGINT)
         / COUNT(*) AS winsorized_mean_cents
FROM b JOIN q USING (event_type) GROUP BY b.event_type
"""

QUERIES["events_winsorized"] = q_events_winsorized
ORACLE_SQL["events_winsorized"] = SQL_EVENTS_WINSORIZED


def q_jaccard_prefix_pairs(sf_dir: str):
    """X84: exact prefix-filtered set-similarity self-join (PPJoin
    family) — every doc pair with word-4-gram Jaccard >= 0.6. The
    brute-force SQL oracle independently validates the prefix
    filter's losslessness claim. (Runs under the DEFAULT shuffle
    strategy: this plan is join/map_groups-shaped, not
    banding-shaped, and the hash-shuffle context deadlocked its
    map_groups at low CPU counts — measured, not assumed.)"""
    from .extras import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.jaccard_prefix_join(
        ds, "text", "doc_id", k=4, theta_num=6, theta_den=10
    )


SQL_JACCARD_PREFIX = """
WITH g AS (
  SELECT DISTINCT doc_id, ARRAY_TO_STRING(toks[i:i+3], ' ') AS gram
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
       UNNEST(RANGE(1, LEN(toks) - 2)) u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
ix AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
       FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
       GROUP BY 1, 2)
SELECT a, b, inter, sa.n + sb.n - inter AS uni
FROM ix JOIN sz sa ON ix.a = sa.doc_id JOIN sz sb ON ix.b = sb.doc_id
WHERE 10 * inter >= 6 * (sa.n + sb.n - inter)
"""

QUERIES["jaccard_prefix_pairs"] = q_jaccard_prefix_pairs
ORACLE_SQL["jaccard_prefix_pairs"] = SQL_JACCARD_PREFIX


def q_event_transitions(sf_dir: str):
    """X85: event-type transition matrix (first-order Markov counts)
    — per user, consecutive event pairs in (ts, event_id) order,
    counted over the corpus. One key shuffle via `ops.group_lag`
    (vectorized per-key sort+shift), then a combiner groupby over the
    bounded (prev, next) domain."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    lagged = ops.group_lag(
        ds, "user_id", ["ts", "event_id"], {"event_type": "prev_type"}
    )

    def pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b["prev_type"]))
        return pa.table(
            {"prev_type": t["prev_type"], "next_type": t["event_type"]}
        )

    return ops.grouped_sum_count(
        lagged.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        keys=["prev_type", "next_type"],
        sums=[],
        count_alias="n",
    )


SQL_EVENT_TRANSITIONS = """
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM (SELECT event_type,
             LAG(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""

QUERIES["event_transitions"] = q_event_transitions
ORACLE_SQL["event_transitions"] = SQL_EVENT_TRANSITIONS


def q_events_corr(sf_dir: str):
    """A17: grouped Pearson correlation (value cents x hour-of-day)
    from EXACT int64 moment partials (n, Σx, Σy, Σxy, Σx², Σy²)
    merged associatively through the combiner — bit-identical on any
    block layout; the only float ops are the final
    num / (sqrt(d1)·sqrt(d2)) in the same order as the SQL (NULL for
    zero variance). Int64 bound: n·Σx² < 2^63 (same contract as the
    variance UDAF A12)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        x = ops.cents(b["value"]).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.hour(b["ts"]), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "x": x,
                "y": y,
                "xy": x * y,
                "xx": x * x,
                "yy": y * y,
            }
        )

    m = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[
            ("x", "sx"),
            ("y", "sy"),
            ("xy", "sxy"),
            ("xx", "sxx"),
            ("yy", "syy"),
        ],
        count_alias="n",
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        syy = b["syy"].to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = num.astype(np.float64) / (
                np.sqrt(d1.astype(np.float64)) * np.sqrt(d2.astype(np.float64))
            )
        mask = (d1 == 0) | (d2 == 0)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": b["n"],
                "corr_xy": pa.array(
                    np.where(mask, 0.0, corr), pa.float64(), mask=mask
                ),
            }
        )

    return m.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_CORR = """
WITH b AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
                  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
           FROM events),
m AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM b GROUP BY event_type)
SELECT event_type, n,
       CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
            THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr_xy
FROM m
"""

QUERIES["events_corr"] = q_events_corr
ORACLE_SQL["events_corr"] = SQL_EVENTS_CORR


EMB_GRID = 1 << 20  # same exact int-grid trick as the k-means family


def q_label_centroids(sf_dir: str):
    """X86: per-label embedding centroid sums — the vector-column
    groupby (mean-pooled class centroids). Embeddings quantize ONCE to
    the int64 grid round(x * 2^20) so per-(label, dim) sums are EXACT
    integers — bit-identical across block layouts and in SQL (the
    float mean is one division away). Per batch: one (n, d) reshape +
    d bincounts over the label codes (d is a constant 64); the
    combiner groupby sums (label, dim) partials — shuffle is
    O(labels * d), never the vectors."""
    import numpy as np

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        lab = b["label"].combine_chunks().to_numpy().astype(np.int64)
        arr = b["embedding"].combine_chunks()
        emb = (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(arr), -1)
        )
        q = np.floor(emb * EMB_GRID + 0.5).astype(np.int64)
        ulab, codes = np.unique(lab, return_inverse=True)
        k, d = len(ulab), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, codes, q)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table(
            {
                "label": np.repeat(ulab, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "sum_q": sums.reshape(-1),
                "n_vecs": np.repeat(cnt, d),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(partial, batch_size=None, batch_format="pyarrow"),
        keys=["label", "dim"],
        sums=[("sum_q", "sum_q"), ("n_vecs", "n_vecs")],
        count_alias="_nb",
    ).drop_columns(["_nb"])


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
       CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_q,
       COUNT(*) AS n_vecs
FROM embeddings, RANGE(1, 65) r(i)
GROUP BY 1, 2
"""

QUERIES["label_centroids"] = q_label_centroids
ORACLE_SQL["label_centroids"] = SQL_LABEL_CENTROIDS


def q_quantity_rank_ties(sf_dir: str):
    """O7: per-group top-k with TIES (RANK semantics, vs O2/X16's
    ROW_NUMBER) — and the scale insight that RANK over a value
    depends only on the VALUE HISTOGRAM: a combiner groupby bounds
    the shuffle to distinct (flag, quantity) pairs, and rank =
    1 + cumulative count of greater values is a per-group cumsum over
    that tiny table. No row ever shuffles; ties collapse to (value,
    rank, n)."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_quantity": ops.cents(b["l_quantity"], scale=1.0),
            }
        )

    counts = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["l_returnflag", "l_quantity"],
        sums=[],
        count_alias="n",
    )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("l_quantity", ascending=False, ignore_index=True)
        cum = g["n"].cumsum().shift(1, fill_value=0)
        g["rnk"] = cum.astype(np.int64) + 1  # RANK: gaps after ties
        g["dense_rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[g["dense_rnk"] <= 3]

    return counts.groupby("l_returnflag").map_groups(
        rank, batch_format="pandas"
    )


SQL_QUANTITY_RANK_TIES = """
SELECT l_returnflag, l_quantity, COUNT(*) AS n, rnk, dense_rnk FROM (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS l_quantity,
         RANK() OVER (PARTITION BY l_returnflag
                      ORDER BY CAST(FLOOR(l_quantity + 0.5) AS BIGINT) DESC)
           AS rnk,
         DENSE_RANK() OVER (PARTITION BY l_returnflag
                      ORDER BY CAST(FLOOR(l_quantity + 0.5) AS BIGINT) DESC)
           AS dense_rnk
  FROM lineitem)
WHERE dense_rnk <= 3 GROUP BY 1, 2, 4, 5
"""

QUERIES["quantity_rank_ties"] = q_quantity_rank_ties
ORACLE_SQL["quantity_rank_ties"] = SQL_QUANTITY_RANK_TIES


def q_events_group_sample(sf_dir: str):
    """O8: per-group deterministic fixed-K sample — the K rows with
    the smallest splitmix64(event_id XOR seed) per event_type (the
    class-balanced subsampling primitive; same rows on any cluster
    size / layout, resumable). Scale plan: a per-block PER-GROUP
    top-K combiner prunes before the shuffle (pandas groupby.head on
    the hash-sorted block), so the group shuffle sees O(blocks*K)
    rows per group; the final per-group head runs on that residue.
    Output rows collapse ties deterministically via (hash, event_id)
    ordering."""
    import numpy as np
    import pandas as pd

    K, SEED = 10, 42
    ds = _read(sf_dir, "events", ["event_type", "event_id"])

    def hashed(b: pa.Table) -> pa.Table:
        k = (
            b["event_id"].combine_chunks().to_numpy().astype(np.int64)
            .view(np.uint64)
        )
        h = ops._mix64(k ^ np.uint64(SEED))
        # signed view keeps parquet/pandas types simple; ORDER is
        # preserved only on the unsigned value, so sort on the
        # shifted int64 (h - 2^63) which is order-isomorphic
        return pa.table(
            {
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "hs": (h ^ np.uint64(1 << 63)).view(np.int64),
            }
        )

    def block_prune(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["hs", "event_id"], kind="mergesort")
            .groupby("event_type", sort=False)
            .head(K)
        )

    pruned = ds.map_batches(
        hashed, batch_size=None, batch_format="pyarrow"
    ).map_batches(block_prune, batch_size=None, batch_format="pandas")
    top = ops.group_topk(
        pruned, "event_type", ["hs", "event_id"], K, ascending=[True, True]
    )
    return top.select_columns(["event_type", "event_id"])


SQL_EVENTS_GROUP_SAMPLE = """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
             PARTITION BY event_type
             ORDER BY h, event_id) AS rn
  FROM ({H})
) WHERE rn <= 10
""".format(
    H=ops.splitmix64_sql("events", "event_id", ["event_type", "event_id"])
)

QUERIES["events_group_sample"] = q_events_group_sample
ORACLE_SQL["events_group_sample"] = SQL_EVENTS_GROUP_SAMPLE


def q_curation_pipeline(sf_dir: str):
    """X53: the end-to-end TRAINING-DATA CURATION chain as ONE
    pipeline — the composition story the individual operators exist
    for: train-split hash filter (map-side) -> language gate
    (lang_pred == 'en') -> quality gate (n_words >= 40) -> exact
    dedup (keep min doc_id per text) -> test-set decontamination
    (drop docs sharing a DECON_K-gram with the test split) -> per-
    source accounting. Every stage reuses the exact oracled kernel of
    its standalone query (_detect, the RE2-matched token count,
    _gram_batch, splitmix64 split), so the composed SQL oracle is the
    same CTEs chained. Shuffles: exact-dedup groupby, decon semi join
    (size-gated), final combiner groupby — everything else map-side."""
    from .extras.textstats import _detect, _TOKEN

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    sd = np.uint64(SPLIT_SEED)
    t1, t2 = np.uint64(SPLIT_TRAIN_END), np.uint64(SPLIT_VAL_END)

    def gates(b: pa.Table) -> pa.Table:
        k = (
            b["doc_id"].combine_chunks().to_numpy().astype(np.int64)
            .view(np.uint64)
        )
        keep = ops._mix64(k ^ sd) < t1
        t = b.filter(pa.array(keep))
        texts = t["text"].to_pylist()
        ok = np.empty(len(texts), dtype=bool)
        nw = np.empty(len(texts), dtype=np.int64)
        for i, x in enumerate(texts):
            x = x or ""
            nw[i] = len(_TOKEN.findall(x))
            ok[i] = nw[i] >= 40 and _detect(x) == "en"
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "source": t["source"],
                "n_words": pa.array(nw),
            }
        ).filter(pa.array(ok))

    survivors = ds.map_batches(
        gates, batch_size=None, batch_format="pyarrow"
    ).materialize()  # feeds dedup keep-ids AND the semi-join left side

    from .extras import dedup as _dedup

    keep_ids = _dedup.exact_dedup(survivors, "text", "doc_id").select_columns(
        ["keep_id"]
    )
    deduped = ops.semi_join(survivors, "doc_id", keep_ids, "keep_id").materialize()

    test_grams = ds.map_batches(
        lambda b: _gram_batch(
            b,
            ops._mix64(
                b["doc_id"].combine_chunks().to_numpy().astype(np.int64)
                .view(np.uint64)
                ^ sd
            )
            >= t2,
        ),
        batch_size=None,
        batch_format="pyarrow",
    ).select_columns(["gram"])
    kept_grams = deduped.map_batches(
        lambda b: _gram_batch(b), batch_size=None, batch_format="pyarrow"
    )
    bad = ops.distinct(
        ops.semi_join(kept_grams, "gram", test_grams, "gram").select_columns(
            ["doc_id"]
        ),
        ["doc_id"],
    )
    clean = ops.anti_join(deduped, "doc_id", bad, "doc_id")
    return ops.grouped_sum_count(
        clean.select_columns(["source", "n_words"]),
        keys=["source"],
        sums=[("n_words", "total_words")],
        count_alias="n_docs",
    )


SQL_CURATION_PIPELINE = """
WITH s AS ({hash_cte}),
tr AS (SELECT doc_id, text, source FROM s WHERE h < {t1}::UBIGINT),
lp AS ({langid}),
q AS (SELECT tr.*,
             LEN(REGEXP_EXTRACT_ALL(tr.text, '[^ \\t\\n\\r\\f]+')) AS n_words
      FROM tr JOIN lp USING (doc_id)
      WHERE lp.lang_pred = 'en'
        AND LEN(REGEXP_EXTRACT_ALL(tr.text, '[^ \\t\\n\\r\\f]+')) >= 40),
d AS (SELECT * FROM q
      WHERE doc_id IN (SELECT MIN(doc_id) FROM q GROUP BY text)),
te AS (SELECT text FROM s WHERE h >= {t2}::UBIGINT),
gt AS (SELECT doc_id, ARRAY_TO_STRING(toks[i:i+{km1}], ' ') AS gram
       FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM d),
            UNNEST(RANGE(1, LEN(toks) - {km2})) u(i)),
gq AS (SELECT DISTINCT ARRAY_TO_STRING(toks[i:i+{km1}], ' ') AS gram
       FROM (SELECT STRING_SPLIT(text, ' ') AS toks FROM te),
            UNNEST(RANGE(1, LEN(toks) - {km2})) u(i)),
bad AS (SELECT DISTINCT gt.doc_id FROM gt JOIN gq USING (gram))
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words
FROM d WHERE doc_id NOT IN (SELECT doc_id FROM bad)
GROUP BY source
""".format(
    hash_cte=ops.splitmix64_sql(
        "documents", "doc_id", ["doc_id", "text", "source"], seed=SPLIT_SEED
    ),
    langid=_langid_sql("tr"),
    t1=SPLIT_TRAIN_END,
    t2=SPLIT_VAL_END,
    km1=DECON_K - 1,
    km2=DECON_K - 2,
)

QUERIES["curation_pipeline"] = q_curation_pipeline
ORACLE_SQL["curation_pipeline"] = SQL_CURATION_PIPELINE


def q_events_mad(sf_dir: str):
    """X54: per-group median absolute deviation — the robust scale
    estimator completing the robust-stats family (X83 winsorized
    mean, X20 median). BOTH medians stay EXACT INTEGERS by working in
    doubled units: med2 = 2*median(cents) is the sum of the two
    middle values (integer even for even counts), mad4 =
    2*median(|2c - med2|). Two combiner-bounded value-count passes +
    per-group cumulative walks — group row counts unbounded, shuffle
    O(distinct values); the tiny per-group med2 table broadcasts into
    the deviation map. No floats anywhere; the SQL MEDIAN() doubles
    the same way."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "c": ops.cents(b["value"])}
        )

    prepped = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).materialize()  # feeds both median passes

    def walk_med2(g: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
        vals = g[col].to_numpy()
        cnts = g["_n"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        r1, r2 = (n - 1) // 2, n // 2  # 0-based middle ranks
        v1 = vals[np.searchsorted(cum, r1 + 1)]
        v2 = vals[np.searchsorted(cum, r2 + 1)]
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], out: [int(v1 + v2)]}
        )

    c1 = ops.grouped_sum_count(
        prepped, keys=["event_type", "c"], sums=[], count_alias="_n"
    )
    med = (
        c1.groupby("event_type")
        .map_groups(lambda g: walk_med2(g, "c", "med2"), batch_format="pandas")
        .to_pandas()
    )
    m2 = dict(zip(med.event_type, med.med2))

    def dev(b: pa.Table) -> pa.Table:
        t = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        m = np.array([m2[x] for x in t], dtype=np.int64)
        return pa.table(
            {"event_type": b["event_type"], "d2": np.abs(2 * c - m)}
        )

    c2 = ops.grouped_sum_count(
        prepped.map_batches(dev, batch_size=None, batch_format="pyarrow"),
        keys=["event_type", "d2"],
        sums=[],
        count_alias="_n",
    )
    mad = c2.groupby("event_type").map_groups(
        lambda g: walk_med2(g, "d2", "mad4"), batch_format="pandas"
    )

    def attach(b: pa.Table) -> pa.Table:
        t = b["event_type"].to_pylist()
        return b.append_column(
            "med2", pa.array([m2[x] for x in t], pa.int64())
        ).select(["event_type", "med2", "mad4"])

    return mad.map_batches(attach, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_MAD = """
WITH b AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, CAST(MEDIAN(2 * c) AS BIGINT) AS med2
      FROM b GROUP BY 1)
SELECT b.event_type, MIN(m.med2) AS med2,
       CAST(MEDIAN(2 * ABS(2 * b.c - m.med2)) AS BIGINT) AS mad4
FROM b JOIN m USING (event_type) GROUP BY b.event_type
"""

QUERIES["events_mad"] = q_events_mad
ORACLE_SQL["events_mad"] = SQL_EVENTS_MAD


def q_source_char_budget(sf_dir: str):
    """X55: proportional-cap data-mixing allocator (discrete
    waterfilling) — given per-source corpus sizes and a global budget
    (60% of total chars here), find the largest integer waterlevel T
    with sum(min(size_s, T)) <= budget and allocate min(size_s, T)
    per source: small sources keep everything, big sources are capped
    at a common level (the standard LLM data-mixing cap). Sizes come
    from ONE combiner groupby; the waterlevel walk is O(#sources) on
    the driver. All arithmetic is integer floor division — the SQL
    oracle computes the identical level via a window cumsum and the
    same MAX-over-qualifying-candidates identity (cand_j =
    (B - prefix_j) // (k - j + 1), qualifying iff cand_j < size_j;
    fallback = max size when the budget covers everything)."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    sizes = ops.collect_table(
        ops.grouped_sum_count(
            ds, keys=["source"], sums=[("n_chars", "tok")], count_alias="_n"
        ).drop_columns(["_n"]),
        pa.schema([("source", pa.string()), ("tok", pa.int64())]),
    )
    src = sizes["source"].to_pylist()
    tok = sizes["tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = sorted(range(len(src)), key=lambda i: (int(tok[i]), src[i]))
    k = len(order)
    total = int(tok.sum())
    B = total * 6 // 10
    pfx, lvl, best = 0, None, None
    for j, i in enumerate(order, start=1):
        cand = (B - pfx) // (k - j + 1)
        if cand < int(tok[i]):
            best = cand if best is None else max(best, cand)
        pfx += int(tok[i])
    lvl = best if best is not None else int(tok.max())
    return pa.table(
        {
            "source": sizes["source"],
            "tok_chars": sizes["tok"],
            "alloc_chars": pa.array(
                np.minimum(tok, np.int64(lvl)), pa.int64()
            ),
        }
    )


SQL_SOURCE_CHAR_BUDGET = """
WITH s AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok
           FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS total, COUNT(*) AS k FROM s),
o AS (SELECT source, tok,
        ROW_NUMBER() OVER (ORDER BY tok, source) AS j,
        CAST(COALESCE(SUM(tok) OVER (
            ORDER BY tok, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS pfx
      FROM s),
c AS (SELECT o.*,
        ((SELECT total FROM tot) * 6 // 10 - pfx)
          // ((SELECT k FROM tot) - j + 1) AS cand
      FROM o),
t AS (SELECT COALESCE(MAX(cand) FILTER (WHERE cand < tok),
                      (SELECT MAX(tok) FROM s)) AS lvl
      FROM c)
SELECT source, tok AS tok_chars,
       LEAST(tok, (SELECT lvl FROM t)) AS alloc_chars
FROM s
"""

QUERIES["source_char_budget"] = q_source_char_budget
ORACLE_SQL["source_char_budget"] = SQL_SOURCE_CHAR_BUDGET


def q_kanon_exposure(sf_dir: str):
    """X56: k-anonymity exposure audit (k=5) over the
    quasi-identifier (event_type, isodow, hour) — the data-governance
    pass a release pipeline runs before publishing: cells whose row
    count is below k are re-identifiable. One combiner groupby over
    the bounded cell domain, a map-side filter, and a second combiner
    rollup per event_type (small-group count + exposed-row sum)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "dw": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1), pa.int64()),
                "hr": pc.cast(pc.hour(b["ts"]), pa.int64()),
            }
        )

    cells = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["event_type", "dw", "hr"],
        sums=[],
        count_alias="n",
    ).filter(expr="n < 5")
    return ops.grouped_sum_count(
        cells.select_columns(["event_type", "n"]),
        keys=["event_type"],
        sums=[("n", "n_exposed_rows")],
        count_alias="n_small_groups",
    )


SQL_KANON_EXPOSURE = """
WITH g AS (SELECT event_type, CAST(ISODOW(ts) AS BIGINT) AS dw,
                  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2, 3)
SELECT event_type, COUNT(*) AS n_small_groups,
       CAST(SUM(n) AS BIGINT) AS n_exposed_rows
FROM g WHERE n < 5 GROUP BY 1
"""

QUERIES["kanon_exposure"] = q_kanon_exposure
ORACLE_SQL["kanon_exposure"] = SQL_KANON_EXPOSURE


def q_custkey_bag_except(sf_dir: str):
    """X57: multiset EXCEPT ALL (bag difference) — completes the set-
    op family (U4/X15 are DISTINCT semantics): each right-side
    occurrence cancels ONE left-side occurrence. Bag difference
    depends only on per-key multiplicities, so two combiner groupbys
    + ONE small outer join on the distinct-key tables replace any
    row-level work: n = max(n_left - n_right, 0), keep n > 0. Output
    is the compact (key, n) form (equal to GROUP BY over SQL's
    EXCEPT ALL)."""
    import numpy as np

    o = ops.grouped_sum_count(
        _read(sf_dir, "orders", ["o_custkey"]),
        keys=["o_custkey"],
        sums=[],
        count_alias="na",
    )
    c = ops.grouped_sum_count(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            lambda b: pa.table({"jk": pc.cast(b["c_custkey"], pa.int64())}),
            batch_size=None,
            batch_format="pyarrow",
        ),
        keys=["jk"],
        sums=[],
        count_alias="nb",
    )
    j = ops.normalize_blocks(
        ops.hash_join(
            o,
            ops.drop_empty_blocks(c),
            on=("o_custkey",),
            right_on=("jk",),
            join_type="left_outer",
        ),
        pa.schema(
            [("o_custkey", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
        ),
    )

    def diff(b: pa.Table) -> pa.Table:
        na = b["na"].to_numpy(zero_copy_only=False)
        nb = pc.fill_null(b["nb"], 0).to_numpy(zero_copy_only=False)
        n = np.maximum(na - nb, 0)
        t = pa.table({"o_custkey": b["o_custkey"], "n": n})
        return t.filter(pc.greater(t["n"], 0))

    return j.map_batches(diff, batch_size=None, batch_format="pyarrow")


SQL_CUSTKEY_BAG_EXCEPT = """
SELECT o_custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders
  EXCEPT ALL
  SELECT CAST(c_custkey AS BIGINT) FROM customer
) GROUP BY o_custkey
"""

QUERIES["custkey_bag_except"] = q_custkey_bag_except
ORACLE_SQL["custkey_bag_except"] = SQL_CUSTKEY_BAG_EXCEPT


def q_bigram_lift_top20(sf_dir: str):
    """X58: top-20 word bigrams by LIFT (association mining: observed
    pair frequency over the product of positional marginals) —
    complements the raw-frequency bigram heavy hitters. One gram
    explode feeds ONE combiner groupby to the distinct-pair count
    table; both positional marginals and the total derive from THAT
    bounded table, never the corpus. Marginals broadcast as dicts
    (documented assumption: the token vocabulary fits the driver —
    swap for hash joins beyond that). The only float is the final
    (n·N)/(nf·ns) in the same op order as SQL; ties break on the
    words, so the top-20 is deterministic."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    grams = ds.map_batches(
        lambda b: _gram_batch(b, k=2), batch_size=None, batch_format="pyarrow"
    )
    p = ops.grouped_sum_count(
        grams.select_columns(["gram"]), keys=["gram"], sums=[], count_alias="n"
    )

    def split_pair(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["gram"], " ")
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "n": b["n"],
            }
        )

    pairs = p.map_batches(
        split_pair, batch_size=None, batch_format="pyarrow"
    ).materialize()  # bounded: distinct bigrams; feeds marginals + lift
    pt = ops.collect_table(
        pairs,
        pa.schema([("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]),
    )
    nf: dict = {}
    ns: dict = {}
    for w, n in zip(pt["w1"].to_pylist(), pt["n"].to_pylist()):
        nf[w] = nf.get(w, 0) + n
    for w, n in zip(pt["w2"].to_pylist(), pt["n"].to_pylist()):
        ns[w] = ns.get(w, 0) + n
    nb = int(pc.sum(pt["n"]).as_py())

    def lift(b: pa.Table) -> pa.Table:
        w1 = b["w1"].to_pylist()
        w2 = b["w2"].to_pylist()
        n = b["n"].to_numpy(zero_copy_only=False)
        f = np.array([nf[x] for x in w1], dtype=np.int64)
        s = np.array([ns[x] for x in w2], dtype=np.int64)
        return b.append_column(
            "lift", pa.array((n.astype(np.float64) * nb) / (f * s))
        )

    scored = pairs.map_batches(lift, batch_size=None, batch_format="pyarrow")
    return ops.topk(scored, ["lift", "w1", "w2"], 20, descending=[True, False, False])


SQL_BIGRAM_LIFT = """
WITH bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
            FROM (SELECT STRING_SPLIT(text, ' ') AS toks FROM documents),
                 UNNEST(RANGE(1, LEN(toks))) u(i)),
p AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
f AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS nf FROM p GROUP BY 1),
s AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS ns FROM p GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nb FROM p)
SELECT w1, w2, n, CAST(n AS DOUBLE) * (SELECT nb FROM tot) / (nf * ns) AS lift
FROM p JOIN f USING (w1) JOIN s USING (w2)
ORDER BY lift DESC, w1, w2 LIMIT 20
"""

QUERIES["bigram_lift_top20"] = q_bigram_lift_top20
ORACLE_SQL["bigram_lift_top20"] = SQL_BIGRAM_LIFT


def q_quantity_percent_rank(sf_dir: str):
    """W7: per-group PERCENT_RANK — (rank-1)/(n-1) with RANK
    semantics, computed entirely on the value histogram like O7: a
    combiner groupby bounds the shuffle to distinct (group, value)
    pairs and rank = 1 + cumulative count of smaller values is a
    per-group cumsum over that table; ties collapse to one row per
    distinct value. The only float is the single division, identical
    op order to SQL."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_quantity": ops.cents(b["l_quantity"], scale=1.0),
            }
        )

    counts = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["l_returnflag", "l_quantity"],
        sums=[],
        count_alias="n",
    )

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("l_quantity", ignore_index=True)
        cum = g["n"].cumsum().shift(1, fill_value=0).to_numpy()
        total = int(g["n"].sum())
        g["pct_rank"] = cum.astype(np.float64) / (total - 1)
        return g

    return counts.groupby("l_returnflag").map_groups(pr, batch_format="pandas")


SQL_QUANTITY_PERCENT_RANK = """
SELECT l_returnflag, l_quantity, COUNT(*) AS n, MIN(pr) AS pct_rank FROM (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS l_quantity,
         PERCENT_RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
           AS pr
  FROM lineitem)
GROUP BY 1, 2
"""

QUERIES["quantity_percent_rank"] = q_quantity_percent_rank
ORACLE_SQL["quantity_percent_rank"] = SQL_QUANTITY_PERCENT_RANK


def q_doc_length_batches(sf_dir: str):
    """X59: length-bucketed inference micro-batching — docs fall into
    word-count quartile buckets (padding-efficient batching for model
    scoring) and get a deterministic batch_id inside their bucket
    (16 docs per micro-batch). All thresholds and bucket offsets come
    from ONE combiner value-count table (driver walk over distinct
    word counts, rank floor((n-1)q) — the global_quantile_disc
    convention); the per-bucket row number rides the distributed
    prefix-sum primitive (`ops.with_global_index` over (bucket,
    doc_id)) minus the exact bucket start offsets — no per-bucket
    map_groups, so a bucket never has to fit one worker."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        from .extras.textstats import _TOKEN as _TK

        nw = pa.array(
            [len(_TK.findall(t or "")) for t in b["text"].to_pylist()],
            pa.int64(),
        )
        return pa.table({"doc_id": b["doc_id"], "nw": nw})

    narrow = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).materialize()  # feeds the quantile walk AND the bucketing

    counts = ops.collect_table(
        ops.grouped_sum_count(narrow, keys=["nw"], sums=[], count_alias="n"),
        pa.schema([("nw", pa.int64()), ("n", pa.int64())]),
    )
    vals = counts["nw"].to_numpy(zero_copy_only=False)
    cnt = counts["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="mergesort")
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    thr = [
        int(vals[np.searchsorted(cum, (n - 1) * p // 4 + 1)]) for p in (1, 2, 3)
    ]
    # exact bucket sizes from the same table -> bucket start offsets
    sizes = [
        int(cum[np.searchsorted(vals, t, side="right") - 1]) if np.any(vals <= t) else 0
        for t in thr
    ]
    starts = [0, sizes[0], sizes[1], sizes[2]]

    t1, t2, t3 = thr

    def bucketize(b: pa.Table) -> pa.Table:
        nw = b["nw"].to_numpy(zero_copy_only=False)
        bkt = np.full(len(nw), 3, dtype=np.int64)
        bkt[nw <= t3] = 2
        bkt[nw <= t2] = 1
        bkt[nw <= t1] = 0
        return pa.table({"doc_id": b["doc_id"], "bucket": bkt})

    bucketed = narrow.map_batches(
        bucketize, batch_size=None, batch_format="pyarrow"
    )
    seq = ops.with_global_index(bucketed, ["bucket", "doc_id"])
    st = np.array(starts, dtype=np.int64)

    def batch_id(b: pa.Table) -> pa.Table:
        bkt = b["bucket"].to_numpy(zero_copy_only=False)
        pos = b["seq_pos"].to_numpy(zero_copy_only=False) - st[bkt]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "bucket": b["bucket"],
                "batch_id": pos // 16,
            }
        )

    return seq.map_batches(batch_id, batch_size=None, batch_format="pyarrow")


SQL_DOC_LENGTH_BATCHES = """
WITH w AS (SELECT doc_id,
                  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^ \\t\\n\\r\\f]+'))
                       AS BIGINT) AS nw
           FROM documents),
t AS (SELECT
  (SELECT nw FROM w ORDER BY nw LIMIT 1
   OFFSET (SELECT (COUNT(*) - 1) // 4 FROM w)) AS q1,
  (SELECT nw FROM w ORDER BY nw LIMIT 1
   OFFSET (SELECT (COUNT(*) - 1) * 2 // 4 FROM w)) AS q2,
  (SELECT nw FROM w ORDER BY nw LIMIT 1
   OFFSET (SELECT (COUNT(*) - 1) * 3 // 4 FROM w)) AS q3),
b AS (SELECT doc_id,
             CASE WHEN nw <= (SELECT q1 FROM t) THEN 0
                  WHEN nw <= (SELECT q2 FROM t) THEN 1
                  WHEN nw <= (SELECT q3 FROM t) THEN 2
                  ELSE 3 END AS bucket
      FROM w)
SELECT doc_id, bucket,
       (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 16
         AS batch_id
FROM b
"""

QUERIES["doc_length_batches"] = q_doc_length_batches
ORACLE_SQL["doc_length_batches"] = SQL_DOC_LENGTH_BATCHES


def q_value_drift_deciles(sf_dir: str):
    """X60: data-drift contingency table — the monitoring pass an ML
    pipeline runs between corpus refreshes: global value DECILES
    (computed once over everything) crossed with the first/second
    half of the time range, per event type. Counts stay exact ints
    (any drift statistic — PSI, chi-square — derives from them
    downstream; ln/float stats are deliberately NOT computed here
    because libm rounding is not reproducible across engines).
    Thresholds come from ONE combiner value-count walk; the split
    midpoint from one global min/max aggregate; then a single
    combiner groupby of indicator sums."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "c": ops.cents(b["value"]),
                "us": pc.cast(b["ts"], pa.int64()),
            }
        )

    prepped = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).materialize()  # quantile walk + min/max + final pass

    counts = ops.collect_table(
        ops.grouped_sum_count(
            prepped.select_columns(["c"]), keys=["c"], sums=[], count_alias="n"
        ),
        pa.schema([("c", pa.int64()), ("n", pa.int64())]),
    )
    vals = counts["c"].to_numpy(zero_copy_only=False)
    cnt = counts["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="mergesort")
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    thr = np.array(
        [
            int(vals[np.searchsorted(cum, (n - 1) * k // 10 + 1)])
            for k in range(1, 10)
        ],
        dtype=np.int64,
    )
    lo = int(prepped.min("us"))
    hi = int(prepped.max("us"))
    mid = lo + (hi - lo) // 2

    def cell(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        us = b["us"].to_numpy(zero_copy_only=False)
        dec = np.searchsorted(thr, c, side="left").astype(np.int64)
        first = (us < mid).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "dec": dec,
                "n_first": first,
                "n_second": 1 - first,
            }
        )

    return ops.grouped_sum_count(
        prepped.map_batches(cell, batch_size=None, batch_format="pyarrow"),
        keys=["event_type", "dec"],
        sums=[("n_first", "n_first"), ("n_second", "n_second")],
        count_alias="n",
    )


def _drift_sql() -> str:
    qs = ",\n  ".join(
        f"""(SELECT c FROM b ORDER BY c LIMIT 1
   OFFSET (SELECT (COUNT(*) - 1) * {k} // 10 FROM b)) AS t{k}"""
        for k in range(1, 10)
    )
    case = "CASE " + " ".join(
        f"WHEN c <= (SELECT t{k} FROM t) THEN {k - 1}" for k in range(1, 10)
    ) + " ELSE 9 END"
    return f"""
WITH b AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                  CAST(EPOCH_US(ts) AS BIGINT) AS us
           FROM events),
t AS (SELECT
  {qs}),
m AS (SELECT MIN(us) + (MAX(us) - MIN(us)) // 2 AS mid FROM b)
SELECT event_type, {case} AS dec, COUNT(*) AS n,
       CAST(COUNT(*) FILTER (WHERE us < (SELECT mid FROM m)) AS BIGINT)
         AS n_first,
       CAST(COUNT(*) FILTER (WHERE us >= (SELECT mid FROM m)) AS BIGINT)
         AS n_second
FROM b GROUP BY 1, 2
"""


SQL_VALUE_DRIFT = _drift_sql()

QUERIES["value_drift_deciles"] = q_value_drift_deciles
ORACLE_SQL["value_drift_deciles"] = SQL_VALUE_DRIFT


def q_user_recent_types(sf_dir: str):
    """X61: per-user recency-deduplicated feature list — the 3 most
    recently seen DISTINCT event types per user (the classic recency
    feature). Dedup-by-recency collapses to per-(user, type) MAX(ts)
    (a combiner aggregate — the shuffle carries one row per pair),
    then `ops.group_topk` ranks the tiny residue; deterministic
    (ts desc, type) tie order."""
    from ray.data.aggregate import Max as _Max

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "us": pc.cast(b["ts"], pa.int64()),
            }
        )

    last = (
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow")
        .map_batches(
            lambda b: b.group_by(["user_id", "event_type"])
            .aggregate([("us", "max")])
            .rename_columns(["user_id", "event_type", "us"]),
            batch_size=None,
            batch_format="pyarrow",
        )
        .groupby(["user_id", "event_type"])
        .aggregate(_Max("us", alias_name="last_us"))
    )
    top = ops.group_topk(
        last, "user_id", ["last_us", "event_type"], 3, ascending=[False, True]
    )
    return top.select_columns(["user_id", "event_type", "last_us", "rn"])


SQL_USER_RECENT_TYPES = """
SELECT user_id, event_type, last_us, rn FROM (
  SELECT user_id, event_type, last_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY last_us DESC, event_type) AS rn
  FROM (SELECT user_id, event_type,
               CAST(EPOCH_US(MAX(ts)) AS BIGINT) AS last_us
        FROM events GROUP BY 1, 2)
) WHERE rn <= 3
"""

QUERIES["user_recent_types"] = q_user_recent_types
ORACLE_SQL["user_recent_types"] = SQL_USER_RECENT_TYPES


def q_source_dup_rate(sf_dir: str):
    """X62: per-source duplication report — the curation dashboard
    number that decides which feeds get deduplicated first. Doc
    counts and distinct-text counts each come from a combiner pass
    (the distinct pass shuffles one row per (source, text) pair);
    ONE small join + a single float division finish it."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["source", "text"])
    n_docs = ops.grouped_sum_count(
        ds.select_columns(["source"]), keys=["source"], sums=[], count_alias="n_docs"
    )
    n_uniq = ops.grouped_sum_count(
        ops.distinct(ds, ["source", "text"]).select_columns(["source"]),
        keys=["source"],
        sums=[],
        count_alias="n_unique",
    ).map_batches(
        lambda b: pa.table({"js": b["source"], "n_unique": b["n_unique"]}),
        batch_size=None,
        batch_format="pyarrow",
    )
    j = ops.normalize_blocks(
        ops.hash_join(
            ops.drop_empty_blocks(n_docs),
            ops.drop_empty_blocks(n_uniq),
            on=("source",),
            right_on=("js",),
        ),
        pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()), ("n_unique", pa.int64())]
        ),
    )

    def fin(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False)
        nu = b["n_unique"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "dup_rate", pa.array((nd - nu).astype(np.float64) / nd)
        )

    return j.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_SOURCE_DUP_RATE = """
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) AS dup_rate
FROM documents GROUP BY source
"""

QUERIES["source_dup_rate"] = q_source_dup_rate
ORACLE_SQL["source_dup_rate"] = SQL_SOURCE_DUP_RATE


def q_type_cooccurrence(sf_dir: str):
    """X63: frequent-itemset pair support — event types co-occurring
    in the same (user, day) basket (market-basket mining, the
    2-itemset level). Baskets dedup to distinct (basket, type)
    through the combiner; ONE self hash-join on the basket key with
    an a<b filter yields pair occurrences (bounded fan-out: a basket
    holds at most |type domain| items), counted by a combiner
    groupby."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    DAY_US = 86400 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        day = pc.divide(us, DAY_US)
        basket = pc.add(
            pc.multiply(b["user_id"], 100_000), day
        )  # user_id * 1e5 + day: collision-free for this day range
        return pa.table({"basket": basket, "t": b["event_type"]})

    bt = ops.distinct(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        ["basket", "t"],
    ).materialize()  # both sides of the self-join
    pairs = ops.normalize_blocks(
        ops.hash_join(
            bt,
            ops.drop_empty_blocks(
                bt.map_batches(
                    lambda b: pa.table({"jb": b["basket"], "t2": b["t"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                )
            ),
            on=("basket",),
            right_on=("jb",),
        ),
        pa.schema(
            [("basket", pa.int64()), ("t", pa.string()), ("t2", pa.string())]
        ),
    ).map_batches(
        lambda b: b.filter(pc.less(b["t"], b["t2"])).select(["t", "t2"]),
        batch_size=None,
        batch_format="pyarrow",
    )
    return ops.grouped_sum_count(
        pairs.rename_columns(["type_a", "type_b"]),
        keys=["type_a", "type_b"],
        sums=[],
        count_alias="support",
    )


SQL_TYPE_COOCCURRENCE = """
WITH b AS (SELECT DISTINCT
             user_id * 100000 + EPOCH_US(ts) // 86400000000 AS basket,
             event_type AS t
           FROM events)
SELECT x.t AS type_a, y.t AS type_b, COUNT(*) AS support
FROM b x JOIN b y ON x.basket = y.basket AND x.t < y.t
GROUP BY 1, 2
"""

QUERIES["type_cooccurrence"] = q_type_cooccurrence
ORACLE_SQL["type_cooccurrence"] = SQL_TYPE_COOCCURRENCE


def q_events_trend(sf_dir: str):
    """X64: per-group OLS trend slope (value drift over time — the
    monitoring sibling of A17's correlation): x = whole hours since
    the corpus-wide min timestamp (one global aggregate, broadcast),
    y = exact cents. Moment partials (n, Σx, Σy, Σxy, Σx²) merge
    associatively through the combiner; slope = ONE float64 division
    of two exact int64s (NULL for constant-x groups). Int64 bound
    documented: n·Σx² < 2^63 for corpora spanning < ~3e5 hours at
    these row counts; re-origin x per shard beyond that."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    narrow = ds.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "us": pc.cast(b["ts"], pa.int64()),
                "c": ops.cents(b["value"]),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
    ).materialize()  # min-ts aggregate + the moments pass
    min_us = int(narrow.min("us"))
    HOUR_US = 3_600_000_000

    def prep(b: pa.Table) -> pa.Table:
        x = (b["us"].to_numpy(zero_copy_only=False) - min_us) // HOUR_US
        y = b["c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "x": x,
                "y": y,
                "xy": x * y,
                "xx": x * x,
            }
        )

    m = ops.grouped_sum_count(
        narrow.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("x", "sx"), ("y", "sy"), ("xy", "sxy"), ("xx", "sxx")],
        count_alias="n",
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        mask = den == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = num.astype(np.float64) / den.astype(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": b["n"],
                "slope_cents_per_hour": pa.array(
                    np.where(mask, 0.0, slope), pa.float64(), mask=mask
                ),
            }
        )

    return m.map_batches(fin, batch_size=None, batch_format="pyarrow")


SQL_EVENTS_TREND = """
WITH b AS (SELECT event_type,
                  (CAST(EPOCH_US(ts) AS BIGINT)
                   - (SELECT CAST(MIN(EPOCH_US(ts)) AS BIGINT) FROM events))
                    // 3600000000 AS x,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
m AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM b GROUP BY event_type)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END
         AS slope_cents_per_hour
FROM m
"""

QUERIES["events_trend"] = q_events_trend
ORACLE_SQL["events_trend"] = SQL_EVENTS_TREND


def q_dedup_normalized_docs(sf_dir: str):
    """X65: normalization-keyed exact dedup (the C4 move): the dedup
    key is casefolded text with punctuation stripped and whitespace
    collapsed, so trivial reformattings collapse to one key — between
    byte-exact dedup (X1) and near-dup sketches (X2+) in strictness.
    Normalization is three vectorized Arrow kernels; then the X1
    hash-agg min-id plan on the derived key."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b["text"])
        t = pc.replace_substring_regex(t, r"[^0-9a-z \t\n\r\f]", "")
        t = pc.replace_substring_regex(t, r"[ \t\n\r\f]+", " ")
        return pa.table(
            {"doc_id": b["doc_id"], "norm_text": pc.utf8_trim_whitespace(t)}
        )

    from .extras import dedup as _dedup

    return _dedup.exact_dedup(
        ds.map_batches(norm, batch_size=None, batch_format="pyarrow"),
        "norm_text",
        "doc_id",
    )


SQL_DEDUP_NORMALIZED = """
SELECT norm_text, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       COUNT(*) AS n_copies
FROM (SELECT doc_id,
             TRIM(REGEXP_REPLACE(
                 REGEXP_REPLACE(LOWER(text), '[^0-9a-z \\t\\n\\r\\f]', '', 'g'),
                 '[ \\t\\n\\r\\f]+', ' ', 'g')) AS norm_text
      FROM documents)
GROUP BY norm_text
"""

QUERIES["dedup_normalized_docs"] = q_dedup_normalized_docs
ORACLE_SQL["dedup_normalized_docs"] = SQL_DEDUP_NORMALIZED


def q_custkey_bag_intersect(sf_dir: str):
    """X66: multiset INTERSECT ALL — the other half of the bag
    algebra (X57): n = min(n_left, n_right) per key, again purely on
    multiplicities (two combiner groupbys + one inner join on
    distinct keys; no row-level work)."""
    import numpy as np

    o = ops.grouped_sum_count(
        _read(sf_dir, "orders", ["o_custkey"]),
        keys=["o_custkey"],
        sums=[],
        count_alias="na",
    )
    e = ops.grouped_sum_count(
        _read(sf_dir, "events", ["user_id"]).map_batches(
            lambda b: pa.table({"jk": b["user_id"]}),
            batch_size=None,
            batch_format="pyarrow",
        ),
        keys=["jk"],
        sums=[],
        count_alias="nb",
    )
    j = ops.normalize_blocks(
        ops.hash_join(
            ops.drop_empty_blocks(o),
            ops.drop_empty_blocks(e),
            on=("o_custkey",),
            right_on=("jk",),
        ),
        pa.schema(
            [("o_custkey", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
        ),
    )

    def m(b: pa.Table) -> pa.Table:
        na = b["na"].to_numpy(zero_copy_only=False)
        nb = b["nb"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"o_custkey": b["o_custkey"], "n": np.minimum(na, nb)}
        )

    return j.map_batches(m, batch_size=None, batch_format="pyarrow")


SQL_CUSTKEY_BAG_INTERSECT = """
SELECT o_custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders
  INTERSECT ALL
  SELECT user_id FROM events
) GROUP BY o_custkey
"""

QUERIES["custkey_bag_intersect"] = q_custkey_bag_intersect
ORACLE_SQL["custkey_bag_intersect"] = SQL_CUSTKEY_BAG_INTERSECT


def q_cross_source_grams(sf_dir: str):
    """X67: cross-source phrase-leakage matrix — for every source
    pair, how many DISTINCT 4-grams they share (syndication /
    contamination between feeds; the corpus has no byte-identical
    cross-source texts, so the audit runs at phrase level). Distinct
    (gram, source) pairs through the combiner, then ONE self
    hash-join on the gram key with a<b (fan-out bounded by sources
    per gram <= |sources|), counted per source pair."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def grams(b: pa.Table) -> pa.Table:
        g = _gram_batch(b, k=DECON_K)  # (doc_id, gram) all occurrences
        # ride source through by doc position: _gram_batch repeats
        # doc rows in order, so rebuild the source column the same way;
        # the k passed above and the repeat arithmetic below MUST stay
        # coupled (ADVICE r3) — m = n_tokens - (k - 1) grams per doc
        import numpy as _np

        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        offs = toks.offsets.to_numpy().astype(_np.int64)
        m = _np.maximum(_np.diff(offs) - (DECON_K - 1), 0)
        src = pa.array(
            _np.repeat(b["source"].combine_chunks().to_numpy(zero_copy_only=False), m)
        )
        return pa.table({"gram": g["gram"], "source": src})

    gs = ops.distinct(
        ds.map_batches(grams, batch_size=None, batch_format="pyarrow"),
        ["gram", "source"],
    ).materialize()  # both sides of the self-join
    pairs = ops.normalize_blocks(
        ops.hash_join(
            gs,
            ops.drop_empty_blocks(
                gs.map_batches(
                    lambda b: pa.table({"jg": b["gram"], "s2": b["source"]}),
                    batch_size=None,
                    batch_format="pyarrow",
                )
            ),
            on=("gram",),
            right_on=("jg",),
        ),
        pa.schema(
            [("gram", pa.string()), ("source", pa.string()), ("s2", pa.string())]
        ),
    ).map_batches(
        lambda b: b.filter(pc.less(b["source"], b["s2"])).select(["source", "s2"]),
        batch_size=None,
        batch_format="pyarrow",
    )
    return ops.grouped_sum_count(
        pairs.rename_columns(["source_a", "source_b"]),
        keys=["source_a", "source_b"],
        sums=[],
        count_alias="n_shared_grams",
    )


SQL_CROSS_SOURCE_GRAMS = """
WITH g AS (SELECT DISTINCT ARRAY_TO_STRING(toks[i:i+3], \' \') AS gram, source
           FROM (SELECT source, STRING_SPLIT(text, \' \') AS toks
                 FROM documents),
                UNNEST(RANGE(1, LEN(toks) - 2)) u(i))
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""

QUERIES["cross_source_grams"] = q_cross_source_grams
ORACLE_SQL["cross_source_grams"] = SQL_CROSS_SOURCE_GRAMS


def q_event_gap_median(sf_dir: str):
    """X68: median inter-arrival gap per event type — latency/cadence
    telemetry composing the LAG primitive with the exact doubled-units
    median (X54): per-user consecutive timestamp deltas (one key
    shuffle, deterministic (ts, event_id) order), then a
    combiner-bounded value-count walk per type; med2 = 2*median stays
    an exact integer."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def us_col(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "us": pc.cast(b["ts"], pa.int64()),
            }
        )

    lagged = ops.group_lag(
        ds.map_batches(us_col, batch_size=None, batch_format="pyarrow"),
        "user_id",
        ["us", "event_id"],
        {"us": "prev_us"},
    )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["prev_us"].notna()]
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "gap": (df["us"] - df["prev_us"].astype("int64")).astype(
                    "int64"
                ),
            }
        )

    counts = ops.grouped_sum_count(
        lagged.map_batches(gaps, batch_size=None, batch_format="pandas"),
        keys=["event_type", "gap"],
        sums=[],
        count_alias="_n",
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["gap"].to_numpy()
        cnts = g["_n"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        r1, r2 = (n - 1) // 2, n // 2
        v1 = vals[np.searchsorted(cum, r1 + 1)]
        v2 = vals[np.searchsorted(cum, r2 + 1)]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_gaps": [n],
                "med2_gap_us": [int(v1 + v2)],
            }
        )

    return counts.groupby("event_type").map_groups(walk, batch_format="pandas")


SQL_EVENT_GAP_MEDIAN = """
WITH g AS (
  SELECT event_type,
         CAST(EPOCH_US(ts) AS BIGINT)
           - LAG(CAST(EPOCH_US(ts) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type, COUNT(*) AS n_gaps,
       CAST(MEDIAN(2 * gap) AS BIGINT) AS med2_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY event_type
"""

QUERIES["event_gap_median"] = q_event_gap_median
ORACLE_SQL["event_gap_median"] = SQL_EVENT_GAP_MEDIAN


def q_events_outliers_mad(sf_dir: str):
    """X69: robust outlier counts — events whose |value - median|
    exceeds 3 robust scales (the MAD z-test every monitoring pipeline
    runs), ENTIRELY in integers: |2c - med2|*2 > 3*mad4 is the exact
    doubled/quadrupled-units form of |c - med| > 3*MAD. Reuses the
    X54 two-pass machinery (combiner value counts + per-group walks),
    broadcasts the tiny (med2, mad4) table, and finishes with one
    combiner groupby of indicator sums."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "c": ops.cents(b["value"])}
        )

    prepped = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).materialize()

    def walk_med2(g: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
        vals = g[col].to_numpy()
        cnts = g["_n"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        r1, r2 = (n - 1) // 2, n // 2
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                out: [
                    int(
                        vals[np.searchsorted(cum, r1 + 1)]
                        + vals[np.searchsorted(cum, r2 + 1)]
                    )
                ],
            }
        )

    c1 = ops.grouped_sum_count(
        prepped, keys=["event_type", "c"], sums=[], count_alias="_n"
    )
    med = (
        c1.groupby("event_type")
        .map_groups(lambda g: walk_med2(g, "c", "med2"), batch_format="pandas")
        .to_pandas()
    )
    m2 = dict(zip(med.event_type, med.med2))

    def dev(b: pa.Table) -> pa.Table:
        t = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        m = np.array([m2[x] for x in t], dtype=np.int64)
        return pa.table(
            {"event_type": b["event_type"], "d2": np.abs(2 * c - m)}
        )

    c2 = ops.grouped_sum_count(
        prepped.map_batches(dev, batch_size=None, batch_format="pyarrow"),
        keys=["event_type", "d2"],
        sums=[],
        count_alias="_n",
    )
    mad = (
        c2.groupby("event_type")
        .map_groups(lambda g: walk_med2(g, "d2", "mad4"), batch_format="pandas")
        .to_pandas()
    )
    m4 = dict(zip(mad.event_type, mad.mad4))

    def flag(b: pa.Table) -> pa.Table:
        t = b["event_type"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        med_a = np.array([m2[x] for x in t], dtype=np.int64)
        mad_a = np.array([m4[x] for x in t], dtype=np.int64)
        out = (np.abs(2 * c - med_a) * 2 > 3 * mad_a).astype(np.int64)
        return pa.table(
            {"event_type": b["event_type"], "is_outlier": out}
        )

    return ops.grouped_sum_count(
        prepped.map_batches(flag, batch_size=None, batch_format="pyarrow"),
        keys=["event_type"],
        sums=[("is_outlier", "n_outliers")],
        count_alias="n",
    )


SQL_EVENTS_OUTLIERS_MAD = """
WITH b AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, CAST(MEDIAN(2 * c) AS BIGINT) AS med2
      FROM b GROUP BY 1),
d AS (SELECT b.event_type, b.c, m.med2,
             CAST(MEDIAN(2 * ABS(2 * b.c - m.med2)) OVER (
                 PARTITION BY b.event_type) AS BIGINT) AS mad4
      FROM b JOIN m USING (event_type))
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(2 * c - med2) * 2 > 3 * mad4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d GROUP BY event_type
"""

QUERIES["events_outliers_mad"] = q_events_outliers_mad
ORACLE_SQL["events_outliers_mad"] = SQL_EVENTS_OUTLIERS_MAD


TEMP_MIX_BUDGET = 200  # temperature-resampled sample size
TEMP_MIX_SEED = 42


def q_docs_temperature_mix(sf_dir: str):
    """X70: temperature-resampled data mixture (the multilingual
    alpha-sampling move, alpha = 1/2): per-language sample quotas
    proportional to sqrt(n_lang) — flattening the head so low-resource
    languages are over-represented relative to their corpus share —
    apportioned EXACTLY by integer largest remainder, then each
    language's quota filled with its k smallest splitmix64(doc_id)
    rows (the O8 deterministic per-group sample). Everything the two
    sides must agree on is integer except ONE IEEE sqrt on an
    exactly-representable int (n*10^6 < 2^53; sqrt is correctly
    rounded, so floor(sqrt(.)) is bit-identical in numpy/DuckDB/libm).
    Scale: quotas come from a combiner groupby (<= #langs rows to the
    driver), the sample from the O8 per-block per-group top-k prune —
    O(blocks*k) rows ever shuffle."""
    import math

    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = {
        r["lang"]: int(r["n"])
        for r in ops.grouped_sum_count(
            ds, keys=["lang"], sums=[], count_alias="n"
        ).take_all()  # <= #languages rows
    }
    w = {g: int(math.floor(math.sqrt(float(n * 1_000_000)))) for g, n in counts.items()}
    W = sum(w.values())
    base = {g: (TEMP_MIX_BUDGET * w[g]) // W for g in w}
    rem = {g: (TEMP_MIX_BUDGET * w[g]) % W for g in w}
    leftover = TEMP_MIX_BUDGET - sum(base.values())
    order = sorted(w, key=lambda g: (-rem[g], g))
    k = {
        g: base[g] + (1 if i < leftover else 0) for i, g in enumerate(order)
    }
    # a quota MAY legitimately exceed a tiny language's row count when
    # sqrt-flattening over-represents small groups; head(kk) below caps
    # at group size exactly like the oracle's rn <= k (ADVICE r4 — no
    # assert: the capped output is the defined result)
    kmax = max(k.values())

    def hashed(b: pa.Table) -> pa.Table:
        key = (
            b["doc_id"].combine_chunks().to_numpy().astype(np.int64)
            .view(np.uint64)
        )
        h = ops._mix64(key ^ np.uint64(TEMP_MIX_SEED))
        return pa.table(
            {
                "lang": b["lang"],
                "doc_id": b["doc_id"],
                "hs": (h ^ np.uint64(1 << 63)).view(np.int64),
            }
        )

    def block_prune(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["hs", "doc_id"], kind="mergesort")
            .groupby("lang", sort=False)
            .head(kmax)
        )

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        kk = k.get(g["lang"].iloc[0], 0)
        out = g.sort_values(["hs", "doc_id"], kind="mergesort").head(kk)
        return out[["lang", "doc_id"]]

    pruned = ds.map_batches(
        hashed, batch_size=None, batch_format="pyarrow"
    ).map_batches(block_prune, batch_size=None, batch_format="pandas")
    return pruned.groupby("lang").map_groups(per_lang, batch_format="pandas")


SQL_DOCS_TEMPERATURE_MIX = """
WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n,
             CAST(FLOOR(SQRT(CAST(n * 1000000 AS DOUBLE))) AS BIGINT) AS w
      FROM n),
tot AS (SELECT SUM(w) AS wsum FROM w),
quota AS (SELECT lang, n, w,
                 ({B} * w) // tot.wsum AS base, ({B} * w) % tot.wsum AS rem
          FROM w, tot),
ranked AS (SELECT *,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr,
                  (SELECT {B} - SUM(base) FROM quota) AS leftover
           FROM quota),
k AS (SELECT lang, base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS k
      FROM ranked),
h AS ({H}),
r AS (SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM h)
SELECT r.lang, r.doc_id FROM r JOIN k USING (lang) WHERE rn <= k.k
""".format(
    B=TEMP_MIX_BUDGET,
    H=ops.splitmix64_sql("documents", "doc_id", ["lang", "doc_id"], seed=TEMP_MIX_SEED),
)

QUERIES["docs_temperature_mix"] = q_docs_temperature_mix
ORACLE_SQL["docs_temperature_mix"] = SQL_DOCS_TEMPERATURE_MIX


def q_supplier_name_ed1(sf_dir: str):
    """X71: edit-distance<=1 string-similarity SELF-JOIN via the FastSS
    deletion neighborhood — the exact small-radius sibling of the LSH
    families: two strings are within one edit iff they share a member
    of {s} U del1(s) (substitution at i -> same i-deletion; insertion
    -> one IS the other's deletion; equality trivially), so candidates
    come from ONE hash self-join on the variant key instead of all
    pairs, then the from-scratch Levenshtein kernel verifies exactly.
    Variant generation is vectorized: one slice+concat kernel pass per
    deletion position (no per-row Python). Scale: |s|+1 variants per
    row through a distinct combiner; self-join fan-out bounded by
    bucket sizes (names sharing a variant), exact verify on the
    candidate residue only."""
    import numpy as np

    from .similarity import levenshtein

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def variants(b: pa.Table) -> pa.Table:
        names = b["s_name"].combine_chunks()
        keys = b["s_suppkey"].combine_chunks()
        lens = pc.utf8_length(names).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if len(lens) else 0
        parts = [pa.table({"k": keys, "v": names, "nm": names})]
        big = 1 << 30
        for i in range(max_len):
            mask = pa.array(lens > i)
            sub_n = names.filter(mask)
            sub_k = keys.filter(mask)
            v = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub_n, 0, i),
                pc.utf8_slice_codeunits(sub_n, i + 1, big),
                "",
            )
            parts.append(pa.table({"k": sub_k, "v": v, "nm": sub_n}))
        return pa.concat_tables(parts)

    ex = ops.distinct(
        sup.map_batches(variants, batch_size=None, batch_format="pyarrow"),
        ["k", "v", "nm"],
    ).materialize()  # both sides of the self-join
    pairs = ops.distinct(
        ops.normalize_blocks(
            ops.hash_join(
                ex,
                ex.map_batches(
                    lambda b: pa.table(
                        {"k2": b["k"], "v2": b["v"], "nm2": b["nm"]}
                    ),
                    batch_size=None,
                    batch_format="pyarrow",
                ),
                on=("v",),
                right_on=("v2",),
            ),
            pa.schema(
                [
                    ("k", pa.int64()),
                    ("v", pa.string()),
                    ("nm", pa.string()),
                    ("k2", pa.int64()),
                    ("nm2", pa.string()),
                ]
            ),
        ).map_batches(
            lambda b: b.filter(pc.less(b["k"], b["k2"])).select(
                ["k", "nm", "k2", "nm2"]
            ),
            batch_size=None,
            batch_format="pyarrow",
        ),
        ["k", "nm", "k2", "nm2"],
    )

    def verify(b: pa.Table) -> pa.Table:
        a_n = b["nm"].to_pylist()
        b_n = b["nm2"].to_pylist()
        lev = np.array(
            [levenshtein(x, y) for x, y in zip(a_n, b_n)], dtype=np.int64
        )
        keep = lev <= 1
        f = b.filter(pa.array(keep))
        return pa.table(
            {
                "a": f["k"],
                "b": f["k2"],
                "lev": pa.array(lev[keep], pa.int64()),
            }
        )

    return pairs.map_batches(verify, batch_size=None, batch_format="pyarrow")


SQL_SUPPLIER_NAME_ED1 = """
SELECT a.s_suppkey AS a, b.s_suppkey AS b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS lev
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""

QUERIES["supplier_name_ed1"] = q_supplier_name_ed1
ORACLE_SQL["supplier_name_ed1"] = SQL_SUPPLIER_NAME_ED1


def q_events_ohlc_hourly(sf_dir: str):
    """A18: per-hour OHLC (open/high/low/close) — the canonical
    mergeable ORDER-STATISTIC aggregate: open/close need the value at
    the min/max (ts, event_id) key, which plain SUM/MIN combiners
    can't express. Plan: per-block pandas partial (one stable sort per
    block, then first/last/min/max per hour) emits ONE row per (block,
    hour) carrying the open/close rows' full ordering keys; a
    `groupby(hour).map_groups` merge picks the global min/max-key rows
    — associative, so the shuffle sees O(blocks x hours) rows, never
    events. All values exact int cents; (ts, event_id) is a total
    order so the result is layout-independent."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["ts", "event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(b["ts"], unit="hour"),
                "ts": b["ts"],
                "event_id": b["event_id"],
                "c": ops.cents(b["value"]),
            }
        )

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["ts", "event_id"], kind="mergesort")
        g = s.groupby("hour", sort=False)
        first = g.nth(0)
        last = g.nth(-1)
        agg = g.agg(lo=("c", "min"), hi=("c", "max"), n=("c", "size"))
        out = pd.DataFrame(
            {
                "hour": agg.index,
                "open_ts": first["ts"].to_numpy(),
                "open_id": first["event_id"].to_numpy(),
                "open_c": first["c"].to_numpy(),
                "close_ts": last["ts"].to_numpy(),
                "close_id": last["event_id"].to_numpy(),
                "close_c": last["c"].to_numpy(),
                "lo": agg["lo"].to_numpy(),
                "hi": agg["hi"].to_numpy(),
                "n": agg["n"].to_numpy().astype("int64"),
            }
        )
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        o = g.sort_values(["open_ts", "open_id"], kind="mergesort").iloc[0]
        c = g.sort_values(["close_ts", "close_id"], kind="mergesort").iloc[-1]
        return pd.DataFrame(
            {
                "hour": [g["hour"].iloc[0]],
                "open_c": [int(o["open_c"])],
                "hi_c": [int(g["hi"].max())],
                "lo_c": [int(g["lo"].min())],
                "close_c": [int(c["close_c"])],
                "n": [int(g["n"].sum())],
            }
        )

    partials = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).map_batches(block_partial, batch_size=None, batch_format="pandas")
    return partials.groupby("hour").map_groups(merge, batch_format="pandas")


SQL_EVENTS_OHLC = """
WITH b AS (SELECT date_trunc('hour', ts) AS hour, ts, event_id,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
w AS (SELECT hour, c,
             ROW_NUMBER() OVER (PARTITION BY hour ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY hour ORDER BY ts DESC, event_id DESC) AS rl
      FROM b)
SELECT hour,
       CAST(MAX(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS open_c,
       MAX(c) AS hi_c, MIN(c) AS lo_c,
       CAST(MAX(CASE WHEN rl = 1 THEN c END) AS BIGINT) AS close_c,
       COUNT(*) AS n
FROM w GROUP BY hour
"""

QUERIES["events_ohlc_hourly"] = q_events_ohlc_hourly
ORACLE_SQL["events_ohlc_hourly"] = SQL_EVENTS_OHLC


def q_events_user_rolling3(sf_dir: str):
    """W6: per-user trailing 3-row moving sum of value cents in
    (ts, event_id) order — the bounded ROWS-window sibling of the W2
    running sum (`ops.group_rolling_sum`: one key shuffle, vectorized
    C rolling inside the group, exact int cents)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "c": ops.cents(b["value"]),
            }
        )

    out = ops.group_rolling_sum(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "c",
        "roll3_cents",
        window=3,
    )
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "roll3_cents"]),
        batch_size=None,
        batch_format="pyarrow",
    )


SQL_EVENTS_USER_ROLLING3 = """
SELECT user_id, event_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS roll3_cents
FROM events
"""

QUERIES["events_user_rolling3"] = q_events_user_rolling3
ORACLE_SQL["events_user_rolling3"] = SQL_EVENTS_USER_ROLLING3


SURVIVOR_PRIORITY = ["purchase", "signup", "click", "view", "error"]


def q_user_survivor_event(sf_dir: str):
    """X72: survivorship dedup (the MDM 'golden record' rule): per
    user keep exactly ONE event — highest type priority first
    (purchase > signup > click > view > error), most recent on ties,
    event_id as the final total-order tiebreak. Priority is a
    vectorized `pc.index_in` against the ordered type list (no per-row
    Python); a per-block per-user head(1) combiner prunes to
    O(blocks x users) rows before the single key shuffle;
    `ops.group_topk(k=1)` picks the global winner."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    prio_set = pa.array(SURVIVOR_PRIORITY)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                # fill_null: a type OUTSIDE the priority list must tie
                # with the last listed type, exactly like the oracle's
                # CASE ... ELSE — NULL would sort differently (ADVICE r4)
                "prio": pc.fill_null(
                    pc.cast(
                        pc.index_in(b["event_type"], value_set=prio_set),
                        pa.int64(),
                    ),
                    len(SURVIVOR_PRIORITY) - 1,
                ),
            }
        )

    def block_prune(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["prio", "ts", "event_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("user_id", sort=False)
            .head(1)
        )

    pruned = ds.map_batches(
        prep, batch_size=None, batch_format="pyarrow"
    ).map_batches(block_prune, batch_size=None, batch_format="pandas")
    top = ops.group_topk(
        pruned,
        "user_id",
        ["prio", "ts", "event_id"],
        1,
        ascending=[True, False, True],
    )
    return top.map_batches(
        lambda b: b.select(["user_id", "event_id", "event_type"]),
        batch_size=None,
        batch_format="pyarrow",
    )


SQL_USER_SURVIVOR_EVENT = """
WITH p AS (
  SELECT user_id, event_id, event_type, ts,
         CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1
              WHEN 'click' THEN 2 WHEN 'view' THEN 3 ELSE 4 END AS prio
  FROM events)
SELECT user_id, event_id, event_type FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY prio, ts DESC, event_id) AS rn
  FROM p) WHERE rn = 1
"""

QUERIES["user_survivor_event"] = q_user_survivor_event
ORACLE_SQL["user_survivor_event"] = SQL_USER_SURVIVOR_EVENT


CONTAIN_TERMS = ["query", "window", "merge"]  # the AND-search term set


def q_docs_containing_all_terms(sf_dir: str):
    """X73: set-containment search (AND-semantics term filter — the
    retrieval primitive behind inverted-index conjunctive queries):
    docs whose token set contains EVERY query term. The term set is
    tiny and broadcast inside the kernel; per batch ONE vectorized
    membership pass per term over the token explode would still shuffle
    tokens, so instead the whole check is map-side: split once, one
    `pc.is_in` per term on the token lists' flattened values, reduced
    per doc with list-offset arithmetic — no shuffle at all, output is
    a filter of the input."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = toks.flatten()
        offs = toks.offsets.to_numpy().astype(np.int64)
        keep = np.ones(len(toks), dtype=bool)
        for t in CONTAIN_TERMS:
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            # per-doc ANY via prefix sums over the list offsets
            cum = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
            keep &= (cum[offs[1:]] - cum[offs[:-1]]) > 0
        return pa.table(
            {"doc_id": b["doc_id"].combine_chunks().filter(pa.array(keep))}
        )

    return ds.map_batches(f, batch_size=None, batch_format="pyarrow")


SQL_DOCS_CONTAINING_ALL = """
SELECT doc_id FROM documents
WHERE {conds}
""".format(
    conds=" AND ".join(
        f"list_contains(string_split(text, ' '), '{t}')" for t in CONTAIN_TERMS
    )
)

QUERIES["docs_containing_all_terms"] = q_docs_containing_all_terms
ORACLE_SQL["docs_containing_all_terms"] = SQL_DOCS_CONTAINING_ALL


def q_priority_price_p25_cont(sf_dir: str):
    """X74: per-group CONTINUOUS (linearly interpolated) quantile —
    SQL QUANTILE_CONT's convention: value at rank (n-1)*q, interpolated
    lo + (hi-lo)*frac between the two bracketing order statistics.
    Exactness: prices quantize to int cents; q = 1/4 makes frac an
    exact binary fraction, and cents < 2^50 keep lo + (hi-lo)*frac
    exactly representable — both sides compute the IDENTICAL float
    expression, so the oracle is bit-exact without the cents trick on
    the output. Scale plan: the same combiner-bounded (group, value)
    count table + cumulative walk as the DISC family (`ops.
    group_quantile_disc`'s hist path) — the shuffle carries distinct
    values, never rows; the walk just picks TWO ranks instead of one."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    Q = 0.25

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": b["o_orderpriority"],
                "c": ops.cents(b["o_totalprice"]),
            }
        )

    counts = ops.grouped_sum_count(
        ds.map_batches(prep, batch_size=None, batch_format="pyarrow"),
        keys=["g", "c"],
        sums=[],
        count_alias="n",
    )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("c", ignore_index=True)
        n = int(df["n"].sum())
        pos = (n - 1) * Q
        lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
        cum = df["n"].cumsum().to_numpy()
        vals = df["c"].to_numpy()
        lo = float(vals[np.searchsorted(cum, lo_i + 1)])
        hi = float(vals[np.searchsorted(cum, min(lo_i + 1, n - 1) + 1)])
        p = (lo + (hi - lo) * frac) / 100.0
        return pd.DataFrame({"o_orderpriority": [df["g"].iloc[0]], "p25": [p]})

    return counts.groupby("g").map_groups(per_group, batch_format="pandas")


SQL_PRIORITY_PRICE_P25_CONT = """
WITH b AS (SELECT o_orderpriority,
                  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
           FROM orders),
r AS (SELECT o_orderpriority, c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY c) - 1 AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM b),
lohi AS (
  SELECT o_orderpriority,
         MAX(CASE WHEN rk = CAST(FLOOR((n - 1) * 0.25) AS BIGINT)
                  THEN c END) AS lo,
         MAX(CASE WHEN rk = LEAST(CAST(FLOOR((n - 1) * 0.25) AS BIGINT) + 1,
                                  n - 1)
                  THEN c END) AS hi,
         MAX((n - 1) * 0.25 - FLOOR((n - 1) * 0.25)) AS frac
  FROM r GROUP BY o_orderpriority)
SELECT o_orderpriority,
       (CAST(lo AS DOUBLE)
        + (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * frac) / 100.0 AS p25
FROM lohi
"""

QUERIES["priority_price_p25_cont"] = q_priority_price_p25_cont
ORACLE_SQL["priority_price_p25_cont"] = SQL_PRIORITY_PRICE_P25_CONT


# ---------------------------------------------------------------------------
# Round-5 widening: unbounded-domain global quantile (X75), from-scratch
# BPE tokenizer (X76), stdlib WAV audio decode (X12c), actor-pool
# hashed-BoW embedding inference demo (X77).


def q_events_value_quantiles_refine(sf_dir: str):
    """X75: exact global p50/p90 of `events.value` — a CONTINUOUS
    double column with (potentially) corpus-many distinct values, so
    the O(distinct) value-count plan of `global_quantile_disc` does
    not apply. `ops.global_quantiles_refine` finds BOTH ranks in 4
    fixed-memory bit-plane refinement passes shared across the two
    quantiles (1 count + 4 refine = 5 corpus scans total, not 10;
    2^16-bounded combiner histograms per unique candidate prefix);
    nothing here scales with rows or distinct values. The single
    pruned column re-streams per pass (no materialize: at corpus
    scale even one float64 column is too big to pin)."""
    ds = _read(sf_dir, "events", ["value"])
    p50, p90 = ops.global_quantiles_refine(ds, "value", (0.5, 0.9))
    return pa.table(
        {
            "q_label": pa.array(["p50", "p90"], type=pa.string()),
            "qvalue": pa.array([p50, p90], type=pa.float64()),
        }
    )


SQL_EVENTS_VALUE_QUANTILES_REFINE = """
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
cnt AS (SELECT COUNT(*) AS n FROM v)
SELECT 'p50' AS q_label,
       (SELECT value FROM v ORDER BY value
        LIMIT 1 OFFSET (SELECT CAST(FLOOR((n - 1) * 0.5) AS BIGINT) FROM cnt)
       ) AS qvalue
UNION ALL
SELECT 'p90',
       (SELECT value FROM v ORDER BY value
        LIMIT 1 OFFSET (SELECT CAST(FLOOR((n - 1) * 0.9) AS BIGINT) FROM cnt)
       )
"""

QUERIES["events_value_quantiles_refine"] = q_events_value_quantiles_refine
ORACLE_SQL["events_value_quantiles_refine"] = SQL_EVENTS_VALUE_QUANTILES_REFINE


def q_doc_bpe_tokens(sf_dir: str):
    """X76: subword token counts under a from-scratch BPE vocabulary
    trained on the corpus itself (Sennrich et al. 2016). Training is
    ONE corpus-scale word-frequency combiner groupby, then merge
    rounds over the (distinct-word, n) table only — size-gated to a
    driver loop below WORD_GATE distinct words and a fully
    distributed per-round pair-count groupby above it (parity-tested
    identical). Encoding is an actor-pool stage with per-actor
    distinct-word caching. Oracled against the independent sequential
    twin's committed golden (reference_impl/sketch.py run_bpe_tokens)."""
    from .extras import bpe

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe.train_bpe(ds, num_merges=80, min_count=2)
    return ds.map_batches(
        bpe.BpeEncoder,
        fn_constructor_args=(merges,),
        concurrency=2,
        batch_size=256,
        batch_format="pyarrow",
    )


QUERIES["doc_bpe_tokens"] = q_doc_bpe_tokens

ORACLE_SQL["doc_bpe_tokens"] = (
    "SELECT doc_id, n_words, n_bpe_tokens "
    f"FROM read_parquet('{_GOLDEN_DIR}/sf001_bpe_tokens.parquet')"
)


# X12c: WAV/PCM audio decode + featurize (round 5). Same oracle
# pattern as multimodal_features: an independent sequential
# implementation (multimodal.expected_audio_table — features computed
# from the RAW samples, no codec round trip) writes the expected
# parquet the SQL reads; `__ray_entry__.oracle_sql()` refreshes it.
AUDIO_ORACLE_PATH = "/tmp/kgray_oracle/audio_expected_500.parquet"


def write_audio_expected(n: int = 500) -> str:
    import os

    import pyarrow.parquet as pq

    from .extras import multimodal

    os.makedirs(os.path.dirname(AUDIO_ORACLE_PATH), exist_ok=True)
    pq.write_table(multimodal.expected_audio_table(n), AUDIO_ORACLE_PATH)
    return AUDIO_ORACLE_PATH


def q_multimodal_wav_features(sf_dir: str):
    """X12c: real from-scratch RIFF/WAVE 16-bit-PCM decode inside an
    actor-pool featurizer (duration/peak/zero-crossing/rms), truncated
    blobs -> decode_ok=False with NULL features. Binary rows are wide,
    so batch_size stays small (64) and batches are zero-copy Arrow."""
    import ray.data as _rd

    from .extras import multimodal

    n = 500 if "0.01" in sf_dir else (2000 if "0.1" in sf_dir else 100)
    ds = _rd.from_arrow(multimodal.make_audio_table(n))
    feats = multimodal.featurize_audio(ds, batch_size=64)
    return ops.collect_table(
        feats,
        schema=pa.schema(
            [
                ("audio_id", pa.int64()),
                ("sample_rate", pa.int32()),
                ("n_frames", pa.int64()),
                ("peak", pa.int32()),
                ("zero_crossings", pa.int64()),
                ("rms", pa.float64()),
                ("decode_ok", pa.bool_()),
            ]
        ),
        sort_by=["audio_id"],
    )


SQL_MULTIMODAL_WAV = (
    "SELECT audio_id, sample_rate, n_frames, peak, zero_crossings, rms, "
    f"decode_ok FROM read_parquet('{AUDIO_ORACLE_PATH}')"
)

QUERIES["multimodal_wav_features"] = q_multimodal_wav_features
ORACLE_SQL["multimodal_wav_features"] = SQL_MULTIMODAL_WAV


def q_docs_embed_corpus(sf_dir: str):
    """X77: end-to-end "embed the corpus" inference stage — quartile
    length buckets (thresholds from ONE combiner word-count
    value-count table, the X59 recipe), map-side sorted batching, and
    an actor-pool hashed-BoW stub model (weights once per actor in
    __init__, one GEMM per micro-batch). Deterministic per doc —
    independent of batch layout and actor count — so it's oracled
    against the sequential twin's committed golden
    (reference_impl/sketch.py run_doc_embed)."""
    import numpy as np

    from .extras import inference
    from .extras.textstats import _TOKEN as _TK

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def wcount(b: pa.Table) -> pa.Table:
        nw = pa.array(
            [len(_TK.findall(t or "")) for t in b["text"].to_pylist()], pa.int64()
        )
        return pa.table({"nw": nw})

    counts = ops.collect_table(
        ops.grouped_sum_count(
            ds.map_batches(wcount, batch_size=None, batch_format="pyarrow"),
            keys=["nw"],
            sums=[],
            count_alias="n",
        ),
        pa.schema([("nw", pa.int64()), ("n", pa.int64())]),
    )
    vals = counts["nw"].to_numpy(zero_copy_only=False)
    cnt = counts["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="mergesort")
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    thr = tuple(
        int(vals[np.searchsorted(cum, (n - 1) * p // 4 + 1)]) for p in (1, 2, 3)
    )
    return inference.embed_corpus(ds, thr, batch_size=64)


QUERIES["docs_embed_corpus"] = q_docs_embed_corpus
ORACLE_SQL["docs_embed_corpus"] = (
    "SELECT doc_id, bucket, n_words, emb_l2, emb_argmax, emb_c0 "
    f"FROM read_parquet('{_GOLDEN_DIR}/sf001_doc_embed.parquet')"
)


# X12d: baseline JPEG codec behind the multimodal featurizer
# (round 5). JPEG is LOSSY, so the PNG oracle trick (features of
# decoded pixels == features of the raw fixture pixels) cannot apply.
# Instead the decoder follows an integer-exact contract (fixed-point
# int64 IDCT + integer BT.601 — extras/jpeg.py header) that an
# INDEPENDENT sequential twin (reference_impl/jpeg_twin.py: bitstring
# reader, prefix-dict Huffman, four-loop IDCT, per-pixel color)
# re-implements; the oracle parquet is the twin's decode of the same
# deterministic blobs. The expected table is cached (the twin's
# pure-Python IDCT costs ~20 s for 500 images), and its content is a
# pure function of (codec source, twin source, fixture/featurizer
# constants) — so the cache key IS a hash of those sources: any edit
# to either implementation rotates the /tmp filename and forces a
# regeneration instead of silently comparing against a stale oracle.


def _jpeg_oracle_path() -> str:
    import hashlib
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    # by path, not by import: reference_impl must never be imported at
    # kgray module scope (Ray workers import kgray.queries)
    for src in (
        os.path.join(here, "extras", "jpeg.py"),
        os.path.join(os.path.dirname(here), "reference_impl", "jpeg_twin.py"),
    ):
        with open(src, "rb") as f:
            h.update(f.read())
    return f"/tmp/kgray_oracle/jpeg_expected_500_{h.hexdigest()[:12]}.parquet"


JPEG_ORACLE_PATH = _jpeg_oracle_path()


def write_jpeg_expected(n: int = 500) -> str:
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(JPEG_ORACLE_PATH):
        from reference_impl.jpeg_twin import expected_jpeg_table

        os.makedirs(os.path.dirname(JPEG_ORACLE_PATH), exist_ok=True)
        tmp = JPEG_ORACLE_PATH + ".tmp"
        pq.write_table(expected_jpeg_table(n), tmp)
        os.replace(tmp, JPEG_ORACLE_PATH)
    return JPEG_ORACLE_PATH


def q_multimodal_jpeg_features(sf_dir: str):
    """X12d: the seeded fixture images re-encoded as baseline JFIF by
    the from-scratch encoder (quality rotates 95/85/75 by img_id so
    all three quant-table scalings are exercised; odd img_ids emit
    4:2:0 subsampled chroma — the real-world profile — and even ones
    4:4:4; restart intervals rotate 0/2/5 MCUs so DRI/RSTn resync is
    oracled too), then decoded by the from-scratch integer-exact
    decoder inside the actor-pool featurizer. Output attests the
    encoder's byte stream length and the decoded-pixel feature norm
    per image."""
    import ray.data as _rd

    from .extras import multimodal

    n = 500 if "0.01" in sf_dir else (2000 if "0.1" in sf_dir else 100)
    base = multimodal.make_image_table(n)

    def to_jpeg(b: pa.Table) -> pa.Table:
        from .extras import jpeg as _j

        ids = b["img_id"].to_pylist()
        blobs = [
            _j.encode_jpeg(
                multimodal.decode_image(blob, fmt),
                quality=(95, 85, 75)[i % 3],
                subsample=(i % 2 == 1),
                restart_interval=(0, 2, 5)[i % 3],
            )
            for i, blob, fmt in zip(
                ids, b["image"].to_pylist(), b["format"].to_pylist()
            )
        ]
        return pa.table(
            {
                "img_id": b["img_id"],
                "image": pa.array(blobs, pa.binary()),
                "format": pa.array(["jpeg"] * len(blobs)),
                "jpeg_bytes": pa.array([len(x) for x in blobs], pa.int64()),
            }
        )

    ds = _rd.from_arrow(base).map_batches(
        to_jpeg, batch_size=64, batch_format="pyarrow"
    )
    feats = multimodal.featurize_images(ds, batch_size=64)

    def flatten(b: pa.Table) -> pa.Table:
        import numpy as _np

        norms = [
            round(float(_np.linalg.norm(_np.asarray(v))), 4)
            if v is not None
            else 0.0
            for v in b["feature"].to_pylist()
        ]
        return pa.table(
            {
                "img_id": b["img_id"],
                "jpeg_bytes": b["jpeg_bytes"],
                "decode_ok": b["decode_ok"],
                "feat_norm": pa.array(norms, type=pa.float64()),
            }
        )

    # jpeg_bytes rides the encode stage THROUGH the featurizer's
    # side-column passthrough — no hash join (its fixed per-partition
    # aggregator startup, ~2.6 s on this host, dominated the query)
    return ops.collect_table(
        feats.map_batches(flatten, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("img_id", pa.int64()),
                ("jpeg_bytes", pa.int64()),
                ("decode_ok", pa.bool_()),
                ("feat_norm", pa.float64()),
            ]
        ),
        sort_by=["img_id"],
    )


SQL_MULTIMODAL_JPEG = (
    "SELECT img_id, jpeg_bytes, decode_ok, feat_norm "
    f"FROM read_parquet('{JPEG_ORACLE_PATH}')"
)

QUERIES["multimodal_jpeg_features"] = q_multimodal_jpeg_features
ORACLE_SQL["multimodal_jpeg_features"] = SQL_MULTIMODAL_JPEG


def q_doc_compress_ratio(sf_dir: str):
    """X78: compressibility quality signal — per-doc zlib ratio in
    integer basis points, with the Gopher-family keep rule (highly
    compressible text is boilerplate/repetition; threshold 40.00%).
    Pure map over the pruned (doc_id, text) read: no shuffle, no
    state — the per-doc zlib call is an opaque CPU kernel like M1's
    sha256, so the in-batch loop IS the vectorization unit. Output is
    all-integer, oracled bit-exact against the sequential twin's
    committed golden (reference_impl/sketch.py run_compress_ratio;
    determinism = pinned zlib level + the same in-process stdlib)."""
    import zlib

    from reference_impl.sketch import COMPRESS_BPS_KEEP, COMPRESS_LEVEL

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(b: pa.Table) -> pa.Table:
        raws, zs = [], []
        for t in b["text"].to_pylist():
            raw = (t or "").encode("utf-8")
            raws.append(len(raw))
            zs.append(len(zlib.compress(raw, COMPRESS_LEVEL)))
        raw_a = np.asarray(raws, dtype=np.int64)
        z_a = np.asarray(zs, dtype=np.int64)
        bps = (z_a * 10000) // np.maximum(raw_a, 1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "raw_bytes": pa.array(raw_a),
                "zlib_bytes": pa.array(z_a),
                "compress_bps": pa.array(bps),
                "keep": pa.array(bps >= COMPRESS_BPS_KEEP),
            }
        )

    return ds.map_batches(ratio, batch_size=None, batch_format="pyarrow")


QUERIES["doc_compress_ratio"] = q_doc_compress_ratio
ORACLE_SQL["doc_compress_ratio"] = (
    "SELECT doc_id, raw_bytes, zlib_bytes, compress_bps, keep "
    f"FROM read_parquet('{_GOLDEN_DIR}/sf001_compress_ratio.parquet')"
)


def q_user_decayed_value(sf_dir: str):
    """X79: recency-decayed per-user activity score with an EXACT
    half-life — value halves per hour of age via integer right shift
    (decayed = cents >> min(62, age_hours)), so both sides compute
    identical int64s and no float pow() ever enters the oracle.
    Corpus-max timestamp is one per-block-max combiner scan; the
    decay+sum is one map + a combiner groupby — two scans total,
    nothing driver-side beyond O(blocks) block maxima."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def block_max(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"mt": pa.array([pc.max(b["ts"]).as_py()])})

    mt = max(
        r["mt"]
        for r in ds.map_batches(
            block_max, batch_size=None, batch_format="pyarrow"
        ).take_all()
    )
    mt_us = int(mt.timestamp() * 1_000_000) if hasattr(mt, "timestamp") else int(mt)

    def decay(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        age_h = (mt_us - ts_us) // 3_600_000_000
        shift = np.minimum(age_h, 62)
        cents = ops.cents(b["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "decayed_cents": pa.array(cents >> shift, type=pa.int64()),
            }
        )

    return ops.grouped_sum_count(
        ds.map_batches(decay, batch_size=None, batch_format="pyarrow"),
        keys=["user_id"],
        sums=[("decayed_cents", "decayed_cents")],
        count_alias="n_events",
    )


QUERIES["user_decayed_value"] = q_user_decayed_value
ORACLE_SQL["user_decayed_value"] = """
WITH m AS (SELECT MAX(ts) AS mt FROM events)
SELECT user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           >> LEAST(62, CAST(FLOOR(EXTRACT(EPOCH FROM mt - ts) / 3600) AS BIGINT))
       ) AS BIGINT) AS decayed_cents,
       COUNT(*) AS n_events
FROM events, m
GROUP BY user_id
"""
