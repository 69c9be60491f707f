"""Relational query inventory — SURVEY.md §2.2-2.7 re-expressed over the test
star schema (TESTDATA.md / FIXTURES.md §D mapping).

Each query cites the reference operator(s) it covers (file:line into
/root/reference/) and ships a byte-equivalent DuckDB oracle.  All queries are
pure DataFrame-API plans: Catalyst handles predicate pushdown, column pruning,
join selection (broadcast for the small dims), and partial aggregation.

Determinism rules used throughout (see functions/aggregates.py):
- money/fixed-point sums and averages via exact scaled-integer aggregation;
- no raw floating aggregates in any hashed output;
- timestamps surface only as DATEs (naive, timezone-independent);
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.aggregates import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from delta_lake_validation_spark.plans.registry import register
from delta_lake_validation_spark.tables import Tables


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary
# (covers A1 group-agg src/benchmarking_suite.py:55-60, A2 multi-agg :70-77,
#  P3 filter :63-67, P10 to_date :58)
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity', 0, 4)} AS avg_qty,
           {sql_davg('l_extendedprice', 2, 4)} AS avg_price,
           {sql_davg('l_discount', 2, 6)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
    doc="A1/A2/P3/P10: src/benchmarking_suite.py:55-77",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
            ).alias("sum_charge"),
            davg(F.col("l_quantity"), 0, 4).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
            davg(F.col("l_discount"), 2, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — column projection (src/benchmarking_suite.py:49-52)
# ---------------------------------------------------------------------------
@register(
    "select_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    """,
    tags=("projection",),
    doc="P1: src/benchmarking_suite.py:49-52",
)
def select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


# ---------------------------------------------------------------------------
# P3 — comparison-predicate filter (src/benchmarking_suite.py:63-67)
# ---------------------------------------------------------------------------
@register(
    "filter_quantity",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem WHERE l_quantity > 45
    """,
    tags=("filter",),
    doc="P3: src/benchmarking_suite.py:63-67",
)
def filter_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.to_date("l_shipdate").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# A2 — global (no-key) aggregate (src/benchmarking_suite.py:70-77)
# ---------------------------------------------------------------------------
@register(
    "global_avg",
    oracle=f"""
    SELECT {sql_davg('l_extendedprice', 2, 4)} AS avg_price,
           {sql_davg('l_quantity', 0, 4)} AS avg_qty
    FROM lineitem
    """,
    tags=("agg",),
    doc="A2: src/benchmarking_suite.py:70-77",
)
def global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy().agg(
        davg(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
        davg(F.col("l_quantity"), 0, 4).alias("avg_qty"),
    )


# ---------------------------------------------------------------------------
# A1 + P10 — group-by-day revenue (src/benchmarking_suite.py:55-60)
# ---------------------------------------------------------------------------
@register(
    "groupby_day_revenue",
    oracle=f"""
    SELECT CAST(l_shipdate AS DATE) AS ship_date,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
    """,
    tags=("agg",),
    doc="A1/P10: src/benchmarking_suite.py:55-60",
)
def groupby_day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# P5 + P4 — derived datetime-arithmetic column, filter on it
# (src/benchmarking_suite.py:80-84: trip_duration > 30)
# ---------------------------------------------------------------------------
@register(
    "shipping_delay",
    oracle="""
    SELECT o_orderkey, l_linenumber,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INTEGER)
               AS delay_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INTEGER)
          > 120
    """,
    tags=("derived", "join"),
    doc="P4/P5: src/benchmarking_suite.py:80-84",
)
def shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast("int")
    return (
        joined.withColumn("delay_days", delay)
        .filter("delay_days > 120")
        .select("o_orderkey", "l_linenumber", "delay_days")
    )


# ---------------------------------------------------------------------------
# P6 — conditional column (when/otherwise) (src/benchmarking_suite.py:109-113)
# ---------------------------------------------------------------------------
@register(
    "conditional_discount_class",
    oracle="""
    SELECT CASE WHEN l_discount > 0.06 THEN 'HIGH'
                WHEN l_discount > 0.03 THEN 'MID'
                ELSE 'LOW' END AS discount_class,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY 1
    """,
    tags=("conditional", "agg"),
    doc="P6: src/benchmarking_suite.py:109-113",
)
def conditional_discount_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    cls = (
        F.when(F.col("l_discount") > 0.06, F.lit("HIGH"))
        .when(F.col("l_discount") > 0.03, F.lit("MID"))
        .otherwise(F.lit("LOW"))
    )
    return (
        li.groupBy(cls.alias("discount_class"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# P8 + P9 — string concat + cast + rename (src/benchmarking_suite.py:93-96)
# ---------------------------------------------------------------------------
@register(
    "part_labels",
    oracle="""
    SELECT p_partkey, 'Brand ' || p_brand || ' #' || CAST(p_size AS VARCHAR) AS label
    FROM part
    """,
    tags=("scalar",),
    doc="P8/P9: src/benchmarking_suite.py:93-96",
)
def part_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Tables(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.concat(
            F.lit("Brand "), F.col("p_brand"), F.lit(" #"), F.col("p_size").cast("string")
        ).alias("label"),
    )


# ---------------------------------------------------------------------------
# P7 — null handling via na.drop (src/benchmarking_suite.py:116-121)
# ---------------------------------------------------------------------------
@register(
    "na_drop_events",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
    """,
    tags=("null",),
    doc="P7: src/benchmarking_suite.py:116-121",
)
def na_drop_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    return ev.na.drop(subset=["user_id", "value", "event_type"]).select(
        "event_id", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# J1 + U1 + A5 + P8/P9 — distinct-union-built dimension joined to fact
# (src/benchmarking_suite.py:87-101: locations dim from PU/DO ids)
# ---------------------------------------------------------------------------
@register(
    "dim_union_join",
    oracle="""
    WITH location_dim AS (
        SELECT DISTINCT locationID,
               'Location ' || CAST(locationID AS VARCHAR) AS loc_name
        FROM (
            SELECT DISTINCT c_nationkey AS locationID FROM customer
            UNION ALL
            SELECT DISTINCT s_nationkey AS locationID FROM supplier
        )
    )
    SELECT c_custkey, loc_name
    FROM customer JOIN location_dim ON c_nationkey = locationID
    """,
    tags=("join", "union", "distinct"),
    doc="J1/U1/A5: src/benchmarking_suite.py:87-101",
)
def dim_union_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pu = t.customer.select(F.col("c_nationkey").alias("locationID")).distinct()
    do = t.supplier.select(F.col("s_nationkey").alias("locationID")).distinct()
    dim = (
        pu.union(do)
        .distinct()
        .withColumn("loc_name", F.concat(F.lit("Location "), F.col("locationID").cast("string")))
    )
    # dim is tiny → broadcast join, no shuffle of the fact side
    return (
        t.customer.join(F.broadcast(dim), F.col("c_nationkey") == F.col("locationID"))
        .select("c_custkey", "loc_name")
    )


# ---------------------------------------------------------------------------
# J2 — equi self-join on key (src/benchmarking_suite.py:151-154)
# ---------------------------------------------------------------------------
@register(
    "self_join_events",
    oracle="""
    SELECT a.event_id AS left_id, b.event_id AS right_id, a.user_id
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'click' AND b.event_type = 'purchase' AND a.event_id < b.event_id
    """,
    tags=("join",),
    doc="J2: src/benchmarking_suite.py:151-154",
)
def self_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(F.col("a.event_id") < F.col("b.event_id"))
        .select(
            F.col("a.event_id").alias("left_id"),
            F.col("b.event_id").alias("right_id"),
            F.col("a.user_id").alias("user_id"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — bucketed similarity (band) join + theta residual
# (src/benchmarking_suite.py:156-163, implemented with the *intended*
#  semantics — distinct bucket columns — per SURVEY.md §2.13 bug 3)
# ---------------------------------------------------------------------------
@register(
    "bucket_band_join",
    oracle="""
    SELECT a.doc_id AS left_doc, b.doc_id AS right_doc,
           CAST(floor(a.n_chars / 100.0) AS BIGINT) AS bucket, a.lang
    FROM documents a JOIN documents b
      ON floor(a.n_chars / 100.0) = floor(b.n_chars / 100.0) AND a.lang = b.lang
    WHERE a.doc_id < b.doc_id
    """,
    tags=("join", "similarity"),
    doc="J3 intent: src/benchmarking_suite.py:156-163",
)
def bucket_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    bucketed = docs.withColumn("bucket", F.floor(F.col("n_chars") / F.lit(100.0)).cast("long"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.lang") == F.col("b.lang")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("left_doc"),
            F.col("b.doc_id").alias("right_doc"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.lang").alias("lang"),
        )
    )


# ---------------------------------------------------------------------------
# W1/W2 — window rank, top-k per partition
# (src/benchmarking_suite.py:103-106,166-169)
# ---------------------------------------------------------------------------
@register(
    "window_rank_topk",
    oracle="""
    SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS INTEGER)
                   AS rnk
        FROM lineitem
    ) WHERE rnk <= 3
    """,
    tags=("window",),
    doc="W1/W2: src/benchmarking_suite.py:103-106,166-169",
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# A4 — COUNT(*) scalar (src/validation_suite.py:420-422)
# ---------------------------------------------------------------------------
@register(
    "count_lineitem",
    oracle="SELECT count(*) AS n FROM lineitem",
    tags=("agg",),
    doc="A4: src/validation_suite.py:420-422",
)
def count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy().agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# A5 — distinct (src/benchmarking_suite.py:92)
# ---------------------------------------------------------------------------
@register(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
    doc="A5: src/benchmarking_suite.py:92",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# P2 — nested-struct field projection (src/benchmarking_suite.py:126-138)
# The star schema has no native structs (FIXTURES.md §D): build the struct
# in-engine, then resolve a dotted path through it.
# ---------------------------------------------------------------------------
@register(
    "nested_project",
    oracle="SELECT event_id, value AS temperature FROM events",
    tags=("nested",),
    doc="P2: src/benchmarking_suite.py:126-138",
)
def nested_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    nested = ev.withColumn("metrics_0", F.struct(F.col("value").alias("temperature")))
    return nested.select("event_id", F.col("metrics_0.temperature").alias("temperature"))


# ---------------------------------------------------------------------------
# A3 — group-by average over nested field (src/benchmarking_suite.py:141-148)
# ---------------------------------------------------------------------------
@register(
    "nested_groupby_avg",
    oracle=f"""
    SELECT user_id, {sql_davg('value', 2, 4)} AS avg_temperature
    FROM events GROUP BY user_id
    """,
    tags=("nested", "agg"),
    doc="A3: src/benchmarking_suite.py:141-148",
)
def nested_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    nested = ev.withColumn("metrics_0", F.struct(F.col("value").alias("temperature")))
    return nested.groupBy("user_id").agg(
        davg(F.col("metrics_0.temperature"), 2, 4).alias("avg_temperature")
    )


# ---------------------------------------------------------------------------
# W1 — rank over two-level nested path (src/benchmarking_suite.py:166-169:
# partitionBy participants_0.bio_metrics.heart_rate, orderBy ….calories_burned)
# ---------------------------------------------------------------------------
@register(
    "nested_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT CAST(user_id % 40 AS INTEGER) AS heart_rate, event_id,
               CAST(rank() OVER (PARTITION BY CAST(user_id % 40 AS INTEGER)
                                 ORDER BY value DESC, event_id ASC) AS INTEGER) AS rnk
        FROM events
    ) WHERE rnk <= 3
    """,
    tags=("nested", "window"),
    doc="W1: src/benchmarking_suite.py:166-169",
)
def nested_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    nested = ev.withColumn(
        "participants_0",
        F.struct(
            F.struct(
                F.col("value").alias("calories_burned"),
                (F.col("user_id") % 40).cast("int").alias("heart_rate"),
            ).alias("bio_metrics")
        ),
    )
    w = Window.partitionBy("participants_0.bio_metrics.heart_rate").orderBy(
        F.desc("participants_0.bio_metrics.calories_burned"), F.asc("event_id")
    )
    return (
        nested.select(
            F.col("participants_0.bio_metrics.heart_rate").alias("heart_rate"),
            "event_id",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Multi-way star join #1 — TPC-H Q3-style (generalizes J1 to 3 tables)
# ---------------------------------------------------------------------------
@register(
    "order_revenue_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """,
    tags=("join", "agg"),
    doc="J1 generalized: src/benchmarking_suite.py:87-101",
)
def order_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales with SF — no broadcast hint; AQE/threshold decides
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way star join #2 — TPC-H Q5-style regional revenue
# ---------------------------------------------------------------------------
@register(
    "regional_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    doc="J1 generalized to 6-way star; SURVEY.md §2.3",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    dim = (
        t.nation.join(t.region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier scale with SF — no broadcast hints (they would
        # OOM executors at 100×); nation×region stays a true broadcast dim
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
