"""Event time-series analytics (batch) + SQL subquery coverage.

Sessionization, funnels, and inter-event gaps over the events table —
batch analogs of the streaming operators (streaming/windowed.py), all in
exact integer epoch-nanos arithmetic so the DuckDB oracle compares
bit-identically.  The sql_* queries enter through run_sql (EP1) and cover
scalar / IN / correlated-EXISTS subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.registry import register
from delta_lake_validation_spark.tables import Tables

_GAP_NS = 10 * 60 * 1_000_000_000  # 10-minute session gap


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsn,
               lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_ns(ts), event_id) AS prev
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, tsn,
               CASE WHEN prev IS NULL OR tsn - prev > {_GAP_NS} THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    sess AS (
        SELECT user_id, tsn,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_idx
        FROM marked
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           CAST((max(tsn) - min(tsn)) // 1000000000 AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, session_idx
    """,
    tags=("timeseries", "window", "agg"),
    doc="batch sessionization (gap rule) — batch analog of streaming session_window",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > _GAP_NS),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.select(
        "user_id", "ts", F.sum("brk").over(wrun).cast("long").alias("session_idx")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(ts) - min(ts)) div 1000000000").cast("long").alias("duration_s"),
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (t_view IS NOT NULL) AS n_viewed,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view) AS n_clicked_after,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click)
               AS n_converted
    FROM per_user
    """,
    tags=("timeseries", "agg"),
    doc="ordered-funnel conversion via conditional min timestamps",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_viewed"),
        F.count(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
        ).alias("n_clicked_after"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            )
        ).alias("n_converted"),
    )


@register(
    "inter_event_gaps",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                        ORDER BY epoch_ns(ts), event_id) AS gap_ns
        FROM events
    )
    SELECT event_type,
           count(gap_ns) AS n_gaps,
           CAST(round(CAST(sum(gap_ns) AS DOUBLE) / count(gap_ns) / 1e9, 3) AS DOUBLE)
               AS avg_gap_s
    FROM gaps WHERE gap_ns IS NOT NULL GROUP BY event_type
    """,
    tags=("timeseries", "window", "agg"),
    doc="inter-event gap statistics (exact integer nanos)",
)
def inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns")
    ).filter(F.col("gap_ns").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_ns").alias("n_gaps"),
        F.round(F.sum("gap_ns").cast("double") / F.count("gap_ns") / F.lit(1e9), 3)
        .cast("double")
        .alias("avg_gap_s"),
    )


# ---------------------------------------------------------------------------
# SQL subquery coverage via the EP1 entry point
# ---------------------------------------------------------------------------
@register(
    "sql_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
    tags=("sql", "subquery"),
    doc="scalar subquery through spark.sql (EP1)",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sql import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        """,
    )


@register(
    "sql_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
    """,
    tags=("sql", "subquery"),
    doc="IN subquery through spark.sql (EP1)",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sql import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        """,
    )


@register(
    "sql_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("sql", "subquery"),
    doc="correlated EXISTS through spark.sql (EP1)",
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sql import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """,
    )


@register(
    "asof_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id,
           p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, event_id, value
                    FROM events WHERE event_type = 'purchase'
                    QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                               ORDER BY event_id DESC) = 1) p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    tags=("timeseries", "asof", "join"),
    doc="as-of join: each event -> user's latest purchase at-or-before it "
        "(operators/asof.py; DuckDB ASOF JOIN is the oracle)",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.asof import asof_join

    ev = Tables(spark, sf_dir).events
    # one tick per (user, ts) — ASOF tie-break among simultaneous right
    # rows is engine-arbitrary, so both sides dedup to max event_id first
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("__p"))
        .select(
            "user_id",
            "ts",
            F.col("__p.event_id").alias("purchase_event_id"),
            F.col("__p.value").alias("purchase_value"),
        )
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        key_cols=["user_id"],
        time_col="ts",
        value_cols=["purchase_event_id", "purchase_value"],
    )
    return out.select("event_id", "user_id", "purchase_event_id", "purchase_value")


# ---------------------------------------------------------------------------
# Hypertable-style continuous aggregate with gap filling: hourly rollup per
# event type over a generated dense bucket spine (sequence/generate_series),
# zero-filled counts plus last-observation-carried-forward interpolation —
# the timeseries operator family (time_bucket_gapfill + locf) that plain
# GROUP BY can't express because absent buckets produce no row.
#
# Scale: the rollup is one hash aggregate; the spine is |event_types| × a
# broadcast 1-row bounds aggregate exploded executor-side, so the dense grid
# never exists on the driver.  LOCF is a per-type running window — at 100 TB
# partition-by event_type keeps state bounded by bucket count, not row count.
# Sums use exact scaled-integer arithmetic (functions/aggregates.dsum).
# ---------------------------------------------------------------------------
_HOUR_NS = 3_600_000_000_000


def _gapfill_oracle() -> str:
    from delta_lake_validation_spark.functions.aggregates import sql_dsum

    return f"""
    WITH agg AS (
        SELECT event_type, epoch_ns(ts) // {_HOUR_NS} AS bucket,
               count(*) AS n, {sql_dsum('value', 3)} AS sum_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(epoch_ns(ts)) // {_HOUR_NS} AS lo,
               max(epoch_ns(ts)) // {_HOUR_NS} AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS bucket
                    FROM bounds) g
    )
    SELECT s.event_type, s.bucket,
           coalesce(a.n, 0) AS n,
           CAST(coalesce(a.sum_value, 0.0) AS DOUBLE) AS sum_value,
           CAST(last_value(a.sum_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS locf_value
    FROM spine s LEFT JOIN agg a USING (event_type, bucket)
    """


@register(
    "time_bucket_gapfill",
    oracle=_gapfill_oracle(),
    tags=("timeseries", "gapfill", "agg"),
    doc="hourly continuous aggregate with dense spine, zero-fill and LOCF",
)
def time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.aggregates import dsum

    ev = Tables(spark, sf_dir).events
    agg = ev.groupBy(
        "event_type", F.expr(f"ts div {_HOUR_NS}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 3).alias("sum_value"))
    bounds = ev.agg(
        F.expr(f"min(ts) div {_HOUR_NS}").alias("lo"),
        F.expr(f"max(ts) div {_HOUR_NS}").alias("hi"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("bucket"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(agg, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_value", F.lit(0.0)).cast("double").alias("sum_value"),
        F.last("sum_value", ignorenulls=True).over(w).cast("double").alias("locf_value"),
    )


# ---------------------------------------------------------------------------
# Attribution-window range join: for every purchase, how many views did the
# same user make in the preceding hour?  A range/interval join Spark lacks as
# a primitive; a naive user_id-only join works locally but degenerates when a
# user's history is long.  The 100 TB shape (reference J3 generalized,
# src/benchmarking_suite.py:156-163): band-bucket both sides on the hour, so
# each purchase joins exactly two (user, hour) buckets — an equi join whose
# per-key cardinality is bounded by events-per-user-hour, then an exact range
# residual.  Left join keeps zero-view purchases.
# ---------------------------------------------------------------------------
_ATTR_NS = 3_600_000_000_000  # 1-hour attribution window, in nanos


@register(
    "attribution_window_join",
    oracle=f"""
    WITH buys AS (
        SELECT event_id, user_id, epoch_ns(ts) AS t_buy
        FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, epoch_ns(ts) AS t_view
        FROM events WHERE event_type = 'view'
    )
    SELECT b.event_id, b.user_id,
           CAST(count(v.t_view) AS BIGINT) AS n_views_1h
    FROM buys b LEFT JOIN views v
      ON b.user_id = v.user_id
     AND v.t_view >= b.t_buy - {_ATTR_NS} AND v.t_view < b.t_buy
    GROUP BY b.event_id, b.user_id
    """,
    tags=("timeseries", "range-join", "band"),
    doc="1-hour attribution range join via hour-band bucketing + exact residual",
)
def attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("t_buy")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("t_view"),
        F.expr(f"ts div {_ATTR_NS}").alias("bucket"),
    )
    # each purchase probes its own hour bucket and the previous one — the
    # only buckets a window of width _ATTR_NS can overlap
    probes = buys.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"t_buy div {_ATTR_NS}"),
                F.expr(f"t_buy div {_ATTR_NS} - 1"),
            )
        ),
    )
    hits = probes.join(
        views,
        (probes.user_id == views.v_user_id)
        & (probes.bucket == views.bucket)
        & (views.t_view >= probes.t_buy - F.lit(_ATTR_NS))
        & (views.t_view < probes.t_buy),
        "inner",
    ).groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_views_1h")
    )
    return buys.join(hits, ["event_id", "user_id"], "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_views_1h", F.lit(0)).cast("long").alias("n_views_1h"),
    )
