"""As-of join — the point-in-time lookup a feature/training pipeline needs
(join each fact row to the latest dimension state at-or-before its
timestamp).  Spark has no native ASOF JOIN (DuckDB and kdb do); the naive
formulations are a range join (quadratic blow-up) or a per-key loop.

Scalable Spark-first shape: union the two sides with a source tag, ONE
shuffle by key, and a running ``last(right_payload, ignorenulls)`` window
ordered by (time, tag) — each left row picks up the most recent right
payload in O(n log n) per key with no pair materialization.  This is the
composition pattern (a) from the engine's custom-operator policy: existing
DataFrame ops only, fully codegen except the window itself.

(The reference has no as-of primitive — its closest is the rounded band
join, src/benchmarking_suite.py:156-163; engine extension.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the latest right row
    with right.time <= left.time (``strict=True``: <) and equal keys.

    Returns all left columns plus the right ``value_cols`` (null when no
    right row precedes).  Right columns must not collide with left's —
    rename before calling.  Ordering ties inside one side are broken by the
    payload struct itself, keeping the result deterministic.
    """
    payload = F.struct(*[F.col(c) for c in value_cols]).alias("__payload")
    rt = right.select(
        *[F.col(c) for c in key_cols], F.col(time_col).alias("__t"), payload
    ).withColumn("__src", F.lit(0))
    lt = left.withColumn("__t", F.col(time_col)).withColumn("__src", F.lit(1))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # inclusive: right sorts before left at equal time (src 0 < 1) so
    # last() sees it; strict: left first (desc src) so it doesn't
    src_order = F.desc("__src") if strict else F.asc("__src")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t"), src_order, F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m",
        F.last(F.when(F.col("__src") == 0, F.col("__payload")), ignorenulls=True).over(w),
    )
    return matched.filter(F.col("__src") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m")[c].alias(c) for c in value_cols],
    )
