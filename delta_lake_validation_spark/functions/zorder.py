"""Z-order (Morton) clustering key — multi-dimensional data skipping.

``zorder_key`` maps each clustering column to a ``bits``-wide quantile rank
(boundaries from a one-pass approxQuantile sample — no global sort), then
interleaves the rank bits into a single Morton code.  Sorting/range-
partitioning by that code co-locates rows that are close in *all* clustered
dimensions, which tightens per-file parquet min/max ranges for every
clustered column simultaneously — the property OPTIMIZE ZORDER exists for
(reference form: src/validation_suite.py:473).

Scale notes: rank assignment is a generated CASE chain (pure codegen, no
window, no shuffle); the only shuffle is the final repartitionByRange on the
code, which is exactly the write-clustering shuffle OPTIMIZE needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(num: Column, boundaries: list[float]) -> Column:
    """rank(num) in [0, len(boundaries)] via a CASE chain over precomputed
    quantile boundaries (nulls rank 0)."""
    expr = F.lit(len(boundaries))
    for i in reversed(range(len(boundaries))):
        expr = F.when(num <= F.lit(boundaries[i]), F.lit(i)).otherwise(expr)
    return F.when(num.isNull(), F.lit(0)).otherwise(expr)


_NUMERICISH = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _as_numeric(df: DataFrame, c: str) -> Column:
    """Orderable numeric image of a column: numerics/dates/timestamps keep
    their order; other types (strings, binaries) rank by xxhash64 — that
    clusters equal values together (equality locality), which is what data
    skipping on high-cardinality string keys actually uses."""
    dtype = dict(df.dtypes)[c]
    if dtype.startswith(_NUMERICISH):
        return F.col(c).cast("double")
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        return F.unix_timestamp(F.col(c)).cast("double")
    return F.xxhash64(F.col(c)).cast("double")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 6, relative_error: float = 0.01
) -> Column:
    """Morton code column interleaving ``bits`` quantile-rank bits per col."""
    n_buckets = (1 << bits) - 1
    quantiles = [i / n_buckets for i in range(1, n_buckets)]
    ranks = []
    for c in cols:
        num = _as_numeric(df, c)
        bounds = df.select(num.alias("__z")).approxQuantile(
            "__z", quantiles, relative_error
        )
        ranks.append(_bucket_expr(num, bounds))
    code = F.lit(0)
    for bit in range(bits):
        for ci, r in enumerate(ranks):
            code = code + (
                F.shiftleft(
                    F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + ci,
                )
            )
    return code.cast("long")


def zorder_sort(
    df: DataFrame, cols: list[str], bits: int = 6, num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort by the Morton code (the OPTIMIZE ZORDER
    rewrite shape).  Pass ``num_partitions`` (≈ desired output files)
    explicitly — an unspecified count is subject to AQE coalescing, which
    can merge the carefully-ranged partitions back together on small data."""
    keyed = df.withColumn("__zorder", zorder_key(df, cols, bits))
    parts = [num_partitions] if num_partitions else []
    return (
        keyed.repartitionByRange(*parts, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
