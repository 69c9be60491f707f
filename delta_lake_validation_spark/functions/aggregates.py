"""Deterministic exact aggregation over fixed-point data.

Why this exists: floating-point summation is not associative, so a distributed
``SUM(double)`` depends on partial-aggregation order — Spark and any oracle
(DuckDB here) will disagree in the low-order bits, and two Spark runs with
different partitioning can too.  The test data (like most money data) is
fixed-point: prices have 2 decimals, discounts 2, derived products ≤6.  Scaling
to integers makes the sum exact, order-independent, and bit-identical across
engines — which is what a value-hash correctness gate needs, and at 100 TB it
also means results don't drift when AQE re-partitions.

``dsum(col, scale)``  == SUM(col) computed exactly at 10^-scale resolution.
``davg(col, scale)``  == AVG rounded half-up at ``out_scale`` — computed
entirely in integer arithmetic, because engines disagree on float rounding
TIES: Spark's round(x, n) is HALF_UP over the exact binary value (BigDecimal),
DuckDB's multiplies in double and rounds half-away, pandas rounds half-even.
A group whose exact average lands on x.xxxx5 (observed at sf0.1) then differs
in the last digit.  round-half-up(N/D) = (2N + D) div (2D) with
N = sum(units)·10^out_scale and D = factor·count sidesteps floats entirely
(positive-domain inputs assumed; floor-div ≠ half-up for negatives).

The SQL mirrors generate the semantically identical DuckDB expressions
(DuckDB's integer sums auto-promote to 128-bit, Spark's path uses decimal).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact distributed sum of a fixed-point double, as double."""
    factor = 10**scale
    cents = F.round(col * F.lit(factor)).cast("long")
    return (F.sum(cents) / F.lit(float(factor))).cast("double")


def davg(col: Column, scale: int = 2, out_scale: int = 4) -> Column:
    """Deterministic half-up average at out_scale digits (see module doc)."""
    factor = 10**scale
    cents = F.round(col * F.lit(factor)).cast("long")
    n_num = F.sum(cents).cast("decimal(38,0)") * F.lit(10**out_scale)
    d_den = (F.lit(factor) * F.count(F.lit(1))).cast("decimal(38,0)")
    scaled = F.floor((F.lit(2) * n_num + d_den) / (F.lit(2) * d_den))
    return (scaled.cast("double") / F.lit(float(10**out_scale))).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`dsum`."""
    factor = 10**scale
    return (
        f"CAST(CAST(sum(CAST(round(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {float(factor)} AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 2, out_scale: int = 4) -> str:
    """DuckDB mirror of :func:`davg` (integer half-up, 128-bit sums)."""
    factor = 10**scale
    out = 10**out_scale
    n = f"(sum(CAST(round(({expr}) * {factor}) AS BIGINT)) * {out})"
    d = f"({factor} * count(*))"
    return f"CAST(CAST((2 * {n} + {d}) // (2 * {d}) AS DOUBLE) / {float(out)} AS DOUBLE)"


def round_half_up(col: Column, scale: int) -> Column:
    """Explicit half-up rounding of a nonnegative double — identical on any
    engine that mirrors the same floor(x·10^s + 0.5)/10^s formula, unlike
    built-in round() whose tie behavior differs across engines."""
    factor = float(10**scale)
    return (F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)).cast("double")


def sql_round_half_up(expr: str, scale: int) -> str:
    """DuckDB mirror of :func:`round_half_up`."""
    factor = float(10**scale)
    return f"CAST(floor(({expr}) * {factor} + 0.5) / {factor} AS DOUBLE)"
