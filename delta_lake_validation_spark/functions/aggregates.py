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
``davg(col, scale)``  == AVG with an exact integer numerator, one double
division at the end (single IEEE op on identical operands → deterministic),
rounded to ``out_scale`` digits.

The SQL mirrors generate the byte-identical DuckDB expressions.
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
    """Deterministic average: exact integer numerator, one final division."""
    factor = 10**scale
    cents = F.round(col * F.lit(factor)).cast("long")
    return F.round(
        F.sum(cents).cast("double") / F.lit(float(factor)) / F.count(F.lit(1)),
        out_scale,
    ).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`dsum`."""
    factor = 10**scale
    return (
        f"CAST(CAST(sum(CAST(round(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {float(factor)} AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 2, out_scale: int = 4) -> str:
    """DuckDB mirror of :func:`davg`."""
    factor = 10**scale
    return (
        f"CAST(round(CAST(sum(CAST(round(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {float(factor)} / count(*), {out_scale}) AS DOUBLE)"
    )
