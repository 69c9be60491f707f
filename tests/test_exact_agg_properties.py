"""Property-based tests (hypothesis): the deterministic-aggregation claim.

dsum's contract is that its result is EXACT for fixed-point inputs and
independent of partitioning/order — the property the whole oracle-hashing
strategy rests on.  We check it against Python's decimal arithmetic across
random inputs and random repartitionings.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.aggregates import dsum

money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(money, min_size=1, max_size=60), parts=st.integers(1, 7))
def test_dsum_exact_and_partition_independent(spark, values, parts):
    exact = sum(values)  # Decimal arithmetic: the ground truth
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = df.repartition(parts).agg(dsum(F.col("x"), 2).alias("s")).collect()[0].s
    assert Decimal(str(round(got, 2))) == exact


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(money, min_size=1, max_size=40))
def test_dsum_order_independent(spark, values):
    a = spark.createDataFrame([(float(v),) for v in values], "x double")
    b = spark.createDataFrame([(float(v),) for v in reversed(values)], "x double")
    ra = a.agg(dsum(F.col("x"), 2).alias("s")).collect()[0].s
    rb = b.agg(dsum(F.col("x"), 2).alias("s")).collect()[0].s
    assert ra == rb  # bit-identical, not merely close
