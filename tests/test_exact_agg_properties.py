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


# ---------------------------------------------------------------------------
# asof_join vs a straight-line Python reference implementation
# ---------------------------------------------------------------------------
_kt = st.tuples(st.integers(0, 2), st.integers(0, 50))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(_kt, min_size=1, max_size=25),
    rights=st.lists(_kt, min_size=0, max_size=25, unique=True),
    strict=st.booleans(),
)
def test_asof_join_matches_reference(spark, lefts, rights, strict):
    from delta_lake_validation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid INT, k INT, t INT"
    )
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in rights], "k INT, t INT, pay INT"
    )
    got = {
        r.lid: r.pay
        for r in asof_join(left, right, ["k"], "t", ["pay"], strict=strict).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [
            (rt, k * 1000 + rt)
            for (rk, rt) in rights
            if rk == k and (rt < t if strict else rt <= t)
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, t, got[i], expect)
