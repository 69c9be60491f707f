"""Bucketed-table co-located join: pre-bucketing both sides on the join key
removes the shuffle from every subsequent join on that key — the classic
amortize-one-shuffle-forever scale lever for fact-to-fact joins.

The assertion reads the physical plan: the bucketed join must contain NO
Exchange on either side, while the plain-table join of the same data does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_validation_spark.tables import Tables

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # warehouse.dir is static config; a database with an explicit LOCATION
    # gives the same isolation at runtime
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{wh}'")
    t = Tables(spark, SF_DIR)
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("bucketdb.b_lineitem")
    t.orders.withColumnRenamed("o_orderkey", "l_orderkey").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bucketdb.b_orders")
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


@pytest.fixture()
def no_broadcast(spark):
    # force the sort-merge path so the bucketed-scan property is observable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(bucketed, spark, no_broadcast):
    joined = spark.table("bucketdb.b_lineitem").join(
        spark.table("bucketdb.b_orders"), "l_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
    # and it computes the right thing
    t = Tables(spark, SF_DIR)
    expect = t.lineitem.join(
        t.orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    assert joined.count() == expect


def test_plain_join_does_shuffle(spark, no_broadcast):
    t = Tables(spark, SF_DIR)
    plain = t.lineitem.join(
        t.orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan  # the shuffle bucketing removes
