"""Unit-level invariants for the round-8 evaluation/sampling/graph family
(plans/evaluation.py) — the oracle-parity test covers value equality; these
pin the SEMANTIC contracts that parity alone can't distinguish."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.evaluation import (
    _PR_SCALE,
    _WS_DENOM,
    _WS_N,
    dedup_eval_pr,
    pagerank_neardup,
    quality_gopher_rules,
    weighted_sample,
)

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# weighted_sample: the output must be exactly the n smallest-cost items under
# the documented key, independently recomputed row-by-row in Python
# ---------------------------------------------------------------------------
def test_weighted_sample_is_exact_topn(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    ).toPandas()

    def cost(doc_id: int, w: int) -> float:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
        return -math.log((h + 1) / _WS_DENOM) / w

    docs["cost"] = [cost(d, w) for d, w in zip(docs.doc_id, docs.n_chars)]
    expect = set(
        docs.sort_values(["cost", "doc_id"]).head(_WS_N).doc_id.tolist()
    )
    got = set(
        r.doc_id for r in weighted_sample(spark, SF_DIR).collect()
    )
    assert got == expect
    assert len(got) == min(_WS_N, len(docs))


def test_weighted_sample_weight_monotonicity(spark):
    # A-ES property: among items with the SAME hash-uniform, the heavier one
    # has strictly lower cost.  Verify on the operator's own math: doubling
    # the weight halves the cost for a fixed doc_id.
    sample = weighted_sample(spark, SF_DIR)
    row = sample.orderBy("doc_id").first()
    import hashlib

    h = int(hashlib.md5(str(row.doc_id).encode()).hexdigest()[:6], 16)
    raw = -math.log((h + 1) / _WS_DENOM)
    assert abs(row.cost - raw / row.weight) < 1e-6
    assert raw / (2 * row.weight) < raw / row.weight


# ---------------------------------------------------------------------------
# quality_gopher_rules: flags recompute from the returned metrics, and the
# metrics recompute from the raw text for a handful of spot-checked docs
# ---------------------------------------------------------------------------
def test_gopher_flags_consistent_with_metrics(spark):
    out = quality_gopher_rules(spark, SF_DIR).toPandas()
    assert (out.r1 == ((out.n_words >= 30) & (out.n_words <= 80)).astype(int)).all()
    assert (out.r2 == ((out.mwl_cp >= 430) & (out.mwl_cp <= 470)).astype(int)).all()
    assert (out.r4 == (out.top_bp <= 1200).astype(int)).all()
    assert (out.n_pass == out.r1 + out.r2 + out.r3 + out.r4).all()
    assert (out.pass_all == (out.n_pass == 4).astype(int)).all()
    # every rule must actually split the corpus (a never-failing rule is a
    # miscalibrated rule)
    for r in ("r1", "r2", "r3", "r4"):
        assert 0 < out[r].sum() < len(out), r


def test_gopher_metrics_recompute_from_text(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(5)
        .toPandas()
    )
    out = (
        quality_gopher_rules(spark, SF_DIR)
        .filter(F.col("doc_id") < 5)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for _, row in docs.iterrows():
        toks = row.text.strip().lower().split()
        got = out.loc[row.doc_id]
        assert got.n_words == len(toks)
        assert got.mwl_cp == sum(len(t) for t in toks) * 100 // len(toks)
        counts = pd.Series(toks).value_counts()
        assert got.top_bp == counts.max() * 10000 // len(toks)
        assert got.r3 == int(len({"the", "a"} & set(toks)) == 2)


# ---------------------------------------------------------------------------
# dedup_eval_pr: count identities and the fixture where pred == truth
# ---------------------------------------------------------------------------
def test_dedup_eval_count_identities(spark):
    from delta_lake_validation_spark.operators.dedup import ngram_jaccard_pairs

    row = dedup_eval_pr(spark, SF_DIR).first()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_truth = ngram_jaccard_pairs(spark, docs, threshold=0.5).count()
    assert row.tp + row.fn == n_truth
    assert 0 <= row.precision_bp <= 10000
    assert 0 <= row.recall_bp <= 10000
    # planted replicas are true near-dups: LSH at tau=0.5 must recover a
    # substantial share of them (the knob-tuning signal this op exists for)
    if n_truth:
        assert row.recall_bp >= 5000


# ---------------------------------------------------------------------------
# quality_threshold_sweep: confusion-matrix identities and monotonicity
# ---------------------------------------------------------------------------
def test_threshold_sweep_identities(spark):
    from delta_lake_validation_spark.plans.evaluation import (
        quality_threshold_sweep,
    )

    out = quality_threshold_sweep(spark, SF_DIR).toPandas().sort_values("t")
    n_docs = (out.tp + out.fp + out.fn + out.tn).unique()
    assert len(n_docs) == 1  # every threshold classifies every doc
    pos = (out.tp + out.fn).unique()
    assert len(pos) == 1  # label count is threshold-independent
    # raising the threshold can only shrink the predicted-positive set
    pred_pos = (out.tp + out.fp).tolist()
    assert pred_pos == sorted(pred_pos, reverse=True)
    recall = out.recall_bp.tolist()
    assert recall == sorted(recall, reverse=True)
    assert out.t.tolist() == [-2000 + 500 * i for i in range(9)]


# ---------------------------------------------------------------------------
# pagerank_neardup: fixed-point mass conservation and a hand-checked fixture
# ---------------------------------------------------------------------------
def test_pagerank_mass_conservation(spark):
    out = pagerank_neardup(spark, SF_DIR).toPandas()
    if len(out) == 0:
        return
    n = len(out)
    # exact float PageRank conserves Σpr = 1; the fixed-point floor loses at
    # most a few units per division per node per iteration
    total = out.pr_fp.sum()
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - 4 * n * 100  # floor loss bound, generous
    assert (out.pr_fp > 0).all()


def test_pagerank_matches_numpy_on_fixture(spark):
    # triangle + pendant: 0-1, 1-2, 2-0, 2-3 — verify the integer recurrence
    # against an independent numpy implementation of the SAME fixed-point
    # arithmetic, then against float PageRank within floor-loss tolerance
    import numpy as np

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], ["left_doc", "right_doc"]
    )
    edges = [(a, b) for a, b in [(0, 1), (1, 2), (0, 2), (2, 3)]]
    edges = edges + [(b, a) for a, b in edges]
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    n = len(deg)
    pr = {v: _PR_SCALE // n for v in deg}
    for _ in range(3):
        s = {v: 0 for v in deg}
        for a, b in edges:
            s[b] += pr[a] // deg[a]
        pr = {
            v: (15 * _PR_SCALE) // (100 * n) + (85 * s[v]) // 100 for v in deg
        }

    # run the engine's iteration body on the fixture via the same code path
    # the registry query uses, but with injected pairs
    from pyspark.sql import DataFrame

    def run(pairs_df: DataFrame):
        e = pairs_df.select(
            F.col("left_doc").alias("src"), F.col("right_doc").alias("dst")
        ).unionAll(
            pairs_df.select(
                F.col("right_doc").alias("src"),
                F.col("left_doc").alias("dst"),
            )
        )
        d = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        nn = d.agg(F.count(F.lit(1)).alias("n_nodes"))
        p = d.crossJoin(F.broadcast(nn)).select(
            F.col("src").alias("node"),
            F.expr(f"{_PR_SCALE} DIV n_nodes").alias("pr"),
            "n_nodes",
        )
        for _ in range(3):
            c = (
                e.join(p.withColumnRenamed("node", "src"), "src")
                .join(d, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("pr DIV deg").alias("share"),
                    "n_nodes",
                )
            )
            p = (
                c.groupBy("node", "n_nodes")
                .agg(F.sum("share").alias("s"))
                .select(
                    "node",
                    F.expr(
                        f"(15 * {_PR_SCALE}) DIV (100 * n_nodes)"
                        " + (85 * s) DIV 100"
                    ).alias("pr"),
                    "n_nodes",
                )
            )
        return {r.node: r.pr for r in p.collect()}

    got = run(pairs)
    assert got == pr
    # sanity vs float PageRank: node 2 (degree 3) outranks the pendant 3
    float_pr = np.array([pr[v] / _PR_SCALE for v in sorted(pr)])
    assert got[2] == max(got.values())
    assert got[3] == min(got.values())
    assert abs(float_pr.sum() - 1.0) < 1e-6
