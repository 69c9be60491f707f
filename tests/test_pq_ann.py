"""Product-quantization ANN invariants (operators/similarity.py pq_*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from delta_lake_validation_spark.operators.similarity import (
    QuerySetTooLargeError,
    cosine_topk,
    pq_ann_topk,
    pq_codebooks,
    pq_encode,
)

from .conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codebooks_deterministic_and_shaped(spark):
    emb = _emb(spark)
    b1 = pq_codebooks(spark, emb, m_sub=8, n_codes=16, iters=3)
    b2 = pq_codebooks(spark, emb, m_sub=8, n_codes=16, iters=3)
    assert b1.shape == (8, 16, 8)  # dim=64 -> 8 subspaces of 8 dims
    assert np.array_equal(b1, b2)  # same sample + seed -> bit-identical


def test_codebooks_reject_indivisible_dim(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(spark, emb, m_sub=7)


def test_encode_codes_in_range_and_reconstruction_sane(spark):
    emb = _emb(spark)
    books = pq_codebooks(spark, emb, m_sub=8, n_codes=16, iters=5)
    coded = pq_encode(spark, emb, books).toPandas()
    assert len(coded) == emb.count()
    codes = np.stack(coded.codes.to_numpy())
    assert codes.shape[1] == 8
    assert codes.min() >= 0 and codes.max() < 16
    # reconstruction error must be far below vector norm (codebooks fit
    # the data): check one vector end-to-end
    row = emb.orderBy("vec_id").first()
    v = np.asarray(row.embedding, dtype=np.float64)
    crow = coded[coded.neighbor_id == row.vec_id].iloc[0]
    recon = np.concatenate(
        [books[j][crow.codes[j]] for j in range(8)]
    )
    assert np.linalg.norm(v - recon) < np.linalg.norm(v)


def test_pq_topk_contract_and_recall(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(spark, emb, q, k=5).toPandas()
    approx = pq_ann_topk(spark, emb, q, k=5, n_codes=64, refine=10).toPandas()
    # output contract: same schema, dense ranks, true-cosine sims
    assert list(approx.columns) == ["query_id", "neighbor_id", "sim", "rnk"]
    for _, g in approx.groupby("query_id"):
        assert sorted(g.rnk.tolist()) == list(range(1, len(g) + 1))
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    assert len(e & a) / len(e) >= 0.8
    # the exact re-rank means sims of recovered pairs EQUAL the exact path
    em = {(r.query_id, r.neighbor_id): r.sim for r in exact.itertuples()}
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in em:
            assert r.sim == em[(r.query_id, r.neighbor_id)]


def test_pq_topk_bounded_query_guard(spark):
    emb = _emb(spark)
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    with pytest.raises(QuerySetTooLargeError, match="bounded-query"):
        pq_ann_topk(spark, emb, q, k=5, max_queries=10)


def test_ivfpq_topk_recall_and_contract(spark):
    from delta_lake_validation_spark.operators.similarity import ivfpq_ann_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(spark, emb, q, k=5).toPandas()
    approx = ivfpq_ann_topk(
        spark, emb, q, k=5, n_cells=8, nprobe=6, n_codes=64, refine=10
    ).toPandas()
    assert list(approx.columns) == ["query_id", "neighbor_id", "sim", "rnk"]
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    assert len(e & a) / len(e) >= 0.7  # 6/8 cells probed on random vectors
    # recovered pairs carry the EXACT cosine (re-rank contract)
    em = {(r.query_id, r.neighbor_id): r.sim for r in exact.itertuples()}
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in em:
            assert r.sim == em[(r.query_id, r.neighbor_id)]


def test_ivfpq_scan_restricted_to_probed_cells(spark):
    # the candidate stream must be cell-restricted: with nprobe == n_cells
    # the scan covers everything (recall == flat PQ), with nprobe=1 it
    # covers ~1/n_cells and recall must drop — the probe knob is real
    from delta_lake_validation_spark.operators.similarity import ivfpq_ann_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(spark, emb, q, k=5).toPandas()
    e = set(zip(exact.query_id, exact.neighbor_id))

    def recall(nprobe):
        a = ivfpq_ann_topk(
            spark, emb, q, k=5, n_cells=8, nprobe=nprobe, n_codes=64
        ).toPandas()
        return len(e & set(zip(a.query_id, a.neighbor_id))) / len(e)

    assert recall(8) > recall(1)
