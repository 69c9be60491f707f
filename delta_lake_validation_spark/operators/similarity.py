"""Similarity search over embedding columns — the engine's ANN operators.

Design for scale (the reference's only "similarity" primitive is a rounded
band join, src/benchmarking_suite.py:156-163; these operators generalize it):

- ``cosine_topk``      — brute-force exact top-k: the small query set is
  broadcast as one NumPy matrix; each partition of the base table does a
  single BLAS matmul against it and emits its local top-k per query; a final
  tiny shuffle reduces to the global top-k.  Work is O(n·q) flops spread
  evenly over partitions, no pair rows ever materialize, and the shuffle
  carries only k·q·partitions candidate rows.  This shape survives a
  1000-executor / 10^10-row scale-up: per-task cost is matmul over its
  partition, memory is O(batch × dim).
- ``cosine_self_pairs`` — all-pairs near-duplicate detection.  The right
  side is broadcast whole while it fits (dim·n·8 bytes; 100k×768 ≈ 600 MB is
  the practical broadcast ceiling); beyond that use ``lsh_near_dup_pairs``
  (operators/dedup.py) which buckets by random hyperplane signature first
  so only intra-bucket blocks multiply.

Numerics: float64 everywhere; cosine computed as dot/(‖a‖·‖b‖) in the same
association as the DuckDB oracle expression, rounded to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def cosine_topk(
    spark: SparkSession,
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qe",
    scale: int = 6,
) -> DataFrame:
    """Exact cosine top-k of every query vector against the base table.

    Returns columns (query_id, neighbor_id, sim, rnk), rnk 1..k, ties broken
    by neighbor id ascending.  Self-matches (same id) are excluded.
    """
    out_empty = "query_id long, neighbor_id long, sim double, rnk int"
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        return spark.createDataFrame([], out_empty)
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qnorm = np.sqrt(np.einsum("ij,ij->i", qm, qm))
    bc = spark.sparkContext.broadcast((qids, qm, qnorm))

    out_schema = "query_id long, neighbor_id long, sim double"

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qm, b_qnorm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = _as_matrix(pdf[vec_col])
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            # (q × b) similarity block — one BLAS call per batch
            sims = np.round(
                (b_qm @ m.T) / (b_qnorm[:, None] * norms[None, :]), scale
            )
            for qi, qid in enumerate(b_qids):
                row = sims[qi]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], row[mask]
                if len(cand_ids) > k:
                    # partial-select top-k then order: O(b) not O(b log b)
                    part = np.argpartition(cand_sims, -k)[-k:]
                    cand_ids, cand_sims = cand_ids[part], cand_sims[part]
                order = np.lexsort((cand_ids, -cand_sims))
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": cand_ids[order],
                        "sim": cand_sims[order],
                    }
                )

    candidates = base.select(id_col, vec_col).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def cosine_self_pairs(
    spark: SparkSession,
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """All pairs (left_id < right_id) with cosine similarity > threshold.

    Right side broadcast whole; left side streamed per partition with one
    matmul per batch.  O(n²) flops — the exact baseline/oracle path; the
    sub-quadratic scale path is LSH bucketing in operators/dedup.py.
    """
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        return spark.createDataFrame([], "left_id long, right_id long, sim double")
    all_ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    bc = spark.sparkContext.broadcast((all_ids, mat, norms))

    out_schema = "left_id long, right_id long, sim double"

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r_ids, r_mat, r_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            l_ids = pdf[id_col].to_numpy()
            l_mat = _as_matrix(pdf[vec_col])
            l_norms = np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))
            sims = np.round(
                (l_mat @ r_mat.T) / (l_norms[:, None] * r_norms[None, :]), scale
            )
            li, ri = np.nonzero((sims > threshold) & (l_ids[:, None] < r_ids[None, :]))
            if len(li):
                yield pd.DataFrame(
                    {"left_id": l_ids[li], "right_id": r_ids[ri], "sim": sims[li, ri]}
                )

    return df.select(id_col, vec_col).mapInPandas(block, out_schema)
