"""Recall report for the approximate operators.

Quantifies each approximate path against its exact counterpart on the test
data — the accuracy half of the accuracy/cost trade the scale paths make:

    python tools/recall_report.py [sf_dir]

Prints one line per (approx, exact) pair: candidate counts, recall, and
precision-at-threshold where applicable.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from delta_lake_validation_spark.plans import REGISTRY  # noqa: E402
from delta_lake_validation_spark.session import get_session  # noqa: E402


def pairs_of(df, a="left_doc", b="right_doc"):
    return {(r[a], r[b]) for r in df.collect()}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("recall")
    spark.sparkContext.setLogLevel("ERROR")

    exact_jac = pairs_of(REGISTRY["ngram_jaccard_pairs"].builder(spark, sf_dir))
    lsh = pairs_of(REGISTRY["dedup_minhash_lsh"].builder(spark, sf_dir))
    sim = pairs_of(REGISTRY["dedup_simhash"].builder(spark, sf_dir))
    print(f"  minhash-lsh vs exact jaccard: {len(lsh)} cand, "
          f"recall {len(exact_jac & lsh) / max(1, len(exact_jac)):.3f}")
    print(f"  simhash     vs exact jaccard: {len(sim)} cand, "
          f"recall {len(exact_jac & sim) / max(1, len(exact_jac)):.3f}")

    topk = {(r.query_id, r.neighbor_id)
            for r in REGISTRY["ann_cosine_topk"].builder(spark, sf_dir).collect()}
    for name in ("ann_lsh_topk_raw", "ann_ivf_topk_raw", "ann_pq_topk_raw",
                 "ann_ivfpq_topk_raw"):
        approx = {(r.query_id, r.neighbor_id)
                  for r in REGISTRY[name].builder(spark, sf_dir).collect()}
        print(f"  {name:12s} vs exact top-10: {len(approx)} results, "
              f"recall {len(topk & approx) / max(1, len(topk)):.3f}")

    clustered_regime(spark)
    return 0


def clustered_regime(spark, n=4000, dim=64, n_clusters=20, n_queries=20, seed=7):
    """ANN recall on CLUSTERED vectors — realistic text embeddings
    concentrate around topic clusters (k well-separated Gaussians), where
    LSH buckets and IVF cells are far more selective than on the
    uniform-random vectors of the sf tables (the ANN worst case).  Sweeps
    the knob each path trades recall with (LSH probe radius / tables, IVF
    nprobe) on BOTH a tight and a diffuse cluster mix, so a user can pick
    settings from measured numbers rather than the random-vector floor."""
    import numpy as np

    from delta_lake_validation_spark.operators.similarity import (
        cosine_topk,
        ivf_kmeans_topk,
        ivfpq_ann_topk,
        lsh_ann_topk,
        pq_ann_topk,
    )

    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.randint(0, n_clusters, size=n)
    for spread in (0.15, 0.6):
        vecs = centers[assign] + spread * rng.normal(size=(n, dim))
        base = spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ).cache()
        qidx = rng.choice(n, size=n_queries, replace=False)
        queries = spark.createDataFrame(
            [(int(1_000_000 + j), [float(x) for x in vecs[i]])
             for j, i in enumerate(qidx)],
            "query_id long, qe array<double>",
        )
        exact = {(r.query_id, r.neighbor_id)
                 for r in cosine_topk(spark, base, queries).collect()}

        def rec(s):
            return len(exact & s) / max(1, len(exact))

        tag = "tight" if spread < 0.3 else "diffuse"
        for tables, hamming in ((2, 0), (4, 1), (4, 2)):
            lsh = {(r.query_id, r.neighbor_id)
                   for r in lsh_ann_topk(
                       spark, base, queries, n_planes=12, dim=dim,
                       n_tables=tables, max_hamming=hamming).collect()}
            print(f"  [clustered/{tag} n={n} k={n_clusters}] lsh_ann "
                  f"T={tables} h<={hamming}: recall {rec(lsh):.3f}")
        for nprobe in (1, 2, 4):
            ivf = {(r.query_id, r.neighbor_id)
                   for r in ivf_kmeans_topk(
                       spark, base, queries, n_cells=n_clusters,
                       nprobe=nprobe).collect()}
            print(f"  [clustered/{tag} n={n} k={n_clusters}] ivf_kmeans "
                  f"nprobe={nprobe}: recall {rec(ivf):.3f}")
        pq = {(r.query_id, r.neighbor_id)
              for r in pq_ann_topk(spark, base, queries).collect()}
        print(f"  [clustered/{tag} n={n} k={n_clusters}] pq "
              f"m=8 c=256 refine=10: recall {rec(pq):.3f}")
        for nprobe in (2, 4):
            ivfpq = {(r.query_id, r.neighbor_id)
                     for r in ivfpq_ann_topk(
                         spark, base, queries, n_cells=n_clusters,
                         nprobe=nprobe).collect()}
            print(f"  [clustered/{tag} n={n} k={n_clusters}] ivfpq "
                  f"nprobe={nprobe}: recall {rec(ivfpq):.3f}")
        base.unpersist()


if __name__ == "__main__":
    raise SystemExit(main())
