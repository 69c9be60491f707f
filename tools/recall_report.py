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
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        approx = {(r.query_id, r.neighbor_id)
                  for r in REGISTRY[name].builder(spark, sf_dir).collect()}
        print(f"  {name:12s} vs exact top-10: {len(approx)} results, "
              f"recall {len(topk & approx) / max(1, len(topk)):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
