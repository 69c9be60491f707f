"""Plan evidence for queries whose final frame materializes via an RDD
conversion (driver union-find / iterative label prop): `explain` on the
registered DataFrame shows only `Scan ExistingRDD`, so this dumps the SQL
subtree that actually does the distributed work — the near-dup pair
pipeline the iterative/driver stage consumes (VERDICT r8 item 6).

Usage: python tools/plan_dump_subtree.py <out_dir> <suffix> [--repo <path>]

Writes <out_dir>/<query>_<suffix>.txt for:
  dedup_clusters          — ngram_jaccard_pairs(docs, 0.8) edge pipeline
  dedup_stream_scenario   — one micro-batch's incremental_jaccard_pairs
                            lookup against the seeded index (the §1 r8
                            shingle pipeline incl. the ACID index scans)
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

repo = str(Path(__file__).resolve().parent.parent)
argv = sys.argv[1:]
if "--repo" in argv:
    i = argv.index("--repo")
    repo = argv[i + 1]
    del argv[i : i + 2]
sys.path.insert(0, repo)

from delta_lake_validation_spark.session import get_session  # noqa: E402
from delta_lake_validation_spark.tables import Tables  # noqa: E402

out_dir, suffix = argv[0], argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session("plan-dump-subtree")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)


def _dump(df, name: str, note: str) -> None:
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    p = Path(out_dir) / f"{name}_{suffix}.txt"
    p.write_text(f"# {note}\n\n{txt}")
    print(f"wrote {p}")


docs = Tables(spark, sf_dir).documents

# --- dedup_clusters: the distributed subtree is the edge pipeline -----------
from delta_lake_validation_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)

pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8)
_dump(
    pairs,
    "dedup_clusters_pairs_subtree",
    "dedup_clusters: the registered frame materializes via the driver "
    "union-find (Scan ExistingRDD) at bench SFs; THIS is the distributed "
    "pipeline it consumes — ngram_jaccard_pairs(docs, threshold=0.8), "
    "executed in full by the edges.take() probe.",
)

# --- dedup_stream_scenario: one micro-batch's lookup pipeline ---------------
from delta_lake_validation_spark.operators.dedup import (  # noqa: E402
    incremental_jaccard_pairs,
)
from delta_lake_validation_spark.streaming.incremental_dedup import (  # noqa: E402
    DedupIndex,
)

with tempfile.TemporaryDirectory() as loc:
    scoped = docs.filter("doc_id < 1500")
    index = DedupIndex.create(
        spark, f"{loc}/index", scoped.filter("doc_id % 3 = 0")
    )
    batch = scoped.filter("doc_id % 3 = 1")
    lookup = incremental_jaccard_pairs(
        spark, batch, index.frames(), threshold=0.8
    )
    _dump(
        lookup,
        "dedup_stream_scenario_lookup_subtree",
        "dedup_stream_scenario: the registered frame is an ACID read of "
        "committed verdict rows (Scan ExistingRDD); THIS is the per-batch "
        "distributed pipeline the foreachBatch sink executes — "
        "incremental_jaccard_pairs(index.frames(), batch doc_id%3==1, "
        "threshold=0.8) against the seeded index.",
    )
