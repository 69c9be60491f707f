"""Empirical scale probe: run the heavy dedup/ANN families at sf0.1 and at a
synthesized sf1 (10x documents/embeddings), recording wall time and shuffle
read/write bytes per query from Spark's status REST API.

Validates SCALE.md's shuffles-scale-linearly claims with measurements instead
of argument: a family whose shuffle bytes grow ~10x and whose wall time grows
~10x (or less, where blocking bounds candidate sets) at 10x input is behaving
as designed; super-linear growth flags an all-pairs regression.

Usage:  python tools/scale_probe.py [family ...]
Output: one markdown table (paste into BASELINE.md) + one JSON line.

The sf1 data is derived from /root/testdata/sf0.1 (never modified): each
document/embedding is replicated 10x with per-replica id offsets and small
text/vector perturbations so near-duplicate structure stays realistic
(replicas are near-dups of their original — a harder, denser workload than
iid fresh data, which is the conservative direction for a dedup probe).
All other tables are symlinked from sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from delta_lake_validation_spark.plans import REGISTRY  # noqa: E402
from delta_lake_validation_spark.session import get_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = str(Path(_REPO) / ".scratch" / "sf1")

DEFAULT_FAMILIES = [
    "ngram_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "curation_pipeline",
    "embedding_near_dup",
    "ann_cosine_topk",
]


def build_sf1(spark) -> None:
    out = Path(SF1)
    if (out / "documents.parquet").exists():
        return
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = spark.range(10).withColumnRenamed("id", "r")
    (
        docs.crossJoin(reps)
        .selectExpr(
            "doc_id + r * 100000000 AS doc_id",
            "CASE WHEN r = 0 THEN text "
            "     ELSE text || ' rep' || CAST(r AS STRING) END AS text",
            "lang",
            "source",
            "CASE WHEN r = 0 THEN n_chars "
            "     ELSE n_chars + 5 + length(CAST(r AS STRING)) END AS n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "documents.parquet"))
    )
    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    (
        embs.crossJoin(reps)
        .selectExpr(
            "vec_id + r * 100000000 AS vec_id",
            "transform(embedding, x -> CAST(x + r * 0.0005 AS FLOAT)) "
            "AS embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "embeddings.parquet"))
    )
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        link = out / f"{t}.parquet"
        if not link.exists():
            link.symlink_to(f"{SF01}/{t}.parquet")


def _stage_metrics(spark) -> dict[int, dict]:
    """All stages from the status REST API, keyed by stageId."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=30
    ) as r:
        stages = json.load(r)
    return {
        (s["stageId"], s["attemptId"]): s for s in stages
    }


def run_probe(spark, name: str, sf_dir: str) -> dict:
    spec = REGISTRY[name]
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    before = _stage_metrics(spark)
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _stage_metrics(spark)
    new = [s for k, s in after.items() if k not in before]
    return {
        "wall_s": round(wall, 2),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
        ),
        "input_mb": round(sum(s.get("inputBytes", 0) for s in new) / 1e6, 1),
        "stages": len(new),
        "top_stages": sorted(
            (
                {
                    "id": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                }
                for s in new
            ),
            key=lambda d: -(d["write_mb"] + d["read_mb"]),
        )[:4],
    }


def main() -> int:
    families = sys.argv[1:] or DEFAULT_FAMILIES
    spark = get_session(
        "scale_probe", extra_conf={"spark.ui.enabled": "true",
                                   "spark.ui.port": "4047"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    # warm the JVM/Arrow/python-worker pool before the first timed probe:
    # earlier rounds' first rows carried 3-5s of codegen + worker fork cost
    # (the starred caveats in BASELINE.md) — an untimed throwaway run of
    # the first family eats that instead
    run_probe(spark, families[0], SF01)
    results: dict[str, dict] = {}
    print("| query | sf0.1 wall | sf1 wall | ratio | sf0.1 shW MB | sf1 shW MB | shuffle ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in families:
        lo = run_probe(spark, name, SF01)
        hi = run_probe(spark, name, SF1)
        results[name] = {"sf0.1": lo, "sf1": hi}
        wr = hi["wall_s"] / max(lo["wall_s"], 0.01)
        sw = (hi["shuffle_write_mb"] / lo["shuffle_write_mb"]
              if lo["shuffle_write_mb"] else float("nan"))
        print(
            f"| {name} | {lo['wall_s']}s | {hi['wall_s']}s | {wr:.1f}x "
            f"| {lo['shuffle_write_mb']} | {hi['shuffle_write_mb']} "
            f"| {sw:.1f}x |"
        )
    print(json.dumps({"probe": "sf1", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
