"""Hot-key probe for the r7 skew sweep: window form vs shipped form.

Measures the exact hazard class VERDICT r6 flagged in five text/curation
queries, on adversarial synthetic inputs where one key owns ~all rows:

* ``df_count``  — corpus document-frequency (token_df_stats /
  boilerplate_spans): ``count().over(Window.partitionBy(key))`` funnels a
  stop word's ~n_docs rows into ONE sort task; the shipped form is a
  hash-agg frequency table (map-side partial combine) joined back.
* ``cumsum``    — per-shard prefix sum (sequence_pack): a cumsum window
  partitioned by a handful of sources sorts a constant fraction of the
  corpus in ONE task; the shipped form is the two-pass distributed prefix
  (functions/prefix.py).
* ``rank``      — per-stratum / global ranking (chars_decile, zipf_fit):
  row_number/NTILE over a hot language (or no key at all) single-tasks;
  the shipped form is the two-pass distributed rank.

Every pair is value-asserted equal before timing counts.  Usage:

    python tools/prefix_probe.py [n_rows] [legs]

``legs``: comma list from df_count,cumsum,rank (default all three).
Prints one markdown row + one JSON line per sub-probe (paste into
BASELINE.md).  Run on an IDLE machine — a concurrent Spark session
distorts the single-task window legs most.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.prefix import (
    distributed_prefix_sum,
    distributed_rank,
)
from delta_lake_validation_spark.session import get_session


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def report(name: str, desc: str, win_s: float, new_s: float, rows: int) -> None:
    print(
        f"| {name} ({desc}, {rows} rows) | window {win_s:.1f}s | "
        f"shipped {new_s:.1f}s | {win_s / new_s:.1f}x |"
    )
    print(
        json.dumps(
            {
                "probe": f"prefix_{name}",
                "rows": rows,
                "window_form_s": round(win_s, 2),
                "shipped_form_s": round(new_s, 2),
                "speedup": round(win_s / new_s, 2),
            }
        )
    )


def probe_df_count(spark, n: int) -> None:
    # every "doc" contains the hot token plus ~9 cold ones: the hot token's
    # window partition owns n/10 of all rows
    base = spark.range(n).select(
        (F.col("id") % (n // 10)).alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit("the"))
        .otherwise(F.concat(F.lit("tok"), (F.col("id") % 500_000)))
        .alias("tok"),
    ).persist()
    total = base.count()

    w = Window.partitionBy("tok")
    windowed = (
        base.withColumn("df", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(F.sum("df").alias("sum_df"))
    )
    dfreq = base.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    shipped = (
        base.join(dfreq, "tok").groupBy("doc_id").agg(F.sum("df").alias("sum_df"))
    )
    a = {(r.doc_id, r.sum_df) for r in shipped.limit(0).collect()}  # warm plans
    del a
    win_s, n_w = timed_count(windowed)
    new_s, n_s = timed_count(shipped)
    assert n_w == n_s, (n_w, n_s)
    report("df_count", "1 stop token owns 10% of rows", win_s, new_s, total)
    base.unpersist()


def probe_cumsum(spark, n: int) -> None:
    # one source owns 95% of the corpus: the window form sorts 0.95n rows
    # in a single task
    base = spark.range(n).select(
        F.when(F.col("id") % 20 == 0, F.lit("books"))
        .otherwise(F.lit("web"))
        .alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 700 + 1).alias("n_tokens"),
    ).persist()
    total = base.count()

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    windowed = base.withColumn("c", F.sum("n_tokens").over(w)).groupBy(
        "source"
    ).agg(F.sum(F.col("c") % 997).alias("probe"))
    shipped = distributed_prefix_sum(
        base, F.col("n_tokens"), order_by=["doc_id"], partition_by=["source"],
        out="c",
    ).groupBy("source").agg(F.sum(F.col("c") % 997).alias("probe"))
    want = {(r.source, r.probe) for r in windowed.collect()}
    got = {(r.source, r.probe) for r in shipped.collect()}
    assert want == got, "cumsum forms diverge"
    win_s, _ = timed_count(windowed)
    new_s, _ = timed_count(shipped)
    report("cumsum", "1 source owns 95% of rows", win_s, new_s, total)
    base.unpersist()


def probe_rank(spark, n: int) -> None:
    # hot language owns 90%: per-lang rank window single-tasks 0.9n rows
    base = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit("fr"))
        .otherwise(F.lit("en"))
        .alias("lang"),
        (F.xxhash64("id") % 100_000).alias("n_chars"),
        F.col("id").alias("doc_id"),
    ).persist()
    total = base.count()

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    windowed = base.withColumn("r", F.row_number().over(w)).groupBy(
        "lang"
    ).agg(F.sum(F.col("r") % 997).alias("probe"))
    shipped = distributed_rank(
        base, order_by=["n_chars", "doc_id"], partition_by=["lang"], out="r"
    ).groupBy("lang").agg(F.sum(F.col("r") % 997).alias("probe"))
    want = {(r.lang, r.probe) for r in windowed.collect()}
    got = {(r.lang, r.probe) for r in shipped.collect()}
    assert want == got, "rank forms diverge"
    win_s, _ = timed_count(windowed)
    new_s, _ = timed_count(shipped)
    report("rank", "1 lang owns 90% of rows", win_s, new_s, total)
    base.unpersist()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    legs = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["df_count", "cumsum", "rank"]
    )
    spark = get_session("prefix-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {
        "df_count": probe_df_count,
        "cumsum": probe_cumsum,
        "rank": probe_rank,
    }
    for leg in legs:
        fns[leg](spark, n)


if __name__ == "__main__":
    main()
