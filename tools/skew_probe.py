"""Hot-digest skew probe: duplicate-CONCENTRATED corpus, window vs agg.

The sf1 scale probe's replica corpus is duplicate-SPREAD (replicas hash
to distinct digests), so it cannot exercise the failure mode the r6
span/chunk rework exists for: ONE n-gram digest carrying a huge share of
all window rows (license headers, cookie banners — 10^7+ occurrences in
a real crawl).  This probe builds that corpus directly — every document
is one token repeated, so every interior sliding window collapses onto
a SINGLE digest — and times first-occurrence marking both ways on
identical input:

* WINDOW form (what dup_ngram_spans/chunk_dedup shipped before r6):
  count().over(h) + row_number().over(h) — every occurrence of a digest
  funnels into one task for the sort; no partial aggregation exists for
  windows, so 1 hot digest = 1 busy task regardless of cores, and the
  single-task sort grows O(n log n) SERIAL with the hot group.
* AGG form (r6): groupBy(h).agg(count, min(struct)) + join back — map-
  side partial combine collapses hot digests before the shuffle, and
  AQE's skew-join can split the probe side.

Usage: python tools/skew_probe.py [n_docs] [reps_per_doc] [block_tokens]
Prints one markdown row + one JSON line (paste into BASELINE.md).
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

from delta_lake_validation_spark.session import get_session

K = 20


def build(spark, n_docs: int, reps: int, block: int = 1):
    # block=1 (default): ONE repeated token, so every interior window
    # collapses onto a SINGLE digest — the real pathology, one digest
    # owning the stage.  block=W>1: a W-token boilerplate block tiled to
    # the same length cycles through W distinct digests and hands the
    # window form W-way parallelism — the counter-case row, reproducible
    # with the same command (third CLI arg).
    toks = [f"hot{i}" for i in range(block)] if block > 1 else ["hot"]
    seq = " ".join(toks[i % len(toks)] for i in range(reps * K))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(seq),
            F.lit(" "),
            # one unique tail token per doc so results aren't degenerate
            F.concat(F.lit("tail"), F.col("id")),
        ).alias("text"),
    )
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= K)
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {K}), "
                f"i -> struct(i AS pos, "
                f"md5(concat_ws(' ', slice(t, i + 1, {K}))) AS h))"
            )
        ).alias("w"),
    ).select("doc_id", "w.pos", "w.h")
    return wins.persist()


def mark_window(wins):
    over_h = Window.partitionBy("h")
    marked = wins.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(over_h).alias("n_occ"),
        F.row_number().over(over_h.orderBy("doc_id", "pos")).alias("rn"),
    )
    return marked.filter((F.col("n_occ") > 1) & (F.col("rn") > 1)).select(
        "doc_id", "pos"
    )


def mark_agg(wins):
    dup_digests = (
        wins.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .filter(F.col("n_occ") > 1)
        .select("h", "first")
    )
    return (
        wins.join(dup_digests, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_session("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    wins = build(spark, n_docs, reps, block)
    total = wins.count()  # materialize the persist; same input both ways
    # warm both code paths on a slice first
    mark_agg(wins.limit(1000)).count()
    mark_window(wins.limit(1000)).count()
    agg_s, n_agg = timed(mark_agg(wins))
    win_s, n_win = timed(mark_window(wins))
    assert n_agg == n_win, (n_agg, n_win)
    print(
        f"| hot-digest marking ({n_docs} docs x {reps * K} tokens, "
        f"{total} windows, block={block} -> ~{max(block, 1)} hot "
        f"digest(s)) | window {win_s:.1f}s | "
        f"agg+join {agg_s:.1f}s | {win_s / agg_s:.1f}x |"
    )
    print(
        json.dumps(
            {
                "probe": "hot_digest",
                "n_docs": n_docs,
                "reps": reps,
                "block": block,
                "windows": total,
                "dup_rows": n_agg,
                "window_form_s": round(win_s, 2),
                "agg_form_s": round(agg_s, 2),
                "speedup": round(win_s / agg_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
