"""Streaming incremental dedup: a document stream checked against — and
folded into — a persistent corpus shingle index.

The batch operator (``operators/dedup.py:incremental_jaccard_pairs``) makes
one batch's dedup O(batch + candidates); this module turns it into a
continuously-ingesting pipeline:

    every micro-batch B:
        1. pairs  = exact Jaccard near-dups of B vs the CURRENT index
        2. within = exact near-dups inside B itself (a batch can carry its
           own duplicates; index lookup alone would miss them)
        3. append B's prefix rows / sets / df contributions to the index
           (ACID appends — atomic, versioned, exactly-once per batch id)
        4. append the verdict rows to the results table

Ordering contract: the shingle rarity order is FROZEN at index creation
(the initial corpus's document frequency).  Batches rank their shingles
under that frozen order, so the PPJoin prefix filter stays provably
lossless forever — exactness never degrades.  What degrades slowly is
*selectivity*: as the corpus drifts, frozen ranks stop being the rarest-
first order, prefixes match more often, and candidate counts rise.  The
cure is an offline index rebuild (recompute dfreq/pos from the full
corpus), which swaps in atomically via the ACID tables' overwrite — the
same "rebuild the index, not the pipeline" pattern every search engine
uses.

Exactly-once: all three index tables and the results table record the
stream's (queryId, batchId) in their commit parameters and skip replayed
batches, the acid_sink idempotence pattern.

At 100 TB: the index tables are the bucketed corpus-side state; each
micro-batch shuffles only itself plus candidates.  Nothing here re-reads
corpus text — ingestion cost is independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_validation_spark.operators.dedup import (
    build_shingle_index,
    incremental_jaccard_pairs,
    ngram_jaccard_pairs,
    shingle_hashes,
)
from delta_lake_validation_spark.sources.acid.table import AcidTable
from delta_lake_validation_spark.streaming.acid_sink import last_committed_batch

_INDEX_TABLES = ("dfreq", "pos", "sets")


class DedupIndex:
    """Persistent corpus shingle index as three ACID tables under one root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _table(self, name: str) -> AcidTable:
        return AcidTable(self.spark, f"{self.root}/{name}")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        corpus: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
    ) -> "DedupIndex":
        """Build and persist the index from the initial corpus (the df-rank
        order frozen here governs all later batches)."""
        idx = build_shingle_index(corpus, id_col, text_col, k)
        schemas = {
            "dfreq": "h long, df long",
            "pos": "id long, h long, pos int, sz long",
            "sets": "id long, hs array<long>",
        }
        self_ = cls(spark, root)
        for name in _INDEX_TABLES:
            t = AcidTable.create(spark, f"{self_.root}/{name}", schemas[name])
            t.append(idx[name])
        return self_

    def frames(self) -> dict[str, DataFrame]:
        return {name: self._table(name).read() for name in _INDEX_TABLES}

    def compact(self, target_files: int = 8) -> dict[str, int]:
        """Compact the index tables' accumulated per-batch files (OPTIMIZE):
        a long-running stream appends one file set per micro-batch, and
        thousands of small files tax every later lookup's listing/planning.
        Run periodically (e.g. every N batches) from maintenance, not from
        the hot sink path.  Returns table -> new version."""
        return {
            name: self._table(name).optimize(target_files=target_files)
            for name in _INDEX_TABLES
        }

    def append_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        query_id: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
    ) -> None:
        """Fold a batch into the index under the FROZEN rarity order: the
        batch's prefix positions are computed against the stored dfreq (df=0
        for unseen shingles), its own shingles append to dfreq as new rows
        (summed on read is unnecessary — dfreq is only an ORDER; frozen
        means we deliberately do NOT update existing counts)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        sh = shingle_hashes(batch, id_col, text_col, k).persist()
        dfreq = self._table("dfreq").read()
        ranked = sh.join(dfreq, "h", "left").fillna(0, subset=["df"])
        w = Window.partitionBy("id").orderBy("df", "h")
        wall = Window.partitionBy("id")
        pos = ranked.select(
            "id",
            "h",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1)).over(wall).alias("sz"),
        )
        sets = sh.groupBy("id").agg(
            F.sort_array(F.collect_list("h")).alias("hs")
        )
        # only genuinely-new shingles enter dfreq (df=0 placeholders keep
        # later batches' unseen-shingle ranking identical to this batch's)
        new_h = (
            sh.select("h").distinct().join(dfreq.select("h"), "h", "left_anti")
            .withColumn("df", F.lit(0).cast("long"))
        )
        params = {"streamQueryId": query_id, "streamBatchId": int(batch_id)}
        for name, df in (("pos", pos), ("sets", sets), ("dfreq", new_h)):
            t = self._table(name)
            if batch_id <= last_committed_batch(t, query_id):
                continue  # replay after restart: this table already folded it
            t.append(df, operation_parameters=params)
        sh.unpersist()


def dedup_stream_sink(
    spark: SparkSession,
    index: DedupIndex,
    results_location: str,
    threshold: float,
    query_id: str = "dedup",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
):
    """foreachBatch callable wiring the whole pipeline:

        docs_stream.writeStream.foreachBatch(
            dedup_stream_sink(spark, index, results_loc, 0.8)
        ).option("checkpointLocation", ...).start()

    Results table schema: (new_doc, match_doc, jaccard, within_batch,
    batch_id).  ``within_batch`` distinguishes batch-internal duplicates
    from index matches."""
    from pyspark.sql import functions as F

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        results = AcidTable(spark, results_location)
        if not results.log.exists():
            results = AcidTable.create(
                spark,
                results_location,
                "new_doc long, match_doc long, jaccard double, "
                "within_batch boolean, batch_id long",
            )
        if batch_id <= last_committed_batch(results, query_id):
            # the whole batch already committed (results are written LAST,
            # so a committed result implies the index commits landed too)
            return
        batch = batch.persist()
        # exclude index entries whose id is in THIS batch: after a crash
        # between the index and results commits, replay re-runs the lookup
        # against an index that already folded the batch — without this
        # filter every batch doc would "match" its own index copy, and
        # within-batch pairs would double as index matches
        own_ids = batch.select(F.col(id_col).alias("corpus_doc")).distinct()
        vs_index = (
            incremental_jaccard_pairs(
                spark, batch, index.frames(), threshold, id_col, text_col, k
            )
            .join(own_ids, "corpus_doc", "left_anti")
            .select(
                F.col("new_doc"),
                F.col("corpus_doc").alias("match_doc"),
                "jaccard",
                F.lit(False).alias("within_batch"),
            )
        )
        within = ngram_jaccard_pairs(
            spark, batch, threshold, id_col, text_col, k
        ).select(
            F.col("left_doc").alias("new_doc"),
            F.col("right_doc").alias("match_doc"),
            "jaccard",
            F.lit(True).alias("within_batch"),
        )
        verdicts = vs_index.unionByName(within).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        # materialize verdicts BEFORE mutating the index (executor-side —
        # localCheckpoint cuts the lineage so the later write cannot
        # re-evaluate against the post-append index state; never a driver
        # collect, so verdict volume doesn't bound batch size)
        verdicts = verdicts.localCheckpoint(eager=True)
        index.append_batch(batch, batch_id, query_id, id_col, text_col, k)
        results.append(
            verdicts,
            operation_parameters={
                "streamQueryId": query_id,
                "streamBatchId": int(batch_id),
            },
        )
        batch.unpersist()

    return write_batch
