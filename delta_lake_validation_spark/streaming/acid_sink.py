"""Exactly-once streaming sink into an ACID table.

``acid_sink`` returns a foreachBatch function that appends each micro-batch
to the table, recording the stream's batch id in the commit's operation
parameters.  On restart, Structured Streaming replays the last
possibly-uncommitted batch — the sink consults the log and skips batch ids
it has already committed, giving end-to-end exactly-once delivery on top of
the source's checkpointed offsets (the same txnVersion/txnAppId idempotence
pattern Delta's streaming sink uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_validation_spark.sources.acid.table import AcidTable


def last_committed_batch(table: AcidTable, query_id: str) -> int:
    last = -1
    for e in table.log.entries():
        params = e.get("operationParameters", {})
        if params.get("streamQueryId") == query_id:
            last = max(last, int(params.get("streamBatchId", -1)))
    return last


def acid_sink(spark: SparkSession, location: str, query_id: str = "default"):
    """foreachBatch callable: ``stream.writeStream.foreachBatch(
    acid_sink(spark, loc)).option("checkpointLocation", …).start()``."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        table = AcidTable(spark, location)
        if batch_id <= last_committed_batch(table, query_id):
            return  # replayed batch after restart — already durable
        table.append(
            df,
            operation_parameters={
                "streamBatchId": int(batch_id),
                "streamQueryId": query_id,
            },
        )

    return write_batch
