"""Streaming reads of ACID-table appends.

The table layout (sources/acid) keeps all system state in underscore-prefixed
directories (_txn_log, _change_data, _staging), which Spark's file listing
treats as hidden — so the table root doubles as a valid streaming file source
for append-only workloads: each committed append's files show up atomically
(rename into place) and the file source picks them up exactly once for
committed transactions.  Same single-writer visibility caveat as
cdf_stream: files are renamed into place BEFORE the log commit, so a
concurrent writer that loses its commit race (overwrite path) or crashes
mid-commit can briefly expose files the log never admitted; with one
writer per table the window is empty.

This is the engine's analog of reading Delta CDF as a stream
(SURVEY.md §2.10 engine note).  Copy-on-write DML/compaction rewrites are
named ``rw-*`` by the write path, so the ``part-*`` glob here never emits
rewritten old rows as phantom inserts; the full feed including DML changes
is ``streaming.cdf_stream.stream_table_changes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_validation_spark.sources.acid.table import AcidTable


def stream_appends(spark: SparkSession, location: str) -> DataFrame:
    """Unbounded DataFrame over an AcidTable's appended rows."""
    table = AcidTable(spark, location)
    snap = table.snapshot()
    reader = spark.readStream.schema(table.schema(snap))
    if snap.partition_columns:
        reader = reader.option("basePath", table.location)
    # one glob level per partition column (k=v hive dirs); a fixed single
    # "*" would silently match nothing on multi-column-partitioned tables
    depth = "/".join(["*"] * len(snap.partition_columns))
    pattern = (
        f"{table.location}/{depth}/part-*.parquet"
        if snap.partition_columns
        else f"{table.location}/part-*.parquet"
    )
    return reader.format("parquet").load(pattern)
