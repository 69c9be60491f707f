"""Streaming reads of ACID-table appends — committed transactions only.

Previously this was a Spark file source over a ``part-*`` glob: correct
under a single healthy writer, but discovery-by-listing meant a crashed or
racing writer's staged-but-uncommitted files could surface in a micro-batch
(files are renamed into place BEFORE the log commit).  ``stream_appends``
is now backed by the ``acidpy`` Python Data Source
(sources/acid/pystream.py), whose offsets are TRANSACTION-LOG versions and
whose batches read exactly the files each commit admitted — a
staged/orphaned file is invisible because no directory is ever listed.

This is the engine's analog of reading Delta CDF as a stream
(SURVEY.md §2.10 engine note).  Copy-on-write DML/compaction rewrites are
named ``rw-*`` by the write path and skipped by the source, so rewritten
old rows never re-emit as phantom inserts; the full feed including DML
changes is ``streaming.cdf_stream.stream_table_changes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_appends(
    spark: SparkSession, location: str, starting_version: int | str = 0
) -> DataFrame:
    """Unbounded DataFrame over an AcidTable's committed appended rows.

    ``starting_version``: first log version to serve (default 0 = full
    history, matching the old file-source behavior of picking up existing
    files), or ``"latest"`` for new commits only."""
    from delta_lake_validation_spark.sources.acid.pystream import register

    register(spark)
    return (
        spark.readStream.format("acidpy")
        .option("path", location)
        .option("startingVersion", str(starting_version))
        .load()
    )
