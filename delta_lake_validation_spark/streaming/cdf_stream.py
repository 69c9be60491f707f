"""Streaming Change Data Feed reader.

DML commits (UPDATE/DELETE/MERGE/OVERWRITE) store their change rows as
parquet under ``_change_data/<uuid>/`` with the ``_change_type`` column
already materialized (sources/acid/table.py).  That directory is itself an
append-only file stream: each commit's change files appear atomically, so a
file source pointed directly at it yields every DML change exactly once
for committed transactions.

Visibility caveat (single-writer assumption): change files are staged
BEFORE the log commit, and a writer that loses the commit race (or
crashes) deletes/abandons them — a stream listing the directory inside
that window can observe rows from a transaction that never committed.
With one writer per table (the reference's operating mode, and this
engine's streaming-sink pattern) the window is empty; multi-writer
deployments should point the maintenance vacuum at crashed writers' leaks
and treat this stream as at-least-once across writer failures.  A
committed-files-only stream (driven off the log instead of the directory)
is the strict fix and is noted in SCALE.md known limits.

Limitations vs batch ``AcidTable.read_changes``: APPEND commits don't write
change files (their inserts are synthesized from data files in batch mode),
and commit version/timestamp aren't in the files — this stream is the
row-level change feed for DML, suitable for incrementally maintaining
downstream aggregates.  ``stream_table_changes`` below unions in the insert
side to make the feed complete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_validation_spark.sources.acid.log import CDF_DIR
from delta_lake_validation_spark.sources.acid.table import CDF_TYPE, AcidTable


def stream_changes(spark: SparkSession, location: str) -> DataFrame:
    """Unbounded DataFrame of DML change rows (schema + _change_type)."""
    from delta_lake_validation_spark.sources.acid.errors import AcidTableError

    table = AcidTable(spark, location)
    snap = table.snapshot()
    if not table._cdf_enabled(snap):
        raise AcidTableError(
            "Change Data Feed is not enabled "
            "(set property enableChangeDataFeed=true)"
        )
    # a CDF-enabled table with no DML yet has no _change_data dir — bootstrap
    # it so the file source starts cleanly and picks up future commits
    table.fs.mkdirs(f"{table.location}/{CDF_DIR}")
    schema = table.schema(snap).add(CDF_TYPE, "string")
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(f"{table.location}/{CDF_DIR}")
    )


def stream_table_changes(spark: SparkSession, location: str) -> DataFrame:
    """COMPLETE streaming change feed: inserts + update pre/post images +
    deletes (the streaming analog of ``AcidTable.read_changes``).

    Composition is sound because the write path partitions new files by
    provenance: append/overwrite data files are named ``part-*`` (their rows
    ARE the inserts — streamed directly, no extra copies stored, the same
    synthesis batch CDF uses), while copy-on-write DML/compaction rewrites
    are named ``rw-*`` and excluded from the file stream — rewritten files
    mostly carry OLD rows, and their actual row-level changes (including
    MERGE's inserts) arrive via the ``_change_data`` stream.  Each side is
    an append-only file source, so every change is delivered exactly once.
    """
    from delta_lake_validation_spark.streaming.acid_stream import stream_appends

    inserts = stream_appends(spark, location).withColumn(CDF_TYPE, F.lit("insert"))
    return inserts.unionByName(stream_changes(spark, location))


class CommittedChangeFeed:
    """Log-driven incremental change feed: serves ONLY committed
    transactions, closing the directory-listing visibility window the file
    sources above document (a lost-race or crashed writer's staged files
    are invisible here because the feed never lists directories — it walks
    the transaction log and reads exactly the files each commit admitted).

    Usage (driver loop, foreachBatch of a timer stream, or a scheduler):

        feed = CommittedChangeFeed(spark, location)
        while True:
            batch = feed.next_batch()       # DataFrame or None
            if batch is not None:
                process(batch)              # CDF contract columns included

    Deliberately not a Structured Streaming Source (PySpark exposes no
    custom-source API); the cursor is plain state the caller may persist
    (``feed.position`` / ``CommittedChangeFeed(..., start_version=p)``) for
    exactly-once across restarts, e.g. in an ACID commit's parameters via
    the acid_sink pattern.
    """

    def __init__(self, spark: SparkSession, location: str, start_version: int = 0):
        self.spark = spark
        self.location = location
        self.position = start_version  # next version to serve

    def _open(self):
        """(table, latest_version) for this poll — a fresh handle each time
        so commits landed by any writer become visible."""
        table = AcidTable(self.spark, self.location)
        return table, table.version()

    def next_batch(self) -> DataFrame | None:
        """Changes of all commits in [position, latest], or None if the log
        has nothing new.  Advances the cursor past what it returned."""
        table, latest = self._open()
        if latest < self.position:
            return None
        df = table.read_changes(self.position, latest)
        self.position = latest + 1
        return df


class DeltaCommittedChangeFeed(CommittedChangeFeed):
    """:class:`CommittedChangeFeed` over a REAL Delta table (`_delta_log`):
    poll-driven incremental consumption of a table other engines write.
    Each ``next_batch`` walks only the new log entries and serves their
    changes through ``DeltaTable.read_changes`` (cdc files when present,
    synthesized insert/delete rows otherwise, DV bitmap diffs for
    deletion-vector commits) with the standard CDF contract columns.
    Cursor/poll semantics are inherited — only the table handle differs."""

    def _open(self):
        from delta_lake_validation_spark.sources.delta_log import DeltaTable

        table = DeltaTable(self.spark, self.location)
        return table, table.latest_version()
