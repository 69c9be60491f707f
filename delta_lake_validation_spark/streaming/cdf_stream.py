"""Streaming Change Data Feed reader — committed transactions only.

DML commits (UPDATE/DELETE/MERGE/OVERWRITE) store their change rows as
parquet under ``_change_data/<uuid>/`` with the ``_change_type`` column
already materialized, and record the file list in their commit entry
(sources/acid/table.py).  Both streams below are backed by the ``acidpy``
Python Data Source (sources/acid/pystream.py): offsets are
TRANSACTION-LOG versions and each micro-batch reads exactly the change
files the commits in ``(start, end]`` recorded — a lost-race or crashed
writer's staged change files are invisible because no directory is ever
listed (previously these were file sources over a ``_change_data``
listing, with a documented single-writer visibility window).

Limitations vs batch ``AcidTable.read_changes``: APPEND commits don't
write change files (their inserts derive from the data files —
``stream_table_changes`` serves them from the ``part-*`` adds), and
commit version/timestamp columns aren't part of the streaming feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_validation_spark.sources.acid.table import AcidTable


def _feed(spark: SparkSession, location: str, feed: str) -> DataFrame:
    from delta_lake_validation_spark.sources.acid.errors import AcidTableError
    from delta_lake_validation_spark.sources.acid.pystream import register

    # fail fast on the driver with the typed error (the source would raise
    # the same complaint later, but from a data-source worker)
    table = AcidTable(spark, location)
    if not table._cdf_enabled(table.snapshot()):
        raise AcidTableError(
            "Change Data Feed is not enabled "
            "(set property enableChangeDataFeed=true)"
        )
    register(spark)
    return (
        spark.readStream.format("acidpy")
        .option("path", location)
        .option("feed", feed)
        .load()
    )


def stream_changes(spark: SparkSession, location: str) -> DataFrame:
    """Unbounded DataFrame of committed DML change rows (schema +
    _change_type), driven off the transaction log."""
    return _feed(spark, location, "changes")


def stream_table_changes(spark: SparkSession, location: str) -> DataFrame:
    """COMPLETE streaming change feed: inserts + update pre/post images +
    deletes (the streaming analog of ``AcidTable.read_changes``).

    Composition is sound because the write path partitions new files by
    provenance: append/overwrite data files are named ``part-*`` (their
    rows ARE the inserts — streamed directly, no extra copies stored, the
    same synthesis batch CDF uses), while copy-on-write DML/compaction
    rewrites are named ``rw-*`` and excluded — rewritten files mostly
    carry OLD rows, and their actual row-level changes (including MERGE's
    inserts) arrive as the commit's recorded ``_change_data`` files.  One
    log-driven source serves both sides, so every change of a committed
    transaction is delivered exactly once."""
    return _feed(spark, location, "table_changes")


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


class ChangeFeedStream:
    """``readStream``-shaped driver over a committed change feed with a
    CHECKPOINTED cursor (VERDICT r3 task 6).

    PySpark exposes no custom Source API, so this adapter reproduces the
    part of Structured Streaming that matters for a change-feed consumer —
    the foreachBatch contract with the offsets/commits write-ahead log
    Spark's own checkpointLocation keeps:

    * each micro-batch is one committed version range, logged to
      ``<checkpoint>/offsets/<batchId>`` BEFORE the batch function runs;
    * ``<checkpoint>/commits/<batchId>`` is written after it returns;
    * on restart, an offset without a commit is REPLAYED with the same
      batch id and the same version range (hence identical rows) — a sink
      that dedups on batch id (e.g. ``acid_sink``) gets exactly-once,
      any other sink gets at-least-once, exactly Spark's semantics.

    Usage::

        stream = ChangeFeedStream(spark, loc, ckpt_dir, delta=True)
        stream.process_available(batch_fn)   # trigger(availableNow=True)

    Scale note: a batch is served through ``read_changes`` — a distributed
    read of exactly the files the new commits admitted; the driver holds
    only the cursor and the version range.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        checkpoint_location: str,
        delta: bool = False,
        start_version: int = 0,
    ):
        import os

        self.spark = spark
        self.location = location
        self.start_version = start_version
        self._feed_cls = DeltaCommittedChangeFeed if delta else CommittedChangeFeed
        from delta_lake_validation_spark.sources.fs import strip_scheme

        self.ckpt = strip_scheme(checkpoint_location)
        os.makedirs(f"{self.ckpt}/offsets", exist_ok=True)
        os.makedirs(f"{self.ckpt}/commits", exist_ok=True)

    # ------------------------------------------------------------- WAL state
    def _batch_ids(self, kind: str) -> list[int]:
        import os

        return sorted(
            int(n) for n in os.listdir(f"{self.ckpt}/{kind}") if n.isdigit()
        )

    def _offset(self, batch_id: int) -> tuple[int, int]:
        import json as _json

        with open(f"{self.ckpt}/offsets/{batch_id}") as f:
            d = _json.load(f)
        return int(d["start"]), int(d["end"])

    def _log_offset(self, batch_id: int, start: int, end: int) -> None:
        import json as _json
        import os

        tmp = f"{self.ckpt}/offsets/.{batch_id}.tmp"
        with open(tmp, "w") as f:
            _json.dump({"start": start, "end": end}, f)
        os.replace(tmp, f"{self.ckpt}/offsets/{batch_id}")

    def _mark_committed(self, batch_id: int) -> None:
        with open(f"{self.ckpt}/commits/{batch_id}", "w") as f:
            f.write("{}")

    # --------------------------------------------------------------- driving
    def process_available(self, batch_fn) -> int:
        """Serve every committed-but-unseen version as micro-batches (the
        ``trigger(availableNow=True)`` shape): first replay the pending
        batch if the last run died between offset-log and commit, then one
        batch covering all new versions.  Returns batches served."""
        feed = self._feed_cls(self.spark, self.location)
        table, latest = feed._open()
        served = 0
        offsets = self._batch_ids("offsets")
        commits = set(self._batch_ids("commits"))
        pending = [b for b in offsets if b not in commits]
        for bid in pending:  # replay, same id + same range = same rows
            start, end = self._offset(bid)
            batch_fn(table.read_changes(start, end), bid)
            self._mark_committed(bid)
            served += 1
        next_start = (
            self._offset(offsets[-1])[1] + 1 if offsets else self.start_version
        )
        if latest >= next_start:
            bid = (offsets[-1] + 1) if offsets else 0
            self._log_offset(bid, next_start, latest)
            batch_fn(table.read_changes(next_start, latest), bid)
            self._mark_committed(bid)
            served += 1
        return served
