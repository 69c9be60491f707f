"""``acidpy`` — committed-files-only streaming source for ACID tables.

Spark's file source (the previous ``stream_appends`` shape) discovers input
by DIRECTORY LISTING, so a crashed or racing writer's staged-but-uncommitted
``part-*`` files could surface in a micro-batch before the transaction log
admitted them (SCALE.md "Streaming file-source reads", item 5).  This source
closes that window the same way cdf_stream's CommittedChangeFeed does: it
never lists data directories — offsets are TRANSACTION-LOG VERSIONS and a
micro-batch reads exactly the files the commits in ``(start, end]`` added.

Semantics match the old file-source contract (appended rows only):

* ``part-*`` adds from APPEND / OVERWRITE commits are served;
* copy-on-write rewrites (``rw-*``, named so by the write path) are
  skipped — their row-level changes belong to the ``_change_data`` feed;
* replaying a committed version range yields identical rows, so Spark's
  offset log gives exactly-once to idempotent sinks.

Scale: the driver holds only version cursors and add-entry metadata; file
bytes are read executor-side via pyarrow (tasks bin-packed to
``maxBytesPerTask``), and the log walk is O(new commits) per trigger.

Reference anchor: the reference has no streaming surface at all
(SURVEY.md §2.10) — this is engine extension, mirroring delta-spark's
log-driven streaming source over our ACID layout.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from delta_lake_validation_spark.sources.acid.log import TransactionLog

_DEFAULT_TASK_BYTES = 128 * 1024 * 1024


def _path_of(options: dict) -> str:
    p = options.get("path")
    if not p:
        raise ValueError("acidpy: .load(path) or option('path', ...) required")
    return p.rstrip("/")


@dataclass
class _AddSlice:
    """One committed file: absolute path, size, raw partitionValues.

    ``is_cdc`` marks a ``_change_data`` file (full rows incl. partition
    columns and a materialized ``_change_type`` — read verbatim);
    ``ctype`` stamps a constant ``_change_type`` on data files when the
    feed carries change semantics (appends are the 'insert' side)."""

    path: str
    size: int
    pv: dict
    is_cdc: bool = False
    ctype: str | None = None


class AcidPyScanPartition(InputPartition):
    def __init__(self, files: list[_AddSlice]):
        self.files = files


CDF_TYPE_COL = "_change_type"


def _first_version_at_or_after(log: TransactionLog, ts: str) -> int:
    """First commit whose timestamp is at-or-after ``ts`` (delta-spark's
    startingTimestamp rule); latest+1 when every commit predates it."""
    from delta_lake_validation_spark.sources.acid.log import _parse_ts

    want = _parse_ts(ts)
    for e in log.entries():
        if _parse_ts(e["timestamp"]) >= want:
            return int(e["version"])
    return log.latest_version() + 1


def _feed_of(options: dict) -> str:
    feed = str(options.get("feed", "appends")).lower()
    if feed not in ("appends", "changes", "table_changes"):
        raise ValueError(f"acidpy: unknown feed {feed!r}")
    return feed


class AcidPyStreamReader(DataSourceStreamReader):
    """Micro-batch source over the ACID transaction log: offsets are table
    versions; a batch serves the files the commits in ``(start, end]``
    admitted.  ``feed``: ``appends`` (default) = ``part-*`` adds;
    ``changes`` = committed ``_change_data`` files (DML row changes);
    ``table_changes`` = both — the complete change feed.

    ``startingVersion`` (default 0, or ``latest``) / ``startingTimestamp``
    (first commit at-or-after, same rule as the Delta-side source) pick
    where the stream begins.  ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
    cap how many commits one micro-batch may span, measured in the
    files/bytes the FEED actually serves (part-* adds for appends,
    ``_change_data`` files for the change feeds, both for table_changes;
    change-file sizes ride the commit entry's ``cdf_sizes``) — without a
    cap, a fresh stream over a long history
    plans its whole backlog as ONE batch (the same monotone-cursor design
    as the deltapy source: zero-cost commits always flow, an oversized
    single commit still makes progress, replays never move backward)."""

    def __init__(self, options: dict):
        self.path = _path_of(options)
        self.feed = _feed_of(options)
        self.max_task_bytes = int(
            options.get("maxbytespertask", _DEFAULT_TASK_BYTES)
        )
        log = TransactionLog(None, self.path)
        snap = log.snapshot()
        if self.feed != "appends" and (
            str(snap.properties.get("enableChangeDataFeed", "")).lower()
            != "true"
        ):
            raise ValueError(
                "acidpy: Change Data Feed is not enabled "
                "(set property enableChangeDataFeed=true)"
            )
        self.schema_json = snap.schema_json
        self.part_cols = list(snap.partition_columns)
        self._snap_version = snap.version
        st = options.get("startingtimestamp")
        sv = options.get("startingversion")
        if st is not None:
            if sv is not None:
                raise ValueError(
                    "acidpy: pass startingVersion or startingTimestamp, "
                    "not both"
                )
            self._start = _first_version_at_or_after(log, st) - 1
        elif str(sv or "0") == "latest":
            self._start = log.latest_version()
        else:
            self._start = int(sv or 0) - 1
        mf = options.get("maxfilespertrigger")
        mb = options.get("maxbytespertrigger")
        self.max_files = int(mf) if mf is not None else None
        self.max_bytes = int(mb) if mb is not None else None
        self._cursor = self._start  # last version this reader has offered
        # highest version KNOWN DELIVERED to a committed batch: every
        # `start` Spark passes to partitions() is the end of a committed
        # batch, and commit(end) finalizes one.  This survives nothing (it
        # is per-process), but it is exactly what a restart needs: after a
        # checkpoint restart Spark calls latestOffset() BEFORE partitions(),
        # and pacing from the option-derived cursor (e.g. -1) would return
        # an offset BELOW the checkpointed end — Spark then records the
        # lower offset and later triggers would re-serve already-delivered
        # versions.  The floor makes both pacing and serving monotone.
        # It starts at -1 (below every version), NEVER at the
        # option-derived start: startingVersion='latest'/'startingTimestamp'
        # re-resolve LIVE at restart, so a floor seeded from them could
        # exceed the checkpointed range and silently skip the replayed
        # versions (fresh starts don't need the seed — Spark's first
        # partitions() start IS initialOffset, which becomes the floor).
        self._floor = -1

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        log = TransactionLog(None, self.path)
        latest = log.latest_version()
        if self.max_files is None and self.max_bytes is None:
            return {"version": latest}
        # advance at most cap files/bytes past the internal cursor, always
        # admitting at least one version so an oversized commit still
        # flows; the cursor only moves forward (partitions()/commit()
        # fast-forward it past replayed batch ends after a checkpoint
        # restart, and the delivered-floor clamp below keeps the returned
        # version from ever dropping under an already-committed offset)
        if self._floor > self._cursor:
            self._cursor = self._floor
        end = self._cursor
        files = nbytes = 0
        while end < latest:
            entry = log.read_entry(end + 1)
            nf = nb = 0
            if self.feed != "changes":
                adds = [
                    ad
                    for ad in entry.get("add", [])
                    if ad["path"].rsplit("/", 1)[-1].startswith("part-")
                ]
                nf += len(adds)
                nb += sum(int(a.get("size") or 0) for a in adds)
            if self.feed != "appends":
                # change files count toward the caps too — a DML-heavy
                # backlog must not plan as one unbounded batch just
                # because it adds no part-* files
                cdf = entry.get("cdf", [])
                sizes = entry.get("cdf_sizes") or {}
                nf += len(cdf)
                nb += sum(int(sizes.get(p) or 0) for p in cdf)
            if (files or nbytes) and (
                (self.max_files is not None and files + nf > self.max_files)
                or (self.max_bytes is not None and nbytes + nb > self.max_bytes)
            ):
                break
            files += nf
            nbytes += nb
            end += 1
        self._cursor = end
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        log = TransactionLog(None, self.path)
        lo, hi = int(start["version"]), int(end["version"])
        if hi > self._cursor:  # checkpoint-restart replay: catch up
            self._cursor = hi
        # `start` is always the end of a COMMITTED batch — record it as the
        # delivered floor and never re-serve versions at or below it, even
        # if a restart raced latestOffset() into planning a stale range
        if lo > self._floor:
            self._floor = lo
        slices: list[_AddSlice] = []
        stamp = None if self.feed == "appends" else "insert"
        for v in range(max(lo, self._floor) + 1, hi + 1):
            entry = log.read_entry(v)
            meta = entry.get("metadata")
            if (
                v > self._snap_version
                and meta
                and meta.get("schemaJson") not in (None, self.schema_json)
            ):
                # same contract as the deltapy source: serving NEW-schema
                # commits through an old-schema reader silently drops
                # columns — refuse and let the restart pick up the new
                # schema.  Replaying history OLDER than the reader's
                # snapshot is safe: files predating a column null-fill.
                raise ValueError(
                    f"acidpy stream: schema changed at version {v}; "
                    "restart the stream to pick up the new schema"
                )
            if self.feed != "changes":
                for ad in entry.get("add", []):
                    rel = ad["path"]
                    name = rel.rsplit("/", 1)[-1]
                    # rw-* rewrites carry mostly OLD rows; the append feed
                    # must never re-emit them (their actual row changes
                    # arrive as _change_data below) — same rule as the old
                    # part-* glob
                    if not name.startswith("part-"):
                        continue
                    slices.append(
                        _AddSlice(
                            path=f"{self.path}/{rel}",
                            size=int(ad.get("size") or 0),
                            pv=ad.get("partitionValues") or {},
                            ctype=stamp,
                        )
                    )
            if self.feed != "appends":
                sizes = entry.get("cdf_sizes") or {}
                for rel in entry.get("cdf", []):
                    size = int(sizes.get(rel) or 0)
                    if not size:
                        # pre-cdf_sizes log entry: one stat so bin-packing
                        # still spreads change files across tasks instead
                        # of stacking every "zero-byte" slice in one bin
                        try:
                            from delta_lake_validation_spark.sources.fs import (
                                pa_fs,
                            )

                            fs, norm = pa_fs(f"{self.path}/{rel}")
                            size = int(fs.get_file_info(norm).size or 0)
                        except Exception:
                            size = 1  # unknown: never 0, avoid one-bin pile-up
                    slices.append(
                        _AddSlice(
                            path=f"{self.path}/{rel}",
                            size=size,
                            pv={},
                            is_cdc=True,
                        )
                    )
        packed = _pack(slices, self.max_task_bytes)
        return [AcidPyScanPartition(g) for g in packed] or [
            AcidPyScanPartition([])
        ]

    def read(self, partition: AcidPyScanPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from delta_lake_validation_spark.sources.fs import pa_fs
        from delta_lake_validation_spark.sources.pydatasource import (
            _arrow_type,
            _pv_python,
        )

        schema = StructType.fromJson(json.loads(self.schema_json))
        part = set(self.part_cols)
        fields = [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        if self.feed != "appends":
            fields.append((CDF_TYPE_COL, pa.string()))
        target = pa.schema(fields)
        types = {f.name: f.dataType for f in schema.fields}
        for fsl in partition.files:
            fs, norm = pa_fs(fsl.path)
            with fs.open_input_file(norm) as fh:
                pf = pq.ParquetFile(fh)
                # change files carry FULL rows (partition columns and
                # _change_type materialized); data files store partition
                # values in the directory structure -> stamped from pv
                want = [
                    f.name
                    for f in schema.fields
                    if (fsl.is_cdc or f.name not in part)
                ]
                if fsl.is_cdc:
                    want.append(CDF_TYPE_COL)
                present = [
                    c for c in want if c in pf.schema_arrow.names
                ]
                for rb in pf.iter_batches(columns=present):
                    n = rb.num_rows
                    arrays = []
                    for name, at in zip(target.names, target.types):
                        if name == CDF_TYPE_COL and not fsl.is_cdc:
                            arrays.append(
                                pa.array([fsl.ctype] * n, type=at)
                            )
                        elif (
                            not fsl.is_cdc
                            and name in part
                        ):
                            val = _pv_python(
                                fsl.pv.get(name), types[name]
                            )
                            arrays.append(
                                pa.nulls(n, at)
                                if val is None
                                else pa.array([val] * n, type=at)
                            )
                        elif name in rb.schema.names:
                            col = rb.column(name)
                            if (
                                pa.types.is_timestamp(col.type)
                                and col.type.tz
                            ):
                                # tz-aware storage -> naive UTC instant
                                col = col.cast(
                                    pa.timestamp(col.type.unit, tz=None)
                                )
                            arrays.append(
                                col.cast(at) if col.type != at else col
                            )
                        else:  # file predates the column -> nulls
                            arrays.append(pa.nulls(n, at))
                    yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def commit(self, end: dict) -> None:
        v = int(end["version"])
        if v > self._floor:  # batch finalized: these versions are delivered
            self._floor = v


def _pack(files: list[_AddSlice], max_bytes: int) -> list[list[_AddSlice]]:
    """First-fit-decreasing bin packing into ~max_bytes tasks."""
    if not files:
        return []
    out: list[list[_AddSlice]] = []
    sizes: list[int] = []
    for f in sorted(files, key=lambda f: -f.size):
        for i, s in enumerate(sizes):
            if s + f.size <= max_bytes:
                out[i].append(f)
                sizes[i] += f.size
                break
        else:
            out.append([f])
            sizes.append(f.size)
    return out


class AcidPyDataSource(DataSource):
    """``spark.readStream.format("acidpy")`` — the committed-files-only
    append stream over an ACID table.  Streaming-only by design: batch
    reads go through ``AcidTable.read`` (snapshot-consistent already)."""

    @classmethod
    def name(cls) -> str:
        return "acidpy"

    def schema(self) -> StructType:
        log = TransactionLog(None, _path_of(self.options))
        out = StructType.fromJson(json.loads(log.snapshot().schema_json))
        if _feed_of(self.options) != "appends":
            out = out.add(CDF_TYPE_COL, "string")
        return out

    def streamReader(self, schema: StructType) -> AcidPyStreamReader:
        return AcidPyStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the ``acidpy`` format on a session."""
    spark.dataSource.register(AcidPyDataSource)
