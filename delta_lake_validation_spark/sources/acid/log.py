"""Transaction log: ordered JSON commit files + snapshot replay.

Layout under a table ``location``::

    _txn_log/00000000000000000000.json   # one entry per version, monotonically
    _txn_log/00000000000000000001.json   # numbered; atomic-exclusive-created
    <part=val>/part-<uuid>.parquet       # data files, hive layout at table root
    _change_data/<version>/*.parquet     # CDF row files for DML commits
    _staging/<uuid>/                     # transient Spark write output

Entry fields: version, timestamp (ISO, UTC), operation, operationParameters,
add[] / remove[] (relative path, partitionValues, numRecords, size,
dataChange), metadata (schema json, partitionColumns, properties — present on
CREATE and property changes), cdf[] (relative CDF file paths).

Scale design: the log is metadata-only — snapshot replay is a driver-side
fold over O(versions) small JSON files and never touches data.  At high
commit counts, Delta-style parquet checkpoints every N commits would bound
replay cost; the protocol here leaves that as a pure optimization (replay
result is a pure fold, so a checkpoint is just a memoized prefix).

Commit protocol (optimistic concurrency, same shape as Delta's):
read snapshot at version v → stage files → attempt exclusive create of
``_txn_log/{v+1}.json``.  Exists already → someone else won → the caller
decides (blind appends rebase and retry; anything that read table state
raises ConcurrentWriteException).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

from delta_lake_validation_spark.sources.acid.errors import (
    TableNotFoundError,
    VersionNotFoundError,
)
from delta_lake_validation_spark.sources.fs import FileSystem

LOG_DIR = "_txn_log"
CDF_DIR = "_change_data"
STAGING_DIR = "_staging"


def _entry_name(version: int) -> str:
    return f"{version:020d}.json"


@dataclass
class Snapshot:
    """Materialized table state at one version."""

    version: int
    schema_json: str
    partition_columns: list[str]
    properties: dict[str, str]
    files: dict[str, dict] = field(default_factory=dict)  # rel path -> add meta
    timestamp: str = ""

    @property
    def num_files(self) -> int:
        return len(self.files)

    @property
    def size_bytes(self) -> int:
        return sum(f.get("size", 0) for f in self.files.values())


CHECKPOINT_INTERVAL = 20


class TransactionLog:
    def __init__(self, spark, location: str, checkpoint_interval: int = CHECKPOINT_INTERVAL):
        self.location = location.rstrip("/")
        self.fs = FileSystem(spark, self.location)
        self.log_path = f"{self.location}/{LOG_DIR}"
        self.checkpoint_interval = checkpoint_interval
        # a committed version's snapshot is immutable (entries are
        # atomic-create-once and callers never mutate snapshot dicts), so
        # replays memoize per version; the latest version itself is always
        # re-resolved from a fresh listing, so concurrent writers stay
        # visible
        self._snap_cache: dict[int, Snapshot] = {}

    # -- reading -----------------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for p in self.fs.list_files(self.log_path):
            name = p.rsplit("/", 1)[-1]
            if name.endswith(".json"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def exists(self) -> bool:
        return bool(self.versions())

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise TableNotFoundError(f"no transaction log at {self.log_path}")
        return vs[-1]

    def read_entry(self, version: int) -> dict:
        return json.loads(self.fs.read_text(f"{self.log_path}/{_entry_name(version)}"))

    def entries(self, start: int = 0, end: int | None = None) -> list[dict]:
        vs = [v for v in self.versions() if v >= start and (end is None or v <= end)]
        return [self.read_entry(v) for v in vs]

    def snapshot(self, version: int | None = None) -> Snapshot:
        vs = self.versions()
        if not vs:
            raise TableNotFoundError(f"no transaction log at {self.log_path}")
        target = vs[-1] if version is None else version
        if target not in vs:
            raise VersionNotFoundError(
                f"version {target} not in log (have {vs[0]}..{vs[-1]})"
            )
        cached = self._snap_cache.get(target)
        if cached is not None:
            return cached
        # seed from the newest checkpoint at or below target: replay cost is
        # O(commits since checkpoint), not O(all commits) — the same
        # memoized-prefix trick as Delta's parquet checkpoints
        snap = Snapshot(version=target, schema_json="", partition_columns=[], properties={})
        start_after = -1
        for cv in sorted(self._checkpoint_versions(), reverse=True):
            if cv <= target:
                data = json.loads(
                    self.fs.read_text(f"{self.log_path}/_checkpoint.{cv:020d}.json")
                )
                snap.schema_json = data["schemaJson"]
                snap.partition_columns = data["partitionColumns"]
                snap.properties = data["properties"]
                snap.files = data["files"]
                snap.timestamp = data.get("timestamp", "")
                start_after = cv
                break
        for v in vs:
            if v <= start_after:
                continue
            if v > target:
                break
            e = self.read_entry(v)
            meta = e.get("metadata")
            if meta:
                snap.schema_json = meta.get("schemaJson", snap.schema_json)
                snap.partition_columns = meta.get(
                    "partitionColumns", snap.partition_columns
                )
                snap.properties.update(meta.get("properties", {}))
            for rm in e.get("remove", []):
                snap.files.pop(rm["path"], None)
            for ad in e.get("add", []):
                snap.files[ad["path"]] = ad
            snap.timestamp = e.get("timestamp", snap.timestamp)
        self._snap_cache[target] = snap
        while len(self._snap_cache) > 4:  # bound memory: newest few only
            self._snap_cache.pop(next(iter(self._snap_cache)))
        return snap

    def version_for_timestamp(self, ts: str) -> int:
        """Latest version whose commit timestamp <= ts (ref time-travel read,
        src/validation_suite.py:429-440; format at :136-137)."""
        want = _parse_ts(ts)
        best = None
        for e in self.entries():
            if _parse_ts(e["timestamp"]) <= want:
                best = e["version"]
        if best is None:
            raise VersionNotFoundError(f"no commit at or before {ts}")
        return best

    # -- writing -----------------------------------------------------------
    def try_commit(self, version: int, entry: dict) -> bool:
        """Atomically claim ``version``. True on success, False if taken."""
        entry = dict(entry)
        entry["version"] = version
        entry.setdefault(
            "timestamp", datetime.now(timezone.utc).isoformat(timespec="microseconds")
        )
        try:
            self.fs.atomic_create(
                f"{self.log_path}/{_entry_name(version)}",
                json.dumps(entry, indent=None, separators=(",", ":")),
            )
        except FileExistsError:
            return False
        if self.checkpoint_interval and version > 0 and version % self.checkpoint_interval == 0:
            self._write_checkpoint(version)
        return True

    def _checkpoint_versions(self) -> list[int]:
        out = []
        for p in self.fs.list_files(self.log_path):
            name = p.rsplit("/", 1)[-1]
            if name.startswith("_checkpoint.") and name.endswith(".json"):
                try:
                    out.append(int(name[len("_checkpoint.") : -5]))
                except ValueError:
                    continue
        return out

    def _write_checkpoint(self, version: int) -> None:
        """Best-effort (idempotent, content-deterministic for a version)."""
        try:
            snap = self.snapshot(version)
            self.fs.atomic_create(
                f"{self.log_path}/_checkpoint.{version:020d}.json",
                json.dumps(
                    {
                        "version": version,
                        "schemaJson": snap.schema_json,
                        "partitionColumns": snap.partition_columns,
                        "properties": snap.properties,
                        "files": snap.files,
                        "timestamp": snap.timestamp,
                    },
                    separators=(",", ":"),
                ),
            )
        except FileExistsError:
            pass

    def next_version(self) -> int:
        vs = self.versions()
        return (vs[-1] + 1) if vs else 0


def _parse_ts(s: str) -> float:
    """Accept ISO-8601 or the reference's '%Y-%m-%d %H:%M:%S.%f' literal
    (src/validation_suite.py:136-137); naive times are treated as UTC."""
    s = s.strip()
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        dt = datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def monotonic_ts() -> float:
    return time.time()
