"""Named-table catalog over ACID tables.

Reference parity for catalog operations (SURVEY.md §2.1): register an
existing location under a name (S4, src/validation_suite.py:289-299), drop
from the catalog without touching data (S5, :262-265), list tables (S15,
:240-241), plus name-or-path dual addressing (TableRef semantics,
:99-122).  The catalog itself is one JSON file in a warehouse directory.
Mutations take an exclusive-create lock file around the read-modify-write
(atomic rename alone prevents torn files but not lost updates between two
concurrent registrars), so concurrent create/register/drop serialize.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from delta_lake_validation_spark.sources.acid.errors import AcidTableError, TableNotFoundError
from delta_lake_validation_spark.sources.acid.table import AcidTable
from delta_lake_validation_spark.sources.fs import strip_scheme


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = strip_scheme(warehouse.rstrip("/"))
        os.makedirs(self.warehouse, exist_ok=True)
        self._path = os.path.join(self.warehouse, "_catalog.json")

    # -- persistence -------------------------------------------------------
    def _load(self) -> dict[str, str]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _store(self, mapping: dict[str, str]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.warehouse, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(mapping, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path)  # atomic on POSIX

    @contextmanager
    def _locked(self, timeout: float = 10.0):
        """Exclusive-create lock file: serializes read-modify-write cycles
        (same primitive as the txn log's commit; object stores swap in a
        conditional put)."""
        lock = self._path + ".lock"
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(f"catalog lock held too long: {lock}")
                time.sleep(0.05)
        try:
            yield
        finally:
            os.unlink(lock)

    # -- operations --------------------------------------------------------
    def create_table(
        self,
        name: str,
        schema: StructType | str,
        partition_by=(),
        properties: dict[str, str] | None = None,
    ) -> AcidTable:
        """CREATE TABLE under the warehouse (S3 + catalog entry)."""
        with self._locked():
            mapping = self._load()
            if name in mapping:
                raise AcidTableError(f"table {name!r} already in catalog")
            location = os.path.join(self.warehouse, f"{name}-{uuid.uuid4().hex[:8]}")
            t = AcidTable.create(self.spark, location, schema, partition_by, properties)
            mapping[name] = location
            self._store(mapping)
        return t

    def register(self, name: str, location: str) -> AcidTable:
        """Attach a catalog name to an existing table location (S4)."""
        t = AcidTable(self.spark, location)
        t.log.latest_version()  # validates a log exists
        with self._locked():
            mapping = self._load()
            mapping[name] = location
            self._store(mapping)
        return t

    def register_delta(self, name: str, location: str):
        """Attach a catalog name to a real Delta Lake table (``_delta_log``
        protocol) — read-only interop entry (SURVEY §2.13; the reference's
        tables are all genuine Delta tables, src/validation_suite.py:268-286).
        Stored as ``{"format": "delta", "location": ...}``; plain-string
        entries remain the engine's own ACID tables."""
        from delta_lake_validation_spark.sources.delta_log import DeltaTable

        t = DeltaTable(self.spark, location)  # validates _delta_log exists
        with self._locked():
            mapping = self._load()
            mapping[name] = {"format": "delta", "location": location}
            self._store(mapping)
        return t

    def drop(self, name: str, delete_data: bool = False) -> None:
        """Remove from the catalog (S5 — catalog-only unless delete_data)."""
        with self._locked():
            mapping = self._load()
            loc = mapping.pop(name, None)
            if loc is None:
                raise TableNotFoundError(f"table {name!r} not in catalog")
            self._store(mapping)
        if delete_data:
            if isinstance(loc, dict):
                loc = loc["location"]
            AcidTable(self.spark, loc).fs.delete(loc, recursive=True)

    def table(self, name_or_path: str) -> AcidTable:
        """Dual addressing: catalog name, or a direct path (TableRef
        semantics, src/validation_suite.py:99-122)."""
        mapping = self._load()
        if name_or_path in mapping:
            entry = mapping[name_or_path]
            if isinstance(entry, dict):
                raise AcidTableError(
                    f"{name_or_path!r} is a Delta interop entry — use "
                    "delta_table()/as_view(); writes go through import_delta"
                )
            return AcidTable(self.spark, entry)
        if os.path.sep in name_or_path or "://" in name_or_path:
            return AcidTable(self.spark, name_or_path)
        raise TableNotFoundError(f"{name_or_path!r} is neither a catalog name nor a path")

    def delta_table(self, name: str):
        """The DeltaTable handle for a ``register_delta`` entry."""
        from delta_lake_validation_spark.sources.delta_log import DeltaTable

        entry = self._load().get(name)
        if not isinstance(entry, dict) or entry.get("format") != "delta":
            raise TableNotFoundError(f"{name!r} is not a Delta catalog entry")
        return DeltaTable(self.spark, entry["location"])

    def list_tables(self) -> list[str]:
        """SHOW TABLES (S15)."""
        return sorted(self._load())

    def as_view(
        self,
        name: str,
        version: int | None = None,
        timestamp: str | None = None,
        view_name: str | None = None,
    ) -> DataFrame:
        """Expose a catalog table snapshot as a temp view for spark.sql —
        optionally a historical one (the SQL analog of VERSION/TIMESTAMP AS
        OF, src/validation_suite.py:429-453; name the view e.g.
        ``orders_v3`` to query two versions side by side).  Works for both
        ACID entries and ``register_delta`` interop entries."""
        entry = self._load().get(name)
        if isinstance(entry, dict) and entry.get("format") == "delta":
            df = self.delta_table(name).read(version=version, timestamp=timestamp)
            df.createOrReplaceTempView(view_name or name)
            return df
        df = self.table(name).read(version=version, timestamp=timestamp)
        df.createOrReplaceTempView(view_name or name)
        return df
