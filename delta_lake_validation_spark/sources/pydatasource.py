"""``format("deltapy")`` — Python Data Source binding for the Delta reader.

Binds the engine's from-scratch Delta protocol implementation
(sources/delta_log.py) into Spark's native source API (SPARK-44076,
``pyspark.sql.datasource``), so the table surface the reference drives via
delta-spark (`/root/reference/src/validation_suite.py:229-231` binds
``io.delta.sql.DeltaSparkSessionExtension``; reads at `:425-453`) is
reachable through ordinary ``spark.read`` / ``spark.readStream`` /
``df.write`` calls:

    spark.dataSource.register(DeltaPyDataSource)
    spark.read.format("deltapy").load("/path/to/table")          # batch
    spark.read.format("deltapy").option("versionAsOf", 3).load(p)
    spark.readStream.format("deltapy").load(p)                   # stream
    df.write.format("deltapy").mode("append").save(p)            # write

Execution model (the part that matters at 100 TB):

* **Planning is metadata-only.**  ``schema()`` / ``partitions()`` run in
  Spark's sparkless Python planning worker; they replay the transaction log
  (JSON + parquet checkpoints via pyarrow), prune files by partition values
  and per-file min/max stats against the pushed filters, load deletion-
  vector sidecars, and bin-pack the surviving files into tasks sized by
  ``maxBytesPerTask`` — O(live files) work, no data touched.
* **Data never visits the driver.**  Each task opens its parquet files with
  pyarrow, drops DV-deleted rows by global row index with a vectorized
  mask, stamps partition values as constant arrays, restores logical column
  names (column mapping ``name``/``id`` — id mode verifies the parquet
  field-ids of every file it actually reads, refusing foreign files), and
  yields Arrow record batches straight into Spark's vectorized pipeline.
  No Python row loop anywhere on the hot path.
* **Filters are reported unsupported but used for pruning.**  File-level
  skipping is inexact (a kept file can still hold non-matching rows), so
  every filter is returned to Spark for exact re-application; the scan
  still skips whole files the stats disprove — same contract as Delta's
  own data skipping.
* **Writes stage executor-side, commit driver-side.**  Tasks write parquet
  (hive-partitioned, physical names, UTC-normalized timestamps) and ship
  only add-action payloads; ``commit`` appends one atomic JSON commit with
  optimistic retry — O(files) at the driver, mirroring Delta's own
  architecture.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

from delta_lake_validation_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaSnapshot,
    DeltaTable,
    _pa_fs,
)
from delta_lake_validation_spark.sources.dv import (
    deserialize_bitmap,
    dv_map_entry,
    load_dv_bytes,
    resolve_dv_entry,
)
from delta_lake_validation_spark.sources.fs import is_local, strip_scheme

_DEFAULT_TASK_BYTES = 128 * 1024 * 1024


# --------------------------------------------------------------- arrow types
def _arrow_type(dt: DataType):
    """Spark type -> the arrow type Spark's data-source arrow path accepts.
    Timestamps are naive microseconds: under the engine's pinned-UTC session
    (session.py) a naive value IS the UTC instant, matching how the files
    store them (isAdjustedToUTC)."""
    import pyarrow as pa

    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, ShortType):
        return pa.int16()
    if isinstance(dt, ByteType):
        return pa.int8()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, DateType):
        return pa.date32()
    if isinstance(dt, TimestampType):
        return pa.timestamp("us")
    if isinstance(dt, BinaryType):
        return pa.binary()
    if isinstance(dt, DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    if isinstance(dt, StructType):
        import pyarrow as _pa

        return _pa.struct(
            [(f.name, _arrow_type(f.dataType)) for f in dt.fields]
        )
    if type(dt).__name__ == "VariantType":
        # Spark's arrow representation of VariantType (pyspark
        # sql/pandas/types.py to_arrow_type): a struct of the two variant
        # binaries, with the metadata field tagged so the receiving side
        # recognizes the struct AS a variant.  Emitting exactly this shape
        # lets the Python Data Source arrow path carry variant columns —
        # the physical parquet group (value/metadata) maps by NAME in
        # _variant_assemble (never positionally; field order varies).
        return pa.struct(
            [
                pa.field("value", pa.binary(), nullable=False),
                pa.field(
                    "metadata",
                    pa.binary(),
                    nullable=False,
                    metadata={b"variant": b"true"},
                ),
            ]
        )
    raise DeltaProtocolError(f"deltapy: unsupported Spark type {dt}")


def _is_variant_target(at) -> bool:
    """True when ``at`` is the tagged variant struct _arrow_type builds."""
    import pyarrow as pa

    if not pa.types.is_struct(at) or at.num_fields != 2:
        return False
    names = {at.field(i).name for i in range(2)}
    if names != {"value", "metadata"}:
        return False
    meta = at.field(at.get_field_index("metadata")).metadata or {}
    return meta.get(b"variant") == b"true"


def _variant_probe(tbl, snap) -> None:
    """Plan-time gate for variant tables: pyarrow builds that predate the
    parquet VARIANT LogicalType (this container ships 16.1) cannot open
    footers of files annotated with it (Spark 4.1 writes the annotation).
    The footer shim (sources/footer_patch.py) rewrites the annotation
    away in memory — the group then reads exactly like the unannotated
    Spark-4.0-era layout — so probe ONE live file up front and refuse
    only when the patched footer still fails.  SHREDDED files (typed_value
    subtrees) assemble at scan time (sources/variant_shred.py) since r8
    and no longer refuse."""
    if not any(
        type(f.dataType).__name__ == "VariantType"
        for f in snap.schema.fields
    ) or not snap.files:
        return
    import pyarrow.parquet as pq

    rel = next(iter(snap.files))
    fs, norm = _pa_fs(tbl._abs(rel))
    try:
        with fs.open_input_file(norm) as fh:
            pq.ParquetFile(fh).schema_arrow
    except OSError as e:
        if "LogicalType" not in str(e):
            raise
        from delta_lake_validation_spark.sources.footer_patch import (
            read_patched_metadata,
        )

        try:
            with fs.open_input_file(norm) as fh:
                pq.ParquetFile(
                    fh, metadata=read_patched_metadata(fh)
                ).schema_arrow
        except Exception:
            raise DeltaProtocolError(
                "deltapy: this table's variant files carry a parquet "
                "LogicalType annotation the installed pyarrow cannot "
                "parse, and the footer shim could not rewrite it — read "
                "via DeltaTable.read / read_delta (the JVM scan serves "
                "them natively)."
            ) from None


def _variant_assemble(col, at):
    """Physical variant struct (parquet group value/metadata, any field
    order) -> the tagged arrow struct, children matched BY NAME.
    SHREDDED groups (a typed_value child — Spark 4.1's default layout)
    route to the per-row reconstructor in sources/variant_shred.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if any(
        col.type.field(i).name == "typed_value"
        for i in range(col.type.num_fields)
    ):
        from delta_lake_validation_spark.sources.variant_shred import (
            assemble_shredded,
        )

        return assemble_shredded(col, at)
    children = [
        col.field("value").cast(pa.binary()),
        col.field("metadata").cast(pa.binary()),
    ]
    mask = pc.is_null(col)
    return pa.StructArray.from_arrays(
        children,
        fields=[at.field(0), at.field(1)],
        mask=mask if pc.any(mask).as_py() else None,
    )


def _pv_python(raw: str | None, dt: DataType):
    """Delta partition-value string -> python scalar of the column type
    (protocol 'Partition Value Serialization'); None stays null."""
    import datetime as _dt

    if raw is None:
        return None
    if isinstance(dt, StringType):
        return raw
    if isinstance(dt, (IntegerType, LongType, ShortType, ByteType)):
        return int(raw)
    if isinstance(dt, (DoubleType, FloatType)):
        return float(raw)
    if isinstance(dt, BooleanType):
        return raw == "true"
    if isinstance(dt, DateType):
        return _dt.date.fromisoformat(raw)
    if isinstance(dt, TimestampType):
        # 'yyyy-MM-dd HH:mm:ss[.ffffff]' — naive == UTC instant
        return _dt.datetime.fromisoformat(raw)
    if isinstance(dt, DecimalType):
        import decimal

        return decimal.Decimal(raw)
    raise DeltaProtocolError(
        f"deltapy: unsupported partition column type {dt}"
    )


# ------------------------------------------------------------------ planning
@dataclass
class _FileSlice:
    """One parquet file as a task sees it: absolute path, DV entry (a
    descriptor dict the task resolves itself via dv.resolve_dv_entry, or
    raw bitmap bytes for computed CDF diffs / non-pyarrow-scheme
    fallbacks; None = nothing deleted), raw partitionValues strings.

    CDF scans extend the slice: ``mode`` ``"drop"`` masks the DV rows out
    (plain reads), ``"keep"`` emits ONLY the DV rows (bitmap-diff change
    rows); ``ctype`` stamps a constant ``_change_type`` while ``is_cdc``
    reads it from the file (cdc parquet carries its own); ``version`` /
    ``ts_us`` stamp the commit axis."""

    path: str
    size: int
    dv: bytes | None
    pv: dict
    mode: str = "drop"
    ctype: str | None = None
    is_cdc: bool = False
    version: int | None = None
    ts_us: int | None = None


class DeltaPyScanPartition(InputPartition):
    def __init__(self, files: list[_FileSlice]):
        self.files = files


# DV sidecar loads in planning workers route through the canonical pyarrow
# read adapter (non-local schemes; local tables use the table's own fs)
from delta_lake_validation_spark.sources.fs import (  # noqa: E402
    PyArrowReadFS as _SparklessReadFS,
)


def _filter_ranges(filters: list[Filter]):
    """(ranges, part_in, part_null) pruning spec from pushed filters.

    ``ranges``: col -> (lower, upper) conjunctive bounds usable against
    both file stats and partition values (same contract as
    DeltaTable.read_where).  ``part_in``: col -> allowed raw-value set
    (EqualTo/In).  ``part_null``: cols that must be null.  Only top-level
    columns participate; anything else is ignored (never wrong, only less
    pruned) — Spark re-applies every filter exactly anyway."""
    ranges: dict[str, list] = {}
    eq_in: dict[str, set] = {}
    nulls: set[str] = set()

    def _col(f) -> str | None:
        path = tuple(f.attribute)
        return path[0] if len(path) == 1 else None

    for f in filters:
        c = _col(f)
        if c is None:
            continue
        if isinstance(f, EqualTo):
            ranges.setdefault(c, [None, None])
            lo, hi = ranges[c]
            ranges[c] = [f.value if lo is None else max(lo, f.value),
                         f.value if hi is None else min(hi, f.value)]
            eq_in.setdefault(c, set()).add(f.value)
        elif isinstance(f, In):
            vs = set(f.value)
            if c in eq_in:
                eq_in[c] &= vs
            else:
                eq_in[c] = vs
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            ranges.setdefault(c, [None, None])
            lo, hi = ranges[c]
            ranges[c] = [f.value if lo is None else max(lo, f.value), hi]
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            ranges.setdefault(c, [None, None])
            lo, hi = ranges[c]
            ranges[c] = [lo, f.value if hi is None else min(hi, f.value)]
        elif isinstance(f, IsNull):
            nulls.add(c)
    return ranges, eq_in, nulls


def _stats_of(action: dict) -> dict:
    st = action.get("stats")
    if isinstance(st, str):
        try:
            st = json.loads(st)
        except ValueError:
            st = None
    return st or {}


def _keep_file(
    snap: DeltaSnapshot,
    action: dict,
    ranges: dict,
    eq_in: dict,
    nulls: set,
) -> bool:
    """False only when stats / partition values *disprove* every-row-match
    potential — missing stats always keep (never wrong, only less pruned)."""
    pv = action.get("partitionValues") or {}
    st = _stats_of(action)
    mins = st.get("minValues") or {}
    maxs = st.get("maxValues") or {}
    part_set = set(snap.partition_columns)
    for col in set(ranges) | set(eq_in) | nulls:
        if col in snap.collated_columns:
            # collated column: binary comparison against collation-ordered
            # stats (or partition equality under a case/accent-insensitive
            # collation) could wrongly prune — keep; Spark re-applies the
            # exact filter with its own collation semantics
            continue
        pcol = snap.phys(col) if col in snap.physical else col
        if col in part_set:
            raw = pv.get(pcol)
            if col in nulls and raw is not None:
                return False
            if raw is None:
                continue  # null partition matches no range/eq, but a
                # range filter on a null value is Spark's to decide — keep
            typed = _pv_python(raw, snap.schema[col].dataType)
            if col in eq_in and typed not in {
                _coerce(v, typed) for v in eq_in[col]
            }:
                return False
            lo = hi = typed
        else:
            lo, hi = mins.get(pcol), maxs.get(pcol)
        if col in ranges:
            lower, upper = ranges[col]
            # one-sided pruning is sound (a known max alone proves every
            # row sits at or below it); each side keeps-on-unknown — the
            # same rule as DeltaTable._stats_skip
            try:
                if lower is not None and hi is not None and _coerce(lower, hi) > hi:
                    return False
            except (TypeError, ValueError):
                pass
            try:
                if upper is not None and lo is not None and _coerce(upper, lo) < lo:
                    return False
            except (TypeError, ValueError):
                pass
    return True


def _coerce(value, like):
    """Best-effort cast of a filter literal to the stats value's type so
    comparisons are same-typed (stats JSON numbers vs python literals)."""
    try:
        return type(like)(value)
    except (TypeError, ValueError):
        return value


def _pack_files(files: list[_FileSlice], max_bytes: int) -> list[list[_FileSlice]]:
    """First-fit-decreasing bin packing into ~max_bytes tasks; every file
    lands somewhere, oversized files get their own task."""
    if not files:
        return []
    out: list[list[_FileSlice]] = []
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


def _plan_slices(
    tbl: DeltaTable, snap: DeltaSnapshot, filters: list[Filter]
) -> list[_FileSlice]:
    ranges, eq_in, nulls = _filter_ranges(filters)
    fs = (
        tbl.fs
        if is_local(tbl.location)
        else _SparklessReadFS()
        if tbl.spark is None
        else tbl.fs
    )
    slices = []
    for p, a in snap.files.items():
        if (ranges or eq_in or nulls) and not _keep_file(
            snap, a, ranges, eq_in, nulls
        ):
            continue
        dv_desc = a.get("deletionVector")
        # descriptor, not bytes: each task fetches/decodes only the
        # sidecars of the files it scans (dv.dv_map_entry scale rule)
        dv = (
            dv_map_entry(dv_desc, tbl.location, fs)
            if dv_desc and dv_desc.get("storageType")
            else None
        )
        slices.append(
            _FileSlice(
                path=tbl._abs(p),
                size=int(a.get("size") or 0),
                dv=dv,
                pv=a.get("partitionValues") or {},
            )
        )
    return slices


def _plan_changes(tbl: DeltaTable, lo: int, hi: int) -> list[_FileSlice]:
    """Change slices for commits ``lo..hi`` inclusive — the same CDF
    semantics as ``DeltaTable.read_changes`` (delta_log.py): explicit cdc
    actions win; an add+remove of the SAME path is a DV rewrite whose row
    changes are exactly the bitmap diff (new-set = deletes, new-cleared =
    restored inserts); a rewrite of different paths without cdc raises
    (those row changes were never recorded); otherwise adds are inserts
    and removes are deletes, DV-masked to live rows."""
    from delta_lake_validation_spark.sources.dv import serialize_bitmap

    fs = tbl.fs if is_local(tbl.location) else _SparklessReadFS()

    def _blob(action):
        d = action.get("deletionVector")
        return load_dv_bytes(d, tbl.location, fs) if d else None

    def _indices(action):
        b = _blob(action)
        return (
            deserialize_bitmap(b).astype(np.int64)
            if b
            else np.array([], dtype=np.int64)
        )

    slices: list[_FileSlice] = []
    for v in range(lo, hi + 1):
        actions = tbl._commit_actions(v)
        cdc = [a["cdc"] for a in actions if "cdc" in a]
        adds = [
            a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        ts_us = (tbl._commit_ts_ms(v) or 0) * 1000
        common = {"version": v, "ts_us": ts_us}
        if cdc:
            for c in cdc:
                slices.append(
                    _FileSlice(
                        path=tbl._abs(c["path"]),
                        size=int(c.get("size") or 0),
                        dv=None,
                        pv=c.get("partitionValues") or {},
                        is_cdc=True,
                        **common,
                    )
                )
        elif adds and removes:
            r_by_path = {r["path"]: r for r in removes}
            same = [
                (a, r_by_path[a["path"]])
                for a in adds
                if a["path"] in r_by_path
            ]
            if len(same) != len(adds) or len(adds) != len(removes):
                raise DeltaProtocolError(
                    f"commit {v} rewrites files without cdc actions: its "
                    "row-level changes were never recorded (CDF not "
                    "enabled at write time)"
                )
            for a, r in same:
                new_idx, old_idx = _indices(a), _indices(r)
                for idxs, kind in (
                    (np.setdiff1d(new_idx, old_idx), "delete"),
                    (np.setdiff1d(old_idx, new_idx), "insert"),
                ):
                    if idxs.size == 0:
                        continue
                    slices.append(
                        _FileSlice(
                            path=tbl._abs(a["path"]),
                            size=int(a.get("size") or 0),
                            dv=serialize_bitmap(idxs.astype(np.uint64)),
                            pv=a.get("partitionValues") or {},
                            mode="keep",
                            ctype=kind,
                            **common,
                        )
                    )
        else:
            for acts, kind in ((adds, "insert"), (removes, "delete")):
                for a in acts:
                    d = a.get("deletionVector")
                    slices.append(
                        _FileSlice(
                            path=tbl._abs(a["path"]),
                            size=int(a.get("size") or 0),
                            dv=dv_map_entry(d, tbl.location, fs)
                            if d
                            else None,
                            pv=a.get("partitionValues") or {},
                            mode="drop",
                            ctype=kind,
                            **common,
                        )
                    )
    return slices


# ------------------------------------------------------------ executor scan
class _ScanExec:
    """Shared executor-side file scan: pyarrow read -> DV mask -> partition
    stamp -> logical rename -> cast -> arrow batches.  Planned driver-side,
    pickled whole (plain python state only)."""

    def __init__(self, snap: DeltaSnapshot, cdf: bool = False):
        schema = snap.schema
        part = set(snap.partition_columns)
        #: (logical, physical, type-json) for non-partition columns, in
        #: logical schema order interleaved with partition stamps
        self.columns = [
            (
                f.name,
                snap.phys(f.name),
                f.name in part,
                f.dataType.json(),
            )
            for f in schema.fields
        ]
        self.mapping_mode = snap.mapping_mode
        self.column_ids = dict(snap.column_ids)
        self.cdf = cdf
        #: logical-col -> (lower, upper) conjunctive bounds from pushed
        #: filters; used for row-group statistics skipping inside files
        #: (set by the batch reader at plan time; inexact — Spark
        #: re-applies the exact filters above the scan)
        self.ranges: dict[str, tuple] = {}

    # -- lazily-built per-process caches (not pickled) ----------------------
    def _ensure(self):
        if getattr(self, "_built", False):
            return
        self.types = {
            lg: _type_from_json(tj) for lg, _, _, tj in self.columns
        }
        import pyarrow as pa

        fields = [
            (lg, _arrow_type(self.types[lg])) for lg, _, _, _ in self.columns
        ]
        if self.cdf:
            fields += [
                ("_change_type", pa.string()),
                ("_commit_version", pa.int64()),
                ("_commit_timestamp", pa.timestamp("us")),
            ]
        self.target = pa.schema(fields)
        self.data_phys = [
            ph for _, ph, is_part, _ in self.columns if not is_part
        ]
        self._built = True

    def __getstate__(self):
        d = dict(self.__dict__)
        for k in (
            "_built",
            "types",
            "target",
            "data_phys",
            "_pq_colidx",
            "_pq_colidx_for",
        ):
            d.pop(k, None)
        return d

    def _verify_ids(self, arrow_schema, path: str):
        if self.mapping_mode != "id" or not self.column_ids:
            return
        seen = {}
        for f_ in arrow_schema:
            meta = f_.metadata or {}
            fid = meta.get(b"PARQUET:field_id")
            if fid is not None:
                seen[f_.name] = int(fid)
        for phys, want in self.column_ids.items():
            got = seen.get(phys)
            if got is not None and got != want:
                raise DeltaProtocolError(
                    f"deltapy: column-mapping id mismatch in {path}: "
                    f"field {phys!r} has parquet field-id {got}, table "
                    f"metadata says {want}; refusing to read incorrectly"
                )
        # a file whose ids point at differently-named columns
        by_id = {v: k for k, v in seen.items()}
        for phys, want in self.column_ids.items():
            holder = by_id.get(want)
            if holder is not None and holder != phys:
                raise DeltaProtocolError(
                    f"deltapy: column-mapping id mismatch in {path}: "
                    f"parquet field-id {want} belongs to {holder!r}, table "
                    f"metadata assigns it to {phys!r}; refusing to read "
                    "incorrectly"
                )

    def scan(self, files: list[_FileSlice]):
        import pyarrow as pa
        import pyarrow.parquet as pq

        self._ensure()
        for fsl in files:
            fs, norm = _pa_fs(fsl.path)
            with fs.open_input_file(norm) as fh:
                try:
                    pf = pq.ParquetFile(fh)
                except OSError as e:
                    if "LogicalType" not in str(e):
                        raise
                    # VARIANT-annotated footer this pyarrow predates:
                    # rewrite the annotation away in memory (the group
                    # then reads like the unannotated Spark-4.0 layout)
                    # and reopen against the patched metadata; refuse
                    # typed when even the shim cannot serve it
                    from delta_lake_validation_spark.sources.footer_patch import (  # noqa: E501
                        read_patched_metadata,
                    )

                    try:
                        pf = pq.ParquetFile(
                            fh, metadata=read_patched_metadata(fh)
                        )
                    except Exception:
                        raise DeltaProtocolError(
                            f"deltapy: {fsl.path} carries a parquet "
                            "LogicalType the installed pyarrow cannot "
                            "parse (and the footer shim could not "
                            "rewrite it) — read via DeltaTable.read / "
                            "read_delta (the JVM scan serves it natively)"
                        ) from None
                # shredded variant files (typed_value subtrees) need no
                # gate here: _variant_assemble detects the layout per
                # column and reconstructs via sources/variant_shred.py
                self._verify_ids(pf.schema_arrow, fsl.path)
                present = [
                    c for c in self.data_phys if c in pf.schema_arrow.names
                ]
                if fsl.is_cdc and "_change_type" in pf.schema_arrow.names:
                    present = present + ["_change_type"]
                members = (
                    np.sort(
                        deserialize_bitmap(
                            resolve_dv_entry(fsl.dv)
                        ).astype(np.int64)
                    )
                    if fsl.dv
                    else None
                )
                offset = 0
                for g in range(pf.num_row_groups):
                    n_rg = pf.metadata.row_group(g).num_rows
                    if self._rg_prunable(pf, g):
                        offset += n_rg
                        continue
                    for rb in pf.iter_batches(
                        row_groups=[g], columns=present
                    ):
                        n = rb.num_rows
                        if members is not None and n:
                            idx = np.arange(
                                offset, offset + n, dtype=np.int64
                            )
                            mask = np.isin(
                                idx, members, assume_unique=True
                            )
                            if fsl.mode == "drop":
                                mask = ~mask
                            if not mask.all():
                                rb = rb.filter(pa.array(mask))
                        elif fsl.mode == "keep" and members is None:
                            rb = rb.slice(0, 0)  # keep-nothing guard
                        offset += n
                        if rb.num_rows == 0:
                            continue
                        yield self._assemble(rb, fsl)

    def _rg_prunable(self, pf, g: int) -> bool:
        """True when this row group's parquet min/max statistics disprove
        the pushed conjunctive ranges — the row-group tier of the same
        data skipping the planner does per file.  Conservative: missing
        or incomparable stats keep the group."""
        if not self.ranges:
            return False
        idx_by_name = getattr(self, "_pq_colidx", None)
        if idx_by_name is None or getattr(self, "_pq_colidx_for", None) is not pf:
            sch = pf.metadata.schema
            idx_by_name = {n: i for i, n in enumerate(sch.names)}
            self._pq_colidx = idx_by_name
            self._pq_colidx_for = pf
        rg = pf.metadata.row_group(g)
        phys_of = {lg: ph for lg, ph, is_part, _ in self.columns if not is_part}
        for col, (lower, upper) in self.ranges.items():
            ph = phys_of.get(col)
            if ph is None or ph not in idx_by_name:
                continue
            st = rg.column(idx_by_name[ph]).statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            try:
                if lower is not None and _coerce(lower, hi) > hi:
                    return True
                if upper is not None and _coerce(upper, lo) < lo:
                    return True
            except (TypeError, ValueError):
                continue
        return False

    def _assemble(self, rb, fsl: _FileSlice):
        import pyarrow as pa

        pv = fsl.pv
        n = rb.num_rows
        arrays = []
        for lg, ph, is_part, _ in self.columns:
            at = self.target.field(lg).type
            if is_part:
                val = _pv_python(pv.get(ph), self.types[lg])
                arrays.append(
                    pa.nulls(n, at)
                    if val is None
                    else pa.array([val] * n, type=at)
                )
            elif ph in rb.schema.names:
                col = rb.column(ph)
                if pa.types.is_timestamp(col.type) and col.type.tz:
                    # tz-aware storage -> naive UTC instant
                    col = col.cast(pa.timestamp(col.type.unit, tz=None))
                if _is_variant_target(at):
                    col = _variant_assemble(col, at)
                arrays.append(col.cast(at) if col.type != at else col)
            else:
                # schema evolution: file predates the column -> nulls
                arrays.append(pa.nulls(n, at))
        if self.cdf:
            import datetime as _dt

            if fsl.is_cdc and "_change_type" in rb.schema.names:
                arrays.append(rb.column("_change_type").cast(pa.string()))
            else:
                arrays.append(pa.array([fsl.ctype] * n, type=pa.string()))
            arrays.append(pa.array([fsl.version] * n, type=pa.int64()))
            ts = (
                _dt.datetime.utcfromtimestamp(fsl.ts_us / 1_000_000)
                if fsl.ts_us is not None
                else None
            )
            arrays.append(pa.array([ts] * n, type=pa.timestamp("us")))
        return pa.RecordBatch.from_arrays(arrays, schema=self.target)


def _type_from_json(tj: str) -> DataType:
    import json as _json

    from pyspark.sql.types import _parse_datatype_json_string

    return _parse_datatype_json_string(tj)


# ------------------------------------------------------------- batch reader
class DeltaPyBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = _path_of(options)
        self.max_task_bytes = int(
            options.get("maxbytespertask", _DEFAULT_TASK_BYTES)
        )
        self.cdf = _boolish(options.get("readchangefeed"))
        tbl = DeltaTable(None, self.path)
        version = _version_of(options, tbl)
        if self.cdf:
            self._start, self._end = _cdf_range_of(options, tbl)
            version = self._end
        self._snap = tbl.snapshot(version)
        self._tbl = tbl
        self._filters: list[Filter] = []
        _variant_probe(tbl, self._snap)
        self.exec = _ScanExec(self._snap, cdf=self.cdf)

    def pushFilters(self, filters: list[Filter]):
        # every filter is used for file-level pruning where possible, and
        # every filter is handed back: file skipping is not exact filtering
        if not self.cdf:
            self._filters = list(filters)
        yield from filters

    def partitions(self):
        if self.cdf:
            slices = _plan_changes(self._tbl, self._start, self._end)
        else:
            slices = _plan_slices(self._tbl, self._snap, self._filters)
            self.exec.ranges = {
                c: (lo, hi)
                for c, (lo, hi) in _filter_ranges(self._filters)[0].items()
                # collated columns: row-group min/max comparisons would be
                # binary-vs-collation — never push them to the executor
                if c not in self._snap.collated_columns
            }
        # planning handles are not needed executor-side
        self._tbl = None
        self._snap = None
        packed = _pack_files(slices, self.max_task_bytes)
        return [DeltaPyScanPartition(g) for g in packed] or [
            DeltaPyScanPartition([])
        ]

    def read(self, partition: DeltaPyScanPartition):
        yield from self.exec.scan(partition.files)


# ------------------------------------------------------------ stream reader
class DeltaPyStreamReader(DataSourceStreamReader):
    """Micro-batch source over the transaction log: offsets are table
    versions, a batch is every data-changing add in ``(start, end]``.

    Append-only contract matching delta-spark's streaming source: a
    data-changing ``remove`` aborts the stream unless ``ignoreDeletes``
    (partition deletes expected) or ``ignoreChanges`` (updates/merges
    re-emit their whole rewritten files — downstream must tolerate
    duplicates) is set.  Compaction commits (``dataChange = false``) are
    always transparent.  ``startingVersion`` (default 0) picks where the
    stream begins; replaying a committed range yields byte-identical
    batches, so an idempotent sink gets exactly-once."""

    def __init__(self, options: dict):
        self.path = _path_of(options)
        self.ignore_deletes = _boolish(options.get("ignoredeletes"))
        self.ignore_changes = _boolish(options.get("ignorechanges"))
        self.cdf = _boolish(options.get("readchangefeed"))
        self.max_task_bytes = int(
            options.get("maxbytespertask", _DEFAULT_TASK_BYTES)
        )
        tbl = DeltaTable(None, self.path)
        snap = tbl.snapshot()
        self._schema_json = snap.schema.json()
        _variant_probe(tbl, snap)
        self.exec = _ScanExec(snap, cdf=self.cdf)
        st = options.get("startingtimestamp")
        sv = str(options.get("startingversion", "0"))
        if st is not None:
            if options.get("startingversion") is not None:
                raise ValueError(
                    "deltapy: pass startingVersion or startingTimestamp, "
                    "not both"
                )
            # delta-spark rule: first commit at-or-after the timestamp
            self._start = tbl.first_version_at_or_after(st) - 1
        elif sv == "latest":
            self._start = tbl.latest_version()
        else:
            self._start = int(sv) - 1  # offset = last *processed* version
        # rate limiting (delta-spark's maxFilesPerTrigger/maxBytesPerTrigger):
        # cap how many commits one micro-batch may span, measured in
        # data-changing add files/bytes.  Without a cap a fresh stream over
        # a long history plans its whole backlog as ONE batch.
        mf = options.get("maxfilespertrigger")
        mb = options.get("maxbytespertrigger")
        self.max_files = int(mf) if mf is not None else None
        self.max_bytes = int(mb) if mb is not None else None
        self._cursor = self._start  # last version this reader has offered
        # highest version KNOWN DELIVERED to a committed batch: every
        # `start` Spark passes to partitions() is the end of a committed
        # batch, and commit(end) finalizes one.  Needed because after a
        # checkpoint restart Spark calls latestOffset() BEFORE partitions():
        # pacing from the option-derived cursor would return an offset
        # BELOW the checkpointed end, Spark would record the lower offset,
        # and later triggers would re-serve already-delivered versions.
        # Starts at -1 (below every version), NEVER at the option-derived
        # start: startingVersion='latest'/startingTimestamp re-resolve
        # LIVE at restart, so a floor seeded from them could exceed the
        # checkpointed range and silently skip the replayed versions.
        self._floor = -1

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        tbl = DeltaTable(None, self.path)
        latest = tbl.latest_version()
        if self.max_files is None and self.max_bytes is None:
            return {"version": latest}
        # advance at most cap files/bytes past the internal cursor, always
        # admitting at least one version so an oversized commit still flows.
        # The cursor only moves forward; after a checkpoint restart it may
        # lag the committed offset, in which case a few quiet triggers pass
        # while it catches up — it can never send the stream backward
        # (partitions()/commit() fast-forward it, and the delivered-floor
        # clamp keeps the returned version at or above every committed
        # offset observed in this process).
        if self._floor > self._cursor:
            self._cursor = self._floor
        end = self._cursor
        files = nbytes = 0
        while end < latest:
            acts = tbl._commit_actions(end + 1)
            adds = [
                a["add"]
                for a in acts
                if a.get("add") and a["add"].get("dataChange", True)
            ]
            if self.cdf:
                # the change feed serves cdc files when a commit records
                # them (adds are ignored then); count what will be read,
                # so a pure-DML backlog (cdc + removes, no counted adds)
                # still trips the cap
                cdc = [a["cdc"] for a in acts if a.get("cdc")]
                if cdc:
                    adds = cdc
            nf, nb = len(adds), sum(int(a.get("size") or 0) for a in adds)
            # zero-cost commits (metadata, deletes) always flow; the cap
            # blocks only once the batch already carries some cost, so an
            # oversized single commit still makes progress
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
        tbl = DeltaTable(None, self.path)
        lo, hi = int(start["version"]), int(end["version"])
        if hi > self._cursor:  # checkpoint-restart replay: catch up
            self._cursor = hi
        # `start` is always the end of a COMMITTED batch — record it as the
        # delivered floor and never re-serve versions at or below it, even
        # if a restart raced latestOffset() into planning a stale range
        if lo > self._floor:
            self._floor = lo
        lo_eff = max(lo, self._floor)
        if self.cdf:
            # change-feed stream: every commit's row-level changes,
            # deletes included as rows — no ignore* needed
            packed = _pack_files(
                _plan_changes(tbl, lo_eff + 1, hi)
                if lo_eff < hi
                else [],
                self.max_task_bytes,
            )
            return [DeltaPyScanPartition(g) for g in packed] or [
                DeltaPyScanPartition([])
            ]
        slices: list[_FileSlice] = []
        fs = tbl.fs if is_local(tbl.location) else _SparklessReadFS()
        for v in range(lo_eff + 1, hi + 1):
            for a in tbl._commit_actions(v):
                if a.get("metaData"):
                    new = a["metaData"].get("schemaString")
                    if new and json.loads(new) != json.loads(
                        self._schema_json
                    ):
                        raise DeltaProtocolError(
                            f"deltapy stream: schema changed at version {v}; "
                            "restart the stream to pick up the new schema"
                        )
                rm = a.get("remove")
                if rm and rm.get("dataChange", True):
                    if not (self.ignore_deletes or self.ignore_changes):
                        raise DeltaProtocolError(
                            f"deltapy stream: data-changing remove at "
                            f"version {v}; set ignoreDeletes (partition "
                            "deletes) or ignoreChanges (row-level rewrites, "
                            "re-emits whole files) to continue"
                        )
                    continue
                ad = a.get("add")
                if not ad or not ad.get("dataChange", True):
                    continue
                dv_desc = ad.get("deletionVector")
                slices.append(
                    _FileSlice(
                        path=tbl._abs(ad["path"]),
                        size=int(ad.get("size") or 0),
                        dv=dv_map_entry(dv_desc, tbl.location, fs)
                        if dv_desc and dv_desc.get("storageType")
                        else None,
                        pv=ad.get("partitionValues") or {},
                    )
                )
        packed = _pack_files(slices, self.max_task_bytes)
        return [DeltaPyScanPartition(g) for g in packed] or [
            DeltaPyScanPartition([])
        ]

    def read(self, partition: DeltaPyScanPartition):
        yield from self.exec.scan(partition.files)

    def commit(self, end: dict) -> None:
        v = int(end["version"])
        if v > self._floor:  # batch finalized: these versions are delivered
            self._floor = v

    def stop(self) -> None:
        pass


# ------------------------------------------------------------------- writer
@dataclass
class _AddPayload(WriterCommitMessage):
    adds: list = field(default_factory=list)


class _PartPredicate:
    """Conjunctive comparison predicate over PARTITION columns, evaluated
    against an add action's partitionValues strings — the sparkless
    commit worker's replaceWhere scope.  Partition-only predicates make
    file-level matching EXACT (all rows of a file share its pv), so the
    removal set and the incoming-row check equal what
    ``DeltaTable.overwrite(replace_where=...)`` computes with a Spark
    scan.  Anything it cannot parse — non-partition columns, OR,
    functions — raises, and the writer routes to DeltaTable.overwrite.

    Grammar: ``term (AND term)*`` where term is ``col op literal``
    (op: = == != <> < <= > >=), ``col [NOT] IN (lit, ...)``, or
    ``col IS [NOT] NULL``; literals are quoted strings (DATE/TIMESTAMP
    prefixes allowed), numbers, or true/false."""

    _TERM = re.compile(
        r"^\(*\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*"
        r"(?:(?P<op><=|>=|==|!=|<>|=|<|>)\s*(?P<lit>.+?)"
        r"|(?P<not_in>NOT\s+)?IN\s*\((?P<inlist>[^)]*)\)"
        r"|IS\s+(?P<is_not>NOT\s+)?NULL)\s*\)*$",
        re.IGNORECASE | re.DOTALL,
    )

    def __init__(self, terms: list[tuple], types: dict):
        self.terms = terms  # (col, kind, payload)
        self.types = types

    @classmethod
    def parse(cls, text: str, part_cols: list, types: dict):
        by_lower = {c.lower(): c for c in part_cols}
        terms = []
        for raw in re.split(r"\s+AND\s+", text.strip(), flags=re.IGNORECASE):
            m = cls._TERM.match(raw.strip())
            if not m:
                raise ValueError(f"unsupported replaceWhere term {raw!r}")
            col = by_lower.get(m.group("col").lower())
            if col is None:
                raise ValueError(
                    f"replaceWhere column {m.group('col')!r} is not a "
                    "partition column"
                )
            if m.group("op"):
                lit = cls._literal(m.group("lit"), types[col])
                if lit is None:
                    raise ValueError(
                        "replaceWhere: NULL literal needs IS NULL"
                    )
                terms.append((col, m.group("op"), lit))
            elif m.group("inlist") is not None:
                vals = [
                    cls._literal(x.strip(), types[col])
                    for x in m.group("inlist").split(",")
                    if x.strip()
                ]
                if not vals or any(v is None for v in vals):
                    # SQL three-valued logic: a NULL inside the list makes
                    # `x NOT IN (...)` never TRUE and `x IN (...)` TRUE only
                    # on a non-NULL match — set-membership over a list
                    # containing None gets NOT IN exactly backwards (it
                    # would delete every non-matching partition).  Refuse;
                    # the writer routes to DeltaTable.overwrite, which
                    # evaluates the predicate with real SQL semantics.
                    raise ValueError(
                        "replaceWhere: NULL (or empty) IN list needs the "
                        "Spark-side overwrite"
                    )
                kind = "not_in" if m.group("not_in") else "in"
                terms.append((col, kind, vals))
            else:
                kind = "is_not_null" if m.group("is_not") else "is_null"
                terms.append((col, kind, None))
        return cls(terms, types)

    @staticmethod
    def _literal(tok: str, dt):
        import datetime as _dt

        tok = tok.strip()
        up = tok.upper()
        for prefix in ("DATE", "TIMESTAMP"):
            if up.startswith(prefix):
                tok = tok[len(prefix) :].strip()
                break
        if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
            s = tok[1:-1].replace(tok[0] * 2, tok[0])
            if isinstance(dt, DateType):
                return _dt.date.fromisoformat(s)
            if isinstance(dt, TimestampType):
                return _dt.datetime.fromisoformat(s)
            return s
        if up in ("TRUE", "FALSE"):
            return up == "TRUE"
        if up == "NULL":
            return None
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            raise ValueError(f"unsupported replaceWhere literal {tok!r}")

    def matches(self, pv: dict) -> bool:
        """SQL semantics: NULL partition values satisfy only IS NULL."""
        for col, kind, payload in self.terms:
            val = _pv_python(pv.get(col), self.types[col])
            if kind == "is_null":
                if val is not None:
                    return False
                continue
            if kind == "is_not_null":
                if val is None:
                    return False
                continue
            if val is None:
                return False  # NULL op literal is never TRUE
            if kind == "in":
                if val not in payload:
                    return False
            elif kind == "not_in":
                if val in payload:
                    return False
            else:
                lit = payload
                if isinstance(val, (int, float)) and isinstance(
                    lit, (int, float)
                ):
                    val, lit = float(val), float(lit)
                if kind in ("=", "=="):
                    ok = val == lit
                elif kind in ("!=", "<>"):
                    ok = val != lit
                elif kind == "<":
                    ok = val < lit
                elif kind == "<=":
                    ok = val <= lit
                elif kind == ">":
                    ok = val > lit
                else:
                    ok = val >= lit
                if not ok:
                    return False
        return True


class DeltaPyWriter(DataSourceArrowWriter):
    """Executor-staged, driver-committed append/overwrite.

    ``option("replaceWhere", pred)`` with mode('overwrite') performs the
    predicate-scoped atomic overwrite for PARTITION-column predicates
    (conjunctive comparisons/IN/IS NULL — see ``_PartPredicate``): staged
    partitions are validated against the predicate executor-side and the
    commit removes exactly the matching live files, matching
    ``DeltaTable.overwrite(replace_where=...)`` row for row.  General
    (non-partition) predicates need a targeting scan the sparkless commit
    worker cannot run and route to ``DeltaTable.overwrite``.

    Refuses tables carrying constraints / invariants / generated or
    identity columns: those require a scan-time enforcement pass that the
    sparkless commit worker cannot run — ``DeltaTable.append`` (which
    enforces them) is the route for such tables.  CDF-enabled tables accept
    appends (inserts synthesize from adds) but refuse overwrite, which
    would need change-data files."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = _path_of(options)
        self.overwrite = overwrite
        self.schema = schema
        self._replace_where_text = options.get("replacewhere")
        self.replace_pred = None  # parsed after partition columns are known
        # Spark's option: only the partitions the frame writes are replaced
        # (an unpartitioned table degenerates to a full overwrite, as in
        # Spark).  Commit-time-only logic, so the sparkless worker can do it.
        self.dynamic_mode = (
            str(options.get("partitionoverwritemode", "")).lower()
            == "dynamic"
        )
        if self._replace_where_text is not None:
            if not overwrite:
                raise ValueError(
                    "deltapy: replaceWhere requires mode('overwrite')"
                )
            if self.dynamic_mode:
                raise ValueError(
                    "deltapy: replaceWhere conflicts with "
                    "partitionOverwriteMode=dynamic (delta-spark's rule)"
                )
        try:
            tbl = DeltaTable(None, self.path)
        except FileNotFoundError:
            tbl = None
        if tbl is None:
            # first write creates the table; partitioning from the option
            raw = options.get("partitionby", "") or ""
            self.part_cols = [c for c in raw.split(",") if c]
            missing = [c for c in self.part_cols if c not in schema.names]
            if missing:
                raise ValueError(
                    f"deltapy: partitionBy columns {missing} not in schema"
                )
            self.existing_meta = None
            self.evolved_schema = None
            self.phys = {f.name: f.name for f in schema.fields}
            self.collated = frozenset()
        else:
            snap = tbl.snapshot()
            tbl._check_writer_protocol(snap)
            props = snap.properties
            bad = sorted(
                k
                for k in props
                if k.startswith("delta.constraints.")
            )
            if bad or any(
                (f.metadata or {}).get(k)
                for f in snap.schema.fields
                for k in (
                    "delta.invariants",
                    "delta.generationExpression",
                    "delta.identity.start",
                )
            ):
                raise DeltaProtocolError(
                    "deltapy writer: table carries constraints/invariants/"
                    "generated or identity columns; use DeltaTable.append "
                    "(scan-time enforcement) instead"
                )
            if "rowTracking" in (
                snap.protocol.get("writerFeatures") or []
            ):
                # rowTracking demands baseRowId assignment + high-water-
                # mark bookkeeping at commit time; only the Spark-side
                # commit chokepoint does that (_stamp_row_tracking)
                raise DeltaProtocolError(
                    "deltapy writer: rowTracking tables need commit-time "
                    "row-id assignment; use DeltaTable.append"
                )
            if overwrite and props.get(
                "delta.enableChangeDataFeed", ""
            ).lower() == "true":
                raise DeltaProtocolError(
                    "deltapy writer: overwrite on a CDF-enabled table needs "
                    "change-data files; use DeltaTable.overwrite"
                )
            # collation is a comparison property, not a storage one: a
            # plain-string frame appends byte-identically to a collated
            # column (delta-spark's implicit cast), so erase collation
            # from the type comparison
            import re as _re

            def _ss(dt) -> str:
                return _re.sub(
                    r"string collate [\w.]+", "string", dt.simpleString()
                )

            want = [(f.name, _ss(f.dataType)) for f in snap.schema]
            got = [(f.name, _ss(f.dataType)) for f in schema]
            self.evolved_schema = None
            if want != got and _boolish(options.get("mergeschema")):
                # mergeSchema: NEW columns widen the table (metaData action
                # in the commit); existing columns must keep their types and
                # relative order.  Missing columns need no null-fill here —
                # every reader treats absent file columns as null.
                have = dict(want)
                conflicts = [
                    n for n, t in got if n in have and have[n] != t
                ]
                if conflicts:
                    raise DeltaProtocolError(
                        "deltapy mergeSchema cannot change existing column "
                        f"types: {conflicts}"
                    )
                missing_parts = [
                    c for c in snap.partition_columns if c not in schema.names
                ]
                if missing_parts:
                    raise DeltaProtocolError(
                        "deltapy mergeSchema: partition columns "
                        f"{missing_parts} must be present in the frame"
                    )
                new_fields = [
                    f for f in schema.fields if f.name not in have
                ]
                self.evolved_schema = (
                    StructType(list(snap.schema.fields) + new_fields)
                    if new_fields
                    else None
                )
            elif want != got:
                raise ValueError(
                    f"deltapy: dataframe schema {got} does not match table "
                    f"schema {want}; option('mergeSchema','true') widens "
                    "the table with new columns"
                )
            self.part_cols = list(snap.partition_columns)
            self.existing_meta = True
            self._base_schema_json = snap.schema.json()
            self.phys = dict(snap.physical)
            self.collated = snap.collated_columns
            if snap.mapping_mode not in ("none", ""):
                raise DeltaProtocolError(
                    "deltapy writer: column-mapped tables not writable "
                    "through the data source; use DeltaTable.append"
                )
        self.types = {f.name: f.dataType for f in schema.fields}
        if self._replace_where_text is not None:
            # partition-scoped predicates are exactly computable at commit
            # time (a file's rows all share its partitionValues) — the one
            # replaceWhere class the sparkless worker can honor with
            # DeltaTable.overwrite(replace_where=...) semantics
            try:
                self.replace_pred = _PartPredicate.parse(
                    self._replace_where_text, self.part_cols, self.types
                )
            except ValueError as exc:
                raise ValueError(
                    f"deltapy replaceWhere: {exc}; general predicates need "
                    "a targeting scan the sparkless commit worker cannot "
                    "run — use DeltaTable.overwrite(df, replace_where=...)"
                ) from None

    # ------------------------------------------------------------- executor
    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        groups: dict[tuple, list] = {}
        for rb in iterator:
            rb = self._utcize(rb)
            for key, sub in self._split(rb):
                groups.setdefault(key, []).append(sub)
        adds = []
        for key, batches in groups.items():
            table = pa.Table.from_batches(batches)
            data = table.drop_columns(
                [c for c in self.part_cols if c in table.schema.names]
            )
            pv = dict(zip(self.part_cols, key))
            if self.replace_pred is not None and not self.replace_pred.matches(pv):
                # delta-spark's contract: every incoming row must satisfy
                # the replaceWhere predicate; partition-scoped predicates
                # make the per-file pv check exact
                raise ValueError(
                    f"deltapy replaceWhere: staged rows land in partition "
                    f"{pv} which does not satisfy "
                    f"{self._replace_where_text!r}"
                )
            rel = self._rel_path(pv)
            fs, norm = _pa_fs(f"{self.path}/{rel}")
            parent = norm.rsplit("/", 1)[0]
            fs.create_dir(parent, recursive=True)
            pq.write_table(data, norm, filesystem=fs, compression="snappy")
            size = fs.get_file_info(norm).size
            adds.append(
                {
                    "path": rel,
                    "partitionValues": pv,
                    "size": int(size),
                    "dataChange": True,
                    "stats": json.dumps(self._stats(data, table.num_rows)),
                }
            )
        return _AddPayload(adds=adds)

    def _utcize(self, rb):
        import pyarrow as pa

        cols = []
        changed = False
        for i, f_ in enumerate(rb.schema):
            col = rb.column(i)
            if pa.types.is_timestamp(f_.type):
                if f_.type.tz is None:
                    # naive batch values are session-UTC instants
                    col = col.cast(pa.timestamp(f_.type.unit, tz="UTC"))
                    changed = True
                elif f_.type.tz != "UTC":
                    col = col.cast(pa.timestamp(f_.type.unit, tz="UTC"))
                    changed = True
            cols.append(col)
        if not changed:
            return rb
        return pa.RecordBatch.from_arrays(
            cols,
            schema=pa.schema(
                [
                    pa.field(f_.name, c.type, f_.nullable)
                    for f_, c in zip(rb.schema, cols)
                ]
            ),
        )

    def _split(self, rb):
        """Yield (partition-key-tuple, record-batch) groups of one batch;
        keys are Delta partition-value *strings* (None for null)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if not self.part_cols:
            yield (), rb
            return
        tbl = pa.Table.from_batches([rb])
        # distinct partition tuples in this batch
        keys = tbl.select(self.part_cols)
        combined = keys.group_by(self.part_cols).aggregate([])
        for row in combined.to_pylist():
            mask = None
            for c in self.part_cols:
                v = row[c]
                m = (
                    pc.is_null(tbl[c])
                    if v is None
                    else pc.equal(tbl[c], pa.scalar(v, type=tbl[c].type))
                )
                mask = m if mask is None else pc.and_(mask, m)
            sub = tbl.filter(mask)
            key = tuple(
                _pv_string(row[c], self.types[c]) for c in self.part_cols
            )
            for b in sub.combine_chunks().to_batches():
                yield key, b

    def _rel_path(self, pv: dict) -> str:
        dirs = "/".join(
            f"{c}={_hive_escape(v) if v is not None else '__HIVE_DEFAULT_PARTITION__'}"
            for c, v in pv.items()
        )
        name = f"part-00000-{uuid.uuid4()}.snappy.parquet"
        return f"{dirs}/{name}" if dirs else name

    def _stats(self, data, num_records: int) -> dict:
        import pyarrow as pa
        import pyarrow.compute as pc

        mins, maxs, nulls = {}, {}, {}
        for f_ in data.schema:
            col = data[f_.name]
            nulls[f_.name] = int(col.null_count)
            if f_.name in getattr(self, "collated", ()):
                continue  # binary min/max on a collated column mis-orders
            t = f_.type
            if (
                pa.types.is_integer(t)
                or pa.types.is_floating(t)
                or pa.types.is_string(t)
                or pa.types.is_date(t)
                or pa.types.is_timestamp(t)
            ) and col.length() > col.null_count:
                mm = pc.min_max(col)
                lo = _stat_json(mm["min"].as_py())
                hi = _stat_json(mm["max"].as_py())
                if lo is not None:  # non-finite floats: omit, never emit
                    mins[f_.name] = lo
                if hi is not None:
                    maxs[f_.name] = hi
        return {
            "numRecords": int(num_records),
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }

    # --------------------------------------------------------------- driver
    def commit(self, messages):
        adds = [a for m in messages if m for a in m.adds]
        self._commit_adds(adds, [], op="WRITE")

    def _commit_adds(self, adds: list, extra: list, op: str) -> None:
        import time

        for attempt in range(40):
            try:
                tbl = DeltaTable(None, self.path)
                version = tbl.latest_version() + 1
                snap = tbl.snapshot()
            except FileNotFoundError:
                tbl = None
                version = 0
                snap = None
            actions = []
            ts = int(time.time() * 1000)
            if version == 0:
                actions.append(
                    {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                )
                actions.append(
                    {
                        "metaData": {
                            "id": str(uuid.uuid4()),
                            "format": {
                                "provider": "parquet",
                                "options": {},
                            },
                            "schemaString": self.schema.json(),
                            "partitionColumns": list(self.part_cols),
                            "configuration": {},
                            "createdTime": ts,
                        }
                    }
                )
            if (
                snap is not None
                and getattr(self, "_base_schema_json", None) is not None
                and snap.schema.json() != self._base_schema_json
            ):
                raise DeltaProtocolError(
                    "deltapy writer: table schema changed concurrently; the "
                    "staged files were validated against the old schema — "
                    "re-run the write"
                )
            if snap is not None and self.existing_meta is None:
                # we planned to CREATE this table but a racing writer won
                # the v0 commit: validate our staged files against the
                # winner's metaData before appending them — silently mixing
                # mismatched files/partitioning would corrupt the table
                want = [
                    (f.name, f.dataType.simpleString()) for f in snap.schema
                ]
                got = [
                    (f.name, f.dataType.simpleString()) for f in self.schema
                ]
                if want != got or list(snap.partition_columns) != list(
                    self.part_cols
                ):
                    raise DeltaProtocolError(
                        "deltapy writer: table was created concurrently "
                        f"with schema {want} / partitioning "
                        f"{list(snap.partition_columns)}, which does not "
                        "match the staged write — re-run the write"
                    )
            if self.evolved_schema is not None and snap is not None:
                actions.append(
                    {
                        "metaData": {
                            "id": snap.metadata_id,
                            "name": snap.name,
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": self.evolved_schema.json(),
                            "partitionColumns": list(snap.partition_columns),
                            "configuration": dict(snap.properties),
                        }
                    }
                )
            dynamic = self.overwrite and self.dynamic_mode
            actions.append(
                {
                    "commitInfo": {
                        "timestamp": ts,
                        "operation": op,
                        "operationParameters": {
                            "mode": "Overwrite"
                            if self.overwrite
                            else "Append",
                            "partitionBy": json.dumps(self.part_cols),
                            **(
                                {"partitionOverwriteMode": "dynamic"}
                                if dynamic
                                else {}
                            ),
                            **(
                                {"predicate": self._replace_where_text}
                                if self.replace_pred is not None
                                else {}
                            ),
                        },
                        "engineInfo": "delta-lake-validation-spark/deltapy",
                    }
                }
            )
            actions.extend(extra)
            if self.overwrite and snap is not None:
                # dynamic mode removes ONLY the partitions the staged adds
                # touch (their partitionValues use the log's own string
                # encoding, so membership is exact); replaceWhere removes
                # exactly the files whose partitionValues satisfy the
                # predicate; static removes all
                touched = {
                    tuple(sorted((a.get("partitionValues") or {}).items()))
                    for a in adds
                }
                for p, a in snap.files.items():
                    if dynamic and tuple(
                        sorted((a.get("partitionValues") or {}).items())
                    ) not in touched:
                        continue
                    if self.replace_pred is not None and not (
                        self.replace_pred.matches(
                            a.get("partitionValues") or {}
                        )
                    ):
                        continue
                    actions.append(
                        {
                            "remove": {
                                "path": p,
                                "deletionTimestamp": ts,
                                "dataChange": True,
                                "partitionValues": a.get("partitionValues")
                                or {},
                                "size": a.get("size"),
                            }
                        }
                    )
            for a in adds:
                a = dict(a)
                a["modificationTime"] = ts
                actions.append({"add": a})
            content = "\n".join(json.dumps(x) for x in actions) + "\n"
            target = f"{self.path}/_delta_log/{version:020d}.json"
            try:
                _atomic_create(target, content)
                return
            except FileExistsError:
                if self.overwrite:
                    # a remove set rebased over a commit this write never
                    # observed would silently absorb (and delete) a racing
                    # writer's rows — fail like DeltaTable.overwrite and
                    # delta-spark's conflict checker so the caller re-reads
                    raise DeltaProtocolError(
                        "deltapy writer: a concurrent commit landed during "
                        "overwrite; the staged remove set is stale — "
                        "re-read and re-run the write"
                    ) from None
                time.sleep(0.05 * (attempt + 1))
                continue
        raise DeltaProtocolError(
            f"deltapy writer: lost the commit race at {self.path} 40 times"
        )

    def abort(self, messages):
        for m in messages:
            if not m:
                continue
            for a in m.adds:
                try:
                    fs, norm = _pa_fs(f"{self.path}/{a['path']}")
                    fs.delete_file(norm)
                except OSError:
                    pass


from pyspark.sql.datasource import DataSourceStreamArrowWriter


class DeltaPyStreamWriter(DeltaPyWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("deltapy")`` — append-only streaming sink.

    Each micro-batch stages files executor-side (inherited ``write``) and
    lands as ONE atomic append commit.  With ``option("txnAppId", …)``
    the commit carries the protocol's ``txn`` action
    ``{appId, version: batchId}``, and a replayed batch (restart after a
    commit that the checkpoint didn't record) is SKIPPED when the log
    already holds a txn for the same appId at-or-past the batch id —
    Delta's own idempotent-sink contract, giving exactly-once end to end.
    The txn lookup reads the snapshot's per-appId watermark, which log
    replay assembles from checkpoint txn rows plus the JSON tail — so the
    watermark survives aggressive log cleanup (write_delta_checkpoint
    carries the latest txn per appId, as the spec requires).
    Without ``txnAppId`` the sink is plain at-least-once on replay."""

    def __init__(self, options: dict, schema: StructType):
        super().__init__(options, schema, overwrite=False)
        self.app_id = options.get("txnappid")

    def _last_txn_version(self, tbl: DeltaTable) -> int | None:
        tx = tbl.snapshot().txns.get(self.app_id)
        return int(tx.get("version", -1)) if tx else None

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import time

        adds = [a for m in messages if m for a in m.adds]
        extra: list[dict] = []
        if self.app_id is not None:
            try:
                tbl = DeltaTable(None, self.path)
            except FileNotFoundError:
                tbl = None
            if tbl is not None:
                last = self._last_txn_version(tbl)
                if last is not None and last >= int(batchId):
                    # replayed batch already committed: drop the staged
                    # files and do nothing — exactly-once
                    self.abort(messages, batchId)
                    return
            extra.append(
                {
                    "txn": {
                        "appId": self.app_id,
                        "version": int(batchId),
                        "lastUpdated": int(time.time() * 1000),
                    }
                }
            )
        self._commit_adds(adds, extra, op="STREAMING UPDATE")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        super().abort(messages)


def _atomic_create(path: str, content: str) -> None:
    """Exclusive-create commit primitive.  Local: O_EXCL (true atomicity);
    non-local: exists-check + write through pyarrow (same best-effort
    semantics Hadoop's S3A gives Delta without a locking service)."""
    import os

    if is_local(path):
        p = strip_scheme(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, content.encode("utf-8"))
        finally:
            os.close(fd)
        return
    import pyarrow.fs as pafs

    fs, norm = _pa_fs(path)
    if fs.get_file_info(norm).type != pafs.FileType.NotFound:
        raise FileExistsError(path)
    fs.create_dir(norm.rsplit("/", 1)[0], recursive=True)
    with fs.open_output_stream(norm) as out:
        out.write(content.encode("utf-8"))


def _pv_string(v, dt: DataType) -> str | None:
    """Python scalar -> Delta partition-value string."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(dt, BooleanType):
        return "true" if v else "false"
    if isinstance(dt, DateType):
        return v.isoformat()
    if isinstance(dt, TimestampType):
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def _stat_json(v):
    import datetime as _dt
    import decimal
    import math

    # mirror delta_log._stat_jsonable: JSON cannot carry NaN/Infinity, and
    # strict parsers in other engines fail on the non-standard tokens —
    # dropping the stat only costs pruning, never correctness
    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _hive_escape(v: str) -> str:
    from urllib.parse import quote

    return quote(str(v), safe="-_.=~")


# --------------------------------------------------------------- the source
def _path_of(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("deltapy: .load(path) / option('path', …) required")
    return path.rstrip("/")


def _version_of(options: dict, tbl: DeltaTable) -> int | None:
    v = options.get("versionasof")
    ts = options.get("timestampasof")
    if v is not None and ts is not None:
        raise ValueError("deltapy: pass versionAsOf or timestampAsOf, not both")
    if v is not None:
        return int(v)
    if ts is not None:
        return tbl.version_for_timestamp(ts)
    return None


def _boolish(v) -> bool:
    return str(v).lower() in ("true", "1", "yes") if v is not None else False


def _cdf_range_of(options: dict, tbl: DeltaTable) -> tuple[int, int]:
    """(start, end) versions for a CDF read: version options win, timestamp
    options resolve with delta-spark's rules (startingTimestamp = first
    commit at-or-after, endingTimestamp = last commit at-or-before)."""
    sv, st = options.get("startingversion"), options.get("startingtimestamp")
    ev, et = options.get("endingversion"), options.get("endingtimestamp")
    if sv is not None and st is not None:
        raise ValueError(
            "deltapy: pass startingVersion or startingTimestamp, not both"
        )
    if ev is not None and et is not None:
        raise ValueError(
            "deltapy: pass endingVersion or endingTimestamp, not both"
        )
    start = (
        int(sv)
        if sv is not None
        else tbl.first_version_at_or_after(st)
        if st is not None
        else 0
    )
    end = (
        int(ev)
        if ev is not None
        else tbl.version_for_timestamp(et)
        if et is not None
        else tbl.latest_version()
    )
    return start, end


class DeltaPyDataSource(DataSource):
    """``spark.read/readStream/write.format("deltapy")`` over the engine's
    own Delta protocol implementation — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "deltapy"

    def schema(self) -> StructType:
        tbl = DeltaTable(None, _path_of(self.options))
        if _boolish(self.options.get("readchangefeed")):
            end = _cdf_range_of(self.options, tbl)[1]
            base = tbl.snapshot(end).schema
            out = StructType(list(base.fields))
            out = out.add("_change_type", StringType())
            out = out.add("_commit_version", LongType())
            out = out.add("_commit_timestamp", TimestampType())
            return out
        return tbl.snapshot(_version_of(self.options, tbl)).schema

    def reader(self, schema: StructType) -> DeltaPyBatchReader:
        return DeltaPyBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DeltaPyStreamReader:
        return DeltaPyStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DeltaPyWriter:
        return DeltaPyWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return DeltaPyStreamWriter(self.options, schema)


def register(spark) -> None:
    """Idempotently register the ``deltapy`` format on a session.

    Ships the package zip first: the data-source CREATION worker
    cloudpickle-imports this module by name, so a bare session started
    outside the repo hits ModuleNotFoundError before any scan runs."""
    from delta_lake_validation_spark.shipping import ensure_worker_imports

    ensure_worker_imports(spark)
    # the reader implements pushFilters(); Spark refuses to plan it when
    # python filter pushdown is off (the default on a bare session), so
    # registering deltapy opts the session in — runtime-settable SQL conf
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaPyDataSource)
