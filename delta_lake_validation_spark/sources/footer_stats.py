"""Per-file parquet statistics from footers instead of a data re-scan.

Every ACID/Delta commit records per-file ``(numRecords, min/max,
nullCount)`` in its add entries.  The original implementation re-read
the just-written staging directory in a second Spark job
(``groupBy(input_file_name)``) — a full pass over every byte the commit
just wrote, per commit.  Parquet footers already carry exactly these
statistics per row group, so this module derives the same values from
metadata only: a few KB per file instead of the file itself.  Guide §6
(I/O): at 100 TB the commit path stops re-reading its own output
entirely.  Caveat (ADVICE r8): for a string/binary column whose min+max
exceed the writer's statistics-size threshold (4096 bytes in
parquet-cpp/parquet-mr) the writer drops that column's WHOLE statistics
object — no min/max and no null_count — so such a column surfaces here
as (None, None, None) and callers must tolerate it per-column (omit the
column from the recorded stats; data skipping keeps-on-unknown) rather
than failing the whole commit back to the scan.

Equivalence with the scan (pinned by tests/test_footer_stats_r8.py):

- int8..64 / float / double / string / boolean / date columns: parquet
  column-chunk statistics use the same orderings Spark's ``min``/``max``
  aggregates do — UTF-8 byte order equals codepoint order for strings,
  and parquet-mr places NaN in double bounds exactly where Spark's
  min/max do (verified: values ``[1.0, NaN]`` give ``(min 1.0, max
  NaN)`` on both paths; callers drop non-finite bounds identically).
- timestamps: Spark writes INT96 (no footer statistics) — callers keep
  timestamp-bearing schemas on the scan path.
- a column whose footer lacks a needed statistic surfaces as ``None``;
  callers OMIT a fully-absent column (min, max and null_count all
  ``None`` — the dropped-statistics-object case above) and fall back to
  the scan only for the asymmetric surprise (a null_count missing while
  min/max are present), so one oversized text column no longer reverts
  every commit on the table to a full re-scan.

Past ``distributed_threshold`` files the footers are read in a Spark
job over the path list (metadata-sized rows only), so a commit with
thousands of files never serializes footer reads on the driver.
"""

from __future__ import annotations

import math
from typing import Iterable


def _merge_min(a, b):
    """min under Spark/parquet ordering: NaN is GREATER than everything,
    so the min prefers any non-NaN value (python's builtin min is
    order-dependent around NaN and cannot be used directly)."""
    if a is None:
        return b
    if b is None:
        return a
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan:
        return b
    if b_nan:
        return a
    return a if a <= b else b


def _merge_max(a, b):
    """max under Spark/parquet ordering: NaN wins."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, float) and math.isnan(a):
        return a
    if isinstance(b, float) and math.isnan(b):
        return b
    return a if a >= b else b


def file_footer_stats(path: str) -> tuple[int, dict[str, tuple]]:
    """``(num_rows, {column_path: (min, max, null_count)})`` for one
    parquet file, from its footer only.  A bound is ``None`` when any
    row group lacks min/max for the column; ``null_count`` is ``None``
    when any row group lacks it.  Values are pyarrow's logical-type-
    converted Python values (int/float/str/bool/date), identical to what
    a Spark ``min``/``max`` collect yields for the supported types.
    Executor-safe: importable module + pyarrow only."""
    import pyarrow.parquet as pq

    from delta_lake_validation_spark.sources.fs import pa_fs

    fs, norm = pa_fs(path)
    try:
        md = pq.read_metadata(norm, filesystem=fs)
    except OSError:
        # Spark 4.1 annotates variant columns with the parquet VARIANT
        # LogicalType, which this container's pyarrow cannot parse — the
        # same footer otherwise carries perfectly good statistics for the
        # non-variant columns.  Reuse the r7 thrift shim that strips the
        # annotation (footer_patch.py); statistics bytes are copied
        # verbatim, so values are identical.  Any other parse failure
        # re-raises and the caller falls back to the scan.
        from delta_lake_validation_spark.sources.footer_patch import (
            read_patched_metadata,
        )

        with fs.open_input_file(norm) as fh:
            md = read_patched_metadata(fh)
    # [min, max, null_count, every_rg_had_minmax, every_rg_had_nullcount]
    cols: dict[str, list] = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            st = col.statistics
            has_mm = st is not None and st.has_min_max
            has_nc = st is not None and st.has_null_count
            ent = cols.setdefault(col.path_in_schema, [None, None, 0, True, True])
            ent[3] = ent[3] and has_mm
            ent[4] = ent[4] and has_nc
            if has_mm:
                ent[0] = _merge_min(ent[0], st.min)
                ent[1] = _merge_max(ent[1], st.max)
            if has_nc:
                ent[2] += st.null_count
    return md.num_rows, {
        name: (
            ent[0] if ent[3] else None,
            ent[1] if ent[3] else None,
            ent[2] if ent[4] else None,
        )
        for name, ent in cols.items()
    }


def _kv(path: str):
    return path, file_footer_stats(path)


def footer_stats(
    paths: Iterable[str],
    spark=None,
    distributed_threshold: int = 256,
) -> dict[str, tuple[int, dict[str, tuple]]]:
    """``{path: file_footer_stats(path)}`` for every path.  Small batches
    read on the driver (sub-ms per local footer); past
    ``distributed_threshold`` the reads fan out as a Spark job over the
    path list so a huge commit's stats collection is executor-parallel
    metadata I/O, never a driver loop."""
    plist = list(paths)
    if spark is not None and len(plist) > distributed_threshold:
        sc = spark.sparkContext
        n_slices = max(1, min(len(plist) // 32, sc.defaultParallelism * 4))
        return dict(sc.parallelize(plist, n_slices).map(_kv).collect())
    return {p: file_footer_stats(p) for p in plist}
