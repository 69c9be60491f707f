"""Table registry over the parquet test star schema.

Reference parity: ``read_parquet_data`` (src/benchmarking_suite.py:40-44) and
``read_parquet_file`` (src/validation_suite.py:407-413) — a thin, lazy parquet
source.  ``spark.read.parquet`` keeps column pruning + predicate pushdown
intact (verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The engine's contract for events.ts is LONG epoch-NANOS: every downstream
# time query does exact integer arithmetic on nanos (`ts div …`), which is the
# deterministic choice for an oracle comparison (DuckDB mirrors it with
# epoch_ns).  The physical parquet type has varied across testdata
# generations (INT64 TIMESTAMP(NANOS) — which Spark's vectorized reader
# rejects during footer inference with [PARQUET_TYPE_ILLEGAL] — and
# TIMESTAMP(MICROS)).  Reading with an explicit LONG schema sidesteps
# inference and yields the raw INT64 in the file's unit; _events_ts_scale
# sniffs the footer once (driver-side, one file) and normalizes to nanos.
EVENTS_SCHEMA = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
)

_TS_SCALE_BY_UNIT = {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000}
_ts_scale_cache: dict[str, int] = {}


def _events_ts_scale(path: str, spark: SparkSession | None = None) -> int:
    """Multiplier that converts the file's raw INT64 ts to epoch-nanos.

    Memoized per path.  Sniff order: pyarrow footer read (local paths), then
    Spark's own schema inference (works on any Hadoop-visible filesystem):
    TIMESTAMP(NANOS) makes inference throw PARQUET_TYPE_ILLEGAL (⇒ the raw
    INT64 already is nanos), MICROS infers TimestampType, a plain LONG needs
    no scaling.  If every probe fails the error propagates — a silent guess
    here would reintroduce the silent-1000×-off failure this exists to stop.
    """
    if path in _ts_scale_cache:
        return _ts_scale_cache[path]
    scale: int | None = None
    try:
        import pyarrow.parquet as pq

        typ = pq.read_schema(path).field("ts").type
        scale = _TS_SCALE_BY_UNIT.get(getattr(typ, "unit", None), 1)
    except Exception:
        if spark is None:
            raise
        try:
            inferred = spark.read.parquet(path).schema["ts"].dataType
            if inferred.typeName() in ("timestamp", "timestamp_ntz"):
                # Spark infers TimestampType for BOTH TIMESTAMP(MICROS) and
                # TIMESTAMP(MILLIS) parquet — assuming micros here would be
                # the silent-1000×-off failure this function exists to stop.
                # Disambiguate from the raw stored INT64's magnitude: epoch
                # values for any plausible event date (1973…2200) differ by
                # unit in non-overlapping bands (millis ~1e11-8e12,
                # micros ~1e14-8e15, nanos ~1e17+).
                row = (
                    spark.read.schema("ts LONG")
                    .parquet(path)
                    .agg({"ts": "max"})
                    .collect()
                )
                raw = row[0][0]
                if raw is None:
                    scale = 1_000  # empty file: unit is moot, pick micros
                elif raw >= 10**16:
                    scale = 1  # already nanos
                elif raw >= 10**13:
                    scale = 1_000  # micros
                elif raw >= 10**10:
                    scale = 1_000_000  # millis
                else:
                    raise ValueError(
                        f"events.ts raw INT64 magnitude {raw} is outside every "
                        "known epoch-unit band; refusing to guess a scale"
                    )
            elif inferred.typeName() == "long":
                scale = 1
            else:
                raise KeyError(inferred.typeName())
        except KeyError:
            raise
        except ValueError:
            raise
        except Exception as e:
            if "PARQUET_TYPE_ILLEGAL" in str(e) or "INT64 (TIMESTAMP(NANOS" in str(e):
                scale = 1  # NANOS: raw INT64 is already epoch-nanos
            else:
                raise
    _ts_scale_cache[path] = scale
    return scale


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet source (ref: src/benchmarking_suite.py:40-44)."""
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.schema(EVENTS_SCHEMA).parquet(path)
        scale = _events_ts_scale(path, spark)
        if scale != 1:
            from pyspark.sql import functions as F

            df = df.withColumn("ts", (F.col("ts") * F.lit(scale)).cast("long"))
        return df
    return spark.read.parquet(path)


class Tables:
    """Attribute-style access: ``Tables(spark, sf_dir).lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source.  ``schema`` is required: schema inference costs a full
    extra pass over the data — never acceptable at scale — and pins column
    types explicitly so downstream arithmetic is deterministic.  Malformed
    rows land in ``_corrupt_record`` when the schema declares it, else the
    permissive default nulls them (audit with ``fk_integrity_audit``-style
    checks rather than failing mid-scan)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with a required explicit schema (same scale
    rationale as ``read_csv``; inference on JSON additionally widens
    numeric types unpredictably)."""
    return spark.read.schema(schema).json(path)


def read_delta(
    spark: SparkSession,
    location: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """Read a real Delta Lake table (``_delta_log`` protocol) — interop with
    tables the reference creates via ``CREATE TABLE ... USING DELTA``
    (ref src/validation_suite.py:268-286).  See sources/delta_log.py."""
    from delta_lake_validation_spark.sources.delta_log import read_delta as _rd

    return _rd(spark, location, version=version, timestamp=timestamp)


def write_delta(
    spark: SparkSession,
    df: DataFrame,
    location: str,
    mode: str = "append",
) -> int:
    """Write into a real Delta Lake table (``_delta_log`` protocol): stage
    hive-laid parquet and commit add (+ remove for overwrite) actions, with
    writer-feature gating (unenforceable invariants/constraints/generated
    columns refuse loudly).  Returns the committed Delta version.  The
    outbound half of interop — see sources/delta_log.py DeltaTable.append/
    overwrite."""
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    t = DeltaTable(spark, location)
    if mode == "append":
        return t.append(df)
    if mode == "overwrite":
        return t.overwrite(df)
    raise ValueError(f"mode must be append|overwrite, got {mode!r}")


def delete_delta(spark: SparkSession, location: str, predicate: str) -> int:
    """Row-level DELETE on a real Delta table (DV-masked when the table has
    deletionVectors enabled, copy-on-write otherwise; cdc files when CDF is
    on).  Returns the committed Delta version."""
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    return DeltaTable(spark, location).delete(predicate)


def update_delta(
    spark: SparkSession,
    location: str,
    assignments: dict[str, str],
    predicate: str,
) -> int:
    """Row-level UPDATE on a real Delta table (same write strategies as
    :func:`delete_delta`).  Returns the committed Delta version."""
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    return DeltaTable(spark, location).update(assignments, predicate)


def merge_delta(
    spark: SparkSession,
    source: DataFrame,
    location: str,
    keys: list[str],
) -> int:
    """MERGE upsert into a real Delta table (WHEN MATCHED UPDATE all /
    WHEN NOT MATCHED INSERT all, ref src/validation_suite.py:489-524
    semantics).  Returns the committed Delta version."""
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    return DeltaTable(spark, location).merge_upsert(source, keys)
