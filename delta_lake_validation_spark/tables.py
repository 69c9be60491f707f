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

# events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects during footer inference ([PARQUET_TYPE_ILLEGAL]).  Reading
# with an explicit schema that types ts as LONG (epoch nanos) sidesteps
# inference in any session, with no legacy conf needed; time queries do exact
# integer arithmetic on nanos (`ts div …`), which is also the deterministic
# choice for an oracle comparison.
EVENTS_SCHEMA = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet source (ref: src/benchmarking_suite.py:40-44)."""
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return spark.read.schema(EVENTS_SCHEMA).parquet(path)
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
