"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query on sf0.001;
``queries()`` / ``oracle_sql()`` are generated from the engine's query
registry (delta_lake_validation_spark.plans) — one entry per implemented
operator from SURVEY.md §2, each aliased identically to its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable no matter where the driver runs us from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from delta_lake_validation_spark.plans import all_oracles, all_queries  # noqa: E402
from delta_lake_validation_spark.shipping import ensure_worker_imports  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_lake_validation_spark.plans.relational import pricing_summary

    ensure_worker_imports(spark)  # bare sessions from any cwd
    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # workers import the package by name (Arrow UDFs, Python Data
            # Source); ship it once so a driver running from ANY cwd works
            ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
