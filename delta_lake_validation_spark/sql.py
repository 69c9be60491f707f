"""SQL entry point (EP1 parity, SURVEY.md §3).

The reference drives most of its surface through ``spark.sql`` strings; our
engine exposes the same entry point by registering the star schema as temp
views so any ANSI query runs verbatim through Catalyst.  ``run_sql`` is the
engine's EP1: view registration + parse + analyze + optimize + execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_validation_spark.tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every test table as a temp view named after the table."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
