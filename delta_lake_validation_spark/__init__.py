"""delta_lake_validation_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``project-n-oss/delta-lake-validation`` (see SURVEY.md):

- ``session``     — SparkSession factories (ref: src/validation_suite.py:224-234)
- ``tables``      — parquet table registry over the test star schema
- ``plans``       — the analytic query inventory (SURVEY.md §2.2-2.7) with
                    DuckDB oracle SQL for every SQL-expressible query
- ``sources``     — parquet IO + the ``acid`` transaction-log table format
                    (Delta-like semantics rebuilt Spark-first: append/overwrite,
                    DELETE/UPDATE/MERGE, time travel, CDF, vacuum, optimize)
- ``functions``   — deterministic exact aggregation, hashing, text & vector fns
- ``operators``   — dedup / similarity / text-analysis / multimodal operators
- ``streaming``   — structured-streaming surface (CDF as a stream, windowed aggs)

Everything is DataFrame/SQL-first: logical plans are declared via the PySpark
DataFrame API and optimized by Catalyst; Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (and then as Arrow-batched
pandas UDFs).
"""

__version__ = "0.1.0"
