"""SparkSession factories.

Reference parity: ``get_session`` (src/validation_suite.py:224-234) builds a
Delta-enabled session; ``get_spark_session`` (src/benchmarking_suite.py:21-22)
builds a plain one.  Our engine has no external table-format dependency — the
ACID layer (``sources.acid``) is self-contained — so one factory serves both
roles, with scale-oriented defaults:

- AQE on (runtime re-planning, skew-join splitting, dynamic coalescing) —
  at 100 TB this is what keeps post-shuffle partition sizes sane.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster AQE coalescing makes a high static value safe.
- Arrow enabled for any pandas interchange (vectorized, not row-pickled).
- Session timezone pinned to UTC so timestamp arithmetic is deterministic
  across driver environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "delta-lake-validation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults.

    On a cluster, pass ``master=None`` and let spark-submit decide; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{DEFAULT_CPUS}]"
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # parallelismFirst stays at its default (true): measured A/B at
        # sf0.1/local[32] (BENCH r3s4), size-based coalescing
        # (parallelismFirst=false, 64m advisory) cut ~2s off the tiny-stage
        # scenario queries but serialized the mid-size shuffles
        # (dedup_clusters/curation_pipeline +1.4s each) for a net 1.05x
        # regression.  On a real cluster shuffles dwarf the advisory size
        # and the flag is near-moot.
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_CPUS),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # let Python data sources (format('deltapy')) see pushed filters
        # for file-level pruning
        "spark.sql.python.filterPushdown.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local-mode niceties; harmless on a cluster
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        from delta_lake_validation_spark.sources.pydatasource import register

        register(spark)
    except Exception:
        # registration is a convenience; the session is still usable and
        # callers can register() explicitly
        pass
    try:
        from delta_lake_validation_spark.shipping import ensure_worker_imports

        ensure_worker_imports(spark)  # workers import the package by name
    except Exception:
        pass
    return spark
