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
        # coalesce post-shuffle partitions by SIZE, not up to the cluster's
        # default parallelism: multi-stage pipelines over small/medium
        # frames (every ACID micro-batch commit, dimension shuffles) stop
        # paying 32-task scheduling per tiny stage, while big shuffles
        # still fan out because the advisory size governs (Spark's own
        # guidance for small-query overhead)
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_CPUS),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local-mode niceties; harmless on a cluster
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
