"""Deployment configuration profiles — the knobs that change with scale.

The operators in this engine are written so the same plans run from
local[32] tests to a 1000-executor cluster; what changes is configuration.
``PROFILES`` captures the three tiers we design for, and
``configure(builder, profile)`` applies one to a SparkSession builder.

Why each knob matters at 100 TB:

- ``spark.sql.shuffle.partitions``: static floor for shuffle width.  With
  AQE coalescing enabled, set it high (4–8× total cores) and let runtime
  statistics shrink it — undersized partitions spill, oversized ones leave
  cores idle.
- ``spark.sql.adaptive.*``: runtime re-planning.  Skew-join splitting is
  the difference between a 10-minute and 10-hour stage on hot keys;
  coalescing keeps reducers at target size as selectivity varies.
- ``spark.sql.autoBroadcastJoinThreshold``: every star join in plans/
  broadcasts its dimension side; at cluster scale dimensions are bigger, so
  the threshold rises with executor memory.
- ``spark.sql.files.maxPartitionBytes``: scan-side parallelism.  At 100 TB
  the default 128 MB yields ~800k tasks — raise it so task count stays in
  the low tens of thousands.
- ``delta-style table layout`` (sources/acid): target file size governs
  file-count pressure; OPTIMIZE cadence + Z-order columns are workload
  choices, and the log checkpoint interval bounds snapshot replay.
- ``spark.sql.execution.arrow.maxRecordsPerBatch``: multimodal payload
  columns are MBs per row — shrink batches so Arrow transfer stays within
  executor memory (operators/multimodal.py).
"""

from __future__ import annotations

PROFILES: dict[str, dict[str, str]] = {
    # local[32] functional testing (the default session factory values)
    "local": {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    },
    # ~10-node / ~1 TB working set
    "cluster-small": {
        "spark.sql.shuffle.partitions": "2000",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
    },
    # ~1000-executor / 100 TB scans
    "cluster-100tb": {
        "spark.sql.shuffle.partitions": "32000",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(512 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "500",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.shuffle.service.enabled": "true",
    },
}


def configure(builder, profile: str = "local"):
    for k, v in PROFILES[profile].items():
        builder = builder.config(k, v)
    return builder
