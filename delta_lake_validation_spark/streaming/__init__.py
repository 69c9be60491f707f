"""Structured-streaming surface.

The reference has zero streaming (SURVEY.md §2.10) — its only change-capture
facility is batch CDF.  This module supplies the streaming layer a
lakehouse engine is expected to have: windowed aggregations with watermarks,
session windows, streaming dedup, and streaming reads of ACID-table appends.
"""

from delta_lake_validation_spark.streaming.windowed import (  # noqa: F401
    dedup_stream,
    interval_join_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from delta_lake_validation_spark.streaming.acid_stream import stream_appends  # noqa: F401
from delta_lake_validation_spark.streaming.stateful import running_user_totals  # noqa: F401
from delta_lake_validation_spark.streaming.heavy_hitters import (  # noqa: F401
    streaming_heavy_hitters,
)
from delta_lake_validation_spark.streaming.cdf_stream import (  # noqa: F401
    CommittedChangeFeed,
    DeltaCommittedChangeFeed,
    stream_changes,
    stream_table_changes,
)
from delta_lake_validation_spark.streaming.acid_sink import acid_sink  # noqa: F401
