"""Incrementally-maintained aggregate views over an ACID table's CDF.

The lakehouse materialized-view pattern: instead of recomputing
``SELECT group_cols, sum(x), count(*)`` over the whole fact table on every
refresh, apply only the rows that changed since the last refresh — read the
Change Data Feed, weight each change row (+1 for insert/update_postimage,
−1 for delete/update_preimage), aggregate the deltas, and combine them with
the stored view state.  At 100 TB a refresh then costs O(changed rows), not
O(table), which is the entire point of keeping a CDF.

Engine extension — the reference consumes CDF only as a batch validation
query (src/validation_suite.py:480-486); this turns it into the incremental
pipeline primitive CDF exists for.

Correctness model:
- SUM/COUNT are self-inverting under signed deltas, so the view equals the
  full recompute exactly for integral values (tested) and up to float
  associativity for doubles.
- Commits whose row-level changes the CDF cannot fully represent
  (OVERWRITE replaces rows it never emits as deletes; RESTORE re-references
  old files) force a FULL recompute of the view — detected from the log, so
  ``refresh()`` is always correct, just not always incremental (the same
  contract Delta Live Tables applies to non-append changes it can't map).
- Exactly-once: the source version the view reflects rides in the
  operationParameters of the SAME overwrite commit that writes the
  refreshed rows (the acid_sink idempotence pattern), so a crashed refresh
  either fully happened or fully didn't — it can never double-apply deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import logging

from pyspark.errors import AnalysisException

from delta_lake_validation_spark.sources.acid import (
    AcidTable,
    ConcurrentWriteException,
    TableNotFoundError,
)
from delta_lake_validation_spark.sources.acid.table import CDF_TYPE

_log = logging.getLogger(__name__)

_LAST_VERSION_PROP = "view.sourceVersion"
# commit operations whose CDF fully describes the row-level change
_INCREMENTAL_OPS = {
    "APPEND",
    "DELETE",
    "UPDATE",
    "MERGE",
    "OPTIMIZE",  # dataChange=false: no CDF rows, nothing to apply
    "SET TBLPROPERTIES",
    "ADD COLUMN",
    "ADD CONSTRAINT",
    "DROP CONSTRAINT",
}


class IncrementalAggView:
    """``SELECT group_cols…, sum(value_col) AS sum_value, count(*) AS n_rows``
    maintained incrementally from the source table's CDF."""

    def __init__(
        self,
        spark: SparkSession,
        source: AcidTable,
        location: str,
        group_cols: list[str],
        value_col: str,
    ):
        self.spark = spark
        self.source = source
        self.location = location
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.view = self._ensure_view()

    # ------------------------------------------------------------- helpers
    def _view_schema(self) -> str:
        # derive sum_value's type from what Spark's SUM actually returns
        # (sum(INT) is LONG, sum(DECIMAL(p,s)) widens precision) — declaring
        # the source column's type would silently downcast-wrap on overflow
        src = self.source.schema()
        agg_schema = self._full_aggregate(
            self.spark.createDataFrame([], src)
        ).schema
        fields = {f.name: f.dataType.simpleString() for f in agg_schema.fields}
        cols = [f"{c} {fields[c]}" for c in self.group_cols]
        cols.append(f"sum_value {fields['sum_value']}")
        cols.append("n_rows LONG")
        return ", ".join(cols)

    def _ensure_view(self) -> AcidTable:
        try:
            t = AcidTable(self.spark, self.location)
            t.log.snapshot()
            return t
        except TableNotFoundError:
            # only "no table here yet" — transient IO / corrupt-log errors
            # must propagate, not get masked by a create() attempt
            return AcidTable.create(self.spark, self.location, self._view_schema())

    def _full_aggregate(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_cols).agg(
            F.sum(self.value_col).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    def last_source_version(self) -> int:
        # every refresh commit carries the watermark, so walk back from the
        # newest commit and stop at the first one that has it — O(1) per
        # refresh instead of re-reading the whole view log every time
        latest = self.view.log.snapshot().version
        for v in range(latest, -1, -1):
            entry = self.view.log.read_entry(v)
            params = entry.get("operationParameters", {})
            if _LAST_VERSION_PROP in params:
                return int(params[_LAST_VERSION_PROP])
        return -1

    def read(self) -> DataFrame:
        return self.view.read()

    # ------------------------------------------------------------- refresh
    def refresh(self) -> str:
        """Bring the view up to the source's current version.  Returns the
        strategy used: ``"noop"``, ``"incremental"`` or ``"full"``."""
        src_version = self.source.log.snapshot().version
        last = self.last_source_version()
        if src_version <= last:
            return "noop"
        if last >= 0 and self._cdf_covers(last + 1, src_version):
            try:
                new_state = self._incremental_state(last + 1, src_version)
                self._commit_state(new_state, src_version)
                return "incremental"
            except ConcurrentWriteException:
                # a racing refresh won — surface it, the caller decides
                # whether to retry; recomputing here would just race again
                raise
            except Exception as e:
                # recoverable only when the incremental inputs are GONE
                # (vacuum reclaimed the files an unprocessed APPEND's
                # synthesized inserts point at) — fall back rather than
                # wedge.  Anything else (analysis bugs, schema drift) is a
                # defect that a silent full recompute would mask.
                msg = str(e)
                gone = isinstance(e, AnalysisException) or any(
                    s in msg
                    for s in ("FileNotFound", "PATH_NOT_FOUND", "does not exist")
                )
                if not gone:
                    raise
                _log.warning(
                    "incremental refresh failed (%s: %s); falling back to "
                    "full recompute",
                    type(e).__name__,
                    msg.splitlines()[0] if msg else "",
                )
        # first refresh, a commit the CDF can't represent row-wise, or a
        # failed incremental attempt: recompute AT THE WATERMARK VERSION so
        # a commit racing in after the src_version read is never baked into
        # state that claims an older watermark (it would then be re-applied)
        new_state = self._full_aggregate(self.source.read(version=src_version))
        self._commit_state(new_state, src_version)
        return "full"

    def _cdf_covers(self, start: int, end: int) -> bool:
        """True when every commit in [start, end] is row-representable from
        the CDF: known operation, and any commit that removed data stored
        its change files (a DELETE/UPDATE/MERGE from before CDF was enabled
        has none — only a full recompute sees those rows leave)."""
        for e in self.source.log.entries(start=start, end=end):
            if e["operation"] not in _INCREMENTAL_OPS:
                return False
            removes_data = any(
                r for r in e.get("remove", [])
            ) and e["operation"] not in ("OPTIMIZE",)
            if removes_data and not e.get("cdf"):
                return False
        return True

    def _commit_state(self, new_state: DataFrame, src_version: int) -> None:
        # state + watermark land in ONE atomic commit: a crashed refresh
        # either happened entirely or not at all
        self.view.overwrite(
            new_state.select(*self.group_cols, "sum_value", "n_rows"),
            operation_parameters={_LAST_VERSION_PROP: str(src_version)},
        )

    def _incremental_state(self, start: int, end: int) -> DataFrame:
        changes = self.source.read_changes(start, end)
        sign = F.when(
            F.col(CDF_TYPE).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            changes.withColumn("__w", sign)
            .groupBy(*self.group_cols)
            .agg(
                F.sum(F.col("__w") * F.col(self.value_col)).alias("d_sum"),
                F.sum(F.col("__w")).cast("long").alias("d_n"),
            )
        )
        cur = self.view.read().alias("v")
        # eqNullSafe: groupBy folds NULL keys into one group, a plain
        # column-list join would never match them and duplicate the row
        cond = None
        for c in self.group_cols:
            eq = F.col(f"v.{c}").eqNullSafe(F.col(f"d.{c}"))
            cond = eq if cond is None else (cond & eq)
        merged = cur.join(delta.alias("d"), cond, "full_outer").select(
            *[F.coalesce(F.col(f"v.{c}"), F.col(f"d.{c}")).alias(c) for c in self.group_cols],
            (
                F.coalesce(F.col("v.sum_value"), F.lit(0))
                + F.coalesce(F.col("d.d_sum"), F.lit(0))
            ).alias("sum_value"),
            (
                F.coalesce(F.col("v.n_rows"), F.lit(0))
                + F.coalesce(F.col("d.d_n"), F.lit(0))
            ).cast("long").alias("n_rows"),
        )
        # groups whose rows all disappeared leave the view entirely
        return merged.filter(F.col("n_rows") > 0)


def refresh_on_changes(view: IncrementalAggView, checkpoint: str):
    """Continuously refresh ``view`` as its source table commits: returns a
    started StreamingQuery driving ``view.refresh()`` once per micro-batch
    of the source's change stream.

    The stream is only a TRIGGER — refresh() reads the CDF itself from the
    view's own watermark, so duplicate or empty micro-batches are harmless
    (refresh is idempotent and exactly-once by construction), and a restart
    from the checkpoint can never double-apply deltas.
    """
    from delta_lake_validation_spark.streaming.cdf_stream import stream_table_changes

    changes = stream_table_changes(view.spark, view.source.location)

    def trigger(_df, _batch_id):
        view.refresh()

    return (
        changes.writeStream.foreachBatch(trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )
