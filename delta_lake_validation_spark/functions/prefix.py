"""Distributed prefix sums and ranks (the two-pass cumsum recipe).

A running sum / row_number over ``Window.partitionBy(low_card_key)
.orderBy(...)`` funnels every row of a hot key into ONE sort task — with a
handful of sources or languages that is a constant fraction of the corpus
per task, and at 100 TB the stage never finishes.  The scale-safe form with
identical semantics is the classic two-pass prefix:

1. **Range-partition** the rows by (partition keys, order keys) into P
   balanced partitions — every partition holds a contiguous slice of the
   global order, ~n/P rows regardless of key skew.
2. **Local pass**: inclusive running sum within (range partition, key)
   — each window partition is bounded by the range-partition size, never
   by a key's row count.
3. **Offsets**: per-(range partition, key) totals are a tiny table
   (P x |keys| rows, independent of corpus size); the exclusive running
   sum over it by partition id gives each slice's starting offset.
4. **Add**: broadcast-join the offsets back and add — global prefix sum.

Results are bit-identical to the single-window form whenever the order
keys are a total order within each partition key (ties never straddle a
range boundary ambiguously because there are no ties).  Used by
sequence_pack / chars_decile / zipf_fit (plans/llm.py) — the VERDICT r6
skew findings 3-5.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

#: internal column names (dropped before returning)
_PID, _MEASURE, _LOCAL, _TOTAL, _OFFSET = (
    "__pid",
    "__prefix_m",
    "__prefix_local",
    "__prefix_tot",
    "__prefix_off",
)


def distributed_prefix_sums(
    df: DataFrame,
    measures: dict[str, Column],
    order_by: Sequence,
    partition_by: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Add one inclusive running sum column per ``measures`` entry
    (out_name -> measure expression) over the rows of each ``partition_by``
    group in ``order_by`` order — the two-pass recipe above, never a
    corpus-sized window partition.  N measures share ONE range shuffle, ONE
    local window pass, and ONE offset broadcast (vocab_growth needs
    cum_tokens + cum_types; two chained single-measure calls would double
    every stage).

    ``order_by`` must be a total order within each group (include a unique
    tiebreaker column); ``partition_by`` entries must be column NAMES (they
    key the offset join).  Plans carry two data shuffles (range + local
    window hash) plus a broadcast of the P x |keys| offset table; every
    window spec is keyed by the range-partition id (plan-audited).

    The sliced frame is persisted for cross-branch slice consistency (see
    the comment below); Spark's SQL cache holds it until clearCache() or
    session end, so long-lived sessions running many prefix queries should
    clear the cache between them (bench.py already does).
    """
    pby = list(partition_by)
    outs = list(measures)
    m_cols = {o: f"{_MEASURE}_{i}" for i, o in enumerate(outs)}
    l_cols = {o: f"{_LOCAL}_{i}" for i, o in enumerate(outs)}
    t_cols = {o: f"{_TOTAL}_{i}" for i, o in enumerate(outs)}
    o_cols = {o: f"{_OFFSET}_{i}" for i, o in enumerate(outs)}
    internal = (
        {_PID}
        | set(m_cols.values())
        | set(l_cols.values())
        | set(t_cols.values())
        | set(o_cols.values())
    )
    reserved = (internal | set(outs)) & set(df.columns)
    if reserved:
        raise ValueError(
            f"distributed_prefix_sums: input already has column(s) "
            f"{sorted(reserved)} that the helper reserves"
        )
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    keyed = df
    for o in outs:
        keyed = keyed.withColumn(m_cols[o], measures[o])
    keyed = keyed.repartitionByRange(num_partitions, *pby, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    # The slice id MUST be materialized once: Spark's range partitioner
    # SAMPLES its boundaries with seeds derived from the RDD instance, so
    # the local-pass branch and the totals/offsets branch — two subtrees of
    # one plan — can re-evaluate the shuffle with DIFFERENT boundaries
    # (exchange reuse is not guaranteed across a broadcast side), skewing
    # every offset.  Persisting pins one slice assignment for all branches;
    # a recompute after eviction replays the SAME RDD lineage (same seeds,
    # same boundaries), so consistency survives executor loss.  The
    # persisted frame is the caller's slim projection, not the corpus.
    keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    w_local = (
        Window.partitionBy(_PID, *pby)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed
    for o in outs:
        local = local.withColumn(l_cols[o], F.sum(m_cols[o]).over(w_local))
    totals = keyed.groupBy(_PID, *pby).agg(
        *[F.sum(m_cols[o]).alias(t_cols[o]) for o in outs]
    )
    # exclusive prefix over the tiny totals table: P rows per group, so the
    # single-task window here is bounded by the partition COUNT, not rows.
    # With no partition_by the spec gets a constant key — same single
    # bounded partition, but Spark's "No Partition Defined for Window"
    # warning (which flags genuinely corpus-sized global windows) stays
    # meaningful in logs instead of firing on this bounded table.  The key
    # must be NON-FOLDABLE (pmod of the pid, always 0) — a literal is
    # stripped by Catalyst's EliminateWindowPartitions and the warning
    # returns.
    w_off = (
        Window.partitionBy(
            *(pby if pby else [F.pmod(F.col(_PID), F.lit(1))])
        )
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID,
        *pby,
        *[
            F.coalesce(F.sum(t_cols[o]).over(w_off), F.lit(0)).alias(o_cols[o])
            for o in outs
        ],
    )
    res = local.join(F.broadcast(offsets), [_PID, *pby])
    for o in outs:
        res = res.withColumn(o, F.col(l_cols[o]) + F.col(o_cols[o]))
    return res.drop(
        _PID,
        *[m_cols[o] for o in outs],
        *[l_cols[o] for o in outs],
        *[o_cols[o] for o in outs],
    )


def distributed_prefix_sum(
    df: DataFrame,
    measure: Column,
    order_by: Sequence,
    partition_by: Sequence[str] = (),
    out: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Single-measure form of ``distributed_prefix_sums`` (see above)."""
    return distributed_prefix_sums(
        df,
        {out: measure},
        order_by=order_by,
        partition_by=partition_by,
        num_partitions=num_partitions,
    )


def distributed_rank(
    df: DataFrame,
    order_by: Sequence,
    partition_by: Sequence[str] = (),
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out`` = row_number() over (PARTITION BY partition_by ORDER BY
    order_by) — a prefix sum of 1 — without a global/hot-key sort task.
    ``order_by`` must be a total order (unique tiebreaker)."""
    return distributed_prefix_sum(
        df,
        F.lit(1).cast("long"),
        order_by=order_by,
        partition_by=partition_by,
        out=out,
        num_partitions=num_partitions,
    )
