"""Round-8 ADVICE + VERDICT hardening tests.

Covers: tie-safe partition-local top-k prune (ADVICE r7 medium), the
bounded-query-set guard (VERDICT r7 task 4), deterministic space-saving
eviction (ADVICE r7 low), and compare_bench's queries-span extraction
(ADVICE r7 low).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from delta_lake_validation_spark.operators.similarity import (
    QuerySetTooLargeError,
    _prune_topk,
    cosine_topk,
    quantized_topk,
)


def test_prune_topk_keeps_smallest_ids_on_ties():
    ids = np.array([10, 2, 5, 7], dtype=np.int64)
    sims = np.array([1.0, 1.0, 1.0, 0.5])
    out_ids, out_sims = _prune_topk(ids, sims, 2)
    assert list(out_ids) == [2, 5]
    assert list(out_sims) == [1.0, 1.0]


def test_prune_topk_under_k_passthrough_sorted():
    ids = np.array([9, 3], dtype=np.int64)
    sims = np.array([0.1, 0.9])
    out_ids, out_sims = _prune_topk(ids, sims, 10)
    assert list(out_ids) == [3, 9]
    assert list(out_sims) == [0.9, 0.1]


def _tied_base(spark, n=40, parts=8):
    # n identical vectors -> every candidate ties at the same (quantized
    # or cosine) score; the global tie-break must yield ids 1..k
    rows = [(i, [0.5, 0.25, -0.5, 0.125]) for i in range(1, n + 1)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def _one_query(spark):
    return spark.createDataFrame(
        [(999, [0.5, 0.25, -0.5, 0.125])], "query_id long, qe array<double>"
    )


@pytest.mark.parametrize("parts", [1, 8])
def test_quantized_topk_tie_break_partition_invariant(spark, parts):
    base = _tied_base(spark, parts=parts)
    out = quantized_topk(spark, base, _one_query(spark), k=5).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)] == [
        1, 2, 3, 4, 5,
    ]
    assert len({r.score_q for r in out}) == 1  # all tied by construction


@pytest.mark.parametrize("parts", [1, 8])
def test_cosine_topk_tie_break_partition_invariant(spark, parts):
    base = _tied_base(spark, parts=parts)
    out = cosine_topk(spark, base, _one_query(spark), k=5).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)] == [
        1, 2, 3, 4, 5,
    ]


def test_bounded_query_set_guard(spark):
    base = _tied_base(spark)
    queries = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)],
        "query_id long, qe array<double>",
    )
    with pytest.raises(QuerySetTooLargeError, match="bounded-query-set"):
        cosine_topk(spark, base, queries, k=2, max_queries=3)
    with pytest.raises(QuerySetTooLargeError):
        quantized_topk(spark, base, queries, k=2, max_queries=3)
    # happy path right AT the cap
    out = cosine_topk(spark, base, queries, k=2, max_queries=5)
    assert out.count() == 10


def test_bounded_guard_on_ann_paths(spark):
    from delta_lake_validation_spark.operators.similarity import (
        ivf_kmeans_topk,
        lsh_ann_topk,
    )

    base = _tied_base(spark)
    queries = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)],
        "query_id long, qe array<double>",
    )
    with pytest.raises(QuerySetTooLargeError):
        lsh_ann_topk(spark, base, queries, k=2, dim=4, max_queries=3)
    with pytest.raises(QuerySetTooLargeError):
        ivf_kmeans_topk(spark, base, queries, k=2, n_cells=2, max_queries=3)


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the update fn."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_space_saving_eviction_deterministic_under_row_order():
    from delta_lake_validation_spark.streaming.heavy_hitters import (
        _space_saving_update,
    )

    update = _space_saving_update(capacity=3)
    toks = ["a"] * 3 + ["b"] * 3 + ["c", "d", "e"]  # c/d/e tie at 1
    results = []
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(toks))
        pdf = pd.DataFrame({"tok": [toks[i] for i in order]})
        state = _FakeState()
        out = list(update((0,), iter([pdf]), state))
        results.append(sorted(out[0]["tok"]))
    assert results[0] == results[1] == results[2]
    # a and b always survive (true heavy hitters); the tied singleton slot
    # resolves deterministically
    assert "a" in results[0] and "b" in results[0]


def test_compare_bench_ignores_non_query_numeric_keys():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from compare_bench import _queries_of

    # full line shape
    doc = {
        "tail": '{"metric": "t", "value": 12.5, "queries": {"q1": 1.5, '
        '"q2": 2.0}, "sf": 0.1, "n_queries": 2, "calibration_sec": 0.15}'
    }
    assert _queries_of(doc) == {"q1": 1.5, "q2": 2.0}
    # truncated mid-queries (the driver keeps only the END of the line)
    doc2 = {
        "tail": '2": 2.0, "q3": 3.25}, "sf": 0.1, "n_queries": 3, '
        '"calibration_sec": 0.15}'
    }
    q2 = _queries_of(doc2)
    assert q2["q3"] == 3.25 and "n_queries" not in q2 and "sf" not in q2


def test_distributed_prefix_sums_multi_measure_equals_window(spark):
    """The r8 multi-measure form must match the single global window for
    BOTH measures simultaneously (one shared range shuffle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from delta_lake_validation_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).alias("a"),
        (F.col("id") % 3).alias("b"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: (r.ca, r.cb)
        for r in df.select(
            "k",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    got = {
        r.k: (r.ca, r.cb)
        for r in distributed_prefix_sums(
            df,
            {"ca": F.col("a"), "cb": F.col("b")},
            order_by=[F.asc("k")],
            num_partitions=8,
        ).collect()
    }
    assert got == want
