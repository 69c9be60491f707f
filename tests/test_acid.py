"""Scenario ports of the reference validation suite (12 tests,
src/validation_suite.py:543-925) against our ACID table layer — with
programmatic asserts instead of the reference's print-and-eyeball oracle
(SURVEY.md §5: the original has exactly one assert).

Table fixture mirrors the reference's orders schema
(src/validation_suite.py:150-157): order_id STRING, item_count INT,
cost DOUBLE, order_time TIMESTAMP, order_date DATE; partitioned by
order_date; CDF enabled (``:268-286``).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark import InheritableThread
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_validation_spark.sources.acid import (
    AcidTable,
    ConcurrentWriteException,
)

SCHEMA = (
    "order_id STRING, item_count INT, cost DOUBLE, "
    "order_time TIMESTAMP, order_date DATE"
)


def _rows(n, date, start=0):
    return [
        Row(
            order_id=f"order_{start + i}",
            item_count=(start + i) % 5 + 1,
            cost=round(0.37 * (start + i + 1), 2),
            order_time=dt.datetime(2024, 1, date.day, 10, i % 60),
            order_date=date,
        )
        for i in range(n)
    ]


D1 = dt.date(2024, 1, 10)
D2 = dt.date(2024, 1, 11)
D3 = dt.date(2024, 1, 12)


@pytest.fixture()
def table(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "orders")
    t = AcidTable.create(
        spark,
        loc,
        SCHEMA,
        partition_by=["order_date"],
        properties={"enableChangeDataFeed": "true"},
    )
    return t


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


# ---- test_1: append + snapshot read (validation_suite.py:545-558) ----------
def test_append_and_read(spark, table):
    table.append(_df(spark, _rows(2, D1)))
    got = table.read()
    assert got.count() == 2
    assert {r.order_id for r in got.collect()} == {"order_0", "order_1"}
    # partition column round-trips through hive layout
    assert got.select("order_date").distinct().collect()[0][0] == D1


# ---- tests_2-4: history + time travel (validation_suite.py:561-645) --------
def test_time_travel_by_version_and_timestamp(spark, table):
    v1 = table.append(_df(spark, _rows(2, D1)))
    v2 = table.append(_df(spark, _rows(3, D2, start=2)))
    assert table.read(version=v1).count() == 2
    assert table.read(version=v2).count() == 5
    assert table.read().count() == 5
    hist = table.history()
    assert [h["version"] for h in hist] == [v2, v1, 0]
    assert hist[-1]["operation"] == "CREATE"
    # timestamp travel: reference picks timestamps out of history (:579-581)
    ts_v1 = next(h["timestamp"] for h in hist if h["version"] == v1)
    assert table.read(timestamp=ts_v1).count() == 2


# ---- test_5: merge upsert (validation_suite.py:648-676; updates win) -------
def test_merge_upsert(spark, table):
    table.append(_df(spark, _rows(4, D1)))
    updates = [
        Row(
            order_id="order_1",
            item_count=99,
            cost=1.0,
            order_time=dt.datetime(2024, 1, 10, 12, 0),
            order_date=D1,
        ),
        Row(
            order_id="order_new",
            item_count=7,
            cost=2.0,
            order_time=dt.datetime(2024, 1, 11, 12, 0),
            order_date=D2,
        ),
    ]
    table.merge(_df(spark, updates), keys=["order_id"])
    got = {r.order_id: r for r in table.read().collect()}
    assert len(got) == 5  # 4 original, 1 updated in place, 1 inserted
    assert got["order_1"].item_count == 99  # matched -> update wins
    assert got["order_new"].item_count == 7  # not matched -> insert
    assert got["order_0"].item_count == 1  # untouched row intact


# ---- test_6: overwrite (validation_suite.py:679-707) -----------------------
def test_overwrite_replaces_all(spark, table):
    table.append(_df(spark, _rows(4, D1)))
    table.overwrite(_df(spark, _rows(2, D2, start=10)))
    got = table.read()
    assert got.count() == 2
    assert {r.order_id for r in got.collect()} == {"order_10", "order_11"}
    # old version still readable (time travel across overwrite)
    assert table.read(version=1).count() == 4


# ---- test_7: append accumulates (validation_suite.py:710-745) --------------
def test_multi_partition_append_delete(spark, table):
    table.append(_df(spark, _rows(2, D1)))
    table.append(_df(spark, _rows(2, D2, start=2)))
    table.append(_df(spark, _rows(2, D3, start=4)))
    assert table.read().count() == 6
    # DELETE with partition predicate (:738-740) — metadata-only fast path
    v = table.delete(F.col("order_date") == F.lit(D2))
    entry = table.log.read_entry(v)
    assert entry["operationParameters"].get("pruned") is True
    assert entry["add"] == []  # no rewrite happened
    assert table.read().count() == 4
    assert table.read().filter(F.col("order_date") == D2).count() == 0


# ---- test_8: update with arithmetic predicate (validation_suite.py:748-772) -
def test_update_mod_predicate(spark, table):
    table.append(_df(spark, _rows(4, D1)))
    table.update({"item_count": "0"}, "MOD(item_count, 2) = 0")
    got = table.read().collect()
    assert all(r.item_count % 2 == 1 or r.item_count == 0 for r in got)
    assert sum(1 for r in got if r.item_count == 0) == 2


# ---- test_9: vacuum physical reclaim (validation_suite.py:775-832) ---------
def test_delete_then_vacuum_removes_files(spark, table, tmp_path):
    table.append(_df(spark, _rows(2, D1)))
    table.append(_df(spark, _rows(2, D2, start=2)))
    part_dir = os.path.join(table.location, f"order_date={D2.isoformat()}")
    assert len([f for f in os.listdir(part_dir) if f.endswith(".parquet")]) > 0
    table.delete(f"order_date = date'{D2.isoformat()}'")
    # logically gone but physically present (time travel still works)
    assert table.read().count() == 2
    deleted = table.vacuum(retain_hours=0)
    assert any(f"order_date={D2.isoformat()}" in p for p in deleted)
    remaining = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert remaining == []  # ref expects 0 files in partition dir (:822-832)
    # vacuumed versions are no longer readable
    with pytest.raises(Exception):
        table.read(version=2).collect()


# ---- test_10: optimize compaction (validation_suite.py:835-880) ------------
def test_optimize_compacts_files(spark, table):
    for i in range(4):
        table.append(_df(spark, _rows(1, D1, start=i)))
    before = table.detail()
    assert before["numFiles"] >= 4
    rows_before = sorted(r.order_id for r in table.read().collect())
    table.optimize(zorder_by=["order_id"])
    after = table.detail()
    assert after["numFiles"] == 1
    assert sorted(r.order_id for r in table.read().collect()) == rows_before
    # file-set difference, as the reference checks (:867-879)
    old_files = {a["path"] for a in table.log.read_entry(1)["add"]}
    new_files = set(table.snapshot().files)
    assert old_files.isdisjoint(new_files)


# ---- tests_11-12: concurrent writers (validation_suite.py:883-925) ---------
def test_concurrent_append_vs_overwrite(spark, table):
    """Two racing writers: blind appends rebase+retry (always commit);
    an overwrite whose snapshot went stale must raise
    ConcurrentWriteException (docstring :886-890 expects a conflict)."""
    table.append(_df(spark, _rows(1, D1)))
    errors: list[Exception] = []
    results: list[int] = []

    def do_append():
        try:
            results.append(table.append(_df(spark, _rows(1, D1, start=50))))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def do_overwrite():
        try:
            results.append(table.overwrite(_df(spark, _rows(1, D2, start=90))))
        except ConcurrentWriteException as e:
            errors.append(e)

    threads = [InheritableThread(target=do_append), InheritableThread(target=do_overwrite)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # linearizability: every committed version is a distinct consecutive int
    vs = table.log.versions()
    assert vs == list(range(len(vs)))
    assert len(results) + len(errors) == 2
    # appends always win eventually; overwrite either won or conflicted
    if errors:
        assert isinstance(errors[0], ConcurrentWriteException)
    # table remains readable and consistent
    assert table.read().count() >= 1


def test_stale_overwrite_conflicts(spark, table):
    """Deterministic staleness: interleave a commit between another writer's
    snapshot and commit (the same window tests 11-12 race over)."""
    table.append(_df(spark, _rows(1, D1)))
    snap = table.log.snapshot()
    # someone else commits first
    table.append(_df(spark, _rows(1, D2, start=5)))
    with pytest.raises(ConcurrentWriteException):
        table._commit_strict(
            {"operation": "OVERWRITE", "add": [], "remove": [], "cdf": []}, snap
        )


# ---- CDF (validation_suite.py:480-486, enabled at :283,302-303) ------------
def test_change_data_feed(spark, table):
    v1 = table.append(_df(spark, _rows(2, D1)))
    table.update({"item_count": "100"}, "order_id = 'order_0'")
    table.delete("order_id = 'order_1'")
    ch = table.read_changes(start_version=v1).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r[table.read_changes(v1).columns.index("_change_type")] if False else r["_change_type"], []).append(r)
    assert {r.order_id for r in by_type["insert"]} == {"order_0", "order_1"}
    assert by_type["update_preimage"][0].item_count == 1
    assert by_type["update_postimage"][0].item_count == 100
    assert by_type["delete"][0].order_id == "order_1"
    # commit version column present and monotone
    assert all(r["_commit_version"] >= v1 for r in ch)


def test_cdf_requires_property(spark, tmp_path):
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "nocdf"), SCHEMA)
    with pytest.raises(Exception, match="ChangeDataFeed"):
        t.read_changes(0)


# ---- table management: register/drop/detail (S4-S8, S15-S17) ---------------
def test_create_if_not_exists_and_detail(spark, table):
    again = AcidTable.create(
        spark, table.location, SCHEMA, partition_by=["order_date"], if_not_exists=True
    )
    assert again.version() == table.version()
    d = table.detail()
    assert d["partitionColumns"] == ["order_date"]
    assert d["properties"]["enableChangeDataFeed"] == "true"
    assert d["numFiles"] == 0


def test_set_property(spark, tmp_path):
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "props"), SCHEMA)
    t.set_property("enableChangeDataFeed", "true")
    assert t.detail()["properties"]["enableChangeDataFeed"] == "true"
    t.append(_df(spark, _rows(1, D1)))
    assert t.read_changes(0).filter("_change_type = 'insert'").count() == 1


# ---- engine extensions: checkpointing + schema evolution -------------------
def test_log_checkpoint_replay(spark, tmp_path):
    from delta_lake_validation_spark.sources.acid.log import TransactionLog

    loc = os.path.join(str(tmp_path), "ckpt")
    t = AcidTable.create(spark, loc, SCHEMA, partition_by=["order_date"])
    t.log.checkpoint_interval = 5
    for i in range(7):
        t.append(_df(spark, _rows(1, D1, start=i)))
    # checkpoint written at v5
    cps = t.log._checkpoint_versions()
    assert 5 in cps
    # snapshot from a fresh handle (checkpoint-seeded) == full replay
    fresh = TransactionLog(spark, loc, checkpoint_interval=5)
    full = TransactionLog(spark, loc, checkpoint_interval=0)
    s1, s2 = fresh.snapshot(), full.snapshot()
    assert s1.files == s2.files and s1.version == s2.version
    assert t.read().count() == 7


def test_add_column_schema_evolution(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "evolve")
    t = AcidTable.create(spark, loc, SCHEMA, partition_by=["order_date"])
    t.append(_df(spark, _rows(2, D1)))
    t.add_column("discount", "double")
    got = t.read()
    assert "discount" in got.columns
    assert got.filter(F.col("discount").isNull()).count() == 2  # old files -> null
    # new writes carry the column
    import pyspark.sql.types as T

    new_schema = SCHEMA + ", discount DOUBLE"
    rows = [
        Row(order_id="order_x", item_count=1, cost=1.0,
            order_time=dt.datetime(2024, 1, 10, 9, 0), order_date=D1, discount=0.5)
    ]
    t.append(spark.createDataFrame(rows, new_schema))
    assert t.read().filter("discount = 0.5").count() == 1
    with pytest.raises(Exception, match="already exists"):
        t.add_column("discount", "double")


def test_merge_rejects_duplicate_source_keys(spark, table):
    table.append(_df(spark, _rows(2, D1)))
    dup_src = _df(spark, _rows(1, D1) + _rows(1, D1))  # same order_id twice
    with pytest.raises(Exception, match="duplicate"):
        table.merge(dup_src, keys=["order_id"])


def test_insert_values(spark, table):
    table.insert_values(_rows(3, D1))
    assert table.read().count() == 3
    assert table.history()[0]["operation"] == "APPEND"


def test_file_stats_and_range_skipping(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "skip")
    t = AcidTable.create(spark, loc, "k INT, v DOUBLE, d DATE")
    # three files with disjoint k ranges
    for base in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [Row(k=base + i, v=float(i), d=D1) for i in range(10)],
                "k INT, v DOUBLE, d DATE",
            ).coalesce(1)
        )
    snap = t.snapshot()
    stats = [m["stats"] for m in snap.files.values()]
    assert all(s and "k" in s["minValues"] for s in stats)
    # range scan prunes to exactly the one file covering [100, 109]
    pruned = t.read_range("k", 100, 109)
    assert pruned.count() == 10
    files_read = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert len(files_read) == 1
    # unbounded side + fallback correctness
    assert t.read_range("k", lower=150).count() == 60 - 10 * 1 - 40  # k in [150..209]
    assert t.read_range("k", upper=-1).count() == 0


def test_many_concurrent_appenders(spark, table):
    """Stress D13/D14: 6 blind appenders race; all must commit (rebase+retry),
    versions stay consecutive, and no rows are lost or duplicated."""
    errors = []

    def appender(i):
        try:
            table.append(_df(spark, _rows(2, D1, start=100 * i)))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [InheritableThread(target=appender, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    vs = table.log.versions()
    assert vs == list(range(len(vs))) and len(vs) == 7  # create + 6 appends
    got = sorted(r.order_id for r in table.read().collect())
    expect = sorted(f"order_{100 * i + j}" for i in range(6) for j in range(2))
    assert got == expect


def test_compact_append_one_file_per_partition(spark, table):
    rows = _rows(6, D1) + _rows(6, D2, start=6)
    table.append(_df(spark, rows).repartition(8), compact=True)
    by_part = {}
    for meta in table.snapshot().files.values():
        pv = meta["partitionValues"]["order_date"]
        by_part[pv] = by_part.get(pv, 0) + 1
    assert by_part == {D1.isoformat(): 1, D2.isoformat(): 1}
    assert table.read().count() == 12


def test_error_paths(spark, tmp_path):
    from delta_lake_validation_spark.sources.acid.errors import (
        TableNotFoundError,
        VersionNotFoundError,
    )

    with pytest.raises(TableNotFoundError):
        AcidTable(spark, os.path.join(str(tmp_path), "ghost")).read()
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "tt"), SCHEMA)
    with pytest.raises(VersionNotFoundError):
        t.read(timestamp="1990-01-01 00:00:00.000")
    with pytest.raises(Exception, match="version or timestamp, not both"):
        t.read(version=0, timestamp="2024-01-01 00:00:00.000")


# ---- RESTORE (Delta RESTORE parity; engine extension) ----------------------
def test_restore_to_version(spark, table):
    v1 = table.append(_df(spark, _rows(2, D1)))
    table.append(_df(spark, _rows(3, D2, start=10)))
    table.delete(F.col("order_date") == D1)
    assert table.read().count() == 3
    rv = table.restore(v1)
    got = table.read()
    assert got.count() == 2
    assert {r.order_id for r in got.collect()} == {"order_0", "order_1"}
    hist = table.history()  # newest-first
    assert hist[0]["operation"] == "RESTORE"
    assert hist[0]["operationParameters"]["version"] == v1
    # CDF for the restore commit: D2 rows leave (delete), D1 rows return (insert)
    ch = table.read_changes(rv, rv)
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_type == {"delete": 3, "insert": 2}
    # restoring is itself versioned: restore to the pre-restore state works
    table.restore(rv - 1)
    assert table.read().count() == 3


def test_restore_reverts_schema_change(spark, table):
    v1 = table.append(_df(spark, _rows(2, D1)))
    table.add_column("note", "string")
    assert "note" in table.schema().fieldNames()
    table.restore(v1)
    assert "note" not in table.schema().fieldNames()
    assert table.read().count() == 2


def test_restore_after_vacuum_raises(spark, table):
    v1 = table.append(_df(spark, _rows(2, D1)))
    table.overwrite(_df(spark, _rows(3, D2, start=10)))
    table.vacuum(retain_hours=0)
    from delta_lake_validation_spark.sources.acid.errors import AcidTableError

    with pytest.raises(AcidTableError, match="vacuumed"):
        table.restore(v1)


def test_restore_sql_forms(spark, table):
    from delta_lake_validation_spark.sources.acid.sqlshim import AcidSqlContext

    v1 = table.append(_df(spark, _rows(2, D1)))
    table.append(_df(spark, _rows(3, D2, start=10)))
    ctx = AcidSqlContext(spark)
    ctx.register("orders", table)
    ctx.sql(f"RESTORE TABLE orders TO VERSION AS OF {v1}")
    assert table.read().count() == 2
    ts = next(h for h in table.history() if h["version"] == v1)["timestamp"]
    ctx.sql(f"RESTORE TABLE orders TO TIMESTAMP AS OF '{ts}'")
    assert table.read().count() == 2


# ---- CHECK constraints (Delta ADD CONSTRAINT parity; engine extension) -----
def test_check_constraint_enforced_on_writes(spark, table):
    from delta_lake_validation_spark.sources.acid.errors import (
        ConstraintViolationError,
    )

    table.append(_df(spark, _rows(2, D1)))
    table.add_constraint("positive_cost", "cost > 0")
    assert table.constraints() == {"positive_cost": "cost > 0"}
    v_before = table.version()
    bad = [Row(order_id="x", item_count=1, cost=-1.0,
               order_time=dt.datetime(2024, 1, 10, 10, 0), order_date=D1)]
    with pytest.raises(ConstraintViolationError, match="positive_cost"):
        table.append(_df(spark, bad))
    # failed write must not commit or leak rows
    assert table.version() == v_before
    assert table.read().count() == 2
    # valid writes pass; NULL evaluates as satisfied (SQL CHECK semantics)
    nullrow = [Row(order_id="y", item_count=1, cost=None,
                   order_time=dt.datetime(2024, 1, 10, 10, 0), order_date=D1)]
    table.append(_df(spark, nullrow))
    assert table.read().count() == 3
    # UPDATE through the rewrite path is gated too
    with pytest.raises(ConstraintViolationError, match="positive_cost"):
        table.update({"cost": "-5.0"}, F.col("order_id") == "order_0")
    # drop, then the same write succeeds
    table.drop_constraint("positive_cost")
    assert table.constraints() == {}
    table.append(_df(spark, bad))
    assert table.read().count() == 4


def test_add_constraint_validates_existing_rows(spark, table):
    from delta_lake_validation_spark.sources.acid.errors import (
        ConstraintViolationError,
    )

    table.append(_df(spark, _rows(3, D1)))  # item_count 1..3
    with pytest.raises(ConstraintViolationError, match="big_orders"):
        table.add_constraint("big_orders", "item_count > 2")
    assert table.constraints() == {}


def test_constraint_sql_forms(spark, table):
    from delta_lake_validation_spark.sources.acid.errors import (
        ConstraintViolationError,
    )
    from delta_lake_validation_spark.sources.acid.sqlshim import AcidSqlContext

    ctx = AcidSqlContext(spark)
    ctx.register("orders", table)
    ctx.sql("ALTER TABLE orders ADD CONSTRAINT sane CHECK (item_count BETWEEN 1 AND 5)")
    with pytest.raises(ConstraintViolationError, match="sane"):
        ctx.sql("INSERT INTO orders VALUES ('z', 99, 1.0, "
                "TIMESTAMP '2024-01-10 10:00:00', DATE '2024-01-10')")
    ctx.sql("ALTER TABLE orders DROP CONSTRAINT sane")
    ctx.sql("INSERT INTO orders VALUES ('z', 99, 1.0, "
            "TIMESTAMP '2024-01-10 10:00:00', DATE '2024-01-10')")
    assert table.read().count() == 1


def test_read_where_multi_column_skipping(spark, tmp_path):
    """Conjunctive multi-column file skipping: a file is pruned when ANY
    column's stats exclude its range; residual filters stay exact."""
    import os

    loc = os.path.join(str(tmp_path), "mc")
    t = AcidTable.create(spark, loc, "k INT, grp INT, v DOUBLE")
    # 4 files with disjoint k ranges and alternating grp values
    for i in range(4):
        t.append(
            spark.createDataFrame(
                [Row(k=i * 100 + j, grp=i % 2, v=float(j)) for j in range(10)],
                "k INT, grp INT, v DOUBLE",
            ).coalesce(1)
        )
    # k range matches files 1-2 only; grp=0 then excludes file 1 (grp=1)
    got = t.read_where({"k": (100, 299), "grp": (0, 0)})
    assert got.count() == 10
    files_read = {r[0] for r in got.select(F.input_file_name()).distinct().collect()}
    assert len(files_read) == 1  # only file 2 (k 200-209, grp 0) survives
    # residual exactness: a range narrower than one file's stats span
    assert t.read_where({"k": (205, 207)}).count() == 3
    # no bounds at all = full table
    assert t.read_where({}).count() == 40


def test_shallow_clone_zero_copy_fork(spark, tmp_path):
    """Shallow clone references the source's files (no copies); writes and
    DML on the clone never touch the source; the clone's vacuum cannot
    reclaim source files."""
    import os

    src_loc = os.path.join(str(tmp_path), "src")
    src = AcidTable.create(spark, src_loc, "k INT, v DOUBLE, d DATE",
                           partition_by=["d"])
    src.append(spark.createDataFrame(
        [Row(k=i, v=float(i), d=dt.date(2024, 1, 1 + i % 2)) for i in range(10)],
        "k INT, v DOUBLE, d DATE"))

    clone_loc = os.path.join(str(tmp_path), "fork")
    clone = src.clone_to(clone_loc)
    # identical content, zero parquet files under the clone's directory
    assert {r.k for r in clone.read().collect()} == set(range(10))
    clone_parquet = [p for p, _, files in os.walk(clone_loc)
                     for f in files if f.endswith(".parquet")]
    assert clone_parquet == []
    # partition pruning still works through the source basePath
    assert clone.read().filter("d = date'2024-01-01'").count() == 5

    # diverge the clone: delete + append; source must be untouched
    clone.delete("k < 3")
    clone.append(spark.createDataFrame(
        [Row(k=100, v=1.0, d=dt.date(2024, 1, 3))], "k INT, v DOUBLE, d DATE"))
    assert {r.k for r in clone.read().collect()} == set(range(3, 10)) | {100}
    assert {r.k for r in src.read().collect()} == set(range(10))

    # clone vacuum only lists its own directory — source files survive
    clone.vacuum(retain_hours=0)
    assert {r.k for r in src.read().collect()} == set(range(10))
    assert {r.k for r in clone.read().collect()} == set(range(3, 10)) | {100}

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
