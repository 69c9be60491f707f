"""Regression tests for the round-1 advisor findings (ADVICE.md r1):

1. DELETE keeps rows where the predicate evaluates NULL (SQL semantics).
2. vacuum honors the retention cutoff via filesystem mtime (all FS kinds).
3. A lost commit race leaves no orphan CDF/data files; vacuum also reclaims
   unreferenced _change_data files.
4. salted_join rejects join types that would duplicate small-side rows.
5. stream_appends sees files under multi-column partition layouts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.skew import salted_join
from delta_lake_validation_spark.sources.acid import (
    AcidTable,
    ConcurrentWriteException,
)


def _cdf_table(spark, tmp_path, name="t", **kw):
    return AcidTable.create(
        spark,
        os.path.join(str(tmp_path), name),
        "k INT, v INT",
        properties={"enableChangeDataFeed": "true"},
        **kw,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v INT")


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    t.append(_df(spark, [(1, 10), (2, None), (3, 3)]))
    t.delete("v > 5")  # NULL > 5 is NULL, not TRUE: row k=2 must survive
    kept = {r.k for r in t.read().collect()}
    assert kept == {2, 3}
    deletes = t.read_changes(0).filter(F.col("_change_type") == "delete").collect()
    assert {r.k for r in deletes} == {1}


def test_vacuum_retention_keeps_recent_unreferenced_files(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    t.append(_df(spark, [(1, 1)]))
    t.overwrite(_df(spark, [(2, 2)]))  # v1 files now inactive
    # files were just written: younger than a 1h retention window
    assert t.vacuum(retain_hours=1.0, dry_run=True) == []
    doomed = t.vacuum(retain_hours=0.0)
    assert doomed  # with retention waived, the inactive v1 file goes
    assert t.read().collect() == [Row(k=2, v=2)]


def test_lost_commit_race_leaves_no_orphans(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    t.append(_df(spark, [(1, 1), (2, 2)]))
    files_before = set(t.fs.list_files(t.location))
    real_try_commit = t.log.try_commit
    t.log.try_commit = lambda v, e: False  # force every attempt to lose
    with pytest.raises(ConcurrentWriteException):
        t.delete("k = 1")
    t.log.try_commit = real_try_commit
    # the failed DELETE staged rewrite + CDF files; all must be cleaned up
    leftovers = set(t.fs.list_files(t.location)) - files_before
    assert [p for p in leftovers if p.endswith(".parquet")] == []
    assert t.read().count() == 2


def test_vacuum_reclaims_orphan_cdf_files(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    t.append(_df(spark, [(1, 1)]))
    t.update({"v": "v + 1"}, "k = 1")  # writes committed CDF files
    committed_cdf = [
        f for f in t.fs.list_files(f"{t.location}/_change_data") if f.endswith(".parquet")
    ]
    assert committed_cdf
    # plant an orphan change file (as a failed commit would have, pre-fix)
    orphan_dir = f"{t.location}/_change_data/orphan"
    _df(spark, [(9, 9)]).write.parquet(orphan_dir)
    doomed = t.vacuum(retain_hours=0.0)
    assert any("_change_data/orphan" in p for p in doomed)
    survivors = set(t.fs.list_files(f"{t.location}/_change_data"))
    assert set(committed_cdf) <= survivors
    # committed CDF still readable (from the UPDATE version on — vacuum
    # retain-0 legitimately breaks synthesizing the old append's inserts)
    assert (
        t.read_changes(2).filter(F.col("_change_type") == "update_postimage").count()
        == 1
    )


def test_salted_join_all_types_match_plain_join(spark):
    """VERDICT r3 task 7: salted right/full outer joins now carry the
    null-stream-side fix (keep exactly one replica of each unmatched
    small-side row) — every equi-join type must equal its unsalted
    counterpart, including duplicate keys and null-key rows."""
    big = spark.createDataFrame(
        [Row(k=1, a=10), Row(k=1, a=11), Row(k=3, a=30), Row(k=None, a=99)],
        "k int, a int",
    )
    small = spark.createDataFrame(
        [Row(k=1, b=100), Row(k=2, b=200), Row(k=2, b=201), Row(k=None, b=999)],
        "k int, b int",
    )

    def rows(df):
        return sorted(
            ((r["k"], r["a"], r["b"]) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    for how in ("inner", "left", "right", "full", "right_outer", "fullouter"):
        exact = big.join(small, ["k"], how)
        got = salted_join(big, small, on=["k"], how=how, n_salts=4)
        assert rows(got) == rows(exact), how
    # semi/anti (no small-side columns) still work
    got = salted_join(big, small, on=["k"], how="semi", n_salts=4)
    assert sorted((r.k, r.a) for r in got.collect()) == [(1, 10), (1, 11)]
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, on=["k"], how="cross")


def test_stream_appends_multi_column_partitions(spark, tmp_path):
    from delta_lake_validation_spark.streaming.acid_stream import stream_appends

    loc = os.path.join(str(tmp_path), "mp")
    t = AcidTable.create(
        spark, loc, "k INT, region STRING, day STRING", partition_by=["region", "day"]
    )
    t.append(
        spark.createDataFrame(
            [(1, "eu", "d1"), (2, "us", "d2")],
            "k INT, region STRING, day STRING",
        )
    )
    out = os.path.join(str(tmp_path), "sink")
    q = (
        stream_appends(spark, loc)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_many_file_commit_stats_executor_side(spark, tmp_path):
    # 200+ staged files in one append: stats must come from one distributed
    # job, and every add entry must carry correct numRecords + min/max
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "many"), "k INT, v INT")
    df = spark.createDataFrame([(i, i * 2) for i in range(1000)], "k INT, v INT")
    t.append(df.repartition(200))
    snap = t.snapshot()
    assert snap.num_files >= 200
    metas = list(snap.files.values())
    assert sum(m["numRecords"] for m in metas) == 1000
    ks = [m["stats"]["minValues"]["k"] for m in metas if m.get("stats")]
    assert min(ks) == 0
    assert max(m["stats"]["maxValues"]["k"] for m in metas if m.get("stats")) == 999
    assert all(m["size"] > 0 for m in metas)
    # data-skipping still works off the executor-computed stats
    assert t.read_range("k", lower=990).count() == 10


def test_append_coerces_compatible_types(spark, tmp_path):
    # inferred-long rows into an INT table must write INT32 parquet
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "co"), "k INT, v INT")
    t.append(spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=None)]))  # longs
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(1, 10), (2, None)}
    assert t.read().schema.simpleString() == "struct<k:int,v:int>"


def test_optimize_rebases_past_concurrent_append(spark, tmp_path):
    # compaction commutes with appends: a lost race rebases instead of
    # raising, as long as the compacted files are still active
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "opt"), "k INT, v INT")
    t.append(_df(spark, [(1, 1)]))
    t.append(_df(spark, [(2, 2)]))
    real = t.log.try_commit
    calls = {"n": 0}

    def lose_once(v, e):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate an append winning the version race
            real(v, {"operation": "APPEND", "operationParameters": {},
                     "add": [], "remove": [], "cdf": []})
            return False
        return real(v, e)

    t.log.try_commit = lose_once
    v = t.optimize(target_files=1)
    t.log.try_commit = real
    assert v == t.version()
    assert t.read().count() == 2
    assert t.detail()["numFiles"] == 1


def test_csv_json_sources_roundtrip(spark, tmp_path):
    """CSV/JSON sources read back a written extract with the declared
    schema — no inference pass, types pinned."""
    from delta_lake_validation_spark.tables import Tables, read_csv, read_json

    from .conftest import SF_DIR

    li = Tables(spark, SF_DIR).lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).limit(100)
    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    li.write.option("header", "true").csv(csv_dir)
    li.write.json(json_dir)
    schema = "l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE"
    back_csv = read_csv(spark, csv_dir, schema)
    back_json = read_json(spark, json_dir, schema)
    assert back_csv.schema == li.schema
    assert back_json.schema == li.schema
    assert back_csv.count() == 100
    assert sorted(r.l_orderkey for r in back_json.collect()) == sorted(
        r.l_orderkey for r in li.collect()
    )


def test_events_ts_scale_sniffs_all_units(spark, tmp_path):
    """The ts-unit sniff must normalize NANOS/MICROS/MILLIS parquet and a
    plain LONG column identically — the testdata's physical type changed
    between rounds once already and silently broke every time query 1000×."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import delta_lake_validation_spark.tables as T

    base = 1_700_000_000_000_000_000  # epoch nanos
    for unit, scale in [("ns", 1), ("us", 1_000), ("ms", 1_000_000)]:
        path = str(tmp_path / f"ev_{unit}.parquet")
        tbl = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([base // scale, (base + scale) // scale],
                           pa.timestamp(unit)),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        })
        pq.write_table(tbl, path, coerce_timestamps=None,
                       use_deprecated_int96_timestamps=False,
                       store_schema=False, version="2.6")
        T._ts_scale_cache.clear()
        assert T._events_ts_scale(path, spark) == scale, unit
        got = (
            spark.read.schema(T.EVENTS_SCHEMA).parquet(path)
            .selectExpr(f"ts * {scale} AS ns").collect()
        )
        assert {r.ns for r in got} == {base, base + scale}, unit
    # plain LONG ts needs no scaling
    path = str(tmp_path / "ev_long.parquet")
    pq.write_table(pa.table({"ts": pa.array([base], pa.int64())}), path)
    T._ts_scale_cache.clear()
    assert T._events_ts_scale(path, spark) == 1
    T._ts_scale_cache.clear()


# ---------------------------------------------------------------------------
# Round-3 advisor findings (ADVICE.md r2)
# ---------------------------------------------------------------------------
def test_ts_scale_fallback_disambiguates_millis(spark, tmp_path, monkeypatch):
    """Without pyarrow, the Spark-inference fallback must NOT assume every
    TimestampType parquet is micros: a MILLIS-typed file needs scale 1e6."""
    import builtins

    import pyarrow as pa
    import pyarrow.parquet as pq

    import delta_lake_validation_spark.tables as T

    base = 1_700_000_000_000_000_000  # epoch nanos
    paths = {}
    for unit, scale in [("us", 1_000), ("ms", 1_000_000)]:
        path = str(tmp_path / f"ev_{unit}.parquet")
        tbl = pa.table({"ts": pa.array([base // scale], pa.timestamp(unit))})
        pq.write_table(tbl, path, coerce_timestamps=None, store_schema=False,
                       version="2.6")
        paths[unit] = (path, scale)

    real_import = builtins.__import__

    def no_pyarrow(name, *a, **kw):
        if name.startswith("pyarrow"):
            raise ImportError("pyarrow disabled for this test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pyarrow)
    for unit, (path, scale) in paths.items():
        T._ts_scale_cache.clear()
        assert T._events_ts_scale(path, spark) == scale, unit
    T._ts_scale_cache.clear()


def test_shallow_clone_is_one_atomic_commit(spark, tmp_path):
    """clone_to writes a SINGLE v0 commit carrying metadata + file refs —
    no intermediate empty-but-valid table state can survive a crash."""
    src = _cdf_table(spark, tmp_path, "src_atomic")
    src.append(_df(spark, [(1, 1), (2, 2)]))
    clone = src.clone_to(os.path.join(str(tmp_path), "fork_atomic"))
    snap = clone.log.snapshot()
    assert snap.version == 0  # one commit, not create-then-clone
    entry = clone.log.read_entry(0)
    assert entry["operation"] == "CLONE"
    assert len(entry["add"]) > 0 and "metadata" in entry
    assert {r.k for r in clone.read().collect()} == {1, 2}


def test_rel_of_preserves_foreign_scheme_uri(spark, tmp_path):
    """A scheme'd input_file_name outside the table root must round-trip
    unchanged (shallow clones on s3a/hdfs store absolute scheme'd refs)."""
    t = _cdf_table(spark, tmp_path, "relof")
    assert (
        t._rel_of("s3a://bucket/src/part-0.parquet")
        == "s3a://bucket/src/part-0.parquet"
    )
    own = f"file://{t.location}/part-1.parquet"
    assert t._rel_of(own) == "part-1.parquet"
    assert t._rel_of("/elsewhere/part-2.parquet") == "/elsewhere/part-2.parquet"


def test_incremental_refresh_raises_on_genuine_bug(spark, tmp_path, monkeypatch):
    """refresh() only falls back to full recompute when incremental inputs
    are gone; an unexpected error must propagate, not silently recompute."""
    from delta_lake_validation_spark.materialized import IncrementalAggView

    src = _cdf_table(spark, tmp_path, "mv_src")
    src.append(_df(spark, [(1, 10), (2, 20)]))
    view = IncrementalAggView(
        spark,
        source=src,
        location=os.path.join(str(tmp_path), "mv"),
        group_cols=["k"],
        value_col="v",
    )
    view.refresh()  # initial full
    src.append(_df(spark, [(1, 5)]))

    monkeypatch.setattr(
        view, "_incremental_state",
        lambda *a, **kw: (_ for _ in ()).throw(ValueError("genuine bug")),
    )
    with pytest.raises(ValueError, match="genuine bug"):
        view.refresh()

    # ...but a gone-files failure still falls back to full
    monkeypatch.setattr(
        view, "_incremental_state",
        lambda *a, **kw: (_ for _ in ()).throw(
            RuntimeError("java.io.FileNotFoundException: part-0 does not exist")
        ),
    )
    assert view.refresh() == "full"
    got = {(r.k, r.sum_value) for r in view.read().collect()}
    assert got == {(1, 15), (2, 20)}


def test_staged_stats_keyed_per_partition_file(spark, tmp_path):
    """Per-file stats must key on the staging-relative subpath: one task
    writing several partition dirs names its files identically, and a
    basename key assigns one file's stats to all of them — observed as
    read_where silently dropping live rows."""
    from delta_lake_validation_spark.sources.acid.table import AcidTable

    loc = str(tmp_path / "stk")
    t = AcidTable.create(spark, loc, "v int, k string", partition_by=["k"])
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "a"), (100, "b")], "v int, k string"
        ).coalesce(1)  # one task -> identical basenames under k=a/ and k=b/
    )
    snap = t.log.snapshot()
    by_part = {
        a["partitionValues"]["k"]: (
            a["numRecords"], (a.get("stats") or {}).get("maxValues", {}).get("v")
        )
        for a in snap.files.values()
    }
    assert by_part == {"a": (2, 2), "b": (1, 100)}
    assert {(r.v, r.k) for r in t.read_where({"v": (None, 10)}).collect()} == {
        (1, "a"), (2, "a")
    }
    assert {(r.v, r.k) for r in t.read_where({"v": (50, None)}).collect()} == {
        (100, "b")
    }


# ---------------------------------------------------------------------------
# ADVICE r4: distributed vacuum must compare paths in ONE normalization.
# Before the fix, the keep set held scheme-qualified URIs
# ('s3://bucket/tbl/...') while pyarrow listings yielded fs-normalized paths
# ('bucket/tbl/...'), so the anti-join never matched and every live file past
# the mtime cutoff was deleted.  The mock factory reproduces the s3
# normalization shape (SubTreeFileSystem paths have no scheme, no leading /).
# ---------------------------------------------------------------------------


class _MockS3Factory:
    """Picklable (fs, normalized-root) factory mimicking
    pyarrow.fs.FileSystem.from_uri('s3://bucket/tbl'): FileInfo.path comes
    back as 'bucket/tbl/...' with no scheme."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def __call__(self):
        import pyarrow.fs as pafs

        return (
            pafs.SubTreeFileSystem(self.base_dir, pafs.LocalFileSystem()),
            "bucket/tbl",
        )


def test_distributed_vacuum_remote_scheme_keeps_live_files(spark, tmp_path):
    import time

    from delta_lake_validation_spark.sources.fs import (
        delete_files_distributed,
        list_stale_distributed,
    )

    base = str(tmp_path / "mock-s3")
    tbl = os.path.join(base, "bucket", "tbl")
    live = ["data1.parquet", "part=a/data2.parquet", "deletion_vector_live.bin"]
    stale = ["stale.parquet", "part=a/stale2.parquet", "deletion_vector_old.bin"]
    skipped = ["_delta_log/00000.json", "notes.txt"]
    for rel in live + stale + skipped:
        p = os.path.join(tbl, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write("x")

    factory = _MockS3Factory(base)
    doomed = list_stale_distributed(
        spark,
        "mock://bucket/tbl",  # never dialed: factory supplies the fs
        set(live),
        cutoff=time.time() + 3600,  # everything old enough — keep set decides
        skip_top=lambda name: name.startswith("_"),
        fs_factory=factory,
    )
    # the whole point: live files MUST survive the anti-join on a
    # non-file:// normalization; only unreferenced data/DV files are doomed
    assert sorted(doomed) == sorted(stale)

    delete_files_distributed(
        spark, "mock://bucket/tbl", doomed, fs_factory=factory
    )
    for rel in live + skipped:
        assert os.path.exists(os.path.join(tbl, rel)), rel
    for rel in stale:
        assert not os.path.exists(os.path.join(tbl, rel)), rel


def test_rel_under_normalization_forms():
    """Caller-side keep-set mapping: scheme-qualified keeps reduce to
    location-relative form against the same scheme-qualified root; paths
    outside the root (shallow-clone sources, absolute 'p' DVs) drop out."""
    from delta_lake_validation_spark.sources.fs import rel_under

    root = "s3://bucket/tbl"
    assert rel_under(root, "s3://bucket/tbl/part=a/f.parquet") == "part=a/f.parquet"
    assert rel_under(root + "/", "s3://bucket/tbl/f.parquet") == "f.parquet"
    assert rel_under(root, "s3://bucket/tblX/f.parquet") is None
    assert rel_under(root, "s3://other/tbl/f.parquet") is None
    assert rel_under("/tmp/tbl", "/tmp/tbl/f.parquet") == "f.parquet"
