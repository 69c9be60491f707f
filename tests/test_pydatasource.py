"""format("deltapy") — Python Data Source over the engine's Delta reader.

Covers the three legs of the source (batch read, streaming read, write)
against the same protocol features the direct DeltaTable tests pin:
partition pruning and stats skipping from pushed filters, deletion
vectors, time travel, column mapping (name + id, with the id-mode footer
refusal), schema evolution, sparkless metadata access, and the
executor-staged / driver-committed writer incl. its refusal gates.
Reference surface: delta-spark reads at
/root/reference/src/validation_suite.py:425-486, writes at :355-368.
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from delta_lake_validation_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaTable,
    create_delta,
)
from delta_lake_validation_spark.sources.pydatasource import (
    DeltaPyBatchReader,
    EqualTo,
    GreaterThan,
)

from tests.test_delta_log import (  # noqa: F401  (shared fixture builders)
    _add,
    _mapped_meta,
    _write_commit,
    _write_parquet,
    _write_parquet_with_ids,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("cat", StringType()),
        StructField("price", DoubleType()),
        StructField("ts", TimestampType()),
        StructField("day", DateType()),
    ]
)


def _rows(n, start=0):
    return [
        (
            start + i,
            "ab"[i % 2],
            float(i) * 1.5,
            datetime.datetime(2024, 1, 1 + i % 5, 12, 0, i % 60),
            datetime.date(2024, 2, 1 + i % 7),
        )
        for i in range(n)
    ]


@pytest.fixture()
def table(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    create_delta(spark, loc, SCHEMA, partition_by=["cat"])
    t = DeltaTable(spark, loc)
    t.append(spark.createDataFrame(_rows(400), SCHEMA))
    return loc


def _sorted(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------------------------------------- batch
def test_batch_read_parity_all_types(spark, table):
    got = spark.read.format("deltapy").load(table)
    want = DeltaTable(spark, table).read()
    assert got.schema == want.schema
    assert _sorted(got) == _sorted(want)


def test_filtered_read_matches_and_prunes(spark, table):
    pred = (F.col("cat") == "a") & (F.col("price") > 100)
    got = spark.read.format("deltapy").load(table).filter(pred)
    want = DeltaTable(spark, table).read().filter(pred)
    assert _sorted(got) == _sorted(want)
    # unit-level: the planner drops the cat=b file(s) for an EqualTo push
    r = DeltaPyBatchReader({"path": table})
    all_parts = sum(len(p.files) for p in r.partitions())
    r2 = DeltaPyBatchReader({"path": table})
    list(r2.pushFilters([EqualTo(("cat",), "a")]))
    kept = sum(len(p.files) for p in r2.partitions())
    assert 0 < kept < all_parts


def test_stats_skipping_prunes_files(spark, tmp_path):
    loc = str(tmp_path / "skip")
    create_delta(spark, loc, "id bigint, v double")
    t = DeltaTable(spark, loc)
    t.append(spark.createDataFrame([(i, float(i)) for i in range(100)], "id bigint, v double"))
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(1000, 1100)], "id bigint, v double"
        )
    )
    r = DeltaPyBatchReader({"path": loc})
    # every row below 500 lives in the first append's file(s)
    list(r.pushFilters([GreaterThan(("id",), 500)]))
    parts = r.partitions()
    full = DeltaPyBatchReader({"path": loc}).partitions()
    assert sum(len(p.files) for p in parts) < sum(len(p.files) for p in full)
    got = spark.read.format("deltapy").load(loc).filter("id > 500")
    assert got.count() == 100 and got.agg(F.min("id")).head()[0] == 1000


def test_deletion_vector_read(spark, table):
    t = DeltaTable(spark, table)
    t.delete("id % 10 = 3")
    got = spark.read.format("deltapy").load(table)
    want = DeltaTable(spark, table).read()
    assert got.count() == 360
    assert _sorted(got) == _sorted(want)


def test_time_travel_options(spark, table):
    t = DeltaTable(spark, table)
    before = _sorted(t.read())
    t.append(spark.createDataFrame(_rows(10, start=10_000), SCHEMA))
    v1 = spark.read.format("deltapy").option("versionAsOf", 1).load(table)
    assert _sorted(v1) == before
    latest = spark.read.format("deltapy").load(table)
    assert latest.count() == 410
    ts = datetime.datetime.now(datetime.timezone.utc).isoformat()
    tts = spark.read.format("deltapy").option("timestampAsOf", ts).load(table)
    assert tts.count() == 410


def test_column_mapping_name_mode(spark, tmp_path):
    loc = tmp_path / "cm"
    log = loc / "_delta_log"
    _write_parquet(
        spark,
        [Row(**{"col-aaaa": 1}), Row(**{"col-aaaa": 2})],
        "`col-aaaa` int",
        loc / "col-bbbb=x",
    )
    _write_parquet(
        spark, [Row(**{"col-aaaa": 3})], "`col-aaaa` int", loc / "col-bbbb=y"
    )
    import os

    def rel(d):
        base = str(loc / d)
        (f,) = [x for x in os.listdir(base) if x.endswith(".parquet")]
        return f"{d}/{f}"

    _write_commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _mapped_meta(),
            _add(rel("col-bbbb=x"), partition_values={"col-bbbb": "x"}),
            _add(rel("col-bbbb=y"), partition_values={"col-bbbb": "y"}),
        ],
    )
    df = spark.read.format("deltapy").load(str(loc))
    assert df.columns == ["v", "k"]
    assert {(r.v, r.k) for r in df.collect()} == {(1, "x"), (2, "x"), (3, "y")}


def test_column_mapping_id_mode_foreign_file_refused(spark, tmp_path):
    """A file whose parquet field-id 1 lives under a different physical
    name must abort the scan (executor-side footer check — every file
    actually read is verified, no sampling window)."""
    import pyarrow as pa

    loc = tmp_path / "cmid"
    log = loc / "_delta_log"
    _write_parquet_with_ids(
        loc / "col-bbbb=x" / "part-0.parquet",
        [{"renamed": 1}],
        [("renamed", 1, pa.int32())],
    )
    meta = _mapped_meta()
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    _write_commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta,
            _add("col-bbbb=x/part-0.parquet", partition_values={"col-bbbb": "x"}),
        ],
    )
    with pytest.raises(Exception, match="id mismatch|field-id"):
        spark.read.format("deltapy").load(str(loc)).collect()


def test_schema_evolution_missing_column_is_null(spark, tmp_path):
    loc = tmp_path / "evo"
    log = loc / "_delta_log"
    f = _write_parquet(spark, [Row(v=1), Row(v=2)], "v int", loc / "d")
    _write_commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "evo",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {
                            "type": "struct",
                            "fields": [
                                {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
                                {"name": "extra", "type": "string", "nullable": True, "metadata": {}},
                            ],
                        }
                    ),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            _add(f),
        ],
    )
    rows = spark.read.format("deltapy").load(str(loc)).collect()
    assert {(r.v, r.extra) for r in rows} == {(1, None), (2, None)}


def test_sparkless_metadata_and_read_guard(spark, table):
    t = DeltaTable(None, table)
    assert t.latest_version() == 1
    snap = t.snapshot()
    assert snap.schema == SCHEMA and snap.partition_columns == ["cat"]
    with pytest.raises(RuntimeError, match="sparkless"):
        t.read()


def test_sparkless_checkpoint_replay(spark, table):
    """The planning worker replays parquet checkpoints through pyarrow —
    including arrow-map normalization of partitionValues."""
    from delta_lake_validation_spark.sources.delta_log import (
        write_delta_checkpoint,
    )

    t = DeltaTable(spark, table)
    t.append(spark.createDataFrame(_rows(7, start=5_000), SCHEMA))
    write_delta_checkpoint(spark, table)
    sparkless = DeltaTable(None, table).snapshot()
    with_spark = DeltaTable(spark, table).snapshot()
    assert sparkless.files.keys() == with_spark.files.keys()
    for p, a in sparkless.files.items():
        assert a.get("partitionValues") == with_spark.files[p].get(
            "partitionValues"
        )
    got = spark.read.format("deltapy").load(table)
    assert got.count() == 407


# ------------------------------------------------------------------ writer
def test_writer_creates_table(spark, tmp_path):
    loc = str(tmp_path / "w1")
    df = spark.createDataFrame(_rows(50), SCHEMA)
    df.write.format("deltapy").mode("append").option("partitionBy", "cat").save(loc)
    t = DeltaTable(spark, loc)
    snap = t.snapshot()
    assert snap.partition_columns == ["cat"]
    assert _sorted(t.read()) == _sorted(df)
    assert _sorted(spark.read.format("deltapy").load(loc)) == _sorted(df)
    h = t.history()[0]
    assert h["operation"] == "WRITE"
    # executor-computed file stats are present and usable for skipping
    for a in snap.files.values():
        st = json.loads(a["stats"])
        assert st["numRecords"] > 0 and "id" in st["minValues"]


def test_writer_append_and_overwrite(spark, tmp_path):
    loc = str(tmp_path / "w2")
    df = spark.createDataFrame(_rows(20), SCHEMA)
    df.write.format("deltapy").mode("append").save(loc)
    spark.createDataFrame(_rows(5, start=100), SCHEMA).write.format(
        "deltapy"
    ).mode("append").save(loc)
    assert spark.read.format("deltapy").load(loc).count() == 25
    small = spark.createDataFrame(_rows(3, start=200), SCHEMA)
    small.write.format("deltapy").mode("overwrite").save(loc)
    t = DeltaTable(spark, loc)
    assert _sorted(t.read()) == _sorted(small)
    assert t.latest_version() == 2


def test_writer_null_partition_roundtrip(spark, tmp_path):
    loc = str(tmp_path / "w3")
    df = spark.createDataFrame(
        [(1, None), (2, "x")], "id bigint, part string"
    )
    df.write.format("deltapy").mode("append").option("partitionBy", "part").save(loc)
    got = spark.read.format("deltapy").load(loc)
    assert _sorted(got) == [(1, None), (2, "x")]
    assert _sorted(DeltaTable(spark, loc).read()) == [(1, None), (2, "x")]


def test_writer_schema_mismatch_refused(spark, tmp_path):
    loc = str(tmp_path / "w4")
    spark.createDataFrame([(1,)], "id bigint").write.format("deltapy").mode(
        "append"
    ).save(loc)
    bad = spark.createDataFrame([("x",)], "id string")
    with pytest.raises(Exception, match="does not match table schema"):
        bad.write.format("deltapy").mode("append").save(loc)


def test_writer_constrained_table_refused(spark, tmp_path):
    loc = str(tmp_path / "w5")
    create_delta(
        spark,
        loc,
        "id bigint",
        properties={"delta.constraints.pos": "id > 0"},
    )
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(Exception, match="constraints"):
        df.write.format("deltapy").mode("append").save(loc)


def test_writer_cdf_overwrite_refused_append_ok(spark, tmp_path):
    loc = str(tmp_path / "w6")
    create_delta(
        spark,
        loc,
        "id bigint",
        properties={"delta.enableChangeDataFeed": "true"},
    )
    df = spark.createDataFrame([(1,), (2,)], "id bigint")
    df.write.format("deltapy").mode("append").save(loc)
    t = DeltaTable(spark, loc)
    ch = t.read_changes(0)
    assert {(r.id, r._change_type) for r in ch.collect()} == {
        (1, "insert"),
        (2, "insert"),
    }
    with pytest.raises(Exception, match="CDF"):
        df.write.format("deltapy").mode("overwrite").save(loc)


def test_writer_concurrent_appends_both_land(spark, tmp_path):
    from pyspark import InheritableThread

    loc = str(tmp_path / "w7")
    create_delta(spark, loc, "id bigint, src string")
    errs = []

    def run(tag):
        try:
            spark.createDataFrame(
                [(i, tag) for i in range(50)], "id bigint, src string"
            ).write.format("deltapy").mode("append").save(loc)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [InheritableThread(target=run, args=(t,)) for t in ("a", "b", "c")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    t = DeltaTable(spark, loc)
    assert t.latest_version() == 3
    df = t.read()
    assert df.count() == 150
    assert df.groupBy("src").count().count() == 3


# --------------------------------------------------------------- streaming
def _run_stream(spark, src, out, ckpt, **opts):
    reader = spark.readStream.format("deltapy")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.option("startingVersion", "0")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_incremental_exactly_once(spark, tmp_path):
    loc = str(tmp_path / "s1")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(_rows(17), SCHEMA)
    df.limit(5).write.format("deltapy").mode("append").save(loc)
    df.write.format("deltapy").mode("append").save(loc)
    _run_stream(spark, loc, out, ckpt)
    assert spark.read.parquet(out).count() == 22
    # restart: only the new commit arrives
    spark.createDataFrame(_rows(3, start=99), SCHEMA).write.format(
        "deltapy"
    ).mode("append").save(loc)
    _run_stream(spark, loc, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 25
    # batch equivalence: streamed rows == table rows
    assert _sorted(got) == _sorted(DeltaTable(spark, loc).read())


def test_stream_refuses_deletes_unless_opted_in(spark, tmp_path):
    loc = str(tmp_path / "s2")
    create_delta(spark, loc, "id bigint, part string", partition_by=["part"])
    t = DeltaTable(spark, loc)
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, part string")
    )
    t.delete("part = 'a'")
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    with pytest.raises(Exception, match="ignoreDeletes|ignoreChanges"):
        _run_stream(spark, loc, out, ckpt)
    _run_stream(spark, loc, out, str(tmp_path / "c3"), ignoreDeletes="true")
    assert spark.read.parquet(out).count() == 2  # both original inserts


def test_stream_compaction_transparent(spark, tmp_path):
    loc = str(tmp_path / "s3")
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")
    df = spark.createDataFrame(_rows(10), SCHEMA)
    df.limit(4).write.format("deltapy").mode("append").save(loc)
    df.write.format("deltapy").mode("append").save(loc)
    _run_stream(spark, loc, out, ckpt)
    assert spark.read.parquet(out).count() == 14
    DeltaTable(spark, loc).optimize()  # dataChange=false commit
    spark.createDataFrame(_rows(2, start=77), SCHEMA).write.format(
        "deltapy"
    ).mode("append").save(loc)
    _run_stream(spark, loc, out, ckpt)
    assert spark.read.parquet(out).count() == 16


# --------------------------------------------------------------------- CDF
def _cdf_rows(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)),) for r in df.collect()
    )


def test_cdf_batch_matches_read_changes(spark, tmp_path):
    loc = str(tmp_path / "cdf")
    create_delta(
        spark,
        loc,
        "id bigint, part string, v double",
        partition_by=["part"],
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(40)],
            "id bigint, part string, v double",
        )
    )
    DeltaTable(spark, loc).update({"v": "v + 100"}, "id % 4 = 1")  # cdc files
    DeltaTable(spark, loc).delete("part = 'a'")
    want = DeltaTable(spark, loc).read_changes(0)
    got = (
        spark.read.format("deltapy")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(loc)
    )
    assert sorted(got.columns) == sorted(want.columns)
    cols = [c for c in sorted(got.columns) if c != "_commit_timestamp"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == w and len(g) > 40


def test_cdf_batch_dv_bitmap_diff(spark, tmp_path):
    """Non-CDF table, DV delete: changes derive from the bitmap diff of
    the add/remove same-path pair — no cdc files on disk."""
    loc = str(tmp_path / "dvdiff")
    create_delta(
        spark,
        loc,
        "id bigint",
        properties={"delta.enableDeletionVectors": "true"},
    )
    t = DeltaTable(spark, loc)
    t.append(spark.createDataFrame([(i,) for i in range(30)], "id bigint"))
    DeltaTable(spark, loc).delete("id % 3 = 0")  # -> DV rewrite commit
    want = DeltaTable(spark, loc).read_changes(2, 2)
    got = (
        spark.read.format("deltapy")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)
        .option("endingVersion", 2)
        .load(loc)
    )
    g = sorted((r.id, r._change_type) for r in got.collect())
    w = sorted((r.id, r._change_type) for r in want.collect())
    assert g == w and len(g) == 10 and all(c == "delete" for _, c in g)


def test_cdf_stream_matches_batch_and_restarts(spark, tmp_path):
    loc = str(tmp_path / "cdfs")
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    create_delta(
        spark,
        loc,
        "id bigint, v double",
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id bigint, v double"
        )
    )
    DeltaTable(spark, loc).update({"v": "v * 2"}, "id < 5")

    def run():
        q = (
            spark.readStream.format("deltapy")
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
            .load(loc)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    batch = (
        spark.read.format("deltapy")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(loc)
    )
    cols = ["id", "v", "_change_type", "_commit_version"]
    s1 = sorted(tuple(r[c] for c in cols) for r in spark.read.parquet(out).collect())
    b1 = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert s1 == b1 and len(s1) == 30  # 20 inserts + 5 pre + 5 post images
    # restart: only the new delete arrives
    DeltaTable(spark, loc).delete("id >= 18")
    run()
    s2 = spark.read.parquet(out)
    assert s2.count() == 32
    assert (
        s2.filter("_change_type = 'delete'").count() == 2
    )


def test_row_group_skipping(spark, tmp_path):
    """Pushed ranges prune whole parquet row groups executor-side (the
    intra-file tier of data skipping), with identical results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_delta_log import _meta
    from delta_lake_validation_spark.sources.pydatasource import (
        _FileSlice,
        _ScanExec,
    )

    loc = tmp_path / "rg"
    loc.mkdir(parents=True)
    pq.write_table(
        pa.table({"id": pa.array(range(300), pa.int64())}),
        str(loc / "f.parquet"),
        row_group_size=100,
    )
    _write_commit(
        loc / "_delta_log",
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta([("id", "long")]),
            _add("f.parquet"),
        ],
    )
    tbl = DeltaTable(None, str(loc))
    ex = _ScanExec(tbl.snapshot())
    sl = _FileSlice(path=str(loc / "f.parquet"), size=1, dv=None, pv={})
    assert sum(b.num_rows for b in ex.scan([sl])) == 300
    ex2 = _ScanExec(tbl.snapshot())
    ex2.ranges = {"id": (250, None)}
    # only the last row group (200..299) survives the stats check
    assert sum(b.num_rows for b in ex2.scan([sl])) == 100
    got = spark.read.format("deltapy").load(str(loc)).filter("id >= 250")
    assert got.count() == 50


# ---------------------------------------------------------- streaming sink
def test_stream_write_roundtrip_exactly_once(spark, tmp_path):
    """rate-less end-to-end: stream OUT of one deltapy table INTO another
    through writeStream, then re-run with the same checkpoint — no
    duplicates (txn idempotence) and no data loss."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ck")
    df = spark.createDataFrame(_rows(25), SCHEMA)
    df.limit(9).write.format("deltapy").mode("append").save(src)
    df.write.format("deltapy").mode("append").save(src)

    def pump():
        q = (
            spark.readStream.format("deltapy")
            .option("startingVersion", "0")
            .load(src)
            .writeStream.format("deltapy")
            .option("path", dst)
            .option("txnAppId", "test-pump")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    pump()
    out = spark.read.format("deltapy").load(dst)
    assert out.count() == 34
    assert _sorted(out) == _sorted(DeltaTable(spark, src).read())
    # no new data: re-pump is a no-op
    pump()
    assert spark.read.format("deltapy").load(dst).count() == 34
    # new commit flows through incrementally
    df.limit(2).write.format("deltapy").mode("append").save(src)
    pump()
    t = DeltaTable(spark, dst)
    assert t.read().count() == 36
    # every batch carried its txn action
    txns = [
        a["txn"]
        for v in t.versions()
        for a in t._commit_actions(v)
        if "txn" in a
    ]
    assert all(x["appId"] == "test-pump" for x in txns) and len(txns) >= 2


def test_stream_write_replayed_batch_skipped(spark, tmp_path):
    """Direct idempotence unit: committing the same batchId twice with a
    txnAppId lands exactly one commit's rows."""
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamWriter,
    )

    loc = str(tmp_path / "t")
    create_delta(spark, loc, "id bigint")
    sch = StructType([StructField("id", LongType())])
    import pyarrow as pa

    def run_batch(bid):
        w = DeltaPyStreamWriter({"path": loc, "txnappid": "app1"}, sch)
        msg = w.write(iter([pa.record_batch({"id": pa.array([1, 2], pa.int64())})]))
        w.commit([msg], bid)

    run_batch(0)
    run_batch(1)
    run_batch(1)  # replay: must be skipped
    t = DeltaTable(spark, loc)
    assert t.read().count() == 4
    assert t.latest_version() == 2


def test_txn_watermark_survives_checkpoint_and_log_cleanup(
    spark, tmp_path
):
    """The spec says checkpoints carry the latest txn per appId.  After a
    checkpoint plus aggressive JSON log cleanup, a replayed micro-batch
    must STILL be skipped — the watermark now lives only in the
    checkpoint parquet."""
    import os

    import pyarrow as pa

    from delta_lake_validation_spark.sources.delta_log import (
        write_delta_checkpoint,
    )
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamWriter,
    )

    loc = str(tmp_path / "t")
    create_delta(spark, loc, "id bigint")
    sch = StructType([StructField("id", LongType())])

    def run_batch(bid):
        w = DeltaPyStreamWriter({"path": loc, "txnappid": "pump"}, sch)
        msg = w.write(
            iter([pa.record_batch({"id": pa.array([1, 2], pa.int64())})])
        )
        w.commit([msg], bid)

    run_batch(0)
    run_batch(1)
    v = write_delta_checkpoint(spark, loc)
    # aggressive log cleanup: drop every commit JSON at-or-before the
    # checkpoint — the JSON-tail txn records are gone
    log = f"{loc}/_delta_log"
    for n in list(os.listdir(log)):
        if n.endswith(".json") and int(n.split(".")[0]) <= v:
            os.remove(f"{log}/{n}")
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.txns["pump"]["version"] == 1
    before = DeltaTable(spark, loc).read().count()
    run_batch(1)  # replay: watermark from the checkpoint must skip it
    t = DeltaTable(spark, loc)
    assert t.read().count() == before
    run_batch(2)  # fresh batch still lands
    assert DeltaTable(spark, loc).read().count() == before + 2
    # multi-part classic and v2 carry the watermark too (v2: in the
    # manifest, not the sidecars — and sparkless replay sees it)
    write_delta_checkpoint(spark, loc, kind="classic", parts=3)
    assert DeltaTable(None, loc).snapshot().txns["pump"]["version"] == 2
    run_batch(3)
    write_delta_checkpoint(spark, loc, kind="v2")
    assert DeltaTable(None, loc).snapshot().txns["pump"]["version"] == 3


def test_sparkless_v2_checkpoint_replay(spark, tmp_path):
    """v2 checkpoints (uuid manifest + _sidecars) replay identically in
    the sparkless planning path (pyarrow manifest + sidecar reads)."""
    from delta_lake_validation_spark.sources.delta_log import (
        write_delta_checkpoint,
    )

    loc = str(tmp_path / "v2")
    create_delta(
        spark,
        loc,
        "id bigint, part string",
        partition_by=["part"],
        properties={"delta.checkpointPolicy": "v2"},
    )
    t = DeltaTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(50)], "id bigint, part string"
        )
    )
    write_delta_checkpoint(spark, loc)
    sparkless = DeltaTable(None, loc).snapshot()
    with_spark = DeltaTable(spark, loc).snapshot()
    assert sparkless.files.keys() == with_spark.files.keys()
    for p, a in sparkless.files.items():
        assert a.get("partitionValues") == with_spark.files[p].get(
            "partitionValues"
        )
    assert spark.read.format("deltapy").load(loc).count() == 50


def test_writer_merge_schema_option(spark, tmp_path):
    loc = str(tmp_path / "wms")
    spark.createDataFrame([(1, 1.0)], "id bigint, v double").write.format(
        "deltapy"
    ).mode("append").save(loc)
    wide = spark.createDataFrame(
        [(2, 2.0, "n")], "id bigint, v double, note string"
    )
    with pytest.raises(Exception, match="mergeSchema"):
        wide.write.format("deltapy").mode("append").save(loc)
    wide.write.format("deltapy").mode("append").option(
        "mergeSchema", "true"
    ).save(loc)
    t = DeltaTable(spark, loc)
    assert [f.name for f in t.schema().fields] == ["id", "v", "note"]
    rows = {(r.id, r.v, r.note) for r in t.read().collect()}
    assert rows == {(1, 1.0, None), (2, 2.0, "n")}
    got = {
        (r.id, r.v, r.note)
        for r in spark.read.format("deltapy").load(loc).collect()
    }
    assert got == rows
    # type change still refuses even with the option
    bad = spark.createDataFrame([("x", 1.0)], "id string, v double")
    with pytest.raises(Exception, match="cannot change"):
        bad.write.format("deltapy").mode("append").option(
            "mergeSchema", "true"
        ).save(loc)


def test_cdf_timestamp_options(spark, tmp_path):
    """startingTimestamp resolves to the first commit at-or-after,
    endingTimestamp to the last at-or-before (delta-spark's rules), on
    both the batch CDF read and the stream start."""
    import datetime as dt

    loc = str(tmp_path / "cdfts")
    create_delta(
        spark, loc, "id bigint",
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(spark, loc)
    t.append(spark.range(0, 5))       # v1
    t.append(spark.range(10, 15))     # v2
    t = DeltaTable(spark, loc)

    def iso(v):
        ms = t._commit_ts_ms(v)
        return dt.datetime.fromtimestamp(
            ms / 1000.0, tz=dt.timezone.utc
        ).isoformat()

    assert t.first_version_at_or_after(iso(1)) == 1
    got = (
        spark.read.format("deltapy")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", iso(2))
        .load(loc)
    )
    assert sorted(r.id for r in got.collect()) == list(range(10, 15))
    got2 = (
        spark.read.format("deltapy")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .option("endingTimestamp", iso(1))
        .load(loc)
    )
    assert sorted(r.id for r in got2.collect()) == list(range(0, 5))
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("deltapy")
            .option("readChangeFeed", "true")
            .option("startingVersion", 0)
            .option("startingTimestamp", iso(1))
            .load(loc)
            .collect()
        )
    # stream start by timestamp: only v2 rows arrive
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    (
        spark.readStream.format("deltapy")
        .option("startingTimestamp", iso(2))
        .load(loc)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(10, 15)
    )


def test_stream_rate_limit_offsets(spark, tmp_path):
    """maxFilesPerTrigger paces the stream: each latestOffset() advances
    at most N add-files past the cursor (≥1 version always), and an e2e
    capped pump still delivers everything exactly once."""
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamReader,
    )

    loc = str(tmp_path / "rate")
    create_delta(spark, loc, "id bigint")
    t = DeltaTable(spark, loc)
    for i in range(5):  # v1..v5, one file each
        t.append(spark.range(i * 10, (i + 1) * 10).coalesce(1))

    r = DeltaPyStreamReader({"path": loc, "maxfilespertrigger": "2"})
    assert r.initialOffset() == {"version": -1}
    seq = [r.latestOffset()["version"] for _ in range(4)]
    assert seq == [2, 4, 5, 5]  # 2 files/trigger over v1..v5, then idle
    # byte cap: each file is >1 byte, so 1-byte cap admits one version each
    rb = DeltaPyStreamReader({"path": loc, "maxbytespertrigger": "1"})
    assert [rb.latestOffset()["version"] for _ in range(3)] == [1, 2, 3]
    # uncapped: whole backlog in one offset (existing availableNow contract)
    ru = DeltaPyStreamReader({"path": loc})
    assert ru.latestOffset()["version"] == 5

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    for _ in range(4):  # capped availableNow pumps until caught up
        (
            spark.readStream.format("deltapy")
            .option("maxFilesPerTrigger", "2")
            .load(loc)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(50))  # everything, no duplicates


def test_dynamic_partition_overwrite_option(spark, tmp_path):
    """option("partitionOverwriteMode", "dynamic") on mode=overwrite
    replaces only the partitions present in the frame."""
    loc = str(tmp_path / "dynds")
    base = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(10)], "id bigint, part string"
    )
    base.write.format("deltapy").mode("append").option(
        "partitionBy", "part"
    ).save(loc)
    repl = spark.createDataFrame([(100, "b"), (101, "b")],
                                 "id bigint, part string")
    repl.write.format("deltapy").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).save(loc)
    got = spark.read.format("deltapy").load(loc)
    assert sorted(r.id for r in got.filter("part = 'a'").collect()) == [
        0, 2, 4, 6, 8
    ]
    assert sorted(r.id for r in got.filter("part = 'b'").collect()) == [
        100, 101
    ]
    # static overwrite still replaces everything
    repl.write.format("deltapy").mode("overwrite").save(loc)
    assert spark.read.format("deltapy").load(loc).count() == 2


# ---------------------------------------------------------------------------
# VERDICT r4 task 5 + ADVICE r4: writer replaceWhere, overwrite race,
# create-race schema guard, strict-JSON stats
# ---------------------------------------------------------------------------


def _two_part_tables(spark, tmp_path):
    """Two identical partitioned tables for row-for-row comparison."""
    rows = [(1, "a"), (2, "a"), (3, "b"), (4, "c")]
    locs = []
    for name in ("rw1", "rw2"):
        loc = str(tmp_path / name)
        spark.createDataFrame(rows, "id bigint, k string").write.format(
            "deltapy"
        ).mode("append").option("partitionBy", "k").save(loc)
        locs.append(loc)
    return locs


def test_writer_replace_where_matches_deltatable(spark, tmp_path):
    """option('replaceWhere') on a partition predicate lands the same
    table state as DeltaTable.overwrite(replace_where=...), row for row."""
    loc_pyds, loc_api = _two_part_tables(spark, tmp_path)
    new = spark.createDataFrame([(10, "a"), (11, "a")], "id bigint, k string")

    new.write.format("deltapy").mode("overwrite").option(
        "replaceWhere", "k = 'a'"
    ).save(loc_pyds)
    DeltaTable(spark, loc_api).overwrite(new, replace_where="k = 'a'")

    got = sorted(
        (r.id, r.k) for r in DeltaTable(spark, loc_pyds).read().collect()
    )
    want = sorted(
        (r.id, r.k) for r in DeltaTable(spark, loc_api).read().collect()
    )
    assert got == want == [(3, "b"), (4, "c"), (10, "a"), (11, "a")]
    # untouched partitions kept their ORIGINAL files (scoped remove set)
    snap = DeltaTable(spark, loc_pyds).snapshot()
    kept = {
        a["partitionValues"]["k"]
        for a in snap.files.values()
    }
    assert kept == {"a", "b", "c"}
    ops = DeltaTable(spark, loc_pyds)._commit_actions(1)
    info = next(x["commitInfo"] for x in ops if "commitInfo" in x)
    assert info["operationParameters"]["predicate"] == "k = 'a'"


def test_writer_replace_where_compound_predicates(spark, tmp_path):
    """IN / range / IS NULL terms scope the removal set exactly."""
    loc = str(tmp_path / "rwc")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id bigint, k string"
    ).write.format("deltapy").mode("append").option(
        "partitionBy", "k"
    ).save(loc)
    spark.createDataFrame([(20, "b")], "id bigint, k string").write.format(
        "deltapy"
    ).mode("overwrite").option("replaceWhere", "k IN ('b')").save(loc)
    got = sorted(
        (r.id, r.k) for r in DeltaTable(spark, loc).read().collect()
    )
    assert got == [(1, "a"), (3, "c"), (4, None), (20, "b")]
    # IS NULL scopes to the null partition only
    spark.createDataFrame([(40, None)], "id bigint, k string").write.format(
        "deltapy"
    ).mode("overwrite").option("replaceWhere", "k IS NULL").save(loc)
    got = sorted(
        (r.id, r.k if r.k is not None else "~")
        for r in DeltaTable(spark, loc).read().collect()
    )
    assert got == [(1, "a"), (3, "c"), (20, "b"), (40, "~")]


def test_writer_replace_where_rejects_nonmatching_rows(spark, tmp_path):
    """Incoming rows outside the predicate fail the write; table unchanged
    (delta-spark's replaceWhere contract)."""
    loc, _ = _two_part_tables(spark, tmp_path)
    bad = spark.createDataFrame([(10, "a"), (99, "b")], "id bigint, k string")
    with pytest.raises(Exception, match="does not satisfy"):
        bad.write.format("deltapy").mode("overwrite").option(
            "replaceWhere", "k = 'a'"
        ).save(loc)
    got = sorted(
        (r.id, r.k) for r in DeltaTable(spark, loc).read().collect()
    )
    assert got == [(1, "a"), (2, "a"), (3, "b"), (4, "c")]


def test_writer_replace_where_routes_general_predicates(spark, tmp_path):
    """Non-partition predicates still refuse with the routing message."""
    loc, _ = _two_part_tables(spark, tmp_path)
    df = spark.createDataFrame([(10, "a")], "id bigint, k string")
    with pytest.raises(Exception, match="DeltaTable.overwrite"):
        df.write.format("deltapy").mode("overwrite").option(
            "replaceWhere", "id > 2"
        ).save(loc)
    with pytest.raises(Exception, match="replaceWhere"):
        df.write.format("deltapy").mode("append").option(
            "replaceWhere", "k = 'a'"
        ).save(loc)


def test_writer_overwrite_race_raises(spark, tmp_path, monkeypatch):
    """ADVICE r4: an overwrite that loses the commit race must FAIL, not
    silently rebase its remove set over a commit it never observed."""
    import json as _json

    import delta_lake_validation_spark.sources.pydatasource as pyds

    loc = str(tmp_path / "race")
    df = spark.createDataFrame([(1, "a")], "id bigint, k string")
    df.write.format("deltapy").mode("append").option(
        "partitionBy", "k"
    ).save(loc)
    w = pyds.DeltaPyWriter(
        {"path": loc}, DeltaTable(spark, loc).snapshot().schema, True
    )
    # racer lands in the exact window between the writer's snapshot read
    # and its atomic create: intercept the create and commit the racer's
    # version first
    orig = pyds._atomic_create
    racer = _json.dumps(
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}}
    ) + "\n"

    def inject_then_create(path, content):
        if not inject_then_create.done:
            inject_then_create.done = True
            orig(path, racer)  # the racer wins this version
        return orig(path, content)

    inject_then_create.done = False
    monkeypatch.setattr(pyds, "_atomic_create", inject_then_create)
    with pytest.raises(DeltaProtocolError, match="concurrent commit"):
        w._commit_adds([], [], op="WRITE")
    # the overwrite did NOT retry past the racer's commit: the racer's
    # version is the head and the original rows are intact
    t = DeltaTable(spark, loc)
    assert t.latest_version() == 1  # create=0, racer=1, nothing after
    assert t._commit_actions(1) == [_json.loads(racer)]
    got = sorted((r.id, r.k) for r in t.read().collect())
    assert got == [(1, "a")]


def test_writer_create_race_validates_schema(spark, tmp_path):
    """ADVICE r4: losing the v0 create race re-validates schema and
    partitioning against the winner's metaData instead of silently mixing
    mismatched files in."""
    from delta_lake_validation_spark.sources.pydatasource import DeltaPyWriter
    from pyspark.sql.types import (
        LongType as _L,
        StringType as _S,
        StructField as _F,
        StructType as _T,
    )

    loc = str(tmp_path / "crace")
    schema = _T([_F("id", _L()), _F("k", _S())])
    w = DeltaPyWriter({"path": loc}, schema, False)  # plans a CREATE
    # the winner creates the table with a DIFFERENT schema
    spark.createDataFrame([(1.5,)], "x double").write.format(
        "deltapy"
    ).mode("append").save(loc)
    with pytest.raises(DeltaProtocolError, match="created concurrently"):
        w._commit_adds([], [], op="WRITE")
    # same-schema loser proceeds as a plain append
    w2 = DeltaPyWriter({"path": str(tmp_path / "crace2")}, schema, False)
    spark.createDataFrame([(7, "z")], "id bigint, k string").write.format(
        "deltapy"
    ).mode("append").save(str(tmp_path / "crace2"))
    w2._commit_adds([], [], op="WRITE")  # no-op append commits cleanly
    assert DeltaTable(spark, str(tmp_path / "crace2")).latest_version() == 1


def test_writer_stats_drop_nonfinite(spark, tmp_path):
    """ADVICE r4: NaN/Infinity min/max never serialize into add.stats —
    strict JSON parsers in other engines reject those tokens."""
    import math

    loc = str(tmp_path / "nan")
    spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1.5)], "id bigint, v double"
    ).coalesce(1).write.format("deltapy").mode("append").save(loc)
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.files
    total = 0
    for a in snap.files.values():
        raw = a.get("stats")
        text = raw if isinstance(raw, str) else json.dumps(raw)
        assert "NaN" not in text and "Infinity" not in text
        st = json.loads(text)
        total += st["numRecords"]
        for side in ("minValues", "maxValues"):
            v = st[side].get("v")
            assert v is None or math.isfinite(v)
    assert total == 3

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
