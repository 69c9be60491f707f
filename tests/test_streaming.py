"""Streaming surface tests: file-source micro-batches driven to completion
with availableNow, results checked against the equivalent batch computation
(the streaming/batch unification Spark guarantees)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from delta_lake_validation_spark.streaming import (
    session_counts,
    stream_appends,
    tumbling_counts,
)
from delta_lake_validation_spark.tables import EVENTS_SCHEMA, _events_ts_scale

from .conftest import SF_DIR

# the physical ts unit varies across testdata generations (see tables.py);
# normalize raw INT64 -> epoch-nanos -> event-time TIMESTAMP
_TS_SCALE = _events_ts_scale(os.path.join(SF_DIR, "events.parquet"))
_TS_UTC = f"timestamp_micros((ts * {_TS_SCALE}) div 1000)"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_src")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")
    return str(d)


def _stream(spark, events_dir):
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    return raw.withColumn("ts_utc", F.expr(_TS_UTC))


def _run(q_df, spark, name):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_match_batch(spark, events_dir):
    out = _run(tumbling_counts(_stream(spark, events_dir)), spark, "tumbling")
    batch = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts_utc", F.expr(_TS_UTC))
        .groupBy(F.window("ts_utc", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == batch.count()
    assert out.agg(F.sum("n")).collect()[0][0] == batch.agg(F.sum("n")).collect()[0][0]


def test_session_counts_run(spark, events_dir):
    out = _run(session_counts(_stream(spark, events_dir), gap="10 minutes"), spark, "sessions")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)
    # every event is in exactly one session
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).count()


def test_stream_appends_from_acid_table(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from delta_lake_validation_spark.sources.acid import AcidTable

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(
        spark, loc, "k INT, v STRING, d DATE", partition_by=["d"]
    )
    rows = [Row(k=i, v=f"v{i}", d=dt.date(2024, 1, 1 + i % 2)) for i in range(10)]
    t.append(spark.createDataFrame(rows, "k INT, v STRING, d DATE"))
    t.append(spark.createDataFrame(rows, "k INT, v STRING, d DATE"))

    stream = stream_appends(spark, loc)
    q = (
        stream.writeStream.format("memory")
        .queryName("acid_appends")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM acid_appends")
    assert got.count() == 20
    assert set(got.columns) == {"k", "v", "d"}
    # partition column survives the streaming read
    assert got.select("d").distinct().count() == 2


def test_stateful_running_totals(spark, events_dir):
    from delta_lake_validation_spark.streaming import running_user_totals

    out = running_user_totals(_stream(spark, events_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.n_events, r.total_value) for r in spark.sql(
        "SELECT * FROM totals").collect()}
    batch = {
        r.user_id: (r.n, round(r.s, 2))
        for r in spark.read.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid in batch:
        assert got[uid][0] == batch[uid][0]
        assert abs(got[uid][1] - batch[uid][1]) < 0.05


def test_stream_changes_delivers_dml(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.streaming import stream_changes

    loc = os.path.join(str(tmp_path), "cdfstream")
    t = AcidTable.create(
        spark, loc, "k INT, v DOUBLE, d DATE",
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame(
        [Row(k=i, v=float(i), d=dt.date(2024, 1, 1)) for i in range(4)],
        "k INT, v DOUBLE, d DATE"))
    t.update({"v": "v * 10"}, "k = 1")
    t.delete("k = 2")

    q = (
        stream_changes(spark, loc)
        .writeStream.format("memory").queryName("cdf_rows")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cdf_rows").collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert {r.k for r in by_type["update_preimage"]} == {1}
    assert by_type["update_postimage"][0].v == 10.0
    assert {r.k for r in by_type["delete"]} == {2}


def test_sliding_counts_cover_events(spark, events_dir):
    from delta_lake_validation_spark.streaming import sliding_counts

    out = _run(
        sliding_counts(_stream(spark, events_dir), window="1 hour", slide="30 minutes"),
        spark,
        "sliding",
    )
    # each event lands in window/slide = 2 windows
    total = out.agg(F.sum("n")).collect()[0][0]
    n_events = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).count()
    assert total == 2 * n_events


def test_acid_sink_exactly_once(spark, events_dir, tmp_path):
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.streaming import acid_sink
    from delta_lake_validation_spark.streaming.acid_sink import last_committed_batch

    loc = os.path.join(str(tmp_path), "sinktbl")
    AcidTable.create(spark, loc, EVENTS_SCHEMA)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    sink = acid_sink(spark, loc, query_id="evsink")

    def drain():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(events_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    t = AcidTable(spark, loc)
    n = t.read().count()
    assert n == spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).count()
    # replaying the same batch id must be a no-op (exactly-once on restart)
    first_batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    sink(first_batch, 0)
    assert t.read().count() == n
    assert last_committed_batch(t, "evsink") >= 0
    # a NEW batch id still appends
    sink(first_batch.limit(5), last_committed_batch(t, "evsink") + 1)
    assert t.read().count() == n + 5


def test_dedup_stream_drops_redeliveries(spark, events_dir, tmp_path):
    import shutil

    from delta_lake_validation_spark.streaming import dedup_stream

    # duplicate the source file => every event delivered twice
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    shutil.copy(os.path.join(events_dir, "events.parquet"), dup_dir + "/a.parquet")
    shutil.copy(os.path.join(events_dir, "events.parquet"), dup_dir + "/b.parquet")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(dup_dir)
        .withColumn("ts_utc", F.expr(_TS_UTC))
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) FROM dedup_out").collect()[0][0]
    assert n == spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).count()


def test_stream_table_changes_complete_feed(spark, tmp_path):
    """Unified change stream = appends-as-inserts + DML row changes, with
    copy-on-write rewrites (rw-* files) never surfacing as phantom inserts."""
    import os

    from pyspark.sql import functions as F

    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.streaming import stream_table_changes

    loc = os.path.join(str(tmp_path), "unified")
    t = AcidTable.create(
        spark, loc, "k INT, v DOUBLE", properties={"enableChangeDataFeed": "true"}
    )
    t.append(spark.createDataFrame([(i, float(i)) for i in range(10)], "k INT, v DOUBLE"))
    t.update({"v": "v * 2"}, "k < 3")      # rewrites all 10 rows, changes 3
    t.delete("k >= 8")                     # rewrites, deletes 2
    q = (
        stream_table_changes(spark, loc)
        .writeStream.format("memory")
        .queryName("unified_changes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT _change_type, count(*) AS n FROM unified_changes GROUP BY 1")
        .collect()
    )
    counts = {r._change_type: r.n for r in got}
    # 10 appended inserts; 3 update pre + 3 post; 2 deletes — and crucially
    # NOT the 10+8 rewritten rows the rw-* files carry
    assert counts == {
        "insert": 10,
        "update_preimage": 3,
        "update_postimage": 3,
        "delete": 2,
    }
    # batch CDF agrees on the same feed
    batch = {
        r._change_type: r.n
        for r in t.read_changes(0)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert batch == counts


def test_interval_join_stream_matches_batch(spark, events_dir):
    """Stream-stream interval join (purchase <- views in preceding hour)
    equals the batch time-bound join — and bounded state comes from the
    watermark + time condition (append mode would otherwise be rejected)."""
    from delta_lake_validation_spark.streaming import interval_join_stream

    src = _stream(spark, events_dir)
    buys = src.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", F.col("ts_utc")
    )
    views = src.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts_utc").alias("v_ts_utc"),
    )
    joined = interval_join_stream(
        buys, views, key="user_id", right_key="v_user_id",
        left_ts="ts_utc", right_ts="v_ts_utc", lookback="1 hour",
    )
    q = (
        joined.writeStream.format("memory").queryName("ivj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT buy_id, view_id FROM ivj")

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).withColumn(
        "ts_utc", F.expr(_TS_UTC)
    )
    bb = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts_utc"
    )
    bv = batch.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts_utc").alias("v_ts_utc"),
    )
    expected = bb.join(
        bv,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_ts_utc") < F.col("ts_utc"))
        & (F.col("v_ts_utc") >= F.col("ts_utc") - F.expr("INTERVAL 1 hour")),
    ).select("buy_id", "view_id")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_committed_change_feed_ignores_uncommitted_files(spark, tmp_path):
    """The log-driven feed serves only committed transactions: a stray
    staged file in the table directory (crashed/racing writer) is never
    emitted, and the cursor survives handoff across feed instances."""
    from delta_lake_validation_spark.sources.acid.table import AcidTable
    from delta_lake_validation_spark.streaming.cdf_stream import (
        CommittedChangeFeed,
    )

    loc = str(tmp_path / "t")
    t = AcidTable.create(
        spark, loc, "id int", properties={"enableChangeDataFeed": "true"}
    )
    feed = CommittedChangeFeed(spark, loc)
    t.append(spark.createDataFrame([(1,), (2,)], "id int"))
    b1 = feed.next_batch()
    assert {(r.id, r._change_type) for r in b1.collect()} == {
        (1, "insert"), (2, "insert")
    }
    assert feed.next_batch() is None  # nothing new

    # simulate a crashed writer: a data-shaped file present in the
    # directory but admitted by no commit
    stray = spark.createDataFrame([(99,)], "id int")
    stray.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    src = next(p for p in (tmp_path / "stray").iterdir() if p.name.endswith(".parquet"))
    (tmp_path / "t" / "part-deadbeef.parquet").write_bytes(src.read_bytes())

    t.delete("id = 1")
    # resume from a NEW feed instance at the persisted cursor
    feed2 = CommittedChangeFeed(spark, loc, start_version=feed.position)
    b2 = feed2.next_batch()
    rows = {(r.id, r._change_type) for r in b2.collect()}
    assert (1, "delete") in rows
    assert all(r[0] != 99 for r in rows)  # stray file never surfaces


def test_delta_committed_change_feed(spark, tmp_path):
    """DeltaCommittedChangeFeed consumes a REAL `_delta_log` incrementally:
    appends surface as inserts, a whole-file delete as deletes, and a new
    feed instance resumes exactly-once from the persisted cursor."""
    import json as _json

    from delta_lake_validation_spark.streaming.cdf_stream import (
        DeltaCommittedChangeFeed,
    )

    loc = tmp_path / "dt"
    log = loc / "_delta_log"

    def _wp(rows, sub):
        spark.createDataFrame(rows, "id int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(loc / sub))
        f = next(
            p.name for p in (loc / sub).iterdir() if p.name.endswith(".parquet")
        )
        return f"{sub}/{f}"

    def _commit(v, actions):
        log.mkdir(parents=True, exist_ok=True)
        (log / f"{v:020d}.json").write_text(
            "\n".join(_json.dumps(a) for a in actions) + "\n"
        )

    meta = {
        "metaData": {
            "id": "feed",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "id", "type": "integer",
                         "nullable": True, "metadata": {}}
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    f0 = _wp([(1,), (2,)], "g0")
    _commit(0, [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                meta,
                {"add": {"path": f0, "partitionValues": {}, "size": 1,
                         "modificationTime": 1700000000000,
                         "dataChange": True}}])
    feed = DeltaCommittedChangeFeed(spark, str(loc))
    b0 = feed.next_batch()
    assert {(r.id, r._change_type) for r in b0.collect()} == {
        (1, "insert"), (2, "insert")
    }
    assert feed.next_batch() is None

    # another writer lands two more commits: append + whole-file delete
    f1 = _wp([(3,)], "g1")
    _commit(1, [{"add": {"path": f1, "partitionValues": {}, "size": 1,
                         "modificationTime": 1700000001000,
                         "dataChange": True}}])
    _commit(2, [{"remove": {"path": f0,
                            "deletionTimestamp": 1700000002000,
                            "dataChange": True}}])
    feed2 = DeltaCommittedChangeFeed(
        spark, str(loc), start_version=feed.position
    )
    b1 = feed2.next_batch()
    rows = {(r.id, r._change_type, r._commit_version) for r in b1.collect()}
    assert rows == {(3, "insert", 1), (1, "delete", 2), (2, "delete", 2)}
    assert feed2.next_batch() is None


def test_change_feed_stream_checkpointed_replay(spark, tmp_path):
    """ChangeFeedStream (VERDICT r3 task 6): stream==batch equivalence over
    a multi-commit REAL Delta table, restart resume from the checkpoint,
    and crash-replay idempotence — killing the driver between offset-log
    and commit replays the SAME batch id with the SAME rows, so a
    batch-id-deduping sink stays exactly-once."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )
    from delta_lake_validation_spark.streaming.cdf_stream import (
        ChangeFeedStream,
    )

    loc = os.path.join(str(tmp_path), "cfs")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    t = create_delta(
        spark, loc, "id int, v string",
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id int, v string"))
    t.update({"v": "'B'"}, "id = 2")

    seen: dict[int, list[tuple]] = {}

    def sink(df, batch_id):
        seen.setdefault(batch_id, []).extend(
            sorted((r["id"], r["v"], r["_change_type"]) for r in df.collect())
        )

    s = ChangeFeedStream(spark, loc, ckpt, delta=True)
    assert s.process_available(sink) == 1
    batch_rows = sorted(r for rows in seen.values() for r in rows)
    expected = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in DeltaTable(spark, loc).read_changes(0).collect()
    )
    assert batch_rows == expected  # stream == batch over all commits
    assert s.process_available(sink) == 0  # nothing new -> no batch

    # new commit, NEW driver instance (restart): resumes from checkpoint
    t.delete("id = 1")
    s2 = ChangeFeedStream(spark, loc, ckpt, delta=True)
    assert s2.process_available(sink) == 1
    assert 1 in seen and any(ct == "delete" for _, _, ct in seen[1])

    # crash between offset-log and commit: remove the commit marker and
    # re-run — batch 1 replays with the same id and identical rows
    replay_before = list(seen[1])
    os.remove(os.path.join(ckpt, "commits", "1"))
    s3 = ChangeFeedStream(spark, loc, ckpt, delta=True)
    assert s3.process_available(sink) == 1
    assert seen[1] == replay_before + replay_before  # same rows, same id
    # a batch-id-deduping consumer therefore sees each change exactly once
    assert s3.process_available(sink) == 0


def test_stream_appends_ignores_uncommitted_files(spark, tmp_path):
    """VERDICT r4 task 3: stream_appends is log-driven (acidpy source) —
    a racing/crashed writer's staged-but-uncommitted part-* file never
    appears in any micro-batch, and commits landed between triggers are
    picked up exactly once."""
    import shutil

    from delta_lake_validation_spark.sources.acid import AcidTable

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(spark, loc, "id int, k string", partition_by=["k"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id int, k string"))

    # crashed writer: data-shaped part-* files in the table dir (root and
    # partition dir) admitted by no commit — the old glob source would
    # stream these
    stray_src = spark.createDataFrame([(99, "a")], "id int, k string")
    stray_src.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stray")
    )
    src = next(
        p for p in (tmp_path / "stray").iterdir()
        if p.name.endswith(".parquet")
    )
    shutil.copy(src, tmp_path / "t" / "k=a" / "part-deadbeef.parquet")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _run_once():
        q = (
            stream_appends(spark, loc)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run_once()
    got = {(r.id, r.k) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b")}  # stray 99 never surfaces

    # a later committed append flows exactly once across a restart from
    # the checkpointed offset; the stray file still doesn't
    t.append(spark.createDataFrame([(3, "a")], "id int, k string"))
    _run_once()
    got2 = sorted(
        (r.id, r.k) for r in spark.read.parquet(out).collect()
    )
    assert got2 == [(1, "a"), (2, "b"), (3, "a")]


def test_stream_appends_skips_rewrites(spark, tmp_path):
    """Copy-on-write DML rewrites (rw-*) must not re-emit old rows as
    phantom inserts on the append feed."""
    from delta_lake_validation_spark.sources.acid import AcidTable

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(
        spark, loc, "id int", properties={"enableChangeDataFeed": "true"}
    )
    t.append(spark.createDataFrame([(i,) for i in range(10)], "id int"))
    t.delete("id = 3")  # copy-on-write rewrite of the touched file

    q = (
        stream_appends(spark, loc)
        .writeStream.format("memory")
        .queryName("acid_rw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.sql("SELECT * FROM acid_rw").collect())
    assert got == list(range(10))  # the append, once; no rewrite re-emits


def test_stream_changes_ignores_uncommitted_change_files(spark, tmp_path):
    """stream_changes / stream_table_changes are log-driven: a crashed
    writer's staged-but-unrecorded _change_data files never surface."""
    import datetime as dt

    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.streaming import (
        stream_changes,
        stream_table_changes,
    )

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(
        spark, loc, "id int", properties={"enableChangeDataFeed": "true"}
    )
    t.append(spark.createDataFrame([(i,) for i in range(5)], "id int"))
    t.delete("id = 2")

    # crashed writer: a change-shaped file under _change_data recorded by
    # no commit — the old directory-listing stream would emit it
    stray = spark.createDataFrame([(99, "delete")], "id int, _change_type string")
    stray.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    src = next(
        p for p in (tmp_path / "stray").iterdir()
        if p.name.endswith(".parquet")
    )
    dest = tmp_path / "t" / "_change_data" / "deadbeef"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "part-00000-stray.parquet").write_bytes(src.read_bytes())

    for fn, qname in ((stream_changes, "chg"), (stream_table_changes, "tch")):
        q = (
            fn(spark, loc)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    chg = {(r.id, r._change_type) for r in spark.sql("SELECT * FROM chg").collect()}
    assert chg == {(2, "delete")}  # the committed DML change, nothing else
    tch = {(r.id, r._change_type) for r in spark.sql("SELECT * FROM tch").collect()}
    assert tch == {(i, "insert") for i in range(5)} | {(2, "delete")}


def test_acidpy_rate_limit_and_starting_timestamp(spark, tmp_path):
    """acidpy backlog protection: maxFilesPerTrigger caps how many commits
    one micro-batch spans (monotone cursor, oversized commits still flow),
    and startingTimestamp picks the first commit at-or-after (delta-spark
    rules) — a fresh stream over a long history never plans the whole
    backlog as one batch."""
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.pystream import (
        AcidPyStreamReader,
        _first_version_at_or_after,
    )
    from delta_lake_validation_spark.sources.acid.log import TransactionLog

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(spark, loc, "id int")
    for i in range(6):  # v1..v6, one single-file append each
        t.append(spark.createDataFrame([(i,)], "id int").coalesce(1))

    r = AcidPyStreamReader({"path": loc, "maxfilespertrigger": "2"})
    offs = []
    cur = r.initialOffset()
    for _ in range(5):
        nxt = r.latestOffset()
        if nxt["version"] == cur["version"]:
            break
        r.partitions(cur, nxt)
        offs.append(nxt["version"])
        cur = nxt
    # 6 single-file commits, 2 files per trigger -> 3 batches: v2, v4, v6
    assert offs == [2, 4, 6]

    # oversized single commit still flows (cap 1 file, commit has many)
    t.append(spark.createDataFrame([(i,) for i in range(100)], "id int"))
    r2 = AcidPyStreamReader(
        {"path": loc, "maxfilespertrigger": "1", "startingversion": "7"}
    )
    nxt = r2.latestOffset()
    assert nxt["version"] == 7  # the whole oversized commit, alone

    # startingTimestamp: first commit at-or-after the v4 commit's stamp
    log = TransactionLog(None, loc)
    ts4 = log.read_entry(4)["timestamp"]
    assert _first_version_at_or_after(log, ts4) == 4
    r3 = AcidPyStreamReader({"path": loc, "startingtimestamp": ts4})
    assert r3.initialOffset() == {"version": 3}  # serves v4 onward
    with pytest.raises(ValueError, match="not both"):
        AcidPyStreamReader(
            {"path": loc, "startingtimestamp": ts4, "startingversion": "2"}
        )

    # e2e: capped availableNow pump still delivers everything exactly once
    from delta_lake_validation_spark.sources.acid.pystream import register

    register(spark)
    out = str(tmp_path / "out")
    for _ in range(6):  # capped availableNow pumps until caught up
        (
            spark.readStream.format("acidpy")
            .option("path", loc)
            .option("maxFilesPerTrigger", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == sorted(list(range(6)) + list(range(100)))


def test_acidpy_stream_refuses_schema_change(spark, tmp_path):
    """A mid-stream schema change refuses (deltapy contract): serving
    old-schema batches would silently null/drop columns."""
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.pystream import (
        AcidPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(spark, loc, "id int")
    t.append(spark.createDataFrame([(1,)], "id int"))
    r = AcidPyStreamReader({"path": loc})
    cur = r.latestOffset()
    assert r.partitions(r.initialOffset(), cur)  # pre-change batch fine

    t.add_column("extra", "string")
    t.append(spark.createDataFrame([(2, "x")], "id int, extra string"))
    with pytest.raises(ValueError, match="schema changed"):
        r.partitions(cur, r.latestOffset())
    # a fresh stream picks up the new schema and serves everything
    r2 = AcidPyStreamReader({"path": loc})
    parts = r2.partitions(r2.initialOffset(), r2.latestOffset())
    rows = [row for p in parts for rb in r2.read(p) for row in rb.to_pylist()]
    assert sorted((x["id"], x.get("extra")) for x in rows) == [
        (1, None), (2, "x")
    ]

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
