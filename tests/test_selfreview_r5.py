"""Regression pins for the round-5 self-review findings:

1. deltapy replaceWhere refuses NULL inside IN lists (SQL three-valued
   logic: set-membership over a list containing NULL gets NOT IN exactly
   backwards — it would delete every non-matching partition).
2. Remote-facade checkpoint re-writes keep the existing file (no
   delete-before-rename missing-file window for a racing reader).
3. The worker-shipping zip is keyed by source content, not driver PID —
   a stale cache file can never ship outdated code to executors.
4. DML commit entries record change-file sizes (``cdf_sizes``) so the
   acidpy change feeds rate-cap and bin-pack a DML backlog instead of
   planning it as one batch / one task.
"""

from __future__ import annotations

import os

import pytest

from delta_lake_validation_spark.sources.acid import AcidTable
from delta_lake_validation_spark.sources.delta_log import DeltaTable


def test_replace_where_null_in_list_refuses(spark, tmp_path):
    """`k NOT IN (..., NULL)` must not silently become set-membership."""
    loc = str(tmp_path / "nin")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, k string"
    ).write.format("deltapy").mode("append").option(
        "partitionBy", "k"
    ).save(loc)
    df = spark.createDataFrame([(10, "a")], "id bigint, k string")
    for pred in ("k NOT IN ('a', NULL)", "k IN ('a', NULL)", "k IN ()"):
        with pytest.raises(Exception, match="DeltaTable.overwrite"):
            df.write.format("deltapy").mode("overwrite").option(
                "replaceWhere", pred
            ).save(loc)
    # table unchanged: nothing was removed by the refused writes
    got = sorted((r.id, r.k) for r in DeltaTable(spark, loc).read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_checkpoint_rewrite_keeps_existing_file(spark, tmp_path, monkeypatch):
    """Re-checkpointing a version through the remote facade must never
    delete the existing checkpoint (a reader whose listing already saw it
    would hit FileNotFound mid-read); the staged tmp is discarded."""
    from delta_lake_validation_spark.sources import delta_log as dlmod
    from delta_lake_validation_spark.sources import fs as fsmod
    from delta_lake_validation_spark.sources.delta_log import (
        write_delta_checkpoint,
    )

    loc = str(tmp_path / "ck")
    spark.createDataFrame([(1,)], "id bigint").write.format("deltapy").mode(
        "append"
    ).save(loc)
    uri = "file:" + loc
    monkeypatch.setattr(fsmod, "is_local", lambda p: False)
    monkeypatch.setattr(dlmod, "is_local", lambda p: False)
    assert write_delta_checkpoint(spark, uri) == 0
    dst = tmp_path / "ck" / "_delta_log" / "00000000000000000000.checkpoint.parquet"
    before = os.stat(dst)
    write_delta_checkpoint(spark, uri)  # same version again
    after = os.stat(dst)
    monkeypatch.undo()
    # same inode — the file was never deleted or replaced
    assert (before.st_ino, before.st_mtime_ns) == (
        after.st_ino,
        after.st_mtime_ns,
    )
    log = dst.parent
    assert not [p for p in log.iterdir() if p.name.startswith(".ckpt-tmp-")]
    # and it still replays
    assert DeltaTable(spark, loc).read().count() == 1


def test_shipping_zip_keyed_by_content(tmp_path, monkeypatch):
    """Editing package source must produce a different cache path (a
    PID-keyed name survives process exit and a recycled PID would ship
    stale code to executors)."""
    import delta_lake_validation_spark.shipping as shipping

    pkg = tmp_path / "fakepkg"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    monkeypatch.setattr(shipping, "_PKG_DIR", pkg)
    z1 = shipping._build_zip()
    assert os.path.exists(z1)
    (pkg / "a.py").write_text("x = 2  # changed\n")
    z2 = shipping._build_zip()
    assert z1 != z2  # content change -> new key, stale zip never reused
    import zipfile

    with zipfile.ZipFile(z2) as z:
        assert b"changed" in z.read("fakepkg/a.py")
    os.unlink(z1)
    os.unlink(z2)


def test_cdf_sizes_ride_commits_and_cap_dml_backlog(spark, tmp_path):
    """Change-file sizes land in the commit entry, and the changes feed's
    maxBytesPerTrigger splits a DML-only backlog into multiple batches
    (it used to count change files as 0 files / 0 bytes)."""
    from delta_lake_validation_spark.sources.acid.log import TransactionLog
    from delta_lake_validation_spark.sources.acid.pystream import (
        AcidPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "t")
    t = AcidTable.create(
        spark,
        loc,
        "id int, v int",
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(i, i) for i in range(6)], "id int, v int"))
    for i in range(3):  # DML-only backlog: v2..v4, each update writes cdf
        t.update({"v": "v + 100"}, f"id = {i}")

    log = TransactionLog(None, loc)
    for v in (2, 3, 4):
        e = log.read_entry(v)
        assert e["cdf"], f"v{v} should carry change files"
        sizes = e.get("cdf_sizes")
        assert sizes and all(sizes[p] > 0 for p in e["cdf"])

    # 1-byte cap: each DML commit must flow alone (3 batches), because
    # change files now count toward the byte cap
    r = AcidPyStreamReader(
        {
            "path": loc,
            "feed": "changes",
            "maxbytespertrigger": "1",
            "startingversion": "2",
        }
    )
    offs, cur = [], r.initialOffset()
    for _ in range(6):
        nxt = r.latestOffset()
        if nxt["version"] == cur["version"]:
            break
        r.partitions(cur, nxt)
        offs.append(nxt["version"])
        cur = nxt
    assert offs == [2, 3, 4]

    # bin-packing: with real sizes, a multi-file change batch spreads
    # across tasks when sizes exceed maxBytesPerTask
    r2 = AcidPyStreamReader(
        {"path": loc, "feed": "changes", "maxbytespertask": "1"}
    )
    parts = r2.partitions({"version": 1}, {"version": 4})
    n_files = sum(len(p.files) for p in parts)
    assert n_files >= 3 and len(parts) == n_files  # 1-byte bins: one each


def test_deltapy_cdf_caps_count_cdc_files(spark, tmp_path):
    """A pure-DML backlog (cdc + removes, no counted adds) must trip the
    deltapy change-feed rate cap — the cap counts what the feed serves."""
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamReader,
    )

    from delta_lake_validation_spark.sources.delta_log import create_delta

    loc = str(tmp_path / "cdfcap")
    create_delta(
        spark,
        loc,
        "id bigint, v bigint",
        properties={"delta.enableChangeDataFeed": "true"},
    )
    DeltaTable(spark, loc).append(
        spark.createDataFrame([(i, i) for i in range(8)], "id bigint, v bigint")
    )
    for i in range(3):  # v2..v4: copy-on-write deletes, each with cdc
        DeltaTable(spark, loc).delete(f"id = {i}")
    r = DeltaPyStreamReader(
        {
            "path": loc,
            "readchangefeed": "true",
            "startingversion": "2",
            "maxfilespertrigger": "1",
        }
    )
    offs, cur = [], r.initialOffset()
    for _ in range(6):
        nxt = r.latestOffset()
        if nxt["version"] == cur["version"]:
            break
        r.partitions(cur, nxt)
        offs.append(nxt["version"])
        cur = nxt
    assert offs == [2, 3, 4]  # one DML commit per micro-batch
