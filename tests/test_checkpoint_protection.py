"""checkpointProtection writer feature (VERDICT r6 "Next round" task 5).

Modern delta-spark tables increasingly carry the checkpointProtection
writer feature; its ONLY writer obligation concerns metadata cleanup: log
entries below ``delta.requireCheckpointProtectionBeforeVersion`` may be
truncated only in one sweep up to a checkpoint at/past the boundary.
These tests pin: (1) writes to such a table no longer refuse, (2) cleanup
refuses to truncate while the newest checkpoint predates the boundary,
(3) a partially-expired protected prefix is kept whole, and (4) once a
checkpoint exists at/past the boundary the whole protected range goes in
one go and the table still replays."""

from __future__ import annotations

import os
import time as _time

import pytest

from delta_lake_validation_spark.sources.delta_log import (
    DeltaTable,
    create_delta,
    write_delta_checkpoint,
)


def _mk_protected(spark, tmp_path, n_commits=5, protect_v=4):
    loc = str(tmp_path / "cp")
    t = create_delta(spark, loc, "v int")
    for i in range(n_commits):
        t.append(spark.createDataFrame([(i,)], "v int"))
    t.alter_properties(
        {"delta.requireCheckpointProtectionBeforeVersion": str(protect_v)}
    )
    return loc, t


def _backdate_all(log_dir):
    old = _time.time() - 3600
    for n in os.listdir(log_dir):
        p = os.path.join(log_dir, n)
        if os.path.isfile(p):
            os.utime(p, (old, old))


def test_feature_written_and_writes_allowed(spark, tmp_path):
    loc, t = _mk_protected(spark, tmp_path)
    proto = t.snapshot().protocol
    assert proto.get("minWriterVersion") == 7
    assert "checkpointProtection" in (proto.get("writerFeatures") or [])
    # a table already carrying the feature accepts writes (previously the
    # writer-feature gate refused)
    t2 = DeltaTable(spark, loc)
    t2.append(spark.createDataFrame([(100,)], "v int"))
    assert {r.v for r in t2.read().collect()} == {0, 1, 2, 3, 4, 100}


def test_cleanup_refused_while_checkpoint_below_boundary(spark, tmp_path):
    # boundary PAST every existing version: the newest possible checkpoint
    # still predates it, so no truncation at all is permitted
    loc, t = _mk_protected(spark, tmp_path, n_commits=5, protect_v=20)
    v_ck = write_delta_checkpoint(spark, loc)
    assert v_ck < 20
    log = os.path.join(loc, "_delta_log")
    _backdate_all(log)
    assert DeltaTable(spark, loc).cleanup_log(retain_hours=0) == []
    jsons = sorted(
        int(n.split(".")[0]) for n in os.listdir(log) if n.endswith(".json")
    )
    assert jsons == list(range(v_ck + 1))


def test_partial_protected_prefix_kept_whole(spark, tmp_path):
    loc, t = _mk_protected(spark, tmp_path, n_commits=5, protect_v=4)
    v_ck = write_delta_checkpoint(spark, loc)  # at/past the boundary
    assert v_ck >= 4
    log = os.path.join(loc, "_delta_log")
    _backdate_all(log)
    # commit 2 is young again: the expired prefix stops INSIDE the
    # protected range -> nothing below the boundary may be cleaned
    now = _time.time()
    os.utime(os.path.join(log, f"{2:020d}.json"), (now, now))
    gone = DeltaTable(spark, loc).cleanup_log(retain_hours=0.5)
    assert gone == []
    jsons = sorted(
        int(n.split(".")[0]) for n in os.listdir(log) if n.endswith(".json")
    )
    assert 0 in jsons and 1 in jsons


def test_one_go_cleanup_past_boundary(spark, tmp_path):
    loc, t = _mk_protected(spark, tmp_path, n_commits=5, protect_v=4)
    t.append(spark.createDataFrame([(99,)], "v int"))
    v_ck = write_delta_checkpoint(spark, loc)
    assert v_ck >= 4
    log = os.path.join(loc, "_delta_log")
    _backdate_all(log)
    gone = DeltaTable(spark, loc).cleanup_log(retain_hours=0)
    # the WHOLE protected prefix went in one sweep
    assert {f"{v:020d}.json" for v in range(4)} <= set(gone)
    dt = DeltaTable(spark, loc)
    assert {r.v for r in dt.read().collect()} == {0, 1, 2, 3, 4, 99}
    with pytest.raises(Exception):
        dt.read(version=1).collect()

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
