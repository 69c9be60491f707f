"""ACID DML queries with driver-checkable oracles (SURVEY.md §2.8).

The driver oracle can only grade analytic queries, so §2.8 (append /
overwrite / DELETE / UPDATE / MERGE / time travel / CDF) was previously
pytest-only evidence.  Each query here builds a throwaway ACID table from the
``nation`` table (25 rows at every TPC-H scale factor — SF-independent), runs
a DML sequence, and returns a deterministic snapshot diff (step, n_rows) that
a plain DuckDB ``SELECT`` over the same ``nation`` view reproduces.

ref DML shapes exercised: DELETE with partition predicate
(src/validation_suite.py:738-740), copy-on-write DELETE (:816-820), UPDATE
with predicate (:762-764), MERGE upsert (:489-524), time travel (:416-453),
CDF read (:480-486).

The result is materialized (a handful of rows) before the scratch table is
removed, so the returned DataFrame never references deleted files.
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.registry import register
from delta_lake_validation_spark.sources.acid.table import AcidTable
from delta_lake_validation_spark.tables import load_table

_SCRATCH_ROOT = Path(__file__).resolve().parents[2] / ".scratch" / "dml"


@contextlib.contextmanager
def _scratch():
    _SCRATCH_ROOT.mkdir(parents=True, exist_ok=True)
    loc = tempfile.mkdtemp(dir=_SCRATCH_ROOT)
    try:
        yield loc
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def _result(spark: SparkSession, rows: list[tuple[str, int]]) -> DataFrame:
    return spark.createDataFrame(rows, "step string, n_rows long").orderBy("step")


@register(
    "dml_append_versions",
    oracle="""
    SELECT * FROM (
      SELECT 'append_1' AS step,
             (SELECT count(*) FROM nation WHERE n_regionkey < 2) AS n_rows
      UNION ALL
      SELECT 'append_2_total', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'time_travel_v1',
             (SELECT count(*) FROM nation WHERE n_regionkey < 2)
    ) ORDER BY step
    """,
    tags=("acid", "dml"),
    doc="Two appends then a versioned read-back (§2.8 D1/D9).",
)
def dml_append_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(spark, loc, nation.schema)
        v1 = t.append(nation.filter("n_regionkey < 2"))
        v2 = t.append(nation.filter("n_regionkey >= 2"))
        rows = [
            ("append_1", t.read(version=v1).count()),
            ("append_2_total", t.read(version=v2).count()),
            ("time_travel_v1", t.read(version=v1).count()),
        ]
    return _result(spark, rows)


@register(
    "dml_delete_versions",
    oracle="""
    SELECT * FROM (
      SELECT 'after_partition_delete' AS step,
             (SELECT count(*) FROM nation WHERE n_regionkey <> 2) AS n_rows
      UNION ALL
      SELECT 'after_cow_delete',
             (SELECT count(*) FROM nation
              WHERE n_regionkey <> 2 AND n_name NOT LIKE 'A%')
      UNION ALL
      SELECT 'cdf_delete_rows',
             (SELECT count(*) FROM nation WHERE n_regionkey = 2)
             + (SELECT count(*) FROM nation
                WHERE n_regionkey <> 2 AND n_name LIKE 'A%')
    ) ORDER BY step
    """,
    tags=("acid", "dml", "cdf"),
    doc="Partition-pruned DELETE, then copy-on-write DELETE, CDF audit (§2.8 D4/D10).",
)
def dml_delete_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(
            spark,
            loc,
            nation.schema,
            partition_by=["n_regionkey"],
            properties={"enableChangeDataFeed": "true"},
        )
        t.append(nation)
        t.delete("n_regionkey = 2")  # metadata-only partition prune
        t.delete("n_name LIKE 'A%'")  # copy-on-write rewrite
        deletes = t.read_changes(start_version=0).filter(
            F.col("_change_type") == "delete"
        )
        rows = [
            ("after_partition_delete", t.read(version=2).count()),
            ("after_cow_delete", t.read().count()),
            ("cdf_delete_rows", deletes.count()),
        ]
    return _result(spark, rows)


@register(
    "dml_dv_delete",
    oracle="""
    SELECT * FROM (
      SELECT 'after_dv_delete' AS step,
             (SELECT count(*) FROM nation WHERE n_nationkey % 5 <> 1) AS n_rows
      UNION ALL
      SELECT 'cdf_dv_deletes',
             (SELECT count(*) FROM nation WHERE n_nationkey % 5 = 1)
      UNION ALL
      SELECT 'pre_delete_total', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'after_second_dv_delete',
             (SELECT count(*) FROM nation
              WHERE n_nationkey % 5 <> 1 AND n_nationkey % 7 <> 3)
      UNION ALL
      SELECT 'files_rewritten', 0
    ) ORDER BY step
    """,
    tags=("acid", "dml", "dv", "cdf"),
    doc="Deletion-vector DELETE scenario (sources/acid/table.py "
    "_delete_by_dv): two DV deletes with merged sidecars, zero files "
    "rewritten (asserted as a graded row), time travel to the pre-delete "
    "snapshot, and row-accurate CDF.  The no-rewrite contract is what "
    "makes small deletes O(matched rows) at 100 TB.",
)
def dml_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(
            spark,
            loc,
            nation.schema,
            properties={"enableChangeDataFeed": "true", "delete.mode": "dv"},
        )
        t.append(nation.coalesce(2))
        files_before = set(t.snapshot().files)
        t.delete("n_nationkey % 5 = 1")  # property routes to DV path
        t.delete("n_nationkey % 7 = 3")  # merges into existing sidecars
        files_after = set(t.snapshot().files)
        deletes = t.read_changes(start_version=0).filter(
            F.col("_change_type") == "delete"
        )
        rows = [
            ("after_dv_delete", t.read(version=2).count()),
            ("after_second_dv_delete", t.read().count()),
            ("pre_delete_total", t.read(version=1).count()),
            ("cdf_dv_deletes", deletes.filter("n_nationkey % 5 = 1").count()),
            ("files_rewritten", len(files_after ^ files_before)),
        ]
    return _result(spark, rows)


@register(
    "dml_merge_upsert",
    oracle="""
    SELECT * FROM (
      SELECT 'after_merge_total' AS step,
             (SELECT count(*) FROM nation) + 2 AS n_rows
      UNION ALL
      SELECT 'updated_rows',
             (SELECT count(*) FROM nation WHERE n_regionkey = 0)
      UNION ALL
      SELECT 'inserted_rows', 2
    ) ORDER BY step
    """,
    tags=("acid", "dml"),
    doc="MERGE upsert: matched rows update, unmatched insert (§2.3 J4 / §2.8 D6).",
)
def dml_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(spark, loc, nation.schema)
        t.append(nation)
        updates = nation.filter("n_regionkey = 0").withColumn(
            "n_name", F.lit("UPDATED")
        )
        inserts = (
            nation.orderBy("n_nationkey")
            .limit(2)
            .withColumn("n_nationkey", (F.col("n_nationkey") + 900).cast("int"))
            .withColumn("n_name", F.lit("INSERTED"))
        )
        t.merge(updates.unionByName(inserts), keys=["n_nationkey"])
        after = t.read()
        rows = [
            ("after_merge_total", after.count()),
            ("updated_rows", after.filter("n_name = 'UPDATED'").count()),
            ("inserted_rows", after.filter("n_nationkey >= 900").count()),
        ]
    return _result(spark, rows)


@register(
    "dml_update_cdf",
    oracle="""
    SELECT * FROM (
      SELECT 'bumped_rows' AS step,
             (SELECT count(*) FROM nation WHERE n_regionkey = 3) AS n_rows
      UNION ALL
      SELECT 'cdf_preimages',
             (SELECT count(*) FROM nation WHERE n_regionkey = 3)
      UNION ALL
      SELECT 'cdf_postimages',
             (SELECT count(*) FROM nation WHERE n_regionkey = 3)
      UNION ALL
      SELECT 'total_rows', (SELECT count(*) FROM nation)
    ) ORDER BY step
    """,
    tags=("acid", "dml", "cdf"),
    doc="UPDATE with predicate + CDF pre/post images (§2.8 D5/D10).",
)
def dml_update_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(
            spark,
            loc,
            nation.schema,
            properties={"enableChangeDataFeed": "true"},
        )
        t.append(nation)
        t.update({"n_name": "'BUMPED'"}, "n_regionkey = 3")
        changes = t.read_changes(start_version=0)
        rows = [
            ("bumped_rows", t.read().filter("n_name = 'BUMPED'").count()),
            (
                "cdf_preimages",
                changes.filter(F.col("_change_type") == "update_preimage").count(),
            ),
            (
                "cdf_postimages",
                changes.filter(F.col("_change_type") == "update_postimage").count(),
            ),
            ("total_rows", t.read().count()),
        ]
    return _result(spark, rows)


@register(
    "dml_optimize_vacuum",
    oracle="""
    SELECT * FROM (
      SELECT 'files_before' AS step,
             2 * (SELECT count(DISTINCT n_regionkey) FROM nation) AS n_rows
      UNION ALL
      SELECT 'files_after_optimize',
             (SELECT count(DISTINCT n_regionkey) FROM nation)
      UNION ALL
      SELECT 'rows_after_optimize', 2 * (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'vacuumed_files',
             2 * (SELECT count(DISTINCT n_regionkey) FROM nation)
    ) ORDER BY step
    """,
    tags=("acid", "maintenance"),
    doc="OPTIMIZE compaction + VACUUM reclaim, rows invariant (§2.8 D11/D12).",
)
def dml_optimize_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(
            spark, loc, nation.schema, partition_by=["n_regionkey"]
        )
        # two compact appends -> exactly one file per partition per append
        t.append(nation, compact=True)
        t.append(nation, compact=True)
        files_before = t.detail()["numFiles"]
        t.optimize(target_files=1)
        rows = [
            ("files_before", files_before),
            ("files_after_optimize", t.detail()["numFiles"]),
            ("rows_after_optimize", t.read().count()),
            ("vacuumed_files", len(t.vacuum(retain_hours=0.0))),
        ]
    return _result(spark, rows)


@register(
    "dml_restore_constraints",
    oracle="""
    SELECT * FROM (
      SELECT 'after_delete' AS step,
             (SELECT count(*) FROM nation WHERE n_regionkey <> 2) AS n_rows
      UNION ALL
      SELECT 'after_restore', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'restore_cdf_inserts', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'constraint_blocked', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'after_drop_append',
             (SELECT count(*) FROM nation)
             + (SELECT count(*) FROM nation WHERE n_regionkey = 0)
    ) ORDER BY step
    """,
    tags=("acid", "dml", "restore", "constraints"),
    doc="RESTORE past a DELETE (with CDF audit), then CHECK-constraint "
        "enforcement and drop (§2.8 extensions).",
)
def dml_restore_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sources.acid.errors import (
        ConstraintViolationError,
    )

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        t = AcidTable.create(
            spark,
            loc,
            nation.schema,
            properties={"enableChangeDataFeed": "true"},
        )
        # one data file: restore's file-level CDF (all original rows return
        # as inserts, all rewritten-file rows leave as deletes) is then
        # layout-independent and deterministic
        v1 = t.append(nation.coalesce(1))
        t.delete(F.col("n_regionkey") == 2)
        after_delete = t.read().count()
        rv = t.restore(v1)
        after_restore = t.read().count()
        cdf_inserts = (
            t.read_changes(rv, rv).filter(F.col("_change_type") == "insert").count()
        )
        t.add_constraint("sane_region", "n_regionkey < 10")
        bad = nation.filter(F.col("n_regionkey") == 0).withColumn(
            "n_regionkey", F.lit(99).cast("long")
        )
        try:
            t.append(bad)
            blocked = -1  # should be unreachable: constraint must reject
        except ConstraintViolationError:
            blocked = t.read().count()
        t.drop_constraint("sane_region")
        t.append(bad)
        rows = [
            ("after_delete", after_delete),
            ("after_restore", after_restore),
            ("restore_cdf_inserts", cdf_inserts),
            ("constraint_blocked", blocked),
            ("after_drop_append", t.read().count()),
        ]
    return _result(spark, rows)


@register(
    "dml_incremental_view",
    oracle="""
    SELECT * FROM (
      SELECT 'full_seed' AS step,
             (SELECT count(DISTINCT n_regionkey) FROM nation) AS n_rows
      UNION ALL
      SELECT 'incr_after_append',
             (SELECT count(DISTINCT n_regionkey) FROM nation) + 1
      UNION ALL
      SELECT 'incr_after_delete',
             (SELECT count(DISTINCT n_regionkey) FROM nation)
      UNION ALL
      SELECT 'sum_region_0',
             (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation
              WHERE n_regionkey = 0)
    ) ORDER BY step
    """,
    tags=("acid", "cdf", "view"),
    doc="Incremental materialized aggregate view maintained from the CDF: "
    "seed (full), append (incremental, new group appears), delete "
    "(incremental, group disappears), and a value check on an untouched "
    "group (delta_lake_validation_spark/materialized.py).",
)
def dml_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.materialized import IncrementalAggView

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as src_loc, _scratch() as view_loc:
        t = AcidTable.create(
            spark, src_loc, nation.schema,
            properties={"enableChangeDataFeed": "true"},
        )
        t.append(nation)
        view = IncrementalAggView(
            spark, t, view_loc, ["n_regionkey"], "n_nationkey"
        )
        s1 = view.refresh()
        n1 = view.read().count()
        t.append(
            spark.createDataFrame(
                [tuple(99 if f.dataType.simpleString() != "string" else "XX"
                       for f in nation.schema.fields)],
                nation.schema,
            )
        )
        s2 = view.refresh()
        n2 = view.read().count()
        t.delete("n_regionkey = 99")
        s3 = view.refresh()
        n3 = view.read().count()
        sum0 = (
            view.read().filter(F.col("n_regionkey") == 0)
            .select("sum_value").collect()[0][0]
        )
        assert (s1, s2, s3) == ("full", "incremental", "incremental"), (s1, s2, s3)
        rows = [
            ("full_seed", n1),
            ("incr_after_append", n2),
            ("incr_after_delete", n3),
            ("sum_region_0", int(sum0)),
        ]
    return _result(spark, rows)


@register(
    "delta_interop_read",
    oracle="""
    SELECT * FROM (
      SELECT 'latest_region_' || CAST(n_regionkey AS VARCHAR) AS step,
             count(*) AS n_rows
      FROM nation GROUP BY n_regionkey
      UNION ALL
      SELECT 'v0_total', (SELECT count(*) FROM nation)
    ) ORDER BY step
    """,
    tags=("acid", "delta", "interop"),
    doc="Authors a real _delta_log (protocol/metaData/add/remove JSON "
    "commits) over nation data, then reads it back through the Delta-"
    "protocol source with time travel (ref src/validation_suite.py:268-286 "
    "world: every reference table is a genuine Delta table).",
)
def delta_interop_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        root = Path(loc)

        def _one_file(df, sub: str) -> str:
            out = root / sub
            df.coalesce(1).write.mode("overwrite").parquet(str(out))
            name = next(p.name for p in out.iterdir() if p.name.endswith(".parquet"))
            return f"{sub}/{name}"

        f_all = _one_file(nation, "part-all")
        f_lo = _one_file(nation.filter("n_regionkey < 2"), "part-lo")
        f_hi = _one_file(nation.filter("n_regionkey >= 2"), "part-hi")

        log = root / "_delta_log"
        log.mkdir()
        meta = {
            "metaData": {
                "id": "delta-interop-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(nation.schema.jsonValue()),
                "partitionColumns": [],
                "configuration": {},
            }
        }
        proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

        def _commit(v: int, ts_ms: int, op: str, actions: list) -> None:
            head = {"commitInfo": {"timestamp": ts_ms, "operation": op}}
            (log / f"{v:020d}.json").write_text(
                "\n".join(_json.dumps(a) for a in [head] + actions) + "\n"
            )

        def _add(p: str) -> dict:
            return {
                "add": {
                    "path": p,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                }
            }

        _commit(0, 1700000000000, "WRITE", [proto, meta, _add(f_all)])
        _commit(
            1,
            1700000100000,
            "OVERWRITE",
            [
                {"remove": {"path": f_all, "deletionTimestamp": 1700000100000,
                            "dataChange": True}},
                _add(f_lo),
                _add(f_hi),
            ],
        )

        t = DeltaTable(spark, str(root))
        latest = (
            t.read()
            .groupBy("n_regionkey")
            .count()
            .select(
                F.concat(F.lit("latest_region_"), F.col("n_regionkey").cast("string"))
                .alias("step"),
                F.col("count").alias("n_rows"),
            )
        )
        v0_total = t.read(version=0).count()
        rows = [(r["step"], r["n_rows"]) for r in latest.collect()]
        rows.append(("v0_total", v0_total))
    return _result(spark, rows)


@register(
    "delta_dv_read",
    oracle="""
    SELECT * FROM (
      SELECT 'live_' || lang AS step, count(*) AS n_rows
      FROM documents WHERE doc_id < 1000 AND doc_id % 7 <> 3 GROUP BY lang
      UNION ALL
      SELECT 'v0_total', count(*) FROM documents WHERE doc_id < 1000
      UNION ALL
      SELECT 'cdf_deleted', count(*)
      FROM documents WHERE doc_id < 1000 AND doc_id % 7 = 3
    ) ORDER BY step
    """,
    tags=("acid", "delta", "interop", "dv"),
    doc="Authors a Delta table whose second commit deletes rows by a real "
    "deletion vector (protocol v3 deletionVectors: uuid sidecar file, "
    "z85 path, CRC'd 64-bit portable roaring bitmap — sources/dv.py), then "
    "grades the DV read path, DV time travel, and the bitmap-diff CDF "
    "against plain SQL predicates.  Modern Delta writers emit DVs for "
    "DELETE/MERGE by default, so this is the interop shape a reference "
    "user's tables actually have (ref src/validation_suite.py:545-700).",
)
def delta_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from delta_lake_validation_spark.sources.delta_log import DeltaTable
    from delta_lake_validation_spark.sources.dv import write_dv_file
    from delta_lake_validation_spark.sources.fs import FileSystem

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter("doc_id < 1000")  # SF-capped scenario, like the nation DMLs:
        # what is graded is the DV contract, not corpus throughput
    )
    with _scratch() as loc:
        root = Path(loc)
        out = root / "data"
        # one file, sorted by doc_id, so row_index == rank(doc_id) and the
        # deleted index set is derivable on both sides
        docs.repartition(1).sortWithinPartitions("doc_id").write.mode(
            "overwrite"
        ).parquet(str(out))
        fname = next(
            p.name for p in out.iterdir() if p.name.endswith(".parquet")
        )
        rel = f"data/{fname}"
        ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
        del_idx = [i for i, d in enumerate(ids) if d % 7 == 3]
        dv = write_dv_file(FileSystem(spark, loc), loc, del_idx)

        log = root / "_delta_log"
        log.mkdir()
        proto = {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        }
        meta = {
            "metaData": {
                "id": "delta-dv-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(docs.schema.jsonValue()),
                "partitionColumns": [],
                "configuration": {},
            }
        }

        def _commit(v: int, ts_ms: int, op: str, actions: list) -> None:
            head = {"commitInfo": {"timestamp": ts_ms, "operation": op}}
            (log / f"{v:020d}.json").write_text(
                "\n".join(_json.dumps(a) for a in [head] + actions) + "\n"
            )

        add_plain = {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        }
        add_dv = {
            "add": {**add_plain["add"], "deletionVector": dv},
        }
        _commit(0, 1700000000000, "WRITE", [proto, meta, add_plain])
        _commit(
            1,
            1700000100000,
            "DELETE",
            [
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": 1700000100000,
                        "dataChange": True,
                    }
                },
                add_dv,
            ],
        )

        t = DeltaTable(spark, loc)
        live = (
            t.read()
            .groupBy("lang")
            .count()
            .select(
                F.concat(F.lit("live_"), F.col("lang")).alias("step"),
                F.col("count").alias("n_rows"),
            )
        )
        rows = [(r["step"], r["n_rows"]) for r in live.collect()]
        rows.append(("v0_total", t.read(version=0).count()))
        rows.append(
            (
                "cdf_deleted",
                t.read_changes(1, 1).filter("_change_type = 'delete'").count(),
            )
        )
    return _result(spark, rows)


@register(
    "dedup_stream_scenario",
    oracle=r"""
    WITH toks AS (SELECT doc_id, doc_id % 3 AS g,
                         string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents WHERE doc_id < 1500),
    sh AS (SELECT doc_id, g,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(range(1, len(t)-1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s FROM toks),
    pairs AS (
      SELECT a.doc_id AS new_doc, b.doc_id AS match_doc,
             len(list_intersect(a.s, b.s)) AS inter,
             len(list_distinct(a.s || b.s)) AS uni,
             a.g AS ga, b.g AS gb, a.doc_id < b.doc_id AS ordered
      FROM sh a JOIN sh b ON a.doc_id != b.doc_id)
    SELECT new_doc, match_doc,
           CAST(floor(CAST(inter AS DOUBLE) / uni * 10000.0 + 0.5) / 10000.0
                AS DOUBLE) AS jaccard,
           within_batch, batch_id
    FROM (
      SELECT *, FALSE AS within_batch, CAST(0 AS BIGINT) AS batch_id
      FROM pairs WHERE ga = 1 AND gb = 0
      UNION ALL
      SELECT *, TRUE, CAST(0 AS BIGINT)
      FROM pairs WHERE ga = 1 AND gb = 1 AND ordered
      UNION ALL
      SELECT *, FALSE, CAST(1 AS BIGINT)
      FROM pairs WHERE ga = 2 AND gb IN (0, 1)
      UNION ALL
      SELECT *, TRUE, CAST(1 AS BIGINT)
      FROM pairs WHERE ga = 2 AND gb = 2 AND ordered
    )
    WHERE inter * 5 >= uni * 4
    """,
    tags=("streaming", "dedup", "acid"),
    doc="end-to-end streaming incremental dedup scenario "
    "(streaming/incremental_dedup.py): corpus=doc_id%3==0 seeds the ACID index, "
    "two micro-batches (%3==1, %3==2) flow through the exactly-once "
    "foreachBatch sink; every verdict row (index match / within-batch dup "
    "per batch) is EXACT Jaccard and reproduced by the DuckDB oracle",
)
def dedup_stream_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.streaming.incremental_dedup import (
        DedupIndex,
        dedup_stream_sink,
    )
    from delta_lake_validation_spark.tables import Tables

    docs = Tables(spark, sf_dir).documents
    with _scratch() as loc:
        docs = docs.filter("doc_id < 1500")  # SF-capped scenario, like
        # the nation-based DML queries: the streaming contract is what is
        # graded, not corpus throughput (bench has the batch dedup families)
        index = DedupIndex.create(
            spark, f"{loc}/index", docs.filter("doc_id % 3 = 0")
        )
        sink = dedup_stream_sink(
            spark, index, f"{loc}/results", threshold=0.8, query_id="scenario"
        )
        sink(docs.filter("doc_id % 3 = 1"), 0)
        sink(docs.filter("doc_id % 3 = 2"), 1)
        rows = AcidTable(spark, f"{loc}/results").read().collect()
    return spark.createDataFrame(
        rows,
        "new_doc long, match_doc long, jaccard double, "
        "within_batch boolean, batch_id long",
    )


@register(
    "delta_write_roundtrip",
    oracle="""
    SELECT * FROM (
      SELECT 'after_append' AS step,
             (SELECT count(*) FROM nation) AS n_rows
      UNION ALL
      SELECT 'append_cdf_inserts',
             (SELECT count(*) FROM nation WHERE n_regionkey >= 2)
      UNION ALL
      SELECT 'after_delete',
             (SELECT count(*) FROM nation WHERE n_regionkey <> 1)
      UNION ALL
      SELECT 'updated_rows',
             (SELECT count(*) FROM nation WHERE n_regionkey = 3)
      UNION ALL
      SELECT 'overwrite_total',
             (SELECT count(*) FROM nation WHERE n_regionkey = 0)
      UNION ALL
      SELECT 'v0_total',
             (SELECT count(*) FROM nation WHERE n_regionkey < 2)
    ) ORDER BY step
    """,
    tags=("acid", "delta", "interop", "dml"),
    doc="Writer half of Delta interop on one table: author a real "
    "_delta_log at v0, APPEND (staged hive parquet + atomic JSON commit, "
    "CDF-derived inserts), row-level DELETE (copy-on-write rewrite of "
    "touched files), row-level UPDATE (arithmetic assignment), OVERWRITE "
    "(add+remove in one commit), then time-travel back to v0 — every DML "
    "a reference user runs on a Delta table, through this engine's writer.",
)
def delta_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as loc:
        root = Path(loc)
        sub = root / "part-v0"
        nation.filter("n_regionkey < 2").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sub))
        f0 = "part-v0/" + next(
            p.name for p in sub.iterdir() if p.name.endswith(".parquet")
        )
        log = root / "_delta_log"
        log.mkdir()
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "delta-write-fixture",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _json.dumps(nation.schema.jsonValue()),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {
                "add": {
                    "path": f0,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                }
            },
        ]
        (log / f"{0:020d}.json").write_text(
            "\n".join(_json.dumps(a) for a in actions) + "\n"
        )
        t = DeltaTable(spark, str(root))
        v1 = t.append(nation.filter("n_regionkey >= 2"))
        after_append = t.read().count()
        cdf_inserts = (
            t.read_changes(v1, v1).filter("_change_type = 'insert'").count()
        )
        t.delete("n_regionkey = 1")
        t2 = DeltaTable(spark, str(root))
        after_delete = t2.read().count()
        t2.update({"n_nationkey": "n_nationkey + 1000"}, "n_regionkey = 3")
        t3 = DeltaTable(spark, str(root))
        updated_rows = t3.read().filter("n_nationkey >= 1000").count()
        t3.overwrite(nation.filter("n_regionkey = 0"))
        fresh = DeltaTable(spark, str(root))
        rows = [
            ("after_append", after_append),
            ("append_cdf_inserts", cdf_inserts),
            ("after_delete", after_delete),
            ("updated_rows", updated_rows),
            ("overwrite_total", fresh.read().count()),
            ("v0_total", fresh.read(version=0).count()),
        ]
    return _result(spark, rows)


@register(
    "delta_pyds_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'write_total' AS step, (SELECT count(*) FROM nation) AS n_rows
      UNION ALL
      SELECT 'pruned_r2', (SELECT count(*) FROM nation WHERE n_regionkey = 2)
      UNION ALL
      SELECT 'time_travel_v0', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'streamed_total',
             (SELECT count(*) FROM nation)
             + (SELECT count(*) FROM nation WHERE n_regionkey < 2)
    ) ORDER BY step
    """,
    tags=("delta", "datasource", "streaming"),
    doc="Python Data Source (format('deltapy'), SPARK-44076) end-to-end: "
    "executor-staged partitioned write, partition-pruned batch read, "
    "versionAsOf time travel, and an exactly-once availableNow stream of "
    "the commit log — the native spark.read/readStream/write binding of "
    "the engine's Delta protocol implementation (reference binds "
    "delta-spark for the same surface, src/validation_suite.py:229-231, "
    "reads :425-453).",
)
def delta_pyds_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sources.pydatasource import (
        register as _ds_register,
    )

    # the grading driver hands us a bare session: opt into python-source
    # filter pushdown and register the format at runtime
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    _ds_register(spark)
    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as root:
        loc = f"{root}/tbl"
        nation.write.format("deltapy").mode("append").option(
            "partitionBy", "n_regionkey"
        ).save(loc)
        write_total = spark.read.format("deltapy").load(loc).count()
        pruned = (
            spark.read.format("deltapy")
            .load(loc)
            .filter("n_regionkey = 2")
            .count()
        )
        nation.filter("n_regionkey < 2").write.format("deltapy").mode(
            "append"
        ).save(loc)
        v0 = (
            spark.read.format("deltapy")
            .option("versionAsOf", 0)
            .load(loc)
            .count()
        )
        q = (
            spark.readStream.format("deltapy")
            .option("startingVersion", "0")
            .load(loc)
            .writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        streamed = spark.read.parquet(f"{root}/out").count()
        rows = [
            ("write_total", write_total),
            ("pruned_r2", pruned),
            ("time_travel_v0", v0),
            ("streamed_total", streamed),
        ]
    return _result(spark, rows)


@register(
    "delta_clone_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'clone_total' AS step, (SELECT count(*) FROM nation) AS n_rows
      UNION ALL
      SELECT 'clone_after_append', (SELECT count(*) FROM nation) + 1
      UNION ALL
      SELECT 'source_unchanged', (SELECT count(*) FROM nation)
      UNION ALL
      SELECT 'deep_after_source_gone', (SELECT count(*) FROM nation)
    ) ORDER BY step
    """,
    tags=("delta", "clone"),
    doc="CLONE table management: shallow clone (metadata-only, absolute-"
    "path adds) reads identically, evolves independently of its source, "
    "and a deep clone survives source deletion (CREATE TABLE … CLONE "
    "surface; reference table-management family, "
    "src/validation_suite.py:268-307).",
)
def delta_clone_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _shutil

    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        clone_delta,
        create_delta,
    )

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as root:
        src = f"{root}/src"
        create_delta(spark, src, nation.schema, partition_by=["n_regionkey"])
        DeltaTable(spark, src).append(nation)
        shallow = f"{root}/shallow"
        clone_delta(spark, src, shallow, shallow=True)
        clone_total = DeltaTable(spark, shallow).read().count()
        c = DeltaTable(spark, shallow)
        c.append(nation.limit(1))
        clone_after = DeltaTable(spark, shallow).read().count()
        source_unchanged = DeltaTable(spark, src).read().count()
        deep = f"{root}/deep"
        clone_delta(spark, src, deep, shallow=False)
        _shutil.rmtree(src)
        deep_total = DeltaTable(spark, deep).read().count()
        rows = [
            ("clone_total", clone_total),
            ("clone_after_append", clone_after),
            ("source_unchanged", source_unchanged),
            ("deep_after_source_gone", deep_total),
        ]
    return _result(spark, rows)


@register(
    "delta_convert_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'converted_total' AS step, (SELECT count(*) FROM nation) AS n_rows
      UNION ALL
      SELECT 'skipped_read', (SELECT count(*) FROM nation WHERE n_regionkey = 3)
      UNION ALL
      SELECT 'after_append', (SELECT count(*) FROM nation) * 2
      UNION ALL
      SELECT 'evolved_nulls', (SELECT count(*) FROM nation)
    ) ORDER BY step
    """,
    tags=("delta", "convert"),
    doc="CONVERT TO DELTA in place (zero-copy adoption of a hive-"
    "partitioned parquet directory with footer-derived skipping stats), "
    "then mergeSchema append: the evolved column is null for every "
    "pre-conversion row (delta-spark CONVERT + mergeSchema surface).",
)
def delta_convert_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        convert_to_delta,
    )

    nation = load_table(spark, sf_dir, "nation")
    with _scratch() as root:
        loc = f"{root}/plain"
        nation.write.partitionBy("n_regionkey").parquet(loc)
        t = convert_to_delta(
            spark, loc, partition_schema="n_regionkey int"
        )
        converted = t.read().count()
        skipped = t.read_where({"n_regionkey": (3, 3)}).count()
        extra = nation.withColumn("note", F.lit("r2"))
        DeltaTable(spark, loc).append(extra, merge_schema=True)
        t2 = DeltaTable(spark, loc)
        after_append = t2.read().count()
        evolved_nulls = t2.read().filter("note IS NULL").count()
        rows = [
            ("converted_total", converted),
            ("skipped_read", skipped),
            ("after_append", after_append),
            ("evolved_nulls", evolved_nulls),
        ]
    return _result(spark, rows)


@register(
    "delta_skipping_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'files_mid' AS step, 1 AS n_rows
      UNION ALL
      SELECT 'full_total', (SELECT count(*) FROM orders)
      UNION ALL
      SELECT 'mid_catalyst',
             (SELECT count(*) FROM orders
              WHERE o_orderkey BETWEEN 1000 AND 3000)
      UNION ALL
      SELECT 'mid_driver',
             (SELECT count(*) FROM orders
              WHERE o_orderkey BETWEEN 1000 AND 3000)
      UNION ALL
      SELECT 'tail_overlay',
             (SELECT count(*) FROM orders
              WHERE o_orderkey BETWEEN 4500 AND 6000)
    ) ORDER BY step
    """,
    tags=("delta", "skipping"),
    doc="Checkpoint-as-data file pruning: orders lands in key-ranged files, "
    "a checkpoint is written, one more file arrives in the JSON tail; the "
    "same range scan then runs BOTH ways — read_where(distributed=True) "
    "plans skipping as a Catalyst job over the checkpoint's add rows "
    "(collecting only survivors, delta-spark's 'the log is data' design) "
    "and distributed=False replays driver-side — and both must agree with "
    "each other and the oracle, while files_mid pins that pruning really "
    "reduced the mid-range scan to its single covering file.",
)
def delta_skipping_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
        write_delta_checkpoint,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # key-ranged chunks so min/max stats are disjoint and prunable; the
    # [4000, 8000) slice stays out of the checkpoint and arrives as tail.
    # An empty chunk commits a 0-row file, which numRecords pruning then
    # skips on every read — no pre-count guard needed.
    chunks = [
        "o_orderkey < 4000",
        "o_orderkey >= 8000 AND o_orderkey < 16000",
        "o_orderkey >= 16000",
    ]
    with _scratch() as root:
        loc = f"{root}/tbl"
        t = create_delta(spark, loc, orders.schema)
        for pred in chunks:
            t.append(orders.filter(pred).coalesce(1))
        write_delta_checkpoint(spark, loc)
        t.append(
            orders.filter("o_orderkey >= 4000 AND o_orderkey < 8000").coalesce(1)
        )
        fresh = DeltaTable(spark, loc)
        mid = {"o_orderkey": (1000, 3000)}
        d_mid = fresh.read_where(mid, distributed=True)
        rows = [
            ("files_mid", len(d_mid.inputFiles())),
            ("full_total", fresh.read_where({"o_orderkey": (None, None)},
                                            distributed=True).count()),
            ("mid_catalyst", d_mid.count()),
            ("mid_driver", fresh.read_where(mid, distributed=False).count()),
            ("tail_overlay", fresh.read_where(
                {"o_orderkey": (4500, 6000)}, distributed=True).count()),
        ]
    return _result(spark, rows)


@register(
    "delta_overwrite_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'dynamic_kept' AS step,
             (SELECT count(*) FROM nation WHERE n_regionkey <> 2) AS n_rows
      UNION ALL
      SELECT 'dynamic_replaced', 3
      UNION ALL
      SELECT 'replace_where_kept',
             (SELECT count(*) FROM nation
              WHERE n_regionkey <> 2 AND n_regionkey <> 1)
      UNION ALL
      SELECT 'replace_where_new', 2
      UNION ALL
      SELECT 'violation_refused', 1
    ) ORDER BY step
    """,
    tags=("delta", "dml", "overwrite"),
    doc="Scoped overwrites on a real Delta table: dynamic partition "
    "overwrite (partitionOverwriteMode=dynamic — only the partitions the "
    "frame writes are replaced) and replaceWhere (predicate-scoped atomic "
    "overwrite; rows violating the predicate refuse with a typed error) — "
    "the delta-spark option surfaces, value-graded against the nation "
    "oracle.",
)
def delta_overwrite_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaProtocolError,
        DeltaTable,
        create_delta,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    with _scratch() as root:
        loc = f"{root}/tbl"
        t = create_delta(
            spark, loc, nation.schema, partition_by=["n_regionkey"]
        )
        t.append(nation)
        # dynamic: replace ONLY region 2 with 3 synthetic rows
        repl = spark.createDataFrame(
            [(900 + i, f"D{i}", 2) for i in range(3)],
            "n_nationkey int, n_name string, n_regionkey int",
        ).select(*[F.col(f.name).cast(f.dataType) for f in nation.schema.fields])
        DeltaTable(spark, loc).overwrite(repl, dynamic_partitions=True)
        after_dyn = DeltaTable(spark, loc).read()
        dynamic_kept = after_dyn.filter("n_regionkey <> 2").count()
        dynamic_replaced = after_dyn.filter("n_regionkey = 2").count()
        # replaceWhere: region 1 becomes 2 synthetic rows, atomically
        repl2 = spark.createDataFrame(
            [(950, "R0", 1), (951, "R1", 1)],
            "n_nationkey int, n_name string, n_regionkey int",
        ).select(*[F.col(f.name).cast(f.dataType) for f in nation.schema.fields])
        DeltaTable(spark, loc).overwrite(repl2, replace_where="n_regionkey = 1")
        after_rw = DeltaTable(spark, loc).read()
        rw_kept = after_rw.filter(
            "n_regionkey <> 2 AND n_regionkey <> 1"
        ).count()
        rw_new = after_rw.filter("n_regionkey = 1").count()
        try:
            DeltaTable(spark, loc).overwrite(
                repl2, replace_where="n_regionkey = 3"
            )
            refused = 0
        except DeltaProtocolError:
            refused = 1
        rows = [
            ("dynamic_kept", dynamic_kept),
            ("dynamic_replaced", dynamic_replaced),
            ("replace_where_kept", rw_kept),
            ("replace_where_new", rw_new),
            ("violation_refused", refused),
        ]
    return _result(spark, rows)


@register(
    "delta_features_scenario",
    oracle="""
    SELECT * FROM (
      SELECT 'clustered_read' AS step,
             (SELECT count(*) FROM nation) AS n_rows
      UNION ALL
      SELECT 'rowtracking_ids', (SELECT count(*) FROM nation) * 2
      UNION ALL
      SELECT 'rowtracking_preserved',
             (SELECT count(*) FROM nation) * 2 - 2
      UNION ALL
      SELECT 'variant_roundtrip', (SELECT count(*) FROM nation)
    ) ORDER BY step
    """,
    tags=("delta", "clustering", "rowtracking", "variant"),
    doc="Round-5 Delta table features end-to-end: CLUSTER BY table whose "
    "OPTIMIZE Z-orders by the delta.clustering domain columns; "
    "rowTracking assignment (contiguous baseRowId ranges, high-water "
    "mark domain) with DV-delete id preservation; a variantType column "
    "round-tripping JSON through create/append/read.  Counts are "
    "emitted only when the protocol-level checks hold, so a silent "
    "feature regression value-mismatches the oracle.",
)
def delta_features_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        clustering_columns,
        create_delta,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n = nation.count()
    with _scratch() as root:
        # --- clustered table: create CLUSTER BY, append, optimize
        cl = f"{root}/clustered"
        t = create_delta(
            spark, cl, nation.schema, cluster_by=["n_regionkey", "n_nationkey"]
        )
        t.append(nation)
        DeltaTable(spark, cl).optimize()  # Z-orders by the domain columns
        snap = DeltaTable(spark, cl).snapshot()
        clustered_ok = clustering_columns(snap) == [
            "n_regionkey",
            "n_nationkey",
        ] and snap.num_files == 1
        clustered_read = DeltaTable(spark, cl).read().count() if clustered_ok else -1

        # --- rowTracking: two appends -> contiguous id ranges + watermark
        rt = f"{root}/rowtracked"
        create_delta(
            spark,
            rt,
            nation.schema,
            properties={
                "delta.enableRowTracking": "true",
                "delta.enableDeletionVectors": "true",
            },
        )
        DeltaTable(spark, rt).append(nation.coalesce(1))
        DeltaTable(spark, rt).append(nation.coalesce(1))
        s = DeltaTable(spark, rt).snapshot()
        spans = sorted(
            (
                int(a["baseRowId"]),
                int(_json.loads(a["stats"])["numRecords"]),
            )
            for a in s.files.values()
        )
        contiguous = spans[0][0] == 0 and all(
            spans[i][0] == spans[i - 1][0] + spans[i - 1][1]
            for i in range(1, len(spans))
        )
        hwm = _json.loads(s.domains["delta.rowTracking"])[
            "rowIdHighWaterMark"
        ]
        ids_ok = contiguous and hwm == 2 * n - 1
        rowtracking_ids = (hwm + 1) if ids_ok else -1

        # --- DV delete keeps every remaining file's original baseRowId
        pre_ids = sorted(a["baseRowId"] for a in s.files.values())
        DeltaTable(spark, rt).delete("n_nationkey = 3")
        s2 = DeltaTable(spark, rt).snapshot()
        preserved = (
            sorted(a["baseRowId"] for a in s2.files.values()) == pre_ids
        )
        live = DeltaTable(spark, rt).read().count()
        rowtracking_preserved = live if preserved else -1

        # --- variant column round-trip
        va = f"{root}/variant"
        vdf = nation.selectExpr(
            "n_nationkey", "parse_json(to_json(struct(n_name, n_regionkey))) AS v"
        )
        create_delta(spark, va, vdf.schema)
        DeltaTable(spark, va).append(vdf)
        back = (
            DeltaTable(spark, va)
            .read()
            .selectExpr(
                "n_nationkey",
                "CAST(variant_get(v, '$.n_regionkey', 'int') AS INT) AS r",
            )
        )
        joined = back.join(
            nation, ["n_nationkey"]
        ).filter("r = n_regionkey")
        variant_roundtrip = joined.count()

        rows = [
            ("clustered_read", clustered_read),
            ("rowtracking_ids", rowtracking_ids),
            ("rowtracking_preserved", rowtracking_preserved),
            ("variant_roundtrip", variant_roundtrip),
        ]
    return _result(spark, rows)
