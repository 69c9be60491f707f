"""VARIANT footer shim (VERDICT r6 "Next round" task 6).

Spark 4.1 annotates variant parquet with the VARIANT LogicalType that the
container's pyarrow 16.1 cannot parse at the footer.  footer_patch.py
rewrites the annotation out of the thrift compact footer in memory; the
engine's writers stage variant parquet UNSHREDDED so both scan legs serve
the same files.  Pins: (1) the raw patcher round-trips a real Spark-4.1
footer, (2) non-variant footers are declared as such, (3) engine-written
variant tables read identically through deltapy and the JVM leg (incl.
after checkpoint), (4) since r8, SHREDDED foreign files ASSEMBLE with JVM
parity (sources/variant_shred.py) — incl. mixed shredded+plain tables,
per-field residuals, nested shapes, and the raw codec round-trip."""

from __future__ import annotations

import glob
import json
import os
import shutil
import struct

import pytest

from delta_lake_validation_spark.sources.delta_log import (
    DeltaTable,
    create_delta,
    write_delta_checkpoint,
)
from delta_lake_validation_spark.sources.footer_patch import (
    FooterPatchError,
    patch_variant_footer,
    read_patched_metadata,
)


def _variant_df(spark, n=10):
    return spark.sql(
        "SELECT id, parse_json(concat('{\"x\": ', id, '}')) AS v "
        f"FROM range({n})"
    )


def _write_raw_variant(spark, out_dir, shredded: bool):
    key = "spark.sql.variant.writeShredding.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, str(shredded).lower())
    try:
        _variant_df(spark).coalesce(1).write.mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set(key, old)
    return glob.glob(os.path.join(out_dir, "part-*.parquet"))[0]


def _footer(path: str) -> bytes:
    with open(path, "rb") as f:
        raw = f.read()
    flen = struct.unpack("<I", raw[-8:-4])[0]
    assert raw[-4:] == b"PAR1"
    return raw[-8 - flen : -8]


def test_patch_roundtrip_on_real_spark41_footer(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = _write_raw_variant(spark, str(tmp_path / "raw"), shredded=False)
    # unpatched footer refuses in this pyarrow
    with pytest.raises(OSError, match="LogicalType"):
        pq.ParquetFile(src).schema_arrow
    patched, dropped = patch_variant_footer(_footer(src))
    assert dropped == 1
    buf = b"PAR1" + patched + struct.pack("<I", len(patched)) + b"PAR1"
    meta = pq.read_metadata(pa.BufferReader(buf))
    assert meta.num_rows == 10
    # full scan through the patched metadata: plain value/metadata group
    fs = pa.fs.LocalFileSystem()
    with fs.open_input_file(src) as fh:
        pf = pq.ParquetFile(fh, metadata=read_patched_metadata(fh))
        t = pf.read()
    v = t.column("v").combine_chunks()
    assert {v.type.field(i).name for i in range(v.type.num_fields)} == {
        "value",
        "metadata",
    }
    assert v.field("value").null_count == 0


def test_patch_passthrough_on_real_testdata_footers():
    """The transformer must walk ANY real footer byte-faithfully: every
    testdata table's footer (big row groups, stats, key-value metadata,
    column orders) round-trips byte-identical with dropped == 0."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    files = glob.glob(os.path.join(sf, "*.parquet")) + glob.glob(
        os.path.join(sf, "*.parquet", "*.parquet")
    )
    checked = 0
    for p in files:
        footer = _footer(p)
        out, dropped = patch_variant_footer(footer)
        assert dropped == 0 and out == footer, p
        checked += 1
    assert checked >= 5


def test_patch_declares_variant_free_footers(spark, tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "plain.parquet")
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "plaindir")
    )
    shutil.copy(glob.glob(str(tmp_path / "plaindir/part-*.parquet"))[0], p)
    footer = _footer(p)
    same, dropped = patch_variant_footer(footer)
    assert dropped == 0 and same == footer  # byte-true pass-through
    fs = pa.fs.LocalFileSystem()
    with fs.open_input_file(p) as fh:
        with pytest.raises(FooterPatchError, match="no VARIANT"):
            read_patched_metadata(fh)


def test_deltapy_parity_on_engine_written_variant(spark, tmp_path):
    from delta_lake_validation_spark.sources import pydatasource

    from pyspark.sql.types import LongType, StructField, StructType, VariantType

    loc = str(tmp_path / "var")
    create_delta(
        spark,
        loc,
        StructType(
            [StructField("id", LongType()), StructField("v", VariantType())]
        ),
    )
    dt = DeltaTable(spark, loc)
    dt.append(_variant_df(spark))
    # engine-staged files must be UNSHREDDED and deltapy-scannable
    jvm = sorted(
        (r.id, r.j)
        for r in dt.read().selectExpr("id", "to_json(v) AS j").collect()
    )
    pydatasource.register(spark)
    py = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert py == jvm and len(py) == 10
    # survives checkpoint-era replay too
    write_delta_checkpoint(spark, loc)
    py2 = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert py2 == jvm


def _foreign_add(loc: str, src: str, fname: str, version: int) -> None:
    """Smuggle a foreign parquet file into the table as a hand-written
    add commit."""
    shutil.copy(src, os.path.join(loc, fname))
    add = {
        "path": fname,
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(loc, fname)),
        "modificationTime": 0,
        "dataChange": True,
    }
    with open(
        os.path.join(loc, "_delta_log", f"{version:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"add": add}) + "\n")


def test_shredded_foreign_file_reads_parity(spark, tmp_path):
    """A shredded variant file smuggled into a table reads through the
    deltapy assembly (sources/variant_shred.py) with JVM parity — the r7
    refusal flipped to a reconstruction (VERDICT r7 task 3)."""
    from delta_lake_validation_spark.sources import pydatasource
    from pyspark.sql.types import LongType, StructField, StructType, VariantType

    loc = str(tmp_path / "varshred")
    create_delta(
        spark,
        loc,
        StructType(
            [StructField("id", LongType()), StructField("v", VariantType())]
        ),
    )
    shredded_src = _write_raw_variant(
        spark, str(tmp_path / "rawshred"), shredded=True
    )
    _foreign_add(loc, shredded_src, "part-shredded.parquet", 1)
    pydatasource.register(spark)
    jvm = sorted(
        (r.id, r.j)
        for r in DeltaTable(spark, loc)
        .read()
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    py = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert py == jvm and len(py) == 10


def test_mixed_shredded_and_unshredded_files_parity(spark, tmp_path):
    """One table, one shredded file + one unshredded file + one
    engine-written file: the scan must detect the layout per file and
    serve all three identically to the JVM leg."""
    from delta_lake_validation_spark.sources import pydatasource
    from pyspark.sql.types import LongType, StructField, StructType, VariantType

    loc = str(tmp_path / "varmix")
    create_delta(
        spark,
        loc,
        StructType(
            [StructField("id", LongType()), StructField("v", VariantType())]
        ),
    )
    dt = DeltaTable(spark, loc)
    dt.append(_variant_df(spark))  # engine-staged, unshredded, ids 0..9
    shredded = _write_shifted(spark, str(tmp_path / "s1"), shredded=True, base=100)
    plain = _write_shifted(spark, str(tmp_path / "s2"), shredded=False, base=200)
    _foreign_add(loc, shredded, "part-foreign-shred.parquet", 2)
    _foreign_add(loc, plain, "part-foreign-plain.parquet", 3)
    pydatasource.register(spark)
    jvm = sorted(
        (r.id, r.j)
        for r in DeltaTable(spark, loc)
        .read()
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    py = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert py == jvm and len(py) == 30


def _write_shifted(spark, out_dir, shredded: bool, base: int):
    key = "spark.sql.variant.writeShredding.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, str(shredded).lower())
    try:
        spark.sql(
            "SELECT id + {b} AS id, parse_json(concat('{{\"x\": ', id + {b}, "
            "', \"s\": \"t', id, '\"}}')) AS v FROM range(10)".format(b=base)
        ).coalesce(1).write.mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set(key, old)
    return glob.glob(os.path.join(out_dir, "part-*.parquet"))[0]


def test_shredded_rich_shapes_parity(spark, tmp_path):
    """Shredding edge shapes through the full deltapy read: per-field
    residuals (type mismatch), extra unshredded fields, nested objects,
    arrays, top-level nulls, SQL nulls."""
    from delta_lake_validation_spark.sources import pydatasource
    from pyspark.sql.types import LongType, StructField, StructType, VariantType

    cases = [
        # (sql CASE expr over id, n)
        ("""CASE WHEN id % 3 = 0 THEN concat('{"x": ', id, ', "s": "a", "e": 9}')
             ELSE concat('{"x": ', id, ', "s": "b"}') END""", 6),
        ("""CASE WHEN id % 3 = 0 THEN '{"x": "str"}'
             ELSE concat('{"x": ', id, '}') END""", 6),
        ("""concat('{"x": ', id, ', "nest": {"a": ', id * 2,
             ', "b": "t"}, "arr": [', id, ', ', id + 1, ']}')""", 5),
        ("""concat('[', id, ', ', id + 1, ']')""", 5),
        ("""CASE WHEN id % 2 = 0 THEN concat('{"x": ', id, '}')
             ELSE 'null' END""", 6),
        ("""CASE WHEN id = 3 THEN NULL
             ELSE concat('{"d": 1.5, "b": true, "t": "q', id, '"}') END""", 6),
    ]
    from pyspark.sql.types import VariantType  # noqa: F811

    pydatasource.register(spark)
    key = "spark.sql.variant.writeShredding.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        for ci, (expr, n) in enumerate(cases):
            df = spark.sql(
                f"SELECT id, parse_json({expr}) AS v FROM range({n})"
            )
            loc = str(tmp_path / f"rich{ci}")
            create_delta(
                spark,
                loc,
                StructType(
                    [
                        StructField("id", LongType()),
                        StructField("v", VariantType()),
                    ]
                ),
            )
            raw = str(tmp_path / f"rawrich{ci}")
            df.coalesce(1).write.mode("overwrite").parquet(raw)
            _foreign_add(
                loc,
                glob.glob(os.path.join(raw, "part-*.parquet"))[0],
                "part-rich.parquet",
                1,
            )
            want = sorted(
                (r.id, r.j)
                for r in df.selectExpr("id", "to_json(v) AS j").collect()
            )
            got = sorted(
                (r.id, r.j)
                for r in spark.read.format("deltapy")
                .load(loc)
                .selectExpr("id", "to_json(v) AS j")
                .collect()
            )
            assert got == want, (ci, got, want)
    finally:
        spark.conf.set(key, old)


def test_variant_codec_roundtrips_spark_binaries(spark, tmp_path):
    """decode+re-encode of Spark-written UNSHREDDED variant binaries is
    semantics-preserving: the fresh pair feeds back through Spark's
    VariantType reader with identical to_json."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_lake_validation_spark.sources.footer_patch import (
        read_patched_metadata,
    )
    from delta_lake_validation_spark.sources.variant_shred import (
        decode_metadata,
        decode_value,
        encode_variant,
    )

    df = spark.sql(
        """SELECT id, parse_json(CASE id % 6
        WHEN 0 THEN concat('{"x": ', id, ', "arr": [1, 2.5, null]}')
        WHEN 1 THEN '{"nested": {"a": {"b": [true, false]}}, "n": -3}'
        WHEN 2 THEN 'null'
        WHEN 3 THEN '[9, "mixed", {"k": 1e30}]'
        WHEN 4 THEN '"a string well past the sixty-four byte short-string cutoff so the long path is exercised too"'
        ELSE '{"big": 123456789012345678901234567.5}' END) AS v
        FROM range(12)"""
    )
    src_dir = str(tmp_path / "plainvar")
    key = "spark.sql.variant.writeShredding.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(src_dir)
    finally:
        spark.conf.set(key, old)
    src = glob.glob(os.path.join(src_dir, "part-*.parquet"))[0]
    fs = pa.fs.LocalFileSystem()
    with fs.open_input_file(src) as fh:
        t = pq.ParquetFile(fh, metadata=read_patched_metadata(fh)).read()
    v = t.column("v").combine_chunks()
    ids, vals, metas = [], [], []
    for i in range(len(v)):
        keys = decode_metadata(v.field("metadata")[i].as_py())
        node = decode_value(v.field("value")[i].as_py(), 0, keys)
        m2, v2 = encode_variant(node)
        ids.append(t.column("id")[i].as_py())
        vals.append(v2)
        metas.append(m2)
    re_path = str(tmp_path / "reenc.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.StructArray.from_arrays(
                    [pa.array(vals, pa.binary()), pa.array(metas, pa.binary())],
                    names=["value", "metadata"],
                ),
            }
        ),
        re_path,
    )
    got = sorted(
        (r.id, r.j)
        for r in spark.read.schema("id long, v variant")
        .parquet(re_path)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    want = sorted(
        (r.id, r.j) for r in df.selectExpr("id", "to_json(v) AS j").collect()
    )
    assert got == want
