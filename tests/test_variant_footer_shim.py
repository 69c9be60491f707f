"""VARIANT footer shim (VERDICT r6 "Next round" task 6).

Spark 4.1 annotates variant parquet with the VARIANT LogicalType that the
container's pyarrow 16.1 cannot parse at the footer.  footer_patch.py
rewrites the annotation out of the thrift compact footer in memory; the
engine's writers stage variant parquet UNSHREDDED so both scan legs serve
the same files.  Pins: (1) the raw patcher round-trips a real Spark-4.1
footer, (2) non-variant footers are declared as such, (3) engine-written
variant tables read identically through deltapy and the JVM leg (incl.
after checkpoint), (4) SHREDDED foreign files refuse typed — never a
silent all-null read."""

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


def test_shredded_foreign_file_refuses_typed(spark, tmp_path):
    """A shredded variant file smuggled into a table must refuse loudly:
    value is null for shredded rows, so silent assembly would read
    nulls."""
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
    fname = "part-shredded.parquet"
    shutil.copy(shredded_src, os.path.join(loc, fname))
    # hand-commit the foreign add (version 1)
    add = {
        "path": fname,
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(loc, fname)),
        "modificationTime": 0,
        "dataChange": True,
    }
    with open(
        os.path.join(loc, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"add": add}) + "\n")
    pydatasource.register(spark)
    with pytest.raises(Exception, match="SHREDDED"):
        spark.read.format("deltapy").load(loc).collect()
    # the JVM leg still serves it (allowReadingShredded)
    assert DeltaTable(spark, loc).read().count() == 10
