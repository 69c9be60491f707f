"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle on the same parquet
tables, then compares row count, schema (loosely), and an order-insensitive
value comparison.  Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from delta_lake_validation_spark.plans import REGISTRY  # noqa: E402
from delta_lake_validation_spark.session import get_session  # noqa: E402
from delta_lake_validation_spark.tables import TABLE_NAMES  # noqa: E402
from delta_lake_validation_spark.testing import compare_frames  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("selfcheck")
    con = duckdb.connect()
    # pin the oracle's parallelism: under shared-VM load duckdb's detected
    # default has been observed at ~3 effective threads, turning the
    # quadratic curation_pipeline oracle at sf0.1 (~7 min at 32 threads)
    # into a 40+ minute crawl
    import os as _os

    con.execute(f"SET threads TO {_os.cpu_count() or 8}")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = spec.builder(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"  {name:28s} rows-only: {len(sdf):8d} rows   [{t_spark:5.1f}s]", flush=True)
            continue
        odf = con.execute(spec.oracle).df()
        status = compare_frames(sdf, odf)
        print(f"  {name:28s} {status:40s} {len(sdf):8d} rows   [{t_spark:5.1f}s]", flush=True)
        if status != "OK":
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
