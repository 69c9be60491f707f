"""Dump `explain("formatted")` for registry queries to files.

Usage: python tools/plan_dump.py <out_dir> <suffix> <query,query,...>
       [--repo <path>]

Writes <out_dir>/<query>_<suffix>.txt for each query.  ``--repo`` points at
an alternate checkout (e.g. a pre-change tree extracted with git archive)
so before/after plans come from the same harness.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

repo = str(Path(__file__).resolve().parent.parent)
argv = sys.argv[1:]
if "--repo" in argv:
    i = argv.index("--repo")
    repo = argv[i + 1]
    del argv[i : i + 2]
sys.path.insert(0, repo)

from delta_lake_validation_spark.plans import REGISTRY  # noqa: E402
from delta_lake_validation_spark.session import get_session  # noqa: E402

out_dir, suffix, names = argv[0], argv[1], argv[2].split(",")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session("plan-dump")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)
for name in names:
    if name not in REGISTRY:
        print(f"SKIP {name}: not in registry")
        continue
    df = REGISTRY[name].builder(spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    p = Path(out_dir) / f"{name}_{suffix}.txt"
    p.write_text(txt)
    print(f"wrote {p}")
