"""Benchmark harness — reimplements the reference's timing decorator
(src/benchmarking_suite.py:25-37) with structured JSON output.

Runs every registry query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "calibration_sec": C,
     "retimed": {name: {"in_sequence": s, "isolated": s}, ...},
     "adjusted_value": N'}
`value`/`queries` are ALWAYS the in-sequence measurements (one
methodology, comparable round-over-round); isolated re-measurements of
>2x outliers live in `retimed` and only adjust `adjusted_value`.
`calibration_sec` is a fixed pure-CPU anchor so uniform host-speed
shifts divide out of cross-round ratios (tools/compare_bench.py
normalizes by it when both files carry one).

Execution uses the `noop` sink so the full plan runs (scan → compute → all
rows materialized) without driver-side collection — the same measurement
boundary a cluster job would have.

Self-defense against session/VM noise (two tiers):
1. min-of-2 within the run for any query slower than
   $SPARK_GRAFT_RETIME_SEC (shared-VM neighbor load measured 2-5× swings);
2. any query still >2× its previous-round record (BENCH_r*.json at the
   same SF) re-measures in an ISOLATED fresh process, and BOTH numbers
   land in the `retimed` field — a regression that survives isolation is
   real; one that doesn't is session state, visible without a manual
   re-run.  `python bench.py --only a,b` is the isolated-run entry point.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from delta_lake_validation_spark.plans import REGISTRY  # noqa: E402
from delta_lake_validation_spark.session import get_session  # noqa: E402


def _prior_round_queries(sf) -> dict[str, float]:
    """Per-query times of the newest BENCH_r*.json recorded at the same SF.

    Handles both shapes: this script's own output ({"queries": {...}}) and
    the driver's capture wrapper ({"sf", "tail": "<truncated output>"}) —
    the tail keeps only the END of the JSON line, so name/seconds pairs
    are regex-extracted and coverage is partial (the captured tail)."""
    best_n, best = -1, {}
    for p in Path(_REPO).glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", p.name)
        if not m:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if data.get("sf") != sf:
            continue
        queries = data.get("queries")
        if not queries and isinstance(data.get("tail"), str):
            queries = {
                name: float(sec)
                for name, sec in re.findall(
                    r'"(\w+)":\s*([0-9]+(?:\.[0-9]+)?)', data["tail"]
                )
                if name not in ("value", "sf")
            }
        n = int(m.group(1))
        if n > best_n and queries:
            best_n, best = n, queries
    return best


def _run_queries(spark, sf_dir: str, names) -> dict[str, float]:
    retime_threshold = float(os.environ.get("SPARK_GRAFT_RETIME_SEC", "2.0"))

    def run_once(spec) -> float:
        # isolate queries from each other: drop cached blocks left by
        # operators (persist/localCheckpoint) and nudge the JVM to release
        # accumulated broadcast/shuffle state — without this, late queries
        # measure the session's garbage, not their own plan (observed 5×)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # The host is a shared VM: identical queries have measured 2-5× apart
    # minutes apart under invisible neighbor load.  min-of-2 on the slow
    # tail recovers the query's intrinsic cost at ~1 extra run per heavy
    # query; fast queries (the majority) stay single-shot.
    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        t = run_once(spec)
        if t > retime_threshold:
            t = min(t, run_once(spec))
        timings[name] = round(t, 3)
    return timings


def main() -> None:
    only = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        only = [n for n in sys.argv[2].split(",") if n in REGISTRY]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_txt = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_txt) if sf_txt.replace(".", "").isdigit() else sf_txt
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so the first measured query isn't charged for startup.
    # A synthetic range-sum alone leaves the parquet-scan, decimal-agg and
    # window codegen paths cold (observed: +1.7s charged to the first real
    # query); warm them with representative queries at the smallest SF.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for warm_name in ("pricing_summary", "window_rank_topk", "token_counts"):
            if warm_name in REGISTRY:
                REGISTRY[warm_name].builder(spark, warm_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
        spark.catalog.clearCache()

    # fixed calibration anchor: pure-CPU, data-independent, so uniform
    # host-speed shifts (r5 measured a 1.25× whole-VM drift) divide out of
    # cross-round ratios instead of reading as query regressions.
    # min-of-3: the minimum is the closest observable to intrinsic cost.
    calibration = round(
        min(_calibration_run(spark) for _ in range(3)), 3
    )

    names = only if only is not None else list(REGISTRY)
    timings = _run_queries(spark, sf_dir, names)

    # The in-sequence numbers are the PRIMARY metric (one methodology,
    # comparable round-over-round).  Suspected outliers (>2x their prior
    # round record) are re-measured in a fresh process, and the isolated
    # numbers land in `retimed` + the substituted-minimum total in
    # `adjusted_value` — never silently mixed into `queries`/`value`
    # (ADVICE r5: downstream consumers compare totals).
    retimed: dict[str, dict[str, float]] = {}
    if only is None:
        prior = _prior_round_queries(sf)
        suspects = [
            n
            for n, t in timings.items()
            if prior.get(n) and t > 2.0 * prior[n] and t >= 0.5
        ]
        if suspects:
            isolated = _isolated_rerun(suspects)
            for n in suspects:
                iso = isolated.get(n)
                if iso is None:
                    continue
                retimed[n] = {"in_sequence": timings[n], "isolated": iso}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration_sec": calibration,
    }
    if retimed:
        out["retimed"] = retimed
        out["adjusted_value"] = round(
            total
            - sum(
                r["in_sequence"] - min(r["in_sequence"], r["isolated"])
                for r in retimed.values()
            ),
            3,
        )
    print(json.dumps(out))


def _calibration_run(spark) -> float:
    """Data-independent CPU anchor: a codegen'd integer pipeline over
    spark.range — no I/O, no shuffle variance beyond one final agg."""
    t0 = time.perf_counter()
    spark.range(0, 80_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _isolated_rerun(names: list[str]) -> dict[str, float]:
    """Re-measure ``names`` in a FRESH process (cold session — no
    accumulated broadcast/shuffle/GC state); {} on any failure so the
    in-sequence numbers still get reported."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", ",".join(names)],
            capture_output=True,
            text=True,
            timeout=1800,
            env=dict(os.environ),
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line).get("queries") or {}
    except Exception:
        pass
    return {}


if __name__ == "__main__":
    main()
