"""Compare two bench JSON files: per-query deltas, sorted by regression.

    python tools/compare_bench.py OLD.json NEW.json [threshold_pct]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((float("inf"), name, o, n, "added" if o is None else "removed"))
            continue
        pct = (n - o) / o * 100 if o else 0.0
        rows.append((pct, name, o, n, f"{pct:+.0f}%"))
    regressions = 0
    for pct, name, o, n, label in sorted(rows, reverse=True):
        flag = " <-- REGRESSION" if isinstance(pct, float) and pct > threshold and o and n and n > 1.0 else ""
        if flag:
            regressions += 1
        print(f"  {name:30s} {str(o):>8s} -> {str(n):>8s}  {label}{flag}")
    print(f"\n{regressions} regressions over {threshold:.0f}% (and >1s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
