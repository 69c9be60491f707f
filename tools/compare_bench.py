"""Compare two bench JSON files: per-query deltas, sorted by regression.

    python tools/compare_bench.py OLD.json NEW.json [threshold_pct]

When BOTH files carry a ``calibration_sec`` (the fixed pure-CPU anchor
bench.py times each run), the new file's timings are normalized by the
calibration ratio first, so a uniform host-speed shift (shared-VM drift)
divides out of the per-query ratios instead of reading as regressions.
"""

from __future__ import annotations

import json
import sys


def _queries_of(doc: dict) -> dict[str, float]:
    """Per-query timings from either shape: bench.py's own output
    ({"queries": {...}, "calibration_sec": C}) or the driver's capture
    wrapper ({"sf", "tail": "<truncated stdout>"}) — the tail keeps only
    the END of the JSON line, so pairs are regex-extracted (partial
    coverage) exactly like bench.py's _prior_round_queries."""
    import re

    q = doc.get("queries")
    if q:
        return dict(q)
    tail = doc.get("tail")
    if isinstance(tail, str):
        # restrict extraction to the span of the "queries" object when its
        # opening brace survived truncation; otherwise fall back to the
        # whole tail minus the known top-level numeric keys (ADVICE r7:
        # the old name-blacklist would misread any future numeric metadata
        # key as a query timing)
        m = re.search(r'"queries"\s*:\s*\{', tail)
        span = tail[m.end():] if m else tail
        # the first '}' closes the queries object whether or not its
        # opening brace survived the truncation (queries is the only
        # nested object in bench.py's output line)
        end = span.find("}")
        if end >= 0:
            span = span[:end]
        return {
            name: float(sec)
            for name, sec in re.findall(
                r'"(\w+)":\s*([0-9]+(?:\.[0-9]+)?)', span
            )
            if name not in ("value", "sf", "calibration_sec", "n_queries")
        }
    raise SystemExit(f"no queries/tail in bench doc (keys: {list(doc)})")


def _calibration_of(doc: dict):
    c = doc.get("calibration_sec")
    if c is not None:
        return c
    tail = doc.get("tail")
    if isinstance(tail, str):
        import re

        m = re.search(r'"calibration_sec":\s*([0-9.]+)', tail)
        if m:
            return float(m.group(1))
    return None


def main() -> int:
    old_doc = json.load(open(sys.argv[1]))
    new_doc = json.load(open(sys.argv[2]))
    old, new = _queries_of(old_doc), _queries_of(new_doc)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    cal_o = _calibration_of(old_doc)
    cal_n = _calibration_of(new_doc)
    scale = 1.0
    if cal_o and cal_n:
        # a slower new host gives cal_n > cal_o, so scale < 1 and the new
        # timings shrink toward what the old host would have measured
        scale = cal_o / cal_n
        print(
            f"  calibration {cal_o}s -> {cal_n}s: normalizing new timings "
            f"by x{scale:.3f}"
        )
        new = {k: v * scale for k, v in new.items()}
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((float("inf"), name, o, n, "added" if o is None else "removed"))
            continue
        pct = (n - o) / o * 100 if o else 0.0
        rows.append((pct, name, o, n, f"{pct:+.0f}%"))
    common = [q for q in old if q in new]
    tot_o = sum(old[q] for q in common)
    tot_n = sum(new[q] for q in common)
    ratio = tot_n / tot_o if tot_o else float("nan")
    # one machine-readable line for round notes: the calibration-normalized
    # common-query ratio is THE cross-round number (host drift divided out)
    print(
        json.dumps(
            {
                "common_queries": len(common),
                "old_total_s": round(tot_o, 1),
                "new_total_normalized_s": round(tot_n, 1),
                "normalized_ratio": round(ratio, 3),
                "calibration_normalized": bool(cal_o and cal_n),
            }
        )
    )
    regressions = 0
    for pct, name, o, n, label in sorted(rows, reverse=True):
        flag = " <-- REGRESSION" if isinstance(pct, float) and pct > threshold and o and n and n > 1.0 else ""
        if flag:
            regressions += 1
        o_txt = f"{o:.3f}" if isinstance(o, float) else str(o)
        n_txt = f"{n:.3f}" if isinstance(n, float) else str(n)
        print(f"  {name:30s} {o_txt:>8s} -> {n_txt:>8s}  {label}{flag}")
    print(f"\n{regressions} regressions over {threshold:.0f}% (and >1s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
