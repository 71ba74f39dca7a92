#!/usr/bin/env python3
"""Median-of-N bench reader — the round-10 capture discipline.

A single Bench capture on this box carries a measured +/-12% noise floor
(round 9: a docs-only commit moved the sf0.1 total 97.4 -> 109.5 s at
equal load), so round-over-round claims must never be read off one run.
This tool folds >=N same-commit history captures into one median record:

    python3 tools/bench_median.py sf0.1 <commit> [min_runs=3]

reads  bench/history/BENCH_FULL-<sf>-<commit>-<epoch>.json  (the
timestamped copies Bench writes per run), takes the PER-KEY median and
the median total, and writes  bench/MEDIAN-<sf>-<commit>.json  carrying:
  - runs: how many captures fed the median
  - loads: each capture's pre-run 1-min load average (all must be <1.2
    for the record to be stamped clean; <0.5 is the closing-capture bar)
  - queries: per-key medians, total: median of totals
README/PLANS deltas must quote THESE medians, never a single capture.
"""
import glob
import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf, commit = sys.argv[1], sys.argv[2]
    min_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pat = f"bench/history/BENCH_FULL-{sf}-{commit}-*.json"
    files = sorted(glob.glob(pat))
    if len(files) < min_runs:
        print(f"need >={min_runs} captures matching {pat}, found {len(files)}")
        return 1
    runs = [json.load(open(f)) for f in files]
    errs = [e for r in runs for e in r.get("errors", [])]
    if errs:
        print(f"refusing: captures contain errors: {sorted(set(errs))}")
        return 1
    loads = [r["load_avg"] for r in runs]
    keys = set()
    for r in runs:
        keys |= set(r["queries"])
    med = {}
    for k in sorted(keys):
        vals = [r["queries"][k] for r in runs
                if k in r["queries"] and r["queries"][k] >= 0]
        if vals:
            med[k] = round(statistics.median(vals), 3)
    out = {
        "sf": sf,
        "commit": commit,
        "runs": len(runs),
        "loads": loads,
        "clean": all(l < 1.2 for l in loads),
        "closing_grade": all(l < 0.5 for l in loads),
        "total": round(statistics.median([r["value"] for r in runs]), 3),
        "prewarm_sec": round(
            statistics.median([r.get("prewarm_sec", 0.0) for r in runs]), 3),
        "queries": med,
    }
    dest = f"bench/MEDIAN-{sf}-{commit}.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{dest}: runs={out['runs']} loads={loads} "
          f"total={out['total']} clean={out['clean']} "
          f"closing_grade={out['closing_grade']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
