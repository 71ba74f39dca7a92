#!/usr/bin/env python3
"""Median-of-N bench reader — the round-10 capture discipline.

A single Bench capture on this box carries a measured +/-12% noise floor
(round 9: a docs-only commit moved the sf0.1 total 97.4 -> 109.5 s at
equal load), so round-over-round claims must never be read off one run.
This tool folds >=N same-commit history captures into one median record:

    python3 tools/bench_median.py sf0.1 <commit> [min_runs=3] \
        [--prev bench/MEDIAN-<sf>-<oldcommit>.json] \
        [--sf01 bench/MEDIAN-sf0.1-<commit>.json]

reads  bench/history/BENCH_FULL-<sf>-<commit>-<epoch>.json  (the
timestamped copies Bench writes per run), takes the PER-KEY median and
the median total, and writes  bench/MEDIAN-<sf>-<commit>.json  carrying:
  - runs: how many captures fed the median
  - loads: each capture's pre-run 1-min load average (all must be <1.2
    for the record to be stamped clean; <0.5 is the closing-capture bar)
  - queries: per-key medians, total: median of totals
README/PLANS deltas must quote THESE medians, never a single capture.

With --prev (VERDICT r11 #5 — the board-drift estimator as a tool, not
hand arithmetic): the box's throughput drifts round to round (r11
measured ×1.2 in ONE HOUR between same-code median sets under
hypervisor-level contention the load gate cannot see), so raw per-key
ratios vs an older close conflate code changes with box drift. The
record then also carries:
  - prev: the baseline file, board_ratio: the MEDIAN of per-key ratios
    cur/prev over all shared keys — the box-drift estimate (the median
    is robust: genuinely-changed keys are a minority by construction,
    and if they aren't, the board ratio honestly absorbs the round's
    typical change instead)
  - adjusted_vs_prev: per-key cur/prev ÷ board_ratio — read THESE for
    round-over-round claims; a key is only interestingly faster/slower
    when its ADJUSTED ratio leaves the ±20-30% single-key noise band.
"""
import glob
import json
import statistics
import sys


def main() -> int:
    argv = list(sys.argv[1:])
    prev_path = None
    if "--prev" in argv:
        i = argv.index("--prev")
        prev_path = argv[i + 1]
        del argv[i:i + 2]
    # --sf01 <MEDIAN-sf0.1-*.json>: emit the 10x scale slope per key
    # (this record's median / the same-commit sf0.1 median) so
    # flat-slope claims and q71/pl17-class regressions are
    # machine-visible (VERDICT r12 #5). Data grows 10x between the sfs,
    # so scan-bound keys should sit well under ~3x; quote any key above
    # that in PLANS.
    sf01_path = None
    if "--sf01" in argv:
        i = argv.index("--sf01")
        sf01_path = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        print(__doc__)
        return 2
    sf, commit = argv[0], argv[1]
    min_runs = int(argv[2]) if len(argv) > 2 else 3
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
    spread = {}
    for k in sorted(keys):
        vals = [r["queries"][k] for r in runs
                if k in r["queries"] and r["queries"][k] >= 0]
        if vals:
            med[k] = round(statistics.median(vals), 3)
            # per-key run vector (VERDICT r13 #6): the pinned ~2 GB guest
            # page cache makes single-run outliers routine on scan keys
            # (dd13 r13: runs 1.89/2.31/6.74 s around a 2.31 median), so
            # the record must carry the spread — "median 2.31" without
            # "max 6.74" reads as a stable number when it is not.
            spread[k] = [round(v, 3) for v in vals]
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
        "query_runs": spread,
    }
    if prev_path:
        prev = json.load(open(prev_path))
        prevq = prev["queries"]
        ratios = {k: med[k] / prevq[k] for k in med
                  if k in prevq and prevq[k] > 0}
        if ratios:
            board = statistics.median(ratios.values())
            out["prev"] = prev_path
            out["board_ratio"] = round(board, 4)
            out["adjusted_vs_prev"] = {
                k: round(r / board, 3) for k, r in sorted(ratios.items())}
            out["new_keys"] = sorted(k for k in med if k not in prevq)
    if sf01_path:
        sf01 = json.load(open(sf01_path))["queries"]
        out["sf01"] = sf01_path
        out["slope_vs_sf0.1"] = {
            k: round(med[k] / sf01[k], 3) for k in sorted(med)
            if k in sf01 and sf01[k] > 0}
    dest = f"bench/MEDIAN-{sf}-{commit}.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{dest}: runs={out['runs']} loads={loads} "
          f"total={out['total']} clean={out['clean']} "
          f"closing_grade={out['closing_grade']}")
    # widest relative spreads (max/min over the run vector) — the
    # cache-noise suspects to quote in PLANS with a rewarm-probe verdict
    # (VERDICT r13 #6)
    wide = sorted(((max(v) / min(v), k) for k, v in spread.items()
                   if min(v) > 0), reverse=True)[:5]
    print("widest spreads (max/min): " + ", ".join(
        f"{k} x{r:.2f} {spread[k]}" for r, k in wide))
    if "board_ratio" in out:
        adj = out["adjusted_vs_prev"]
        hot = {k: v for k, v in adj.items() if v >= 1.3 or v <= 0.7}
        print(f"board_ratio={out['board_ratio']} vs {out['prev']}; "
              f"{len(adj)} shared keys, adjusted outliers (|Δ|≥30%): "
              f"{hot if hot else 'none'}")
    if "slope_vs_sf0.1" in out:
        sl = out["slope_vs_sf0.1"]
        steep = {k: v for k, v in sl.items() if v > 3.0}
        print(f"slope_vs_sf0.1 vs {out['sf01']}: {len(sl)} keys, "
              f"steep (>3x on 10x data): {steep if steep else 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
