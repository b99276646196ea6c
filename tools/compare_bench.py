"""Round-over-round bench comparison using the calibration anchor.

Reads two BENCH_DETAIL artifacts (older, newer) and prints the analysis
every round's notes need — raw and host-normalized totals, the
calibration ratio, the per-query ratio distribution, and the biggest
movers — so a wall swing on unchanged code is attributed to host speed
by one division instead of an investigation (VERDICT-r9 item #3/#4).

Usage:
    python tools/compare_bench.py BENCH_DETAIL_r09.json BENCH_DETAIL_r10.json

Artifacts from before the anchor (r9 and older) have no
``calibration_sec``; the tool then prints raw ratios only and says so.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    d["_path"] = path
    d["_timings"] = {k: v for k, v in d.get("queries", {}).items()
                     if isinstance(v, (int, float))}
    # bench.py records a failed query as {"err": "..."} — surface these
    # as breakages, never as silently absent timings
    d["_errors"] = {k: v["err"] for k, v in d.get("queries", {}).items()
                    if isinstance(v, dict) and "err" in v}
    return d


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])

    print(f"old: {old['_path']}  total {old.get('value')} s"
          f"  cal {old.get('calibration_sec')}"
          f"  norm {old.get('value_normalized')}")
    print(f"new: {new['_path']}  total {new.get('value')} s"
          f"  cal {new.get('calibration_sec')}"
          f"  norm {new.get('value_normalized')}")

    o_cal, n_cal = old.get("calibration_sec"), new.get("calibration_sec")
    if o_cal and n_cal:
        print(f"host speed ratio (new/old calibration): {n_cal / o_cal:.3f}"
              " — >1 means the new window's host was slower")
    else:
        print("calibration absent on one side (pre-r10 artifact): raw "
              "ratios below are NOT host-adjusted")

    shared = [k for k in new["_timings"]
              if k in old["_timings"] and old["_timings"][k] > 0]
    if not shared:
        print("no shared queries to compare")
        return 0
    ratios = sorted(
        ((new["_timings"][k] / old["_timings"][k], k) for k in shared))
    med = statistics.median(r for r, _ in ratios)
    print(f"\nshared queries: {len(shared)}   median raw ratio: {med:.3f}")
    if o_cal and n_cal:
        host = n_cal / o_cal
        print(f"median host-adjusted ratio: {med / host:.3f} "
              "(≈1.0 means the code is the same speed)")
    regressions = [(r, k) for r, k in ratios if r > 1.0][-5:][::-1]
    improvements = [(r, k) for r, k in ratios if r < 1.0][:5]
    print("\nbiggest regressions (raw):" if regressions
          else "\nno raw regressions (every shared query >= old speed)")
    for r, k in regressions:
        print(f"  {r:5.2f}x  {k}  ({old['_timings'][k]:.2f}s -> "
              f"{new['_timings'][k]:.2f}s)")
    if improvements:
        print("biggest improvements (raw):")
    for r, k in improvements:
        print(f"  {r:5.2f}x  {k}  ({old['_timings'][k]:.2f}s -> "
              f"{new['_timings'][k]:.2f}s)")
    # a query erroring on one side is a BREAKAGE (or a fix), not a
    # headline-set change — report it before the only-in lists
    broke = sorted(set(new["_errors"]) & set(old["_timings"]))
    fixed = sorted(set(old["_errors"]) & set(new["_timings"]))
    for k in broke:
        print(f"BROKE this round: {k} — {new['_errors'][k][:200]}")
    for k in fixed:
        print(f"fixed this round: {k} (errored in old run)")
    only_new = sorted(set(new["_timings"]) - set(old["_timings"])
                      - set(old["_errors"]))
    only_old = sorted(set(old["_timings"]) - set(new["_timings"])
                      - set(new["_errors"]))
    if only_new:
        print(f"\nonly in new ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    return 1 if broke else 0


if __name__ == "__main__":
    raise SystemExit(main())
