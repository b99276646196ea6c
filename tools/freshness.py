"""Driver-verdict freshness audit (the round-7 SLO, VERDICT-r6 item #2).

The driver's correctness gate re-verifies only the first ~50 registered
queries per round, so at 170+ queries the steady-state worst-case verdict
age is ceil(N/50) = 4 rounds.  This tool makes that budget auditable:

* reads every ``CORRECTNESS_r*.json`` and computes, per registered query,
  the latest round with a fully green row (rows+schema+hash),
* prints the staleness histogram (verdict round -> query count) that the
  round notes should report instead of a prose claim,
* checks the SLO: every query whose verdict would be >3 rounds old at the
  NEXT driver run — plus every never-verified (new) query — must sit
  inside the first 50 of priority order, i.e. the upcoming gate slice.

Usage: python tools/freshness.py [--repo=/root/repo] [--suggest]

``--suggest`` prints the recommended next head (must-run set first, then
the next-stalest fill to exactly 50) for updating ``_PRIORITY``.

Exit status 1 when the SLO is violated, so it can gate a commit.
``tests/test_freshness.py`` asserts the same invariant in the suite.

REGISTRY-CAPACITY CEILING (policy, VERDICT-r8 item #3).  The budget
arithmetic caps the registry: a 50-row head re-verified per round with a
max verdict age of 3 rounds means at most ``HEAD_BUDGET * (MAX_AGE_ROUNDS
+ 1) = 200`` queries can stay fresh.  At 196 registered queries the
steady-state new-op budget from r10 onward is ~0 — every round's must-run
block is a full 50-query cohort.  Growing past 200 is a hard SLO break:
new queries may only be added by retiring or merging existing ones (or if
the driver raises its budget).  ``main`` prints the headroom and fails if
the registry exceeds the ceiling.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, ".")

HEAD_BUDGET = 50
MAX_AGE_ROUNDS = 3  # verdict may be at most this many rounds behind NEXT run


def verdict_rounds(repo: str) -> dict[str, int]:
    """Latest fully-green driver-verdict round per query name."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, v in rows.items():
            green = (
                v.get("err") is None
                and v.get("rows_match") is True
                and v.get("schema_match") is True
                # rows-only checks carry hash_match=None; none registered,
                # but treat an explicit False as not-green.
                and v.get("hash_match") is not False
            )
            if green:
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def max_round(repo: str) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)\.json$", p))
    ]
    return max(rounds) if rounds else 0


def audit(repo: str = ".") -> tuple[list[str], dict[str, int], list[str]]:
    """Return (ordered registry names, latest verdict map, must-run set)."""
    from prac_data_pipelines_spark.queries import all_queries

    names = list(all_queries())
    latest = verdict_rounds(repo)
    next_run = max_round(repo) + 1
    must = [
        n for n in names
        if latest.get(n) is None or next_run - latest[n] > MAX_AGE_ROUNDS
    ]
    return names, latest, must


def main() -> int:
    repo = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--repo=")), ".")
    names, latest, must = audit(repo)
    next_run = max_round(repo) + 1
    hist = Counter(latest.get(n, 0) for n in names)
    ceiling = HEAD_BUDGET * (MAX_AGE_ROUNDS + 1)
    over_capacity = len(names) > ceiling
    print(f"registered queries : {len(names)} "
          f"(capacity ceiling {ceiling}, headroom {ceiling - len(names)})")
    if over_capacity:
        # keep printing the full audit (incl. --suggest) — the operator
        # needs the staleness report to plan the retirement; fail at exit
        print(f"CAPACITY VIOLATED — {len(names)} > {ceiling}: the {HEAD_BUDGET}"
              f"-row budget cannot keep every verdict <= {MAX_AGE_ROUNDS} "
              "rounds old; retire or merge queries")
    print(f"next driver round  : r{next_run}")
    print("verdict histogram  :",
          {f"r{k}" if k else "never": v for k, v in sorted(hist.items())})
    head = names[:HEAD_BUDGET]
    missing = [n for n in must if n not in head]
    print(f"must-run this round: {len(must)} "
          f"(never-verified or verdict older than r{next_run - MAX_AGE_ROUNDS})")
    if "--suggest" in sys.argv[1:]:
        fill = [n for n in sorted(
            (n for n in names if n not in must),
            key=lambda n: (latest.get(n, 0), names.index(n)))]
        suggested = (must + fill)[:HEAD_BUDGET]
        print("suggested head     :")
        for n in suggested:
            print(f"  {n}  (r{latest.get(n, 0) or '-'})")
    if missing:
        print(f"SLO VIOLATED — outside the {HEAD_BUDGET}-row head: {missing}")
        return 1
    print(f"SLO ok — all must-run queries sit inside the {HEAD_BUDGET}-row head")
    return 1 if over_capacity else 0


if __name__ == "__main__":
    sys.exit(main())
