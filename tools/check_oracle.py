"""Local correctness harness — a mirror of the driver's CORRECTNESS gate.

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--head=N]
                                    [--partitions=N]

--head=N checks only the first N queries in priority order — the exact
slice the driver's ~50-row gate budget will cover next round.
--partitions=N overrides spark.sql.shuffle.partitions for a determinism
sweep: every result must be identical under any physical parallelism
(123/123 verified at N=7 vs the default 32).

sf0.1 policy for the recursive-oracle queries (PERMANENT, per
VERDICT-r7 item #7): the connected-component queries listed in
RECURSIVE_ORACLE_QUERIES below have DuckDB recursive-CTE oracles that
are correct but too slow at sf0.1, so the full-registry sweep there
excludes them ("non-recursive" counts in round notes). They are
NOT weaker-checked: at sf0.1 each is pinned by a driver-side union-find
cross-check over the SAME pair graph (tests/test_accuracy.py — exact
cluster-set equality, text and image families), and their recursive
oracles run fully at sf0.001/sf0.01 in every sweep. Skipping them at
sf0.1 is a DuckDB-runtime concession, not a correctness gap.
--skip-recursive applies exactly that exclusion (the canonical sf0.1
sweep is: check_oracle.py /root/testdata/sf0.1 --skip-recursive).

sf0.1 policy for the SLOW (non-recursive) oracles (VERDICT-r8 item #5):
SLOW_ORACLE_QUERIES below have DuckDB oracles that are polynomial-heavy
but terminating at sf0.1. The set is EMPTY as of r10:
doc_strip_dup_spans was the last member (~380 s, cut to ~90-150 s in
r9 by AS MATERIALIZED on the twice-referenced ws/wins CTEs, then to
~0.3 s in r10 by replacing DuckDB's pathological min(STRUCT) aggregate
with an order-preserving packed-BIGINT min — profiled at 483 s CPU for
224k groups). POLICY stands for any future member: slow oracles STAY
in the canonical sf0.1 sweep — the cost is accepted once per round for
a full value check; they are never excluded from any sweep that gates
a round. --skip-slow exists ONLY for interactive iteration (it prints
what it skipped so a skipped sweep can't be mistaken for canonical).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from prac_data_pipelines_spark.queries import all_oracles, all_queries  # noqa: E402
from prac_data_pipelines_spark.session import get_spark  # noqa: E402
from prac_data_pipelines_spark.testing import compare_frames, duck_connect  # noqa: E402

# The queries whose DuckDB oracle is a recursive CTE (connected
# components) — correct but impractically slow at sf0.1; see module
# docstring for the permanent policy and their sf0.1 pinning.
RECURSIVE_ORACLE_QUERIES = frozenset({
    "doc_dup_clusters", "doc_dedup_keep_best", "doc_dedup_weights",
    "multimodal_phash_clusters", "multimodal_phash_keep_best",
    # r8: image-side soft dedup; sf0.1-pinned by the union-find ROLLUP
    # cross-check (tests/test_accuracy.py::
    # test_phash_weights_match_union_find_rollup_at_sf01)
    "multimodal_phash_weights",
})

# Non-recursive oracles that are slow (minutes, not hours) at sf0.1.
# These remain IN the canonical sf0.1 sweep — see module docstring for
# the accepted-cost policy; --skip-slow is for iteration only.
SLOW_ORACLE_QUERIES = frozenset()  # empty since r10 (see policy above)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    head = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                 if a.startswith("--head=")), None)
    parts = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                  if a.startswith("--partitions=")), None)
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    if parts is not None:
        # determinism sweep: results must be identical under ANY physical
        # parallelism (catches order-dependent float accumulation — the
        # money-average class in operators/rounding.py's caveat)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    for a in sys.argv[1:]:
        # --conf key=value (repeatable): sweep any runtime conf — e.g.
        # spark.sql.adaptive.enabled=false, or
        # spark.sql.autoBroadcastJoinThreshold=-1 (the 1000-executor plan
        # shape: every join a shuffle join) — results must not move.
        if a.startswith("--conf="):
            key, val = a.split("=", 1)[1].split("=", 1)[0], a.split("=", 2)[2]
            spark.conf.set(key, val)
    con = duck_connect(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    if head is not None:
        queries = dict(list(queries.items())[:head])
    if "--skip-recursive" in sys.argv[1:]:
        skipped = sorted(RECURSIVE_ORACLE_QUERIES & queries.keys())
        queries = {n: f for n, f in queries.items()
                   if n not in RECURSIVE_ORACLE_QUERIES}
        print(f"skipping {len(skipped)} recursive-oracle queries "
              f"(sf0.1 policy, union-find-pinned): {', '.join(skipped)}")
    if "--skip-slow" in sys.argv[1:]:
        skipped = sorted(SLOW_ORACLE_QUERIES & queries.keys())
        queries = {n: f for n, f in queries.items()
                   if n not in SLOW_ORACLE_QUERIES}
        if skipped:
            print(f"skipping {len(skipped)} slow-oracle queries (ITERATION "
                  f"ONLY — not a canonical sweep): {', '.join(skipped)}")
        else:
            print("--skip-slow: SLOW_ORACLE_QUERIES is empty — nothing "
                  "skipped; this sweep is canonical-equivalent")
    failures = 0
    checked = 0
    sweep_t0 = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pd)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare_frames(spark_pd, duck_pd)
        if problems:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{checked - failures}/{checked} passing "
          f"[sweep wall {time.time() - sweep_t0:.0f}s]")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
