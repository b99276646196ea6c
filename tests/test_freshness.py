"""Driver-verdict freshness SLO (VERDICT-r6 item #2).

The driver re-verifies only the first ``HEAD_BUDGET`` registered queries
per round, so verdict age is bounded only if the rotation actually
schedules the stalest queries.  These tests pin that invariant statically
— no Spark session needed — so a new-operator batch that displaces stale
re-verdicts past the boundary (the r5/r6 failure mode) fails the suite
instead of surfacing one round later in the judge's audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import freshness  # noqa: E402

from prac_data_pipelines_spark.queries import all_oracles, all_queries

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_priority_names_are_registered_and_unique():
    from prac_data_pipelines_spark.queries import _PRIORITY

    names = set(all_queries())
    unknown = [n for n in _PRIORITY if n not in names]
    assert unknown == [], f"_PRIORITY lists unregistered queries: {unknown}"
    dupes = [n for n in set(_PRIORITY) if list(_PRIORITY).count(n) > 1]
    assert dupes == [], f"_PRIORITY has duplicates: {dupes}"


def test_head_covers_every_stale_or_new_query():
    """Every never-verified query and every query whose verdict would be
    more than MAX_AGE_ROUNDS old at the next driver run must sit inside
    the upcoming gate slice (the first HEAD_BUDGET names)."""
    names, latest, must = freshness.audit(REPO)
    head = set(names[: freshness.HEAD_BUDGET])
    missing = [n for n in must if n not in head]
    assert missing == [], (
        f"{len(missing)} stale/new queries outside the "
        f"{freshness.HEAD_BUDGET}-row driver budget: {missing} — "
        "reorder _PRIORITY (python tools/freshness.py --suggest)"
    )


def test_next_rotation_is_staged_in_priority_order():
    """VERDICT-r9 item #8: the NEXT round's must-run block must already sit
    directly below the 50-row boundary, so each rotation stays one
    mechanical head-swap.  Simulate the upcoming driver verdicts landing
    on the current head, then recompute the following round's must-run
    set and assert it fits inside positions [HEAD_BUDGET, 2*HEAD_BUDGET).
    """
    names, latest, _ = freshness.audit(REPO)
    next_run = freshness.max_round(REPO) + 1
    simulated = dict(latest)
    for n in names[: freshness.HEAD_BUDGET]:
        simulated[n] = next_run
    round_after = next_run + 1
    must_next = [
        n for n in names
        if simulated.get(n) is None
        or round_after - simulated[n] > freshness.MAX_AGE_ROUNDS
    ]
    staged = set(names[freshness.HEAD_BUDGET: 2 * freshness.HEAD_BUDGET])
    unstaged = [n for n in must_next if n not in staged]
    assert len(must_next) <= freshness.HEAD_BUDGET, (
        f"next-round must-run set is {len(must_next)} > budget — registry "
        "over capacity or a rotation was skipped"
    )
    assert unstaged == [], (
        f"next-round must-run queries not staged directly below the head "
        f"boundary: {unstaged} — reorder _PRIORITY now so the r{round_after} "
        "rotation stays a mechanical head-swap"
    )


def test_every_query_has_value_oracle_or_documented_exception():
    """The registry has carried full value oracles for every query since
    r4; keep it that way so the driver never downgrades to rows-only."""
    missing = [n for n in all_queries() if n not in all_oracles()]
    assert missing == [], f"queries without a DuckDB oracle: {missing}"
