"""A/B the decimal-sum determinism tax (VERDICT r4 item 3).

The five money-average sites route their aggregate term through
``operators.rounding.money`` (decimal(18,2) cast when
``USE_DECIMAL_MONEY_SUMS`` is True, the plain float column when False).
This probe times each site's FULL registered query both ways —
min-of-N on the same session, modes interleaved per query so co-tenant
host noise hits both arms alike — and prints a table for SCALING.md.

The float arm is measurement-only: it can differ from the oracle by a
last ulp (the exact failure the idiom prevents), so the flag is
restored to True before exit and never ships flipped.

Usage: python tools/decimal_tax_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from prac_data_pipelines_spark.operators import rounding  # noqa: E402
from prac_data_pipelines_spark.queries import all_queries  # noqa: E402
from prac_data_pipelines_spark.session import get_spark  # noqa: E402

SITES = (
    "pricing_summary",
    "parts_never_ordered",
    "rich_inactive_customers",
    "min_cost_supplier",
    "order_vs_customer_avg",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("decimal-tax-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).collect()
        return time.time() - t0

    try:
        print(f"| query | decimal s | float s | tax |  ({sf_dir}, "
              f"min-of-{reps})")
        print("|---|---|---|---|")
        for name in SITES:
            best: dict[bool, float] = {}
            for mode in (True, False):
                rounding.USE_DECIMAL_MONEY_SUMS = mode
                run(name)  # warm both plans before timing
            for _ in range(reps):
                for mode in (True, False):  # interleave arms vs host noise
                    rounding.USE_DECIMAL_MONEY_SUMS = mode
                    t = run(name)
                    best[mode] = min(best.get(mode, t), t)
            tax = (best[True] - best[False]) / best[False] * 100
            print(f"| {name} | {best[True]:.2f} | {best[False]:.2f} | "
                  f"{tax:+.0f}% |")
    finally:
        rounding.USE_DECIMAL_MONEY_SUMS = True
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
