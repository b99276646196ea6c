"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collection cost distorting the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prac_data_pipelines_spark.queries import all_queries  # noqa: E402
from prac_data_pipelines_spark.session import get_spark  # noqa: E402

# Headline set: the heavy/representative queries (join assembly, wide agg,
# windows, sessionization, balances). Cheap point-lookups are excluded so the
# benchmark tracks real operator cost.
HEADLINE = [
    "pricing_summary",
    "master_denorm",
    "order_balance",
    "order_last_ship",
    "customer_metrics",
    "running_balance",
    "aging_pivot",
    "pareto_abc",
    "dual_sort",
    "events_sessionize",
    "events_hourly",
    "scalar_suite",
    "cxc_saldo_factura",
    "cxc_kpis",
    "cxc_concentracion",
    "doc_minhash_pairs",
    "doc_simhash",
    "doc_curation",
    "knn_brute",
    "multimodal_features",
    "customer_order_distribution",
    "large_quantity_orders",
    "asof_latest_order",
    "volume_shipping",
    "market_share",
    "waiting_suppliers",
    "knn_lsh",
    "doc_dup_clusters",
    "cxc_antiguedad_cliente",
    "doc_decontaminate",
    "doc_repetition",
    "tfidf_top_terms",
    "doc_pack_sequences",
    "events_funnel",
    "events_retention",
    "cube_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the JVM + parquet footers once (excluded from timings).
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # The host shows sporadic multi-second stalls unrelated to the workload;
    # min-of-N isolates actual engine cost from environment noise.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
