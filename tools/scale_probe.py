"""Scale probe: replicate the fact tables k× (shifted keys, registered as
temp views) and run the headline relational queries at the inflated scale.

Verifies the claims the engine makes about 100 TB behavior on the largest
data this container can hold: near-linear wall-time scaling, stable plans,
no OOM/spill collapse. Usage: python tools/scale_probe.py [k] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from prac_data_pipelines_spark.session import get_spark  # noqa: E402
from prac_data_pipelines_spark.sources import load_table  # noqa: E402


def replicate(df, key_cols: list[str], k: int, span: int):
    parts = []
    for i in range(k):
        part = df
        for c in key_cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * span))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    span = 100_000_000
    # Materialize the replicated tables to parquet first so the timings
    # measure query cost over a clean columnar scan, not the k-way union.
    import shutil
    import tempfile
    scratch = tempfile.mkdtemp(prefix="scale_probe_")
    replicate(load_table(spark, sf_dir, "lineitem"), ["l_orderkey"], k, span) \
        .write.mode("overwrite").parquet(f"{scratch}/lineitem")
    replicate(load_table(spark, sf_dir, "orders"), ["o_orderkey"], k, span) \
        .write.mode("overwrite").parquet(f"{scratch}/orders")
    li = spark.read.parquet(f"{scratch}/lineitem")
    orders = spark.read.parquet(f"{scratch}/orders")
    n_li = li.count()
    print(f"replicated lineitem: {n_li:,} rows (k={k})")
    import atexit
    atexit.register(lambda: shutil.rmtree(scratch, ignore_errors=True))

    t0 = time.time()
    (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
       .groupBy("l_returnflag", "l_linestatus")
       .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))
       .write.format("noop").mode("overwrite").save())
    print(f"pricing_summary-shape at {k}x: {time.time()-t0:.2f}s")

    t0 = time.time()
    applied = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ap"))
    (orders.join(applied, orders.o_orderkey == applied.l_orderkey, "left")
     .select("o_orderkey", (F.col("o_totalprice") - F.coalesce("ap", F.lit(0.0))).alias("saldo"))
     .write.format("noop").mode("overwrite").save())
    print(f"order_balance-shape at {k}x: {time.time()-t0:.2f}s")

    t0 = time.time()
    from pyspark.sql import Window
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    (orders.withColumn("run", F.sum("o_totalprice").over(w))
     .write.format("noop").mode("overwrite").save())
    print(f"running_balance-shape at {k}x: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
