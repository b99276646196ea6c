"""Classic decision-support query shapes (EXISTS, anti-join, HAVING,
scalar subqueries, zero-preserving outer aggregation) — the remaining
relational idioms a complete engine must plan well, in TPC-H form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rounding import r2
from ..sources import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# priority_with_late_lines — Q4 shape: EXISTS subquery → left-semi join
# (no fan-out, one shuffle on the order key).
# --------------------------------------------------------------------------

def q_priority_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    late = (_t(spark, sf_dir, "lineitem")
            .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("date"))
            .select("l_orderkey"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_PRIORITY_LATE_LINES = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > DATE '1998-01-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

register("priority_late_lines", q_priority_late_lines, SQL_PRIORITY_LATE_LINES)


# --------------------------------------------------------------------------
# customer_order_distribution — Q13 shape: zero-preserving left outer
# aggregation (customers with no orders must appear in the 0 bucket).
# --------------------------------------------------------------------------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT n_orders, count(*)::BIGINT AS n_customers
FROM per_cust GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""

register("customer_order_distribution", q_customer_order_distribution,
         SQL_CUSTOMER_ORDER_DISTRIBUTION)


# --------------------------------------------------------------------------
# large_quantity_orders — Q18 shape: HAVING over a grouped sum, joined
# back to the fact for detail columns.
# --------------------------------------------------------------------------

def q_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 120)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey",
                r2(F.col("o_totalprice")).alias("total"),
                r2(F.col("_qty")).alias("cantidad_total"))
        .orderBy(F.col("cantidad_total").desc(), F.col("o_orderkey").asc())
    )


SQL_LARGE_QUANTITY_ORDERS = """
SELECT o_orderkey, o_custkey,
       floor(o_totalprice * 100 + 0.5) / 100 AS total,
       floor(qty * 100 + 0.5) / 100 AS cantidad_total
FROM orders JOIN (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
) b ON o_orderkey = b.l_orderkey
ORDER BY cantidad_total DESC, o_orderkey ASC
"""

register("large_quantity_orders", q_large_quantity_orders, SQL_LARGE_QUANTITY_ORDERS)


# --------------------------------------------------------------------------
# parts_never_ordered — anti-join shape: parts never ordered in high
# quantity (>45), by brand.
# --------------------------------------------------------------------------

def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    ordered = (_t(spark, sf_dir, "lineitem")
               .filter(F.col("l_quantity") > 45).select("l_partkey"))
    return (
        part.join(ordered, part.p_partkey == ordered.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
             r2(F.avg("p_retailprice")).alias("precio_medio"))
        .orderBy("p_brand")
    )


SQL_PARTS_NEVER_ORDERED = """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       floor(avg(p_retailprice) * 100 + 0.5) / 100 AS precio_medio
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
GROUP BY p_brand ORDER BY p_brand
"""

register("parts_never_ordered", q_parts_never_ordered, SQL_PARTS_NEVER_ORDERED)


# --------------------------------------------------------------------------
# rich_inactive_customers — Q22 shape: scalar subquery (global average as
# a broadcast one-row aggregate) + anti join (above-average customers with
# no urgent orders).
# --------------------------------------------------------------------------

def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"))
    avg_bal = customer.filter("c_acctbal > 0").agg(
        F.avg("c_acctbal").alias("_avg"))
    return (
        customer.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             r2(F.sum("c_acctbal")).alias("saldo_total"))
        .orderBy("c_mktsegment")
    )


SQL_RICH_INACTIVE_CUSTOMERS = """
SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
       floor(sum(c_acctbal) * 100 + 0.5) / 100 AS saldo_total
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

register("rich_inactive_customers", q_rich_inactive_customers,
         SQL_RICH_INACTIVE_CUSTOMERS)
