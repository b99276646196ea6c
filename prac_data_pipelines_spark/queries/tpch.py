"""Classic decision-support query shapes (EXISTS, anti-join, HAVING,
scalar subqueries, zero-preserving outer aggregation) — the remaining
relational idioms a complete engine must plan well, in TPC-H form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rounding import money, r2
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
    # money average via an EXACT decimal sum: float avg accumulates in
    # partial-aggregation order, and a last-ulp difference vs the oracle
    # flips floor(x*100+0.5) when the true value sits on a .xx5 boundary
    # (observed at sf0.1: 2 brands off by exactly 0.01). The decimal sum
    # is order-insensitive, so both engines round the same value.
    avg_exact = (F.floor(F.sum(money(F.col("p_retailprice"))).cast("double")
                         * 100 / F.count(F.lit(1)) + F.lit(0.5)) / 100)
    return (
        part.join(ordered, part.p_partkey == ordered.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
             avg_exact.alias("precio_medio"))
        .orderBy("p_brand")
    )


SQL_PARTS_NEVER_ORDERED = """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       floor(sum(p_retailprice::DECIMAL(18,2))::DOUBLE * 100 / count(*)
             + 0.5) / 100 AS precio_medio
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
    # threshold via the exact decimal sum (order-insensitive): a float
    # avg differs from the oracle's by a last ulp, and balances can land
    # EXACTLY on the average (cent-structured data), flipping the strict >
    avg_bal = customer.filter("c_acctbal > 0").agg(
        (F.sum(money(F.col("c_acctbal"))).cast("double")
         / F.count(F.lit(1))).alias("_avg"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
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
WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

register("rich_inactive_customers", q_rich_inactive_customers,
         SQL_RICH_INACTIVE_CUSTOMERS)


# --------------------------------------------------------------------------
# volume_shipping — Q7 shape: the nation-to-nation trade-flow chain
# (supplier→lineitem→orders→customer plus TWO roles of the nation dim).
# Plan shape that matters at scale: both nation joins broadcast, the
# lineitem⋈orders fan-in is the only big shuffle, and the bidirectional
# nation-pair filter is pushed below the aggregation.
# --------------------------------------------------------------------------

_NATION_A, _NATION_B = "NATION_3", "NATION_7"


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"),
                       F.col("n_name").alias("nacion_prov"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"),
                       F.col("n_name").alias("nacion_cli"))
    pair = (
        ((F.col("nacion_prov") == _NATION_A) & (F.col("nacion_cli") == _NATION_B))
        | ((F.col("nacion_prov") == _NATION_B) & (F.col("nacion_cli") == _NATION_A))
    )
    vol = r2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("nacion_prov", "nacion_cli",
                 F.year("l_shipdate").cast("long").alias("anio"))
        .agg(r2(F.sum(vol)).alias("volumen"),
             F.count(F.lit(1)).cast("long").alias("n_lineas"))
        .orderBy("nacion_prov", "nacion_cli", "anio")
    )


SQL_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS nacion_prov, n2.n_name AS nacion_cli,
       year(l_shipdate)::BIGINT AS anio,
       floor(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100)
             * 100 + 0.5) / 100 AS volumen,
       count(*)::BIGINT AS n_lineas
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{_NATION_A}' AND n2.n_name = '{_NATION_B}')
   OR (n1.n_name = '{_NATION_B}' AND n2.n_name = '{_NATION_A}')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

register("volume_shipping", q_volume_shipping, SQL_VOLUME_SHIPPING)


# --------------------------------------------------------------------------
# market_share — Q8 shape: one nation's share of a region's order volume
# per year — a 6-table join tree reduced by a conditional-sum ratio
# (numerator and denominator in ONE aggregation pass, no second scan).
# --------------------------------------------------------------------------

_SHARE_NATION = "NATION_5"
_SHARE_REGION = "ASIA"
_SHARE_PTYPE = "PROMO"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rounding import r6

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == _SHARE_PTYPE)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == _SHARE_REGION)
    n_cust = (nation.join(F.broadcast(region),
                          nation.n_regionkey == region.r_regionkey)
              .select(F.col("n_nationkey").alias("c_nkey")))
    n_supp = nation.select(F.col("n_nationkey").alias("s_nkey"),
                           F.col("n_name").alias("nacion_prov"))
    vol = r2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    es_objetivo = (F.col("nacion_prov") == _SHARE_NATION)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("anio"))
        .agg(r6(F.sum(F.when(es_objetivo, vol).otherwise(0.0))
                / F.sum(vol)).alias("cuota"),
             r2(F.sum(vol)).alias("volumen_total"))
        .orderBy("anio")
    )


SQL_MARKET_SHARE = f"""
SELECT year(o_orderdate)::BIGINT AS anio,
       floor(sum(CASE WHEN n2.n_name = '{_SHARE_NATION}'
                 THEN floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
                 ELSE 0 END)
             / sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100)
             * 1000000 + 0.5) / 1000000 AS cuota,
       floor(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100)
             * 100 + 0.5) / 100 AS volumen_total
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = '{_SHARE_PTYPE}' AND r_name = '{_SHARE_REGION}'
GROUP BY 1 ORDER BY 1
"""

register("market_share", q_market_share, SQL_MARKET_SHARE)


# --------------------------------------------------------------------------
# waiting_suppliers — Q21 shape: the double-correlated EXISTS / NOT EXISTS
# self-join on the fact table (suppliers whose line was the ONLY returned
# one on a multi-supplier order; the synthetic lineitem has no
# receipt/commit dates, so the returnflag stands in for "late").
# Planned as one semi- and one anti-join on the order key — the fact
# table self-joins shuffle on the same key, so AQE reuses the exchange.
#
# Measured alternative (rejected): collapsing both conditions into one
# groupBy(l_orderkey) with two distinct aggregates ("only late supplier"
# = distinct-late-count 1, "other supplier exists" = distinct-count > 1)
# looks like fewer shuffles but plans through Expand — the fact triples
# before the first partial aggregate and the grouping key widens to
# (order, supp, late_supp, gid). Controlled A/B at the 32x fact
# replication (19.2 M rows, same session, alternating runs): semi/anti
# 3.8-10 s, multi-distinct Expand 8-35 s. The join form stays.
# --------------------------------------------------------------------------

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R")
    others = li.select(F.col("l_orderkey").alias("o_key"),
                       F.col("l_suppkey").alias("o_supp"))
    late_others = late.select(F.col("l_orderkey").alias("lo_key"),
                              F.col("l_suppkey").alias("lo_supp"))
    base = late.select("l_orderkey", "l_suppkey").dropDuplicates()
    exists_other = base.join(
        others,
        (base.l_orderkey == others.o_key) & (base.l_suppkey != others.o_supp),
        "left_semi")
    only_late = exists_other.join(
        late_others,
        (exists_other.l_orderkey == F.col("lo_key"))
        & (exists_other.l_suppkey != F.col("lo_supp")),
        "left_anti")
    return (
        only_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("ordenes_retrasadas"))
        .orderBy(F.col("ordenes_retrasadas").desc(), F.col("l_suppkey").asc())
        .limit(20)
    )


SQL_WAITING_SUPPLIERS = """
WITH base AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  WHERE l_returnflag = 'R'
)
SELECT b.l_suppkey, count(*)::BIGINT AS ordenes_retrasadas
FROM base b
WHERE EXISTS (SELECT 1 FROM lineitem o
              WHERE o.l_orderkey = b.l_orderkey AND o.l_suppkey <> b.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem lo
                  WHERE lo.l_orderkey = b.l_orderkey
                    AND lo.l_suppkey <> b.l_suppkey
                    AND lo.l_returnflag = 'R')
GROUP BY b.l_suppkey
ORDER BY ordenes_retrasadas DESC, l_suppkey ASC LIMIT 20
"""

register("waiting_suppliers", q_waiting_suppliers, SQL_WAITING_SUPPLIERS)


# --------------------------------------------------------------------------
# min_cost_supplier — Q2 shape: for each part (of a type, in a region),
# the supplier with the MINIMUM average sale price — the correlated-min
# subquery re-expressed as a per-part min joined back on equality. The
# testdata has no partsupp table, so the (part, supplier) price matrix is
# derived from lineitem aggregates; the decisive plan property is
# identical: the correlated min is one partial-aggregated shuffle, the
# equality join-back reuses the same key partitioning, and the region
# chain (supplier→nation→region) is all broadcast.
# --------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_TYPE = "STANDARD"


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rsupp = (supp
             .join(F.broadcast(nation),
                   supp.s_nationkey == nation.n_nationkey)
             .join(F.broadcast(region.filter(F.col("r_name") == _Q2_REGION)),
                   nation.n_regionkey == region.r_regionkey)
             .select("s_suppkey", "s_name", F.col("n_name").alias("nacion")))
    tparts = part.filter(F.col("p_type") == _Q2_TYPE).select("p_partkey", "p_name")
    price = (li.join(F.broadcast(tparts), li.l_partkey == F.col("p_partkey"))
             .join(F.broadcast(rsupp), li.l_suppkey == F.col("s_suppkey"))
             .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "nacion")
             .agg((F.floor(F.sum(money(F.col("l_extendedprice")))
                           .cast("double") * 100
                           / F.count(F.col("l_extendedprice"))
                           + F.lit(0.5)) / 100)
                  .alias("precio_medio")))  # exact decimal sum: rounding.py
    min_price = (price.groupBy("p_partkey")
                 .agg(F.min("precio_medio").alias("_min_precio")))
    return (
        price.join(min_price, "p_partkey")
        .filter(F.col("precio_medio") == F.col("_min_precio"))
        .select("p_partkey", "p_name", "s_name", "nacion", "precio_medio")
        .orderBy("p_partkey", "s_name")
    )


SQL_MIN_COST_SUPPLIER = f"""
WITH price AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name AS nacion,
         floor(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE * 100
               / count(l_extendedprice) + 0.5) / 100 AS precio_medio
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = '{_Q2_TYPE}'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
                  AND r.r_name = '{_Q2_REGION}'
  GROUP BY 1, 2, 3, 4, 5
)
SELECT p_partkey, p_name, s_name, nacion, precio_medio
FROM price
WHERE precio_medio = (SELECT min(precio_medio) FROM price p2
                      WHERE p2.p_partkey = price.p_partkey)
ORDER BY p_partkey, s_name
"""

register("min_cost_supplier", q_min_cost_supplier, SQL_MIN_COST_SUPPLIER)


# --------------------------------------------------------------------------
# important_stock — Q11 shape: per-supplier value filtered against a
# fraction of the GLOBAL total (HAVING vs a scalar subquery). The global
# total is a one-row aggregate attached via broadcast cross-join — never
# a second scan of the fact, never a single-partition window (the
# anti-pattern ADVICE flagged for zscore).
# --------------------------------------------------------------------------

_Q11_FRACTION = 0.005


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (li.groupBy("l_suppkey")
                .agg(F.sum(value).alias("_valor")))
    total = per_supp.agg(F.sum("_valor").alias("_total"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("_valor") > F.col("_total") * _Q11_FRACTION)
        .select(F.col("l_suppkey").cast("long").alias("suppkey"),
                r2(F.col("_valor")).alias("valor"))
        .orderBy(F.col("valor").desc(), F.col("suppkey").asc())
    )


SQL_IMPORTANT_STOCK = f"""
WITH per_supp AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS _valor
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey::BIGINT AS suppkey,
       floor(_valor * 100 + 0.5) / 100 AS valor
FROM per_supp
WHERE _valor > (SELECT sum(_valor) FROM per_supp) * {_Q11_FRACTION}
ORDER BY valor DESC, suppkey ASC
"""

register("important_stock", q_important_stock, SQL_IMPORTANT_STOCK)


# --------------------------------------------------------------------------
# top_supplier — Q15 shape: supplier(s) achieving the MAXIMUM quarterly
# revenue (the view + scalar-max join). The max attaches as a broadcast
# one-row aggregate; ties are kept, exactly as Q15 requires — an
# unpartitioned row_number would drop them and serialize.
# --------------------------------------------------------------------------

_Q15_QUARTER_START = "1995-01-01"
_Q15_QUARTER_END = "1995-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= _Q15_QUARTER_START)
                  & (F.col("l_shipdate") < _Q15_QUARTER_END))
        .groupBy("l_suppkey")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("ingresos")))
    max_rev = revenue.agg(F.max("ingresos").alias("_max"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("ingresos") == F.col("_max"))
        .join(F.broadcast(supp), revenue.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey").cast("long").alias("suppkey"),
                "s_name", "ingresos")
        .orderBy("suppkey")
    )


SQL_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey,
         floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
           AS ingresos
  FROM lineitem
  WHERE l_shipdate >= '{_Q15_QUARTER_START}'
    AND l_shipdate < '{_Q15_QUARTER_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey::BIGINT AS suppkey, s_name, ingresos
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE ingresos = (SELECT max(ingresos) FROM revenue)
ORDER BY suppkey
"""

register("top_supplier", q_top_supplier, SQL_TOP_SUPPLIER)


# --------------------------------------------------------------------------
# shipping_priority — Q3 shape: selective dimension filter (market
# segment) broadcast into the fact join chain, revenue aggregation per
# order, distributed top-k (TakeOrdered — never a global sort of the
# aggregate). Citation: reference has no such query; this is engine
# surface for the decision-support idiom.
# --------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    lines = (_t(spark, sf_dir, "lineitem")
             .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
             .select("l_orderkey", "l_extendedprice", "l_discount"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lines.join(orders, lines.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(r2(F.sum(revenue)).alias("ingreso"))
        .orderBy(F.col("ingreso").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(F.col("l_orderkey").cast("long").alias("l_orderkey"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "ingreso")
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey::BIGINT AS l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS ingreso
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate
ORDER BY ingreso DESC, l_orderkey ASC LIMIT 10
"""

register("shipping_priority", q_shipping_priority, SQL_SHIPPING_PRIORITY)


# --------------------------------------------------------------------------
# local_supplier_volume — Q5 shape: the 6-way join with the co-location
# condition (customer and supplier in the SAME nation). Dimension chain
# (region → nation) broadcasts; the only big-big join is
# lineitem ⋈ orders on the order key; the supplier dim broadcasts with a
# composite (s_suppkey, s_nationkey) key so the nation equality rides the
# hash join instead of a post-filter.
# --------------------------------------------------------------------------

def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (_t(spark, sf_dir, "region")
              .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                      & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date")))
              .select("o_orderkey", "o_custkey"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    lines = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lines.join(orders, lines.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), lines.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust.join(F.broadcast(nation),
                                    cust.c_nationkey == nation.n_nationkey)),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return (
        joined.groupBy("n_name")
        .agg(r2(F.sum(revenue)).alias("ingreso"))
        .orderBy(F.col("ingreso").desc(), F.col("n_name").asc())
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name, floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS ingreso
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name ORDER BY ingreso DESC, n_name ASC
"""

register("local_supplier_volume", q_local_supplier_volume,
         SQL_LOCAL_SUPPLIER_VOLUME)


# --------------------------------------------------------------------------
# returned_items — Q10 shape: returned-lineitem revenue attributed back
# to customers, top-20. The fact side filters on the return flag before
# any join (pushed to the scan); customer and nation broadcast.
# --------------------------------------------------------------------------

def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    returned = (_t(spark, sf_dir, "lineitem")
                .filter(F.col("l_returnflag") == "R")
                .select("l_orderkey", "l_extendedprice", "l_discount"))
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
                      & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date")))
              .select("o_orderkey", "o_custkey"))
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r2(F.sum(revenue)).alias("ingreso"))
        .orderBy(F.col("ingreso").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                "c_name", r2(F.col("c_acctbal")).alias("c_acctbal"),
                "n_name", "ingreso")
    )


SQL_RETURNED_ITEMS = """
SELECT c_custkey::BIGINT AS c_custkey, c_name,
       floor(c_acctbal * 100 + 0.5) / 100 AS c_acctbal, n_name,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS ingreso
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY ingreso DESC, c_custkey ASC LIMIT 20
"""

register("returned_items", q_returned_items, SQL_RETURNED_ITEMS)


# --------------------------------------------------------------------------
# promo_revenue_share — Q14 shape: conditional-aggregate ratio over a
# fact ⋈ dim join (share of revenue from promo-typed parts in one
# month). Part broadcasts; the ratio is one map-side-combined aggregate —
# no second pass for the denominator.
# --------------------------------------------------------------------------

def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    lines = (_t(spark, sf_dir, "lineitem")
             .filter((F.col("l_shipdate") >= F.lit("1995-09-01").cast("date"))
                     & (F.col("l_shipdate") < F.lit("1995-10-01").cast("date")))
             .select("l_partkey", "l_extendedprice", "l_discount"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(0.0)
    return (
        lines.join(F.broadcast(part), lines.l_partkey == part.p_partkey)
        .agg((F.sum(promo) * 100.0 / F.sum(revenue)).alias("_pct"))
        .select(F.expr("floor(_pct * 10000 + 0.5) / 10000").alias("promo_pct"))
    )


SQL_PROMO_REVENUE_SHARE = """
SELECT floor((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
              / sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
       AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""

register("promo_revenue_share", q_promo_revenue_share, SQL_PROMO_REVENUE_SHARE)


# --------------------------------------------------------------------------
# discounted_bulk_revenue — Q19 shape: disjunction of conjunctive
# brand/size/quantity predicates across the join. Catalyst extracts the
# common l_partkey = p_partkey conjunct so the OR rides a single
# broadcast hash join with the residual disjunction as the join filter —
# never a nested-loop.
# --------------------------------------------------------------------------

def q_discounted_bulk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    lines = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = lines.join(F.broadcast(part),
                        lines.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30)))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (joined.filter(cond)
            .agg(r2(F.sum(revenue)).alias("ingreso"),
                 F.count(F.lit(1)).cast("long").alias("n_lineas")))


SQL_DISCOUNTED_BULK_REVENUE = """
SELECT floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS ingreso,
       count(*)::BIGINT AS n_lineas
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

register("discounted_bulk_revenue", q_discounted_bulk_revenue,
         SQL_DISCOUNTED_BULK_REVENUE)


# --------------------------------------------------------------------------
# revenue_change — Q6 shape: the pure scan-side aggregate. Every predicate
# (ship year, discount band, quantity cap) pushes into the parquet scan;
# the whole query is one map-side-combined agg with NO shuffle of fact
# rows — the canonical "filters must reach the scan" probe.
# --------------------------------------------------------------------------

def q_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
                  & (F.col("l_discount").between(0.05, 0.07))
                  & (F.col("l_quantity") < 24))
        .agg(r2(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
             .alias("ingreso_descuento"),
             F.count(F.lit(1)).cast("long").alias("n_lineas"))
    )


SQL_REVENUE_CHANGE = """
SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100
         AS ingreso_descuento,
       count(*)::BIGINT AS n_lineas
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

register("revenue_change", q_revenue_change, SQL_REVENUE_CHANGE)


# --------------------------------------------------------------------------
# product_profit — Q9 shape: profit per (supplier nation, order year) for
# one part family. The testdata has no partsupp table, so unit cost is
# proxied by 60% of p_retailprice (deterministic, documented adaptation).
# Plan: part filter broadcasts into the fact scan, supplier→nation is a
# broadcast chain, and the only big-big join is lineitem ⋈ orders on the
# order key — one fact shuffle, then a small keyed rollup.
# --------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_name").contains("red"))
            .select("p_partkey", "p_retailprice"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nacion"),
                 F.year("o_orderdate").cast("long").alias("anio"))
        .agg(r2(F.sum(profit)).alias("ganancia"))
        .orderBy(F.col("nacion").asc(), F.col("anio").desc())
    )


SQL_PRODUCT_PROFIT = """
SELECT n_name AS nacion, year(o_orderdate)::BIGINT AS anio,
       floor(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity) * 100 + 0.5) / 100
         AS ganancia
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY nacion, anio ORDER BY nacion ASC, anio DESC
"""

register("product_profit", q_product_profit, SQL_PRODUCT_PROFIT)


# --------------------------------------------------------------------------
# line_priority_mix — Q12 shape: conditional priority counts per category
# for lines shipped in one year. The testdata has no l_shipmode column,
# so the category is l_linestatus (same conditional-count idiom). The
# orders side projects two columns and the rollup output is 2 rows; the
# big-big join on the order key is the only shuffle.
# --------------------------------------------------------------------------

def q_line_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date")))
          .select("l_orderkey", "l_linestatus"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(F.sum(is_high.cast("int")).cast("long").alias("n_alta"),
             F.sum((~is_high).cast("int")).cast("long").alias("n_baja"))
        .orderBy("l_linestatus")
    )


SQL_LINE_PRIORITY_MIX = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS n_alta,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS n_baja
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""

register("line_priority_mix", q_line_priority_mix, SQL_LINE_PRIORITY_MIX)


# --------------------------------------------------------------------------
# small_qty_revenue — Q17 shape: the correlated per-part average. For one
# brand, average yearly revenue from lines whose quantity is under 20% of
# that part's own average quantity. Plan: the brand filter broadcasts into
# the fact scan (lineitem read ONCE), then the per-part average is a
# whole-partition window over the brand subset — one keyed shuffle of
# ~1/|brands| of the fact, never a second scan, never a self-join of the
# full fact. At 100 TB the window partition (one part's lines) is bounded
# by part cardinality × order velocity, not corpus size.
# --------------------------------------------------------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    brand_parts = (_t(spark, sf_dir, "part")
                   .filter(F.col("p_brand") == "Brand#23")
                   .select("p_partkey"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(r2(F.sum("l_extendedprice") / 7.0).alias("ingreso_anual"),
             F.count(F.lit(1)).cast("long").alias("n_lineas"))
    )


SQL_SMALL_QTY_REVENUE = """
SELECT floor((sum(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS ingreso_anual,
       count(*)::BIGINT AS n_lineas
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

register("small_qty_revenue", q_small_qty_revenue, SQL_SMALL_QTY_REVENUE)


# --------------------------------------------------------------------------
# dominant_part_suppliers — Q20 shape: nested quantified subqueries →
# semi-join chain. Suppliers who shipped more than 25% of the 1996 volume
# of some 'red' part. The testdata has no partsupp/availqty, so the
# quantified predicate is per-part volume share (same nesting, adapted
# measure). Plan: part-name filter broadcasts into the fact scan; one
# keyed shuffle to (part, supplier) grain; the per-part total is a window
# over the already-reduced grain (|parts|×|suppliers| rows, not fact
# rows); supplier names broadcast-join at the end.
# --------------------------------------------------------------------------

def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    red_parts = (_t(spark, sf_dir, "part")
                 .filter(F.col("p_name").startswith("red"))
                 .select("p_partkey"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_pair = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn("_total", F.sum("_qty").over(w))
        .filter(F.col("_qty") > 0.25 * F.col("_total"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_partes_dominadas"))
    )
    return (
        dominant.join(F.broadcast(supp), dominant.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name",
                "n_partes_dominadas")
        .orderBy(F.col("n_partes_dominadas").desc(), F.col("s_suppkey").asc())
    )


SQL_DOMINANT_PART_SUPPLIERS = """
WITH pair AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
), shared AS (
  SELECT l_suppkey, count(*)::BIGINT AS n_partes_dominadas
  FROM (SELECT *, sum(qty) OVER (PARTITION BY l_partkey) AS total FROM pair)
  WHERE qty > 0.25 * total
  GROUP BY l_suppkey
)
SELECT s_suppkey::BIGINT AS s_suppkey, s_name, n_partes_dominadas
FROM shared JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_partes_dominadas DESC, s_suppkey ASC
"""

register("dominant_part_suppliers", q_dominant_part_suppliers,
         SQL_DOMINANT_PART_SUPPLIERS)


# --------------------------------------------------------------------------
# part_supplier_counts — Q16 shape (the last uncovered TPC-H idiom):
# count of DISTINCT suppliers per part-attribute group, with a NOT LIKE
# attribute filter, an IN size list, and a NOT IN supplier exclusion
# (the "customer complaints" analog = suppliers with a negative account
# balance). The testdata has no partsupp, so the part-supplier
# relationship is the distinct (l_partkey, l_suppkey) grain of lineitem
# (reference: sql/consultas_tpch.sql-style catalog rollups).
#
# Plan shape: the part filter is pushed to the parquet scan and
# broadcast into the fact; the complainer list is a <10-row broadcast
# anti-join (never a shuffle); the fact reduces FIRST to the distinct
# (partkey, suppkey) grain (one keyed shuffle, map-side combined), and
# only that reduced grain carries the part attributes into the final
# count-distinct aggregate. At 100 TB the only fact-sized exchange is
# the pair-grain distinct.
# --------------------------------------------------------------------------

_Q16_SIZES = (3, 9, 14, 19, 23, 36, 45, 49)


def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (_t(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#1")
                    & ~F.col("p_type").like("PROMO%")
                    & F.col("p_size").isin(*_Q16_SIZES))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    complainers = (_t(spark, sf_dir, "supplier")
                   .filter(F.col("s_acctbal") < 0)
                   .select("s_suppkey"))
    pairs = (_t(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey")
             .join(complainers.hint("broadcast"),
                   F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
             .distinct())
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .select("p_brand", "p_type",
                F.col("p_size").cast("long").alias("p_size"), "supplier_cnt")
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
                 F.col("p_type").asc(), F.col("p_size").asc())
    )


SQL_PART_SUPPLIER_COUNTS = f"""
SELECT p_brand, p_type, p_size::BIGINT AS p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) pares
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN {_Q16_SIZES}
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

register("part_supplier_counts", q_part_supplier_counts,
         SQL_PART_SUPPLIER_COUNTS)
