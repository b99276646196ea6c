"""SQL-text execution surface (SURVEY §2.1 S2): queries expressed as Spark
SQL strings over registered temp views — the engine's parity with the
reference's run-SQL-from-file scan, plus ordered distinct lists (O6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import register_views
from . import register

# The same text executes on Spark SQL and DuckDB unchanged — the engine's
# SQL dialect surface for .sql-file driven reports.
_PRIORITY_ROLLUP = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    out = spark.sql(_PRIORITY_ROLLUP)
    return out.withColumn("n_orders", out["n_orders"].cast("long"))


register("sql_text", q_sql_text,
         _PRIORITY_ROLLUP.replace("count(*)", "count(*)::BIGINT"))


# Ordered distinct value lists (O6: filter-widget domains).

def q_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT 'mktsegment' AS dominio, c_mktsegment AS valor
        FROM customer WHERE c_mktsegment IS NOT NULL
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'orderpriority', o_orderpriority
        FROM orders WHERE o_orderpriority IS NOT NULL
        GROUP BY o_orderpriority
        ORDER BY dominio, valor
    """)


SQL_DISTINCT_VALUES = """
SELECT 'mktsegment' AS dominio, c_mktsegment AS valor
FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment
UNION ALL
SELECT 'orderpriority', o_orderpriority
FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority
ORDER BY dominio, valor
"""

register("distinct_values", q_distinct_values, SQL_DISTINCT_VALUES)


# Correlated LATERAL subquery (top-2 customers per nation): the same text
# plans on Spark SQL (DecorrelateInnerQuery -> per-key window) and DuckDB.
_LATERAL_TOPK = """
SELECT n_name, c.c_name,
       floor(c.c_acctbal * 100 + 0.5) / 100 AS c_acctbal
FROM nation,
LATERAL (
  SELECT c_name, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name ASC
  LIMIT 2
) c
ORDER BY n_name, c_acctbal DESC, c_name
"""


def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_TOPK)


register("sql_lateral_topk", q_sql_lateral_topk, _LATERAL_TOPK)
