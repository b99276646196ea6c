"""Master "movements" assembly — the engine's core lineage root.

Parity target: the reference's master CxC table (see SURVEY §1/§2.3 J1):
a denormalized movement-grain frame where charge documents (invoices) and
credit documents (payments/advances) share one schema, linked by
``DOCTO_CC_ACR_ID`` (the charge a payment applies to).

Two producers:

- ``assemble_master(tables)`` — the generic 9-left-join assembly over
  ERP-shaped source tables (JDBC parity path; reference
  ``src/data_transformer.py:84-197``). Dimensions are broadcast; the
  amount-line fan-out join is the only shuffle join.
- ``cxc_master_from_tpch(spark, sf_dir)`` — deterministic adapter deriving a
  CxC-shaped master from the harness star schema (orders → charges,
  lineitem → payments), with messy-domain flags, nulls, unapplied ('A')
  rows and both currencies synthesized so every downstream operator has a
  populated path. ``MASTER_SQL_CTE`` is its DuckDB twin for oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources import load_table

AS_OF_CXC = "1998-08-01"  # deterministic "today" for the CxC layer
SQL_AS_OF_CXC = f"DATE '{AS_OF_CXC}'"

MASTER_COLUMNS = [
    "DOCTO_CC_ID", "DOCTO_CC_ACR_ID", "CLIENTE_ID", "NOMBRE_CLIENTE",
    "TIPO_CLIENTE", "VENDEDOR", "MONEDA", "CONCEPTO", "NATURALEZA_CONCEPTO",
    "TIPO_IMPTE", "CANCELADO", "IMPORTE", "IMPUESTO", "FECHA_EMISION",
    "FECHA_VENCIMIENTO", "LIMITE_CREDITO", "ESTATUS_CLIENTE",
    "CARGOS", "ABONOS",
]


def assemble_master(tables: dict[str, DataFrame]) -> DataFrame:
    """Generic ERP assembly: fact ``DOCTOS_CC`` ⟕ amount lines ⟕ dims.

    Expects ERP-shaped frames keyed like the reference's table registry
    (``DOCTOS_CC``, ``IMPORTES_DOCTOS_CC``, ``CLIENTES``, ``TIPOS_CLIENTES``,
    ``VENDEDORES``, ``MONEDAS``, ``CONCEPTOS_CC``, ``VENCIMIENTOS_CARGOS_CC``,
    ``CONDICIONES_PAGO``). Small dims are broadcast; the 1-N amount-line join
    shuffles both sides on DOCTO_CC_ID once.
    """
    f = tables["DOCTOS_CC"]
    imp = tables["IMPORTES_DOCTOS_CC"]
    cli = tables["CLIENTES"]
    master = (
        imp.join(f, "DOCTO_CC_ID", "left")
        .join(broadcast(cli), "CLIENTE_ID", "left")
    )
    for dim, key in (("TIPOS_CLIENTES", "TIPO_CLIENTE_ID"),
                     ("VENDEDORES", "VENDEDOR_ID"),
                     ("MONEDAS", "MONEDA_ID"),
                     ("CONCEPTOS_CC", "CONCEPTO_CC_ID"),
                     ("CONDICIONES_PAGO", "COND_PAGO_ID")):
        if dim in tables:
            master = master.join(broadcast(tables[dim]), key, "left")
    if "VENCIMIENTOS_CARGOS_CC" in tables:
        master = master.join(tables["VENCIMIENTOS_CARGOS_CC"], "DOCTO_CC_ID", "left")
    nat = F.upper(F.trim(F.col("NATURALEZA_CONCEPTO")))
    return (
        master.withColumn("CARGOS", F.when(nat == "C", F.col("IMPORTE")).otherwise(0.0))
        .withColumn("ABONOS", F.when(nat == "R", F.col("IMPORTE")).otherwise(0.0))
    )


# --------------------------------------------------------------------------
# Deterministic TPC-H → CxC adapter (Spark + SQL twin, kept in sync below).
# --------------------------------------------------------------------------

_R2 = "floor({} * 100 + 0.5) / 100"


def cxc_master_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    cust = broadcast(customer.selectExpr(
        "c_custkey",
        "upper(trim(c_name)) AS NOMBRE_CLIENTE",
        "CASE WHEN c_nationkey % 4 = 0 THEN 'USD' ELSE 'MXN' END AS MONEDA",
        f"{_R2.format('greatest(c_acctbal, 0) * 100')} AS LIMITE_CREDITO",
        "c_mktsegment",
    ))

    def client_cols(key: str) -> list[str]:
        return [
            f"CASE WHEN {key} % 17 = 0 THEN NULL "
            f"WHEN {key} % 2 = 0 THEN 'CREDITO' ELSE 'CONTADO' END AS TIPO_CLIENTE",
            f"CASE WHEN {key} % 13 = 0 THEN NULL "
            f"ELSE concat('VEND-', cast({key} % 5 as string)) END AS VENDEDOR",
            "'ACTIVO' AS ESTATUS_CLIENTE",
        ]

    charges = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .selectExpr(
            "o_orderkey AS DOCTO_CC_ID",
            "cast(NULL as bigint) AS DOCTO_CC_ACR_ID",
            "o_custkey AS CLIENTE_ID",
            "NOMBRE_CLIENTE", "MONEDA", "LIMITE_CREDITO",
            *client_cols("o_custkey"),
            "CASE WHEN o_orderkey % 11 = 0 THEN 'INTERESES' "
            "ELSE concat('VENTA ', c_mktsegment) END AS CONCEPTO",
            "'C' AS NATURALEZA_CONCEPTO",
            "'C' AS TIPO_IMPTE",
            "CASE WHEN o_orderkey % 97 = 0 THEN 'S' "
            "WHEN o_orderkey % 98 = 0 THEN 'si' ELSE 'N' END AS CANCELADO",
            "o_totalprice AS IMPORTE",
            f"{_R2.format('o_totalprice * 0.16')} AS IMPUESTO",
            "cast(o_orderdate as date) AS FECHA_EMISION",
            "date_add(cast(o_orderdate as date), "
            "cast(30 + (o_custkey % 3) * 30 as int)) AS FECHA_VENCIMIENTO",
        )
    )

    # The payments arm is SPLIT on the (l_orderkey + l_linenumber) % 12
    # advance-vs-collection predicate so that TIPO_IMPTE and CONCEPTO are
    # LITERALS per union arm (r11, guide §2.4).  Same rows, same values —
    # the predicate is deterministic and row-level, the two sub-arms
    # partition exactly the rows the old CASE expressions produced.  The
    # point is plan pruning: every downstream TIPO_IMPTE / CONCEPTO
    # filter (cargos TIPO='C', abonos TIPO='R', flujos TIPO<>'A', the
    # es_venta CONCEPTO gate) now CONSTANT-FOLDS inside the non-matching
    # arms, so Catalyst statically deletes them — with the old
    # row-dependent CASE, a cargos-only consumer still scanned lineitem
    # and ran the payments join just to evaluate a never-true predicate
    # per row.  Measured at sf0.1 (alternating A/B min-of-4): the nine
    # cxc bench members 25.2 -> 16.5 s (0.65x); at 100 TB the charge-side
    # consumers stop touching the lineitem-grain arm entirely.
    def payments_arm(pred: str, concepto: str, tipo: str):
        return (
            lineitem.filter(F.expr(pred))
            .join(orders, lineitem.l_orderkey == orders.o_orderkey, "left")
            .join(cust, orders.o_custkey == cust.c_custkey, "left")
            .selectExpr(
                "10000000 + l_orderkey * 10 + l_linenumber AS DOCTO_CC_ID",
                "l_orderkey AS DOCTO_CC_ACR_ID",
                "o_custkey AS CLIENTE_ID",
                "NOMBRE_CLIENTE", "MONEDA", "LIMITE_CREDITO",
                *client_cols("o_custkey"),
                f"'{concepto}' AS CONCEPTO",
                "'R' AS NATURALEZA_CONCEPTO",
                f"'{tipo}' AS TIPO_IMPTE",
                "CASE WHEN (l_orderkey + l_linenumber) % 89 = 0 THEN 'SI' ELSE 'N' END AS CANCELADO",
                f"{_R2.format('l_extendedprice * (1 - l_discount)')} AS IMPORTE",
                f"{_R2.format(_R2.format('l_extendedprice * (1 - l_discount)') + ' * 0.16')} AS IMPUESTO",
                "cast(l_shipdate as date) AS FECHA_EMISION",
                "cast(NULL as date) AS FECHA_VENCIMIENTO",
            )
        )

    advances = payments_arm(
        "(l_orderkey + l_linenumber) % 12 = 0", "ANTICIPO", "A")
    collections = payments_arm(
        "(l_orderkey + l_linenumber) % 12 != 0", "COBRO", "R")

    union = charges.unionByName(collections).unionByName(advances)
    return (
        union.withColumn(
            "CARGOS", F.when(F.col("NATURALEZA_CONCEPTO") == "C", F.col("IMPORTE")).otherwise(0.0))
        .withColumn(
            "ABONOS", F.when(F.col("NATURALEZA_CONCEPTO") == "R", F.col("IMPORTE")).otherwise(0.0))
        .select(*MASTER_COLUMNS)
    )


def _sql_client_cols(key: str) -> str:
    return f"""
         CASE WHEN {key} % 17 = 0 THEN NULL
              WHEN {key} % 2 = 0 THEN 'CREDITO' ELSE 'CONTADO' END AS TIPO_CLIENTE,
         CASE WHEN {key} % 13 = 0 THEN NULL
              ELSE concat('VEND-', cast({key} % 5 as varchar)) END AS VENDEDOR,
         'ACTIVO' AS ESTATUS_CLIENTE"""


MASTER_SQL_CTE = f"""
cust AS (
  SELECT c_custkey,
         upper(trim(c_name)) AS NOMBRE_CLIENTE,
         CASE WHEN c_nationkey % 4 = 0 THEN 'USD' ELSE 'MXN' END AS MONEDA,
         floor(greatest(c_acctbal, 0) * 100 * 100 + 0.5) / 100 AS LIMITE_CREDITO,
         c_mktsegment
  FROM customer
), master AS (
  SELECT o_orderkey AS DOCTO_CC_ID,
         CAST(NULL AS BIGINT) AS DOCTO_CC_ACR_ID,
         o_custkey AS CLIENTE_ID,
         NOMBRE_CLIENTE, MONEDA, LIMITE_CREDITO,{_sql_client_cols('o_custkey')},
         CASE WHEN o_orderkey % 11 = 0 THEN 'INTERESES'
              ELSE concat('VENTA ', c_mktsegment) END AS CONCEPTO,
         'C' AS NATURALEZA_CONCEPTO,
         'C' AS TIPO_IMPTE,
         CASE WHEN o_orderkey % 97 = 0 THEN 'S'
              WHEN o_orderkey % 98 = 0 THEN 'si' ELSE 'N' END AS CANCELADO,
         o_totalprice AS IMPORTE,
         floor(o_totalprice * 0.16 * 100 + 0.5) / 100 AS IMPUESTO,
         CAST(o_orderdate AS DATE) AS FECHA_EMISION,
         CAST(o_orderdate AS DATE) + (30 + (o_custkey % 3) * 30)::INT AS FECHA_VENCIMIENTO,
         o_totalprice AS CARGOS,
         0.0 AS ABONOS
  FROM orders LEFT JOIN cust ON o_custkey = c_custkey
  UNION ALL
  SELECT 10000000 + l_orderkey * 10 + l_linenumber AS DOCTO_CC_ID,
         l_orderkey AS DOCTO_CC_ACR_ID,
         o_custkey AS CLIENTE_ID,
         NOMBRE_CLIENTE, MONEDA, LIMITE_CREDITO,{_sql_client_cols('o_custkey')},
         CASE WHEN (l_orderkey + l_linenumber) % 12 = 0 THEN 'ANTICIPO'
              ELSE 'COBRO' END AS CONCEPTO,
         'R' AS NATURALEZA_CONCEPTO,
         CASE WHEN (l_orderkey + l_linenumber) % 12 = 0 THEN 'A' ELSE 'R' END AS TIPO_IMPTE,
         CASE WHEN (l_orderkey + l_linenumber) % 89 = 0 THEN 'SI' ELSE 'N' END AS CANCELADO,
         floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS IMPORTE,
         floor((floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100) * 0.16 * 100 + 0.5) / 100
           AS IMPUESTO,
         CAST(l_shipdate AS DATE) AS FECHA_EMISION,
         CAST(NULL AS DATE) AS FECHA_VENCIMIENTO,
         0.0 AS CARGOS,
         floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS ABONOS
  FROM lineitem
  LEFT JOIN orders ON l_orderkey = o_orderkey
  LEFT JOIN cust ON o_custkey = c_custkey
)
"""

# Active (non-cancelled) predicate over the messy flag domain —
# reference src/reporte_cxc.py:309 normalized once at this seam.
# NULL flags coalesce to 'N' (active): a bare NOT IN would evaluate to NULL
# and silently drop the row from BOTH the active and cancelled views.
# Accepted "cancelled" domain comes from config so Spark and the SQL
# oracles cannot drift apart.
from ..config import CANCELADO_ACEPTADO as _CANC

_CANC_SQL = ",".join(f"'{v}'" for v in _CANC)
ACTIVO = (f"upper(trim(cast(coalesce(CANCELADO, 'N') as string))) "
          f"NOT IN ({_CANC_SQL})")
