"""Portfolio analytics: aging distribution, current-vs-overdue split,
concept summaries, cancelled and unapplied summaries.

Parity targets: SURVEY §2.4 A1-A8. Spark-first: conditional aggregations
replace the reference's filter-per-view passes; the full-outer
cargos⋈abonos-by-concepto join (J5) is restated as one grouped conditional
aggregation (semantically identical, one shuffle instead of three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import RANGOS_ANTIGUEDAD
from ..operators.buckets import bucket_order_expr
from ..operators.rounding import r2
from ..operators.totals import with_total_row
from .master import ACTIVO
from .reporte import active, monto, saldo_factura, with_cycle_metrics


def antiguedad_cartera(master: DataFrame, as_of: str,
                       moneda: str = "MXN",
                       charges: DataFrame | None = None) -> DataFrame:
    """Open-invoice balance by aging bucket, bucket-ordered, with TOTAL row
    (reference ``src/analytics.py:133-174``)."""
    if charges is None:
        charges = with_cycle_metrics(saldo_factura(master), as_of)
    open_inv = charges.filter((F.col("MONEDA") == moneda) & (F.col("SALDO_FACTURA") > 0))
    agg = (
        open_inv.groupBy(F.col("CATEGORIA_MORA").alias("RANGO"))
        .agg(F.count(F.lit(1)).cast("long").alias("NUM_FACTURAS_PENDIENTES"),
             r2(F.sum("SALDO_FACTURA")).alias("SALDO_PENDIENTE"))
        .withColumn("ORDEN",
                    bucket_order_expr(F.col("RANGO"), RANGOS_ANTIGUEDAD).cast("long"))
    )
    return with_total_row(
        agg, "RANGO", ["SALDO_PENDIENTE"], int_sum_cols=["NUM_FACTURAS_PENDIENTES"],
        const={"ORDEN": F.lit(len(RANGOS_ANTIGUEDAD) + 1).cast("long")},
    ).orderBy("ORDEN", "RANGO")


def cartera_vencida_vs_vigente(master: DataFrame, as_of: str,
                               moneda: str = "MXN",
                               charges: DataFrame | None = None) -> DataFrame:
    """Current-vs-overdue split of the open sale portfolio
    (reference ``src/analytics.py:264-304``)."""
    if charges is None:
        charges = with_cycle_metrics(saldo_factura(master), as_of)
    open_inv = charges.filter((F.col("MONEDA") == moneda) & (F.col("SALDO_FACTURA") > 0))
    estatus = F.when(F.col("DELTA_MORA") > 0, "VENCIDA").otherwise("VIGENTE")
    return (
        open_inv.groupBy(estatus.alias("ESTATUS"))
        .agg(F.count(F.lit(1)).cast("long").alias("NUM_FACTURAS"),
             r2(F.sum("SALDO_FACTURA")).alias("SALDO"))
        .orderBy("ESTATUS")
    )


def antiguedad_por_cliente(master: DataFrame, as_of: str,
                           moneda: str = "MXN",
                           charges: DataFrame | None = None) -> DataFrame:
    """Per-client aging pivot (reference ``src/analytics.py:180-260``):
    sale charges vs credits per client, open-invoice count/balance, and
    the open balance pivoted across the aging buckets.

    Spark-first: the reference runs five pandas groupbys plus a Python
    pivot loop; here it is TWO conditional grouped passes (cargos/abonos
    over the active master; open-invoice + bucket pivot over the charges
    frame) joined on the client key — both shuffle once on that key.
    Clients with at least one sale charge, stratified dual sort, TOTAL row.
    """
    if charges is None:
        charges = with_cycle_metrics(saldo_factura(master), as_of)
    venta = (F.col("TIPO_IMPTE") == "C") & F.col("CONCEPTO").contains("VENTA")
    labels = [label for _, _, label in RANGOS_ANTIGUEDAD]

    act = (active(master)
           .filter((F.col("MONEDA") == moneda)
                   & F.col("NOMBRE_CLIENTE").isNotNull()))
    per_client = (
        act.groupBy("NOMBRE_CLIENTE")
        .agg(
            F.coalesce(F.max(F.when(venta, F.col("ESTATUS_CLIENTE"))),
                       F.lit("")).alias("ESTATUS_CLIENTE"),
            F.sum(venta.cast("int")).cast("long").alias("NUM_FACTURAS_TOTALES"),
            r2(F.sum(F.when(venta, r2(monto())).otherwise(0.0)))
            .alias("TOTAL_CARGOS"),
            r2(F.sum(F.when(F.col("TIPO_IMPTE") == "R", r2(monto()))
                     .otherwise(0.0))).alias("TOTAL_ABONOS"),
        )
        .filter(F.col("NUM_FACTURAS_TOTALES") > 0)
    )
    abiertas = charges.filter(
        (F.col("MONEDA") == moneda) & venta & (F.col("SALDO_FACTURA") > 0)
        & F.col("NOMBRE_CLIENTE").isNotNull())
    open_aggs = (
        abiertas.groupBy("NOMBRE_CLIENTE")
        .agg(F.count(F.lit(1)).cast("long").alias("NUM_FACTURAS_PENDIENTES"),
             r2(F.sum("SALDO_FACTURA")).alias("SALDO_PENDIENTE"),
             *[r2(F.sum(F.when(F.col("CATEGORIA_MORA") == lbl,
                               F.col("SALDO_FACTURA")).otherwise(0.0)))
               .alias(lbl) for lbl in labels])
    )
    joined = (
        per_client.join(open_aggs, "NOMBRE_CLIENTE", "left")
        .select(
            "NOMBRE_CLIENTE", "ESTATUS_CLIENTE", "NUM_FACTURAS_TOTALES",
            F.coalesce("NUM_FACTURAS_PENDIENTES", F.lit(0)).cast("long")
            .alias("NUM_FACTURAS_PENDIENTES"),
            "TOTAL_CARGOS", "TOTAL_ABONOS",
            F.coalesce("SALDO_PENDIENTE", F.lit(0.0)).alias("SALDO_PENDIENTE"),
            *[F.coalesce(lbl, F.lit(0.0)).alias(lbl) for lbl in labels],
        )
    )
    from ..operators.sorting import dual_sort_keys
    out = with_total_row(
        joined, "NOMBRE_CLIENTE",
        ["TOTAL_CARGOS", "TOTAL_ABONOS", "SALDO_PENDIENTE"] + labels,
        int_sum_cols=["NUM_FACTURAS_TOTALES", "NUM_FACTURAS_PENDIENTES"],
        const={"ESTATUS_CLIENTE": F.lit("")},
    )
    es_total = F.col("NOMBRE_CLIENTE") == "TOTAL"
    keys = dual_sort_keys(F.col("SALDO_PENDIENTE"), F.col("NOMBRE_CLIENTE"))
    return out.orderBy(es_total.cast("int").asc(), *keys,
                       F.col("NOMBRE_CLIENTE").asc())


def resumen_por_concepto(master: DataFrame, moneda: str = "MXN") -> DataFrame:
    """Charges and credits per concept — one conditional aggregation
    (restates the reference's full-outer join of two aggregates,
    ``src/analytics.py:310-348``)."""
    act = active(master).filter(F.col("MONEDA") == moneda)
    es_cargo = F.col("NATURALEZA_CONCEPTO") == "C"
    es_abono = F.col("NATURALEZA_CONCEPTO") == "R"
    return (
        act.groupBy(F.coalesce("CONCEPTO", F.lit("Sin concepto asignado"))
                    .alias("CONCEPTO"))
        .agg(
            F.sum(es_cargo.cast("int")).cast("long").alias("NUM_CARGOS"),
            r2(F.sum(F.when(es_cargo, r2(monto())).otherwise(0.0))).alias("TOTAL_CARGOS"),
            F.sum(es_abono.cast("int")).cast("long").alias("NUM_ABONOS"),
            r2(F.sum(F.when(es_abono, r2(monto())).otherwise(0.0))).alias("TOTAL_ABONOS"),
        )
        .orderBy(F.col("TOTAL_CARGOS").desc(), F.col("TOTAL_ABONOS").desc(),
                 F.col("CONCEPTO").asc())
    )


def resumen_cancelados(master: DataFrame, moneda: str = "MXN") -> DataFrame:
    """Cancelled movements per concept (the complement of the active filter;
    reference ``src/analytics.py:391-425``)."""
    canc = master.filter(~F.expr(ACTIVO) & (F.col("MONEDA") == moneda))
    return (
        canc.groupBy("CONCEPTO")
        .agg(F.count(F.lit(1)).cast("long").alias("NUM_DOCUMENTOS"),
             r2(F.sum(r2(monto()))).alias("MONTO_CANCELADO"))
        .orderBy(F.col("MONTO_CANCELADO").desc(), F.col("CONCEPTO").asc())
    )


def resumen_ajustes(master: DataFrame, moneda: str = "MXN") -> DataFrame:
    """Unapplied/advance (TIPO_IMPTE='A') amounts per client
    (reference ``src/analytics.py:354-385``)."""
    ajustes = active(master).filter(
        (F.col("TIPO_IMPTE") == "A") & (F.col("MONEDA") == moneda))
    return (
        ajustes.groupBy(F.coalesce("NOMBRE_CLIENTE", F.lit("Sin cliente"))
                        .alias("NOMBRE_CLIENTE"))
        .agg(F.count(F.lit(1)).cast("long").alias("NUM_MOVIMIENTOS"),
             r2(F.sum(r2(monto()))).alias("MONTO_POR_ACREDITAR"))
        .orderBy(F.col("MONTO_POR_ACREDITAR").desc(), F.col("NOMBRE_CLIENTE").asc())
    )


def auditoria_nulos(master: DataFrame) -> DataFrame:
    """Null-attribute audits: movements missing client type / salesperson
    (reference ``src/auditor.py:267-313``)."""
    act = active(master)
    return (
        act.groupBy("MONEDA")
        .agg(
            F.sum(F.col("TIPO_CLIENTE").isNull().cast("int")).cast("long")
            .alias("SIN_TIPO_CLIENTE"),
            F.sum(F.col("VENDEDOR").isNull().cast("int")).cast("long")
            .alias("SIN_VENDEDOR"),
            F.count(F.lit(1)).cast("long").alias("TOTAL_MOVIMIENTOS"),
        )
        .orderBy("MONEDA")
    )
