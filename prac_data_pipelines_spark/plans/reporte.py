"""Operating-report layer: invoice balances, collection-cycle metrics and
per-client running balances over the master movements frame.

Parity targets (SURVEY §2.12): ``SALDO_FACTURA`` (J2), ``DELTA_RECAUDO``/
``DELTA_MORA`` + bucket categories, ``SALDO_CLIENTE`` (W1), open/closed
views (J4/U1). All shapes are single-shuffle joins/windows keyed on the
charge document or client — fully parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import RANGOS_ANTIGUEDAD, RANGOS_RECAUDO
from ..operators.buckets import bucketize
from ..operators.rounding import r2
from .master import ACTIVO


def active(master: DataFrame) -> DataFrame:
    """Drop cancelled movements (messy flag domain normalized once;
    reference ``src/reporte_cxc.py:309,322-331``)."""
    return master.filter(F.expr(ACTIVO))


def monto() -> Column:
    return F.col("IMPORTE") + F.col("IMPUESTO")


def saldo_factura(master: DataFrame) -> DataFrame:
    """Per-charge balance: (IMPORTE+IMPUESTO) of the charge minus the sum of
    its applied credits (TIPO_IMPTE='R'), linked by DOCTO_CC_ACR_ID
    (reference ``src/reporte_cxc.py:338-360``).

    One aggregation + one key join, both shuffling on the charge id; the
    credit aggregation is map-side combined.
    """
    act = active(master)
    charges = act.filter(F.col("TIPO_IMPTE") == "C")
    credits = act.filter(F.col("TIPO_IMPTE") == "R")
    applied = (
        credits.groupBy(F.col("DOCTO_CC_ACR_ID").alias("_ACR_ID"))
        .agg(F.sum(r2(monto())).alias("_ABONADO"),
             F.max("FECHA_EMISION").alias("FECHA_ULTIMO_PAGO"))
    )
    return (
        charges.join(applied, charges.DOCTO_CC_ID == F.col("_ACR_ID"), "left")
        .drop("_ACR_ID")
        .withColumn("ABONOS_APLICADOS", r2(F.coalesce("_ABONADO", F.lit(0.0))))
        .withColumn("SALDO_FACTURA",
                    r2(r2(monto()) - F.coalesce("_ABONADO", F.lit(0.0))))
        .drop("_ABONADO")
    )


def with_cycle_metrics(charges_with_saldo: DataFrame, as_of: str) -> DataFrame:
    """DELTA_MORA (open invoices: days overdue vs ``as_of``) bucketed by the
    aging ladder, DELTA_RECAUDO (paid invoices: last payment vs due date)
    bucketed by the collection ladder (reference ``src/reporte_cxc.py:380-435``)."""
    is_open = F.col("SALDO_FACTURA") > 0
    delta_mora = F.when(
        is_open, F.datediff(F.lit(as_of).cast("date"), F.col("FECHA_VENCIMIENTO")))
    delta_recaudo = F.when(
        ~is_open & F.col("FECHA_ULTIMO_PAGO").isNotNull(),
        F.datediff(F.col("FECHA_ULTIMO_PAGO"), F.col("FECHA_VENCIMIENTO")))
    return (
        charges_with_saldo
        .withColumn("DELTA_MORA", delta_mora.cast("long"))
        .withColumn("CATEGORIA_MORA",
                    F.when(is_open, bucketize(F.col("DELTA_MORA"), RANGOS_ANTIGUEDAD)))
        .withColumn("DELTA_RECAUDO", delta_recaudo.cast("long"))
        .withColumn("CATEGORIA_RECAUDO",
                    F.when(delta_recaudo.isNotNull(),
                           bucketize(F.col("DELTA_RECAUDO"), RANGOS_RECAUDO)))
    )


def movimientos_con_pagos(master: DataFrame, charges_with_saldo: DataFrame,
                          abiertos: bool) -> DataFrame:
    """Open (resp. closed) charges ∪ the payments applied to them, banded.

    Reference ``src/reporte_cxc.py:464-505``: the payment membership is a
    semi-join against the charge-id set (J4), the result is a unionByName
    (U1), and the Excel banding groups each charge with its payments (W3).
    Banding is partitioned by client — groups never span clients because
    the client is the leading sort key — so the window parallelizes.
    """
    from ..operators.windows import band_groups

    cond = (F.col("SALDO_FACTURA") > 0) if abiertos else (F.col("SALDO_FACTURA") <= 0)
    sel = ["DOCTO_CC_ID", "DOCTO_CC_ACR_ID", "CLIENTE_ID", "NOMBRE_CLIENTE",
           "MONEDA", "TIPO_IMPTE", "IMPORTE", "IMPUESTO", "FECHA_EMISION"]
    charge_ids = charges_with_saldo.filter(cond).select(
        F.col("DOCTO_CC_ID").alias("_CID"))
    charges = (charges_with_saldo.filter(cond).select(*sel))
    payments = (
        active(master).filter(F.col("TIPO_IMPTE") == "R")
        .join(charge_ids, F.col("DOCTO_CC_ACR_ID") == F.col("_CID"), "left_semi")
        .select(*sel)
    )
    union = charges.unionByName(payments)
    grupo = F.coalesce("DOCTO_CC_ACR_ID", "DOCTO_CC_ID")
    return band_groups(
        union, group_key=grupo,
        order_by=[grupo.asc(), F.col("TIPO_IMPTE").asc(), F.col("DOCTO_CC_ID").asc()],
        partition_by=["CLIENTE_ID"],
    )


def saldo_cliente(master: DataFrame) -> DataFrame:
    """Per-client running signed balance (charges add, credits subtract) in a
    total deterministic order (group key, doc id — unique at movement grain;
    reference ``src/reporte_cxc.py:362-373`` with the §4.1 tiebreak fix).

    Partitioned window → parallel across clients at any scale.
    """
    act = active(master).filter(F.col("TIPO_IMPTE") != "A")
    signed = (F.when(F.col("NATURALEZA_CONCEPTO") == "C", r2(monto()))
               .when(F.col("NATURALEZA_CONCEPTO") == "R", -r2(monto()))
               .otherwise(0.0))
    w = (Window.partitionBy("CLIENTE_ID")
         .orderBy(F.col("FECHA_EMISION").asc_nulls_first(),
                  F.coalesce("DOCTO_CC_ACR_ID", "DOCTO_CC_ID").asc(),
                  F.col("DOCTO_CC_ID").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return act.withColumn("SALDO_CLIENTE", r2(F.sum(signed).over(w)))
