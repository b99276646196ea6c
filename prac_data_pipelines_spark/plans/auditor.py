"""Audit layer: statistical outlier views, null-attribute audits, cancelled
document analysis, and the data-quality profile.

Parity targets: the reference auditor (``src/auditor.py``) — z-score
outlier rules over sale amounts (``:173-211``), collection deltas and
overdue deltas (``:213-265``), null audits (``:267-313``), cancelled-doc
analysis (``:315-347``), column data-quality profile (``:349-376``), and
the run summary (``:382-415``). Everything is a conditional aggregation or
a windowed standardization over the already-cached charges frame — no
extra scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ANOMALIAS
from ..operators.profile import column_profile
from ..operators.stats import zscore_columns
from .master import ACTIVO


def importes_atipicos(charges: DataFrame) -> DataFrame:
    """Sale charges whose amount is a z-outlier within the sale subset."""
    z = zscore_columns(charges, "IMPORTE",
                       subset=charges["CONCEPTO"].contains("VENTA"),
                       z_col="Z_IMPORTE", flag_col="ES_ATIPICO")
    return (z.filter(F.col("ES_ATIPICO"))
            .select("DOCTO_CC_ID", "CLIENTE_ID", "NOMBRE_CLIENTE", "MONEDA",
                    "IMPORTE", "Z_IMPORTE"))


def recaudos_atipicos(charges_with_metrics: DataFrame) -> DataFrame:
    """Paid invoices whose collection delay is a z-outlier."""
    z = zscore_columns(charges_with_metrics, "DELTA_RECAUDO",
                       subset=F.col("DELTA_RECAUDO").isNotNull(),
                       z_col="Z_RECAUDO", flag_col="ES_ATIPICO")
    return (z.filter(F.col("ES_ATIPICO"))
            .select("DOCTO_CC_ID", "CLIENTE_ID", "NOMBRE_CLIENTE", "MONEDA",
                    "DELTA_RECAUDO", "Z_RECAUDO"))


def moras_atipicas(charges_with_metrics: DataFrame) -> DataFrame:
    """Open invoices whose overdue age is a z-outlier OR beyond the
    critical-days threshold (the reference's dual rule)."""
    z = zscore_columns(charges_with_metrics, "DELTA_MORA",
                       subset=F.col("DELTA_MORA").isNotNull(),
                       z_col="Z_MORA", flag_col="ES_ATIPICO")
    critico = F.col("DELTA_MORA") > ANOMALIAS["DIAS_MORA_CRITICO"]
    return (z.filter(F.coalesce(F.col("ES_ATIPICO"), F.lit(False)) | critico)
            .select("DOCTO_CC_ID", "CLIENTE_ID", "NOMBRE_CLIENTE", "MONEDA",
                    "DELTA_MORA", "Z_MORA"))


def documentos_cancelados(master: DataFrame) -> DataFrame:
    return master.filter(~F.expr(ACTIVO))


def resumen_auditoria(master: DataFrame, charges_with_metrics: DataFrame) -> DataFrame:
    """One-row audit summary (the reference's result dict, as a frame)."""
    act_nulls = (
        master.filter(F.expr(ACTIVO))
        .agg(
            F.count(F.lit(1)).cast("long").alias("movimientos_activos"),
            F.sum(F.col("TIPO_CLIENTE").isNull().cast("int")).cast("long")
            .alias("sin_tipo_cliente"),
            F.sum(F.col("VENDEDOR").isNull().cast("int")).cast("long")
            .alias("sin_vendedor"),
        )
    )
    cancel = master.filter(~F.expr(ACTIVO)).agg(
        F.count(F.lit(1)).cast("long").alias("documentos_cancelados"))
    outliers = (
        importes_atipicos(charges_with_metrics)
        .agg(F.count(F.lit(1)).cast("long").alias("importes_atipicos")))
    return act_nulls.crossJoin(cancel).crossJoin(outliers)


def calidad_datos(master: DataFrame) -> DataFrame:
    return column_profile(master)
