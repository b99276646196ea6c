"""CxC business-layer queries: the reference-parity view surface (operating
report, analytics, KPIs) driven through ``plans/`` over a deterministic
CxC-shaped master derived from the harness star schema.

Each query exercises a full business plan (assembly → balances → cycle
metrics → aggregation) and carries a DuckDB oracle twin built from the
shared ``MASTER_SQL_CTE``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import RANGOS_ANTIGUEDAD, RANGOS_RECAUDO
from ..operators.buckets import bucket_order_sql, bucketize_sql
from ..operators.rounding import r2
from ..plans import analytics as pa
from ..plans import kpis as pk
from ..plans import reporte as pr
from ..plans.master import AS_OF_CXC, MASTER_SQL_CTE, SQL_AS_OF_CXC, cxc_master_from_tpch
from . import register

# --------------------------------------------------------------------------
# Shared oracle CTE fragments (mirror plans/reporte.py exactly)
# --------------------------------------------------------------------------

from ..config import CANCELADO_ACEPTADO as _CANC

_SQL_ACTIVO = ("upper(trim(CAST(coalesce(CANCELADO, 'N') AS VARCHAR))) NOT IN ("
               + ",".join(f"'{v}'" for v in _CANC) + ")")
_R2 = "floor({} * 100 + 0.5) / 100"
_MONTO_R2 = _R2.format("(IMPORTE + IMPUESTO)")

_BASE = f"""WITH {MASTER_SQL_CTE.strip()},
activos AS (SELECT * FROM master WHERE {_SQL_ACTIVO}),
cargos AS (SELECT * FROM activos WHERE TIPO_IMPTE = 'C'),
abonos AS (SELECT * FROM activos WHERE TIPO_IMPTE = 'R'),
saldos AS (
  SELECT c.*,
         {_R2.format('coalesce(ap.abonado, 0)')} AS ABONOS_APLICADOS,
         {_R2.format(f'({_MONTO_R2} - coalesce(ap.abonado, 0))')} AS SALDO_FACTURA,
         ap.FECHA_ULTIMO_PAGO
  FROM cargos c LEFT JOIN (
    SELECT DOCTO_CC_ACR_ID, sum({_MONTO_R2}) AS abonado,
           max(FECHA_EMISION) AS FECHA_ULTIMO_PAGO
    FROM abonos GROUP BY 1
  ) ap ON c.DOCTO_CC_ID = ap.DOCTO_CC_ACR_ID
),
metricas AS (
  SELECT *,
    CASE WHEN SALDO_FACTURA > 0
         THEN datediff('day', FECHA_VENCIMIENTO, {SQL_AS_OF_CXC}) END AS DELTA_MORA,
    CASE WHEN SALDO_FACTURA > 0 THEN
      {bucketize_sql(f"datediff('day', FECHA_VENCIMIENTO, {SQL_AS_OF_CXC})", RANGOS_ANTIGUEDAD)}
    END AS CATEGORIA_MORA,
    CASE WHEN SALDO_FACTURA <= 0 AND FECHA_ULTIMO_PAGO IS NOT NULL
         THEN datediff('day', FECHA_VENCIMIENTO, FECHA_ULTIMO_PAGO) END AS DELTA_RECAUDO,
    CASE WHEN SALDO_FACTURA <= 0 AND FECHA_ULTIMO_PAGO IS NOT NULL THEN
      {bucketize_sql("datediff('day', FECHA_VENCIMIENTO, FECHA_ULTIMO_PAGO)", RANGOS_RECAUDO)}
    END AS CATEGORIA_RECAUDO
  FROM saldos
)"""

_ES_VENTA_SQL = "(TIPO_IMPTE = 'C' AND contains(CONCEPTO, 'VENTA'))"


def _master(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cxc_master_from_tpch(spark, sf_dir)


# --------------------------------------------------------------------------
# cxc_master_summary — assembly checksum per (currency, nature, kind).
# --------------------------------------------------------------------------

def q_cxc_master_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _master(spark, sf_dir)
    return (
        m.groupBy("MONEDA", "NATURALEZA_CONCEPTO", "TIPO_IMPTE")
        .agg(F.count(F.lit(1)).cast("long").alias("n_movimientos"),
             r2(F.sum("IMPORTE")).alias("total_importe"),
             r2(F.sum("IMPUESTO")).alias("total_impuesto"))
        .orderBy("MONEDA", "NATURALEZA_CONCEPTO", "TIPO_IMPTE")
    )


SQL_CXC_MASTER_SUMMARY = f"""{_BASE}
SELECT MONEDA, NATURALEZA_CONCEPTO, TIPO_IMPTE,
       count(*)::BIGINT AS n_movimientos,
       {_R2.format('sum(IMPORTE)')} AS total_importe,
       {_R2.format('sum(IMPUESTO)')} AS total_impuesto
FROM master GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

register("cxc_master_summary", q_cxc_master_summary, SQL_CXC_MASTER_SUMMARY)


# --------------------------------------------------------------------------
# cxc_saldo_factura — per-invoice balance (the core business formula).
# --------------------------------------------------------------------------

def q_cxc_saldo_factura(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = pr.saldo_factura(_master(spark, sf_dir))
    estado = F.when(F.col("SALDO_FACTURA") > 0, "ABIERTA").otherwise("PAGADA")
    return s.select(
        "DOCTO_CC_ID", "CLIENTE_ID", "MONEDA",
        r2(pr.monto()).alias("CARGO_TOTAL"),
        "ABONOS_APLICADOS", "SALDO_FACTURA",
        estado.alias("ESTADO"),
    )


SQL_CXC_SALDO_FACTURA = f"""{_BASE}
SELECT DOCTO_CC_ID, CLIENTE_ID, MONEDA,
       {_MONTO_R2} AS CARGO_TOTAL,
       ABONOS_APLICADOS, SALDO_FACTURA,
       CASE WHEN SALDO_FACTURA > 0 THEN 'ABIERTA' ELSE 'PAGADA' END AS ESTADO
FROM saldos
"""

register("cxc_saldo_factura", q_cxc_saldo_factura, SQL_CXC_SALDO_FACTURA)


# --------------------------------------------------------------------------
# cxc_antiguedad — aging distribution with TOTAL row (MXN).
# --------------------------------------------------------------------------

def q_cxc_antiguedad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.antiguedad_cartera(_master(spark, sf_dir), AS_OF_CXC, "MXN")


SQL_CXC_ANTIGUEDAD = f"""{_BASE},
agg AS (
  SELECT CATEGORIA_MORA AS RANGO,
         count(*)::BIGINT AS NUM_FACTURAS_PENDIENTES,
         {_R2.format('sum(SALDO_FACTURA)')} AS SALDO_PENDIENTE,
         {bucket_order_sql('CATEGORIA_MORA', RANGOS_ANTIGUEDAD)}::BIGINT AS ORDEN
  FROM metricas WHERE MONEDA = 'MXN' AND SALDO_FACTURA > 0
  GROUP BY CATEGORIA_MORA
)
SELECT * FROM agg
UNION ALL
SELECT 'TOTAL', sum(NUM_FACTURAS_PENDIENTES)::BIGINT,
       {_R2.format('sum(SALDO_PENDIENTE)')}, {len(RANGOS_ANTIGUEDAD) + 1}::BIGINT
FROM agg
ORDER BY ORDEN, RANGO
"""

register("cxc_antiguedad", q_cxc_antiguedad, SQL_CXC_ANTIGUEDAD)


# --------------------------------------------------------------------------
# cxc_antiguedad_cliente — per-client aging pivot with TOTAL row (MXN;
# reference src/analytics.py:180-260). Two keyed conditional aggregations
# joined on the client, buckets pivoted as conditional sums.
# --------------------------------------------------------------------------

def q_cxc_antiguedad_cliente(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.antiguedad_por_cliente(_master(spark, sf_dir), AS_OF_CXC, "MXN")


_PIVOT_COLS = ", ".join(
    f"""{_R2.format(f'''sum(CASE WHEN CATEGORIA_MORA = '{lbl}' THEN SALDO_FACTURA ELSE 0 END)''')} AS "{lbl}\""""
    for _, _, lbl in RANGOS_ANTIGUEDAD)
_PIVOT_NAMES = ", ".join(f'"{lbl}"' for _, _, lbl in RANGOS_ANTIGUEDAD)
_PIVOT_ZERO = ", ".join(f'coalesce(a."{lbl}", 0.0) AS "{lbl}"'
                        for _, _, lbl in RANGOS_ANTIGUEDAD)
_PIVOT_TOTAL = ", ".join(_R2.format(f'sum("{lbl}")') + f' AS "{lbl}"'
                         for _, _, lbl in RANGOS_ANTIGUEDAD)

SQL_CXC_ANTIGUEDAD_CLIENTE = f"""{_BASE},
por_cliente AS (
  SELECT NOMBRE_CLIENTE,
         coalesce(max(CASE WHEN {_ES_VENTA_SQL} THEN ESTATUS_CLIENTE END), '')
           AS ESTATUS_CLIENTE,
         sum(CASE WHEN {_ES_VENTA_SQL} THEN 1 ELSE 0 END)::BIGINT
           AS NUM_FACTURAS_TOTALES,
         {_R2.format(f'sum(CASE WHEN {_ES_VENTA_SQL} THEN {_MONTO_R2} ELSE 0 END)')}
           AS TOTAL_CARGOS,
         {_R2.format(f"sum(CASE WHEN TIPO_IMPTE = 'R' THEN {_MONTO_R2} ELSE 0 END)")}
           AS TOTAL_ABONOS
  FROM activos WHERE MONEDA = 'MXN' AND NOMBRE_CLIENTE IS NOT NULL
  GROUP BY 1
  HAVING sum(CASE WHEN {_ES_VENTA_SQL} THEN 1 ELSE 0 END) > 0
),
abiertos AS (
  SELECT NOMBRE_CLIENTE,
         count(*)::BIGINT AS NUM_FACTURAS_PENDIENTES,
         {_R2.format('sum(SALDO_FACTURA)')} AS SALDO_PENDIENTE,
         {_PIVOT_COLS}
  FROM metricas
  WHERE MONEDA = 'MXN' AND SALDO_FACTURA > 0 AND {_ES_VENTA_SQL}
        AND NOMBRE_CLIENTE IS NOT NULL
  GROUP BY 1
),
base AS (
  SELECT p.NOMBRE_CLIENTE, p.ESTATUS_CLIENTE, p.NUM_FACTURAS_TOTALES,
         coalesce(a.NUM_FACTURAS_PENDIENTES, 0)::BIGINT AS NUM_FACTURAS_PENDIENTES,
         p.TOTAL_CARGOS, p.TOTAL_ABONOS,
         coalesce(a.SALDO_PENDIENTE, 0.0) AS SALDO_PENDIENTE,
         {_PIVOT_ZERO}
  FROM por_cliente p LEFT JOIN abiertos a USING (NOMBRE_CLIENTE)
)
SELECT * FROM base
UNION ALL
SELECT 'TOTAL', '', sum(NUM_FACTURAS_TOTALES)::BIGINT,
       sum(NUM_FACTURAS_PENDIENTES)::BIGINT,
       {_R2.format('sum(TOTAL_CARGOS)')}, {_R2.format('sum(TOTAL_ABONOS)')},
       {_R2.format('sum(SALDO_PENDIENTE)')}, {_PIVOT_TOTAL}
FROM base
"""

register("cxc_antiguedad_cliente", q_cxc_antiguedad_cliente,
         SQL_CXC_ANTIGUEDAD_CLIENTE)


# --------------------------------------------------------------------------
# cxc_cartera — current vs overdue split (MXN).
# --------------------------------------------------------------------------

def q_cxc_cartera(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.cartera_vencida_vs_vigente(_master(spark, sf_dir), AS_OF_CXC, "MXN")


SQL_CXC_CARTERA = f"""{_BASE}
SELECT CASE WHEN DELTA_MORA > 0 THEN 'VENCIDA' ELSE 'VIGENTE' END AS ESTATUS,
       count(*)::BIGINT AS NUM_FACTURAS,
       {_R2.format('sum(SALDO_FACTURA)')} AS SALDO
FROM metricas WHERE MONEDA = 'MXN' AND SALDO_FACTURA > 0
GROUP BY 1 ORDER BY 1
"""

register("cxc_cartera", q_cxc_cartera, SQL_CXC_CARTERA)


# --------------------------------------------------------------------------
# cxc_resumen_concepto — charges/credits per concept (MXN).
# --------------------------------------------------------------------------

def q_cxc_resumen_concepto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.resumen_por_concepto(_master(spark, sf_dir), "MXN")


SQL_CXC_RESUMEN_CONCEPTO = f"""{_BASE}
SELECT coalesce(CONCEPTO, 'Sin concepto asignado') AS CONCEPTO,
       sum(CASE WHEN NATURALEZA_CONCEPTO = 'C' THEN 1 ELSE 0 END)::BIGINT AS NUM_CARGOS,
       {_R2.format(f"sum(CASE WHEN NATURALEZA_CONCEPTO = 'C' THEN {_MONTO_R2} ELSE 0 END)")}
         AS TOTAL_CARGOS,
       sum(CASE WHEN NATURALEZA_CONCEPTO = 'R' THEN 1 ELSE 0 END)::BIGINT AS NUM_ABONOS,
       {_R2.format(f"sum(CASE WHEN NATURALEZA_CONCEPTO = 'R' THEN {_MONTO_R2} ELSE 0 END)")}
         AS TOTAL_ABONOS
FROM activos WHERE MONEDA = 'MXN'
GROUP BY 1 ORDER BY TOTAL_CARGOS DESC, TOTAL_ABONOS DESC, CONCEPTO ASC
"""

register("cxc_resumen_concepto", q_cxc_resumen_concepto, SQL_CXC_RESUMEN_CONCEPTO)


# --------------------------------------------------------------------------
# cxc_cancelados / cxc_ajustes — cancelled docs and unapplied advances.
# --------------------------------------------------------------------------

def q_cxc_cancelados(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.resumen_cancelados(_master(spark, sf_dir), "MXN")


SQL_CXC_CANCELADOS = f"""{_BASE}
SELECT CONCEPTO, count(*)::BIGINT AS NUM_DOCUMENTOS,
       {_R2.format(f'sum({_MONTO_R2})')} AS MONTO_CANCELADO
FROM master WHERE NOT ({_SQL_ACTIVO}) AND MONEDA = 'MXN'
GROUP BY 1 ORDER BY MONTO_CANCELADO DESC, CONCEPTO ASC
"""

register("cxc_cancelados", q_cxc_cancelados, SQL_CXC_CANCELADOS)


def q_cxc_ajustes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.resumen_ajustes(_master(spark, sf_dir), "MXN")


SQL_CXC_AJUSTES = f"""{_BASE}
SELECT coalesce(NOMBRE_CLIENTE, 'Sin cliente') AS NOMBRE_CLIENTE,
       count(*)::BIGINT AS NUM_MOVIMIENTOS,
       {_R2.format(f'sum({_MONTO_R2})')} AS MONTO_POR_ACREDITAR
FROM activos WHERE TIPO_IMPTE = 'A' AND MONEDA = 'MXN'
GROUP BY 1 ORDER BY MONTO_POR_ACREDITAR DESC, NOMBRE_CLIENTE ASC
"""

register("cxc_ajustes", q_cxc_ajustes, SQL_CXC_AJUSTES)


# --------------------------------------------------------------------------
# cxc_auditoria_nulos — null-attribute audit per currency.
# --------------------------------------------------------------------------

def q_cxc_auditoria_nulos(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pa.auditoria_nulos(_master(spark, sf_dir))


SQL_CXC_AUDITORIA_NULOS = f"""{_BASE}
SELECT MONEDA,
       sum(CASE WHEN TIPO_CLIENTE IS NULL THEN 1 ELSE 0 END)::BIGINT AS SIN_TIPO_CLIENTE,
       sum(CASE WHEN VENDEDOR IS NULL THEN 1 ELSE 0 END)::BIGINT AS SIN_VENDEDOR,
       count(*)::BIGINT AS TOTAL_MOVIMIENTOS
FROM activos GROUP BY 1 ORDER BY 1
"""

register("cxc_auditoria_nulos", q_cxc_auditoria_nulos, SQL_CXC_AUDITORIA_NULOS)


# --------------------------------------------------------------------------
# cxc_kpis — DSO / CEI / delinquency per currency with interpretations.
# --------------------------------------------------------------------------

def q_cxc_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pk.kpi_rows(_master(spark, sf_dir), AS_OF_CXC).orderBy("MONEDA", "kpi")


_R4 = "floor({} * 10000 + 0.5) / 10000"

SQL_CXC_KPIS = f"""{_BASE},
venta_saldos AS (
  SELECT MONEDA,
         sum(CASE WHEN SALDO_FACTURA > 0 THEN SALDO_FACTURA ELSE 0 END) AS _saldo_total,
         sum(CASE WHEN SALDO_FACTURA > 0 AND DELTA_MORA > 0 THEN SALDO_FACTURA ELSE 0 END)
           AS _saldo_vencido
  FROM metricas WHERE {_ES_VENTA_SQL} GROUP BY 1
), flujos AS (
  SELECT MONEDA,
         sum(CASE WHEN {_ES_VENTA_SQL} AND FECHA_EMISION >= {SQL_AS_OF_CXC} - 90
                  THEN {_MONTO_R2} ELSE 0 END) AS _ventas_periodo,
         sum(CASE WHEN NATURALEZA_CONCEPTO = 'C' AND FECHA_EMISION >= {SQL_AS_OF_CXC} - 90
                  THEN {_MONTO_R2} ELSE 0 END) AS _cargos_periodo,
         sum(CASE WHEN NATURALEZA_CONCEPTO = 'R' AND FECHA_EMISION >= {SQL_AS_OF_CXC} - 90
                  THEN {_MONTO_R2} ELSE 0 END) AS _cobros_periodo,
         sum(CASE WHEN NATURALEZA_CONCEPTO = 'C' THEN {_MONTO_R2}
                  WHEN NATURALEZA_CONCEPTO = 'R' THEN -{_MONTO_R2} ELSE 0 END) AS _saldo_actual
  FROM activos WHERE TIPO_IMPTE <> 'A' GROUP BY 1
), base_kpi AS (
  SELECT coalesce(v.MONEDA, f.MONEDA) AS MONEDA,
         coalesce(_saldo_total, 0) AS _saldo_total,
         coalesce(_saldo_vencido, 0) AS _saldo_vencido,
         coalesce(_ventas_periodo, 0) AS _ventas_periodo,
         coalesce(_cargos_periodo, 0) AS _cargos_periodo,
         coalesce(_cobros_periodo, 0) AS _cobros_periodo,
         coalesce(_saldo_actual, 0) AS _saldo_actual
  FROM venta_saldos v FULL OUTER JOIN flujos f ON v.MONEDA = f.MONEDA
), calc AS (
  SELECT MONEDA,
         {_R4.format('CASE WHEN _ventas_periodo > 0 THEN _saldo_total / _ventas_periodo * 90 END')}
           AS dso,
         {_R4.format('''CASE WHEN (_saldo_actual - _cargos_periodo + _cobros_periodo + _cargos_periodo) > 0
               THEN _cobros_periodo / (_saldo_actual - _cargos_periodo + _cobros_periodo + _cargos_periodo)
               ELSE 1.0 END''')} AS cei,
         {_R4.format('CASE WHEN _saldo_total > 0 THEN _saldo_vencido / _saldo_total ELSE 0.0 END')}
           AS morosidad
  FROM base_kpi
)
SELECT MONEDA, 'CEI' AS kpi, cei AS valor,
       CASE WHEN cei >= 0.9 THEN 'EXCELENTE' WHEN cei >= 0.7 THEN 'ACEPTABLE'
            ELSE 'CRITICO' END AS interpretacion FROM calc
UNION ALL
SELECT MONEDA, 'DSO', dso,
       CASE WHEN dso <= 45 THEN 'EXCELENTE' WHEN dso <= 75 THEN 'ACEPTABLE'
            ELSE 'CRITICO' END FROM calc
UNION ALL
SELECT MONEDA, 'MOROSIDAD', morosidad,
       CASE WHEN morosidad <= 0.05 THEN 'SANA' WHEN morosidad <= 0.15 THEN 'VIGILAR'
            ELSE 'CRITICA' END FROM calc
ORDER BY MONEDA, kpi
"""

register("cxc_kpis", q_cxc_kpis, SQL_CXC_KPIS)


# --------------------------------------------------------------------------
# cxc_concentracion — Pareto/ABC client concentration (MXN).
# --------------------------------------------------------------------------

def q_cxc_concentracion(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pk.concentracion_abc(_master(spark, sf_dir), "MXN")
    return out.select("CLIENTE_ID", "NOMBRE_CLIENTE", "SALDO_PENDIENTE",
                      "PCT", "PCT_ACUMULADO", "CLASE_ABC")


_R6 = "floor({} * 1000000 + 0.5) / 1000000"

SQL_CXC_CONCENTRACION = f"""{_BASE},
per_client AS (
  SELECT CLIENTE_ID, NOMBRE_CLIENTE,
         {_R2.format('sum(SALDO_FACTURA)')} AS SALDO_PENDIENTE
  FROM saldos WHERE MONEDA = 'MXN' AND SALDO_FACTURA > 0
  GROUP BY 1, 2
), with_pct AS (
  SELECT *, SALDO_PENDIENTE / sum(SALDO_PENDIENTE) OVER () AS pct_raw FROM per_client
), ranked AS (
  SELECT CLIENTE_ID, NOMBRE_CLIENTE, SALDO_PENDIENTE,
         {_R6.format('pct_raw')} AS PCT,
         {_R6.format('''sum(pct_raw) OVER (ORDER BY SALDO_PENDIENTE DESC, CLIENTE_ID ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS cum_r,
         row_number() OVER (ORDER BY SALDO_PENDIENTE DESC, CLIENTE_ID ASC) AS rn,
         count(*) OVER () AS nall
  FROM with_pct
), pinned AS (
  SELECT CLIENTE_ID, NOMBRE_CLIENTE, SALDO_PENDIENTE, PCT,
         CASE WHEN rn = nall THEN CAST(1.0 AS DOUBLE) ELSE cum_r END
           AS PCT_ACUMULADO,
         rn
  FROM ranked
)
SELECT CLIENTE_ID, NOMBRE_CLIENTE, SALDO_PENDIENTE, PCT, PCT_ACUMULADO,
       CASE WHEN rn = 1 THEN 'A'
            WHEN PCT_ACUMULADO * 100 <= 80.0 THEN 'A'
            WHEN PCT_ACUMULADO * 100 <= 95.0 THEN 'B'
            ELSE 'C' END AS CLASE_ABC
FROM pinned
"""

register("cxc_concentracion", q_cxc_concentracion, SQL_CXC_CONCENTRACION)


# --------------------------------------------------------------------------
# cxc_limite_credito — credit-limit utilization ladder (MXN).
# --------------------------------------------------------------------------

def q_cxc_limite_credito(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pk.limite_credito(_master(spark, sf_dir), "MXN")


SQL_CXC_LIMITE = f"""{_BASE},
per_client AS (
  SELECT CLIENTE_ID, NOMBRE_CLIENTE, LIMITE_CREDITO,
         {_R2.format('sum(SALDO_FACTURA)')} AS SALDO_PENDIENTE
  FROM saldos WHERE MONEDA = 'MXN' AND SALDO_FACTURA > 0
  GROUP BY 1, 2, 3
)
SELECT CLIENTE_ID, NOMBRE_CLIENTE, LIMITE_CREDITO, SALDO_PENDIENTE,
       CASE WHEN LIMITE_CREDITO > 0
            THEN {_R4.format('SALDO_PENDIENTE / LIMITE_CREDITO')} END AS UTILIZACION_PCT,
       CASE WHEN LIMITE_CREDITO <= 0 THEN 0.0
            ELSE {_R2.format('(LIMITE_CREDITO - SALDO_PENDIENTE)')} END AS DISPONIBLE,
       CASE WHEN LIMITE_CREDITO <= 0 THEN 'SIN_LIMITE'
            WHEN {_R4.format('SALDO_PENDIENTE / LIMITE_CREDITO')} > 1.0 THEN 'SOBRE_LIMITE'
            WHEN {_R4.format('SALDO_PENDIENTE / LIMITE_CREDITO')} >= 0.90 THEN 'CRITICO'
            WHEN {_R4.format('SALDO_PENDIENTE / LIMITE_CREDITO')} >= 0.70 THEN 'ALTO'
            ELSE 'NORMAL' END AS ALERTA
FROM per_client
"""

register("cxc_limite_credito", q_cxc_limite_credito, SQL_CXC_LIMITE)


# --------------------------------------------------------------------------
# cxc_morosidad_cliente — per-client delinquency metrics (MXN).
# --------------------------------------------------------------------------

def q_cxc_morosidad_cliente(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pk.morosidad_por_cliente(_master(spark, sf_dir), AS_OF_CXC, "MXN")


SQL_CXC_MOROSIDAD_CLIENTE = f"""{_BASE}
SELECT CLIENTE_ID, NOMBRE_CLIENTE,
       count(*)::BIGINT AS N_FACTURAS,
       sum(CASE WHEN SALDO_FACTURA > 0 THEN 1 ELSE 0 END)::BIGINT AS N_PENDIENTES,
       sum(CASE WHEN SALDO_FACTURA > 0 AND DELTA_MORA <= 0 THEN 1 ELSE 0 END)::BIGINT
         AS N_VIGENTES,
       sum(CASE WHEN SALDO_FACTURA > 0 AND DELTA_MORA > 0 THEN 1 ELSE 0 END)::BIGINT
         AS N_VENCIDAS,
       {_R2.format('sum(CASE WHEN SALDO_FACTURA > 0 THEN SALDO_FACTURA ELSE 0 END)')}
         AS SALDO_PENDIENTE,
       {_R2.format('sum(CASE WHEN SALDO_FACTURA > 0 AND DELTA_MORA > 0 THEN SALDO_FACTURA ELSE 0 END)')}
         AS SALDO_VENCIDO,
       max(CASE WHEN SALDO_FACTURA > 0 AND DELTA_MORA > 0 THEN DELTA_MORA END)::BIGINT
         AS MAX_DIAS_VENCIDO
FROM metricas
WHERE {_ES_VENTA_SQL} AND MONEDA = 'MXN'
GROUP BY 1, 2
"""

register("cxc_morosidad_cliente", q_cxc_morosidad_cliente, SQL_CXC_MOROSIDAD_CLIENTE)


# --------------------------------------------------------------------------
# cxc_saldo_cliente — per-client running balance (W1 on the CxC shape),
# bounded to a client subset to keep the checked output report-sized.
# --------------------------------------------------------------------------

def q_cxc_saldo_cliente(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pr.saldo_cliente(_master(spark, sf_dir))
    return (out.filter(F.col("CLIENTE_ID") < 100)
            .select("CLIENTE_ID", "DOCTO_CC_ID", "SALDO_CLIENTE"))


SQL_CXC_SALDO_CLIENTE = f"""{_BASE}
SELECT CLIENTE_ID, DOCTO_CC_ID,
       floor(sum(CASE WHEN NATURALEZA_CONCEPTO = 'C' THEN {_MONTO_R2}
                      WHEN NATURALEZA_CONCEPTO = 'R' THEN -{_MONTO_R2}
                      ELSE 0 END)
             OVER (PARTITION BY CLIENTE_ID
                   ORDER BY FECHA_EMISION ASC NULLS FIRST,
                            coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID) ASC,
                            DOCTO_CC_ID ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100
         AS SALDO_CLIENTE
FROM activos WHERE TIPO_IMPTE <> 'A' AND CLIENTE_ID < 100
"""

register("cxc_saldo_cliente", q_cxc_saldo_cliente, SQL_CXC_SALDO_CLIENTE)


# --------------------------------------------------------------------------
# cxc_movimientos_abiertos — open charges ∪ their applied payments
# (semi-join membership, J4/U1) with per-client presentation banding (W3).
# --------------------------------------------------------------------------

def q_cxc_movimientos_abiertos(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _master(spark, sf_dir)
    charges = pr.saldo_factura(m)
    out = pr.movimientos_con_pagos(m, charges, abiertos=True)
    return out.select("CLIENTE_ID", "DOCTO_CC_ID", "TIPO_IMPTE",
                      F.col("_BAND_GROUP").cast("long").alias("banda"))


SQL_CXC_MOVIMIENTOS_ABIERTOS = f"""{_BASE},
union_mov AS (
  SELECT DOCTO_CC_ID, DOCTO_CC_ACR_ID, CLIENTE_ID, TIPO_IMPTE
  FROM saldos WHERE SALDO_FACTURA > 0
  UNION ALL
  SELECT DOCTO_CC_ID, DOCTO_CC_ACR_ID, CLIENTE_ID, TIPO_IMPTE
  FROM abonos WHERE DOCTO_CC_ACR_ID IN (SELECT DOCTO_CC_ID FROM saldos WHERE SALDO_FACTURA > 0)
), flagged AS (
  SELECT CLIENTE_ID, DOCTO_CC_ID, TIPO_IMPTE,
         coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID) AS grupo,
         CASE WHEN lag(coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID)) OVER w IS NULL
                OR coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID)
                   <> lag(coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID)) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM union_mov
  WINDOW w AS (PARTITION BY CLIENTE_ID
               ORDER BY coalesce(DOCTO_CC_ACR_ID, DOCTO_CC_ID) ASC,
                        TIPO_IMPTE ASC, DOCTO_CC_ID ASC)
)
SELECT CLIENTE_ID, DOCTO_CC_ID, TIPO_IMPTE,
       (sum(chg) OVER (PARTITION BY CLIENTE_ID
                       ORDER BY grupo ASC, TIPO_IMPTE ASC, DOCTO_CC_ID ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) % 2)::BIGINT
         AS banda
FROM flagged
"""

register("cxc_movimientos_abiertos", q_cxc_movimientos_abiertos,
         SQL_CXC_MOVIMIENTOS_ABIERTOS)
