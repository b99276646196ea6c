"""End-to-end pipeline orchestration: the reference's six-step flow
(extract → operating report → audit → analytics → KPIs → export) restated
as one lazy DataFrame lineage with explicit materialization points.

The view dictionary (SURVEY §2.11) is the product surface: named derived
views consumed by the report sinks and the dashboard.

Scale notes:
- The master and the balance-enriched charges frame are each consumed by
  many downstream views → ``cache()`` them once (the one optimization
  Catalyst will not infer; reference re-uses one in-memory frame the same
  way, SURVEY §4).
- Every view is computed per currency by ONE grouped pass where possible;
  the per-currency split happens at the cached lineage, not at the scan.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from .operators.profile import column_profile
from .operators.stats import zscore_columns
from .plans import analytics as pa
from .plans import kpis as pk
from .plans import reporte as pr
from .plans.master import AS_OF_CXC, cxc_master_from_tpch
from .session import get_spark

CURRENCIES = ("MXN", "USD")


def run_pipeline(spark: SparkSession, sf_dir: str,
                 as_of: str = AS_OF_CXC) -> dict[str, DataFrame]:
    """Build the full named-view dictionary over the CxC master."""
    master = cxc_master_from_tpch(spark, sf_dir).cache()
    charges = pr.with_cycle_metrics(pr.saldo_factura(master), as_of).cache()

    views: dict[str, DataFrame] = {}

    # Operating report family
    views["reporte_cxc"] = charges
    views["movimientos_abiertos_cxc"] = charges.filter("SALDO_FACTURA > 0")
    views["movimientos_cerrados_cxc"] = charges.filter("SALDO_FACTURA <= 0")
    views["movimientos_abiertos_con_pagos"] = \
        pr.movimientos_con_pagos(master, charges, abiertos=True)
    views["movimientos_cerrados_con_pagos"] = \
        pr.movimientos_con_pagos(master, charges, abiertos=False)
    views["por_acreditar"] = pr.active(master).filter("TIPO_IMPTE = 'A'")
    # negated active-filter, not subtract(): a set-difference would shuffle
    # the full row width to deduplicate what a predicate already expresses
    from pyspark.sql import functions as F
    from .plans.master import ACTIVO
    views["registros_cancelados_cxc"] = master.filter(~F.expr(ACTIVO))
    # Raw master with presentation banding (the reference's registros_totales)
    from .operators.windows import band_groups
    _grp = F.coalesce("DOCTO_CC_ACR_ID", "DOCTO_CC_ID")
    views["registros_totales_cxc"] = band_groups(
        master, group_key=_grp,
        order_by=[_grp.asc(), F.col("TIPO_IMPTE").asc(), F.col("DOCTO_CC_ID").asc()],
        partition_by=["CLIENTE_ID"])
    views["saldos_cliente"] = pr.saldo_cliente(master)
    # Full report + z-score enrichment for amount, collection delay, and
    # overdue age (the reference's movimientos_totales surface).
    from pyspark.sql import functions as F
    totales = zscore_columns(
        charges, "IMPORTE", subset=charges["CONCEPTO"].contains("VENTA"),
        z_col="Z_IMPORTE", flag_col="ES_ATIPICO_IMPORTE")
    totales = zscore_columns(
        totales, "DELTA_RECAUDO", subset=F.col("DELTA_RECAUDO").isNotNull(),
        z_col="Z_RECAUDO", flag_col="ES_ATIPICO_RECAUDO")
    totales = zscore_columns(
        totales, "DELTA_MORA", subset=F.col("DELTA_MORA").isNotNull(),
        z_col="Z_MORA", flag_col="ES_ATIPICO_MORA")
    views["movimientos_totales_cxc"] = totales

    # Analytics family (per currency)
    for m in CURRENCIES:
        suf = m.lower()
        views[f"antiguedad_cartera_{suf}"] = pa.antiguedad_cartera(master, as_of, m, charges=charges)
        views[f"antiguedad_por_cliente_{suf}"] = \
            pa.antiguedad_por_cliente(master, as_of, m, charges=charges)
        views[f"cartera_vencida_vs_vigente_{suf}"] = \
            pa.cartera_vencida_vs_vigente(master, as_of, m, charges=charges)
        views[f"resumen_concepto_cxc_{suf}"] = pa.resumen_por_concepto(master, m)
        views[f"resumen_cancelados_cxc_{suf}"] = pa.resumen_cancelados(master, m)
        views[f"resumen_ajustes_cxc_{suf}"] = pa.resumen_ajustes(master, m)

    # KPI family
    views["kpis_resumen"] = pk.kpi_rows(master, as_of, charges=charges)
    for m in CURRENCIES:
        suf = m.lower()
        views[f"kpis_concentracion_{suf}"] = pk.concentracion_abc(master, m, charges=charges)
        views[f"kpis_limite_credito_{suf}"] = pk.limite_credito(master, m, charges=charges)
        views[f"kpis_morosidad_cliente_{suf}"] = pk.morosidad_por_cliente(master, as_of, m, charges=charges)

    # Audit family
    from .plans import auditor as au
    views["auditoria_nulos"] = pa.auditoria_nulos(master)
    activos = pr.active(master)
    views["sin_tipo_cliente"] = activos.filter(F.col("TIPO_CLIENTE").isNull())
    views["sin_vendedor"] = activos.filter(F.col("VENDEDOR").isNull())
    views["importes_atipicos"] = au.importes_atipicos(charges)
    views["recaudos_atipicos"] = au.recaudos_atipicos(charges)
    views["moras_atipicas"] = au.moras_atipicas(charges)
    views["resumen_auditoria"] = au.resumen_auditoria(master, charges)
    views["calidad_datos"] = column_profile(master)

    return views


def main() -> int:
    ap = argparse.ArgumentParser(description="Run the CxC analytics pipeline")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="output")
    ap.add_argument("--as-of", default=AS_OF_CXC)
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--dashboard", type=int, metavar="PORT", default=None,
                    help="serve the interactive dashboard on PORT and block")
    ap.add_argument("--test-connection", metavar="JDBC_URL", default=None,
                    help="only probe the database connection and exit 0/1 "
                         "(reference main.py --test-connection parity)")
    ap.add_argument("--probe-query", default="SELECT 1",
                    help="dialect probe for --test-connection (Derby/DB2: "
                         "'VALUES 1'; Firebird: 'SELECT 1 FROM RDB$DATABASE')")
    args = ap.parse_args()

    spark = get_spark("cxc-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    if args.test_connection:
        from .sources.registry import probe_connection

        ok = probe_connection(spark, args.test_connection, args.probe_query)
        print("conexion exitosa" if ok else "conexion fallida")
        return 0 if ok else 1
    views = run_pipeline(spark, args.sf_dir, args.as_of)
    for name, df in views.items():
        print(f"{name}: {df.count()} rows")
    if not args.skip_export:
        from .sinks.pdf import export_pdf_report
        from .sinks.report import export_views
        written = export_views(views, args.out)
        pdf_views = {k: views[k] for k in (
            "kpis_resumen", "antiguedad_cartera_mxn", "antiguedad_cartera_usd",
            "cartera_vencida_vs_vigente_mxn", "kpis_concentracion_mxn",
        ) if k in views}
        written.append(export_pdf_report(pdf_views, f"{args.out}/dashboard_cxc.pdf"))
        print(f"wrote {len(written)} artifacts to {args.out}")
    if args.dashboard is not None:
        import time

        from .sinks.dashboard import serve_dashboard
        server, port = serve_dashboard(views, args.dashboard)
        print(f"dashboard: http://127.0.0.1:{port}/ (Ctrl-C to stop)")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
