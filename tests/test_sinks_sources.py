"""Source format roundtrips (CSV/JSON with explicit schemas) and the
dependency-free PDF report sink."""

from __future__ import annotations

import os
import shutil
import tempfile


def test_csv_json_roundtrip(spark, sf_dir):
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.sources.registry import load_csv, load_json

    region = load_table(spark, sf_dir, "region")
    d = tempfile.mkdtemp(prefix="fmt_")
    try:
        region.write.mode("overwrite").option("header", "true").csv(f"{d}/csv")
        region.write.mode("overwrite").json(f"{d}/json")
        back_csv = load_csv(spark, f"{d}/csv", schema=region.schema)
        back_json = load_json(spark, f"{d}/json", schema=region.schema)
        want = sorted(map(tuple, region.collect()))
        assert sorted(map(tuple, back_csv.collect())) == want
        assert sorted(map(tuple, back_json.collect())) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pdf_report_sink(spark, sf_dir):
    from prac_data_pipelines_spark.pipeline import run_pipeline
    from prac_data_pipelines_spark.sinks.pdf import export_pdf_report

    views = run_pipeline(spark, sf_dir)
    subset = {k: views[k] for k in ("kpis_resumen", "antiguedad_cartera_mxn",
                                    "cartera_vencida_vs_vigente_mxn")}
    d = tempfile.mkdtemp(prefix="pdf_")
    try:
        path = export_pdf_report(subset, f"{d}/reporte.pdf")
        with open(path, "rb") as f:
            data = f.read()
        assert data.startswith(b"%PDF-1.4")
        assert data.rstrip().endswith(b"%%EOF")
        assert len(data) > 2000
        assert data.count(b"/Type /Page ") == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)
