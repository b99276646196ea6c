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
    subset = {k: views[k] for k in (
        "kpis_resumen", "antiguedad_cartera_mxn",
        "cartera_vencida_vs_vigente_mxn", "kpis_concentracion_mxn",
        "kpis_limite_credito_mxn")}
    d = tempfile.mkdtemp(prefix="pdf_")
    try:
        path = export_pdf_report(subset, f"{d}/reporte.pdf")
        with open(path, "rb") as f:
            data = f.read()
        assert data.startswith(b"%PDF-1.4")
        assert data.rstrip().endswith(b"%%EOF")
        assert len(data) > 10_000
        # one page per KPI view
        assert data.count(b"/Type /Page ") == 5
        # vector chart content: filled rects (bars/tables), Bezier arcs
        # (donut wedges, Pareto markers), dashed 80% guide, bold font
        assert data.count(b" re f") > 5    # chart bars (fill only)
        assert data.count(b" re B") > 50   # table cells (fill + grid)
        assert data.count(b" c ") > 8
        assert b"[3 3] 0 d" in data
        assert b"/Helvetica-Bold" in data
        # xref offsets must point at their objects
        xref_at = int(data.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
        assert data[xref_at:xref_at + 4] == b"xref"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pdf_donut_geometry_closes():
    """A full-circle donut (one 100% wedge) must produce arcs covering
    2*pi: the wedge path's final curve endpoint returns to the start."""
    from prac_data_pipelines_spark.sinks.pdf import Canvas

    c = Canvas()
    c.wedge(100.0, 100.0, 50.0, 30.0, 0.0, 6.283185307179586, (1, 0, 0))
    op = c.ops[-1]
    assert op.count(" c") >= 8  # >= 4 outer + 4 inner segments
    assert "150.00 100.00 m" in op  # starts at angle 0 on the outer radius
    assert op.endswith("h B")


def test_pdf_text_alignment_and_rotation():
    from prac_data_pipelines_spark.sinks.pdf import Canvas

    c = Canvas()
    c.text(100, 50, "abcd", size=10, align="center")
    assert "1 0 0 1 89.60 50.00 Tm" in c.ops[-1]  # x - len*size*0.52/2
    c.text(100, 50, "abcd", size=10, rotate_deg=45)
    assert "0.7071 0.7071 -0.7071 0.7071" in c.ops[-1]


def test_text_source_lines_and_wholetext(spark, tmp_path):
    """Raw-corpus ingestion: line mode yields one row per line with file
    provenance; wholetext yields one row per file."""
    from prac_data_pipelines_spark.sources.registry import load_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("uno\ndos\ntres\n")
    (d / "b.txt").write_text("cuatro\n")

    lines = load_text(spark, str(d))
    assert lines.columns == ["archivo", "texto"]
    assert lines.count() == 4
    got = {r["texto"] for r in lines.collect()}
    assert got == {"uno", "dos", "tres", "cuatro"}
    by_file = {r["archivo"].rsplit("/", 1)[-1]
               for r in lines.select("archivo").distinct().collect()}
    assert by_file == {"a.txt", "b.txt"}

    whole = load_text(spark, str(d), wholetext=True)
    assert whole.count() == 2
    texts = sorted(r["texto"] for r in whole.collect())
    assert texts == ["cuatro\n", "uno\ndos\ntres\n"]


def test_orc_avro_format_breadth(spark, sf_dir, tmp_path):
    """Format breadth beyond parquet/csv/json: ORC round-trips natively;
    Avro requires the external spark-avro package — assert the clean
    error seam rather than silently skipping the format."""
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    orc_path = str(tmp_path / "orders_orc")
    orders.write.format("orc").save(orc_path)
    back = spark.read.format("orc").load(orc_path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # predicate pushdown reaches the ORC scan too
    plan = (back.filter("o_custkey = 1")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "o_custkey" in plan

    import pytest as _pytest
    with _pytest.raises(Exception, match="[Aa]vro"):
        orders.write.format("avro").save(str(tmp_path / "orders_avro"))


def test_load_table_parallelize_gate(spark, sf_dir):
    """The unsplittable-input heal: ``parallelize=True`` repartitions a
    scan whose partition count is below the cluster parallelism (a
    single-row-group file yields ONE task however it is split), is a
    no-op by default, keeps results identical, and must not break filter
    pushdown / column pruning at the scan."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.sources.registry import _SCAN_UNDERPARALLEL

    cores = spark.sparkContext.defaultParallelism
    plain = load_table(spark, sf_dir, "documents")
    par = load_table(spark, sf_dir, "documents", parallelize=True)
    if plain.rdd.getNumPartitions() < cores:
        assert par.rdd.getNumPartitions() == cores
    # the layout decision is memoized per (path, cores)
    assert (f"{sf_dir}/documents.parquet", cores) in _SCAN_UNDERPARALLEL
    # identical content either way
    assert (par.orderBy("doc_id").collect()
            == plain.orderBy("doc_id").collect())
    # pushdown + pruning still reach the scan through the repartition
    q = par.filter(F.col("doc_id") > 10).select("doc_id", "source")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    scan = plan[plan.index("Scan parquet"):]
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in scan
    assert "text" not in scan.split("ReadSchema")[1].splitlines()[0]
