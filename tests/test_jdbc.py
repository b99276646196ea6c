"""Live JDBC integration: the extraction seam exercised end-to-end against
an embedded Apache Derby database (Derby ships in Spark's jars for the
Hive metastore, so no external service is needed). Mirrors the
reference's database extraction (src/db_connector.py:66-133) including
the partitioned-read scale path."""

from __future__ import annotations

import pytest

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "cxcdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE clientes (id INT PRIMARY KEY, nombre VARCHAR(40), "
        "saldo DOUBLE)")
    ps = conn.prepareStatement("INSERT INTO clientes VALUES (?, ?, ?)")
    for i in range(1, 101):
        ps.setInt(1, i)
        ps.setString(2, f"C{i:03d}")
        ps.setDouble(3, i * 1.5)
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    conn.close()
    return url


def test_jdbc_query_read(spark, derby_url):
    from prac_data_pipelines_spark.sources.registry import load_jdbc_table

    df = load_jdbc_table(
        spark, derby_url,
        "SELECT id, nombre, saldo FROM clientes WHERE id <= 50", DERBY)
    rows = df.collect()
    assert len(rows) == 50
    assert {r["ID"] for r in rows} == set(range(1, 51))
    assert abs(sum(r["SALDO"] for r in rows) - sum(i * 1.5 for i in range(1, 51))) < 1e-9


def test_jdbc_partitioned_read(spark, derby_url):
    from prac_data_pipelines_spark.sources.registry import load_jdbc_partitioned

    df = load_jdbc_partitioned(
        spark, derby_url, "clientes", "id", 1, 100, 4, DERBY)
    # the read is split into one stride per partition (parallel connections)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    per_part = df.rdd.glom().map(len).collect()
    assert sum(per_part) == 100
    assert all(n > 0 for n in per_part), per_part
    total = df.groupBy().sum("saldo").collect()[0][0]
    assert abs(total - sum(i * 1.5 for i in range(1, 101))) < 1e-9


def test_probe_connection_success_and_failure(spark, derby_url):
    """The preflight probe (reference src/db_connector.py:173-191 parity):
    True on a live database, False — never an exception — on a bad URL."""
    from prac_data_pipelines_spark.sources.registry import probe_connection

    assert probe_connection(spark, derby_url, probe_query="VALUES 1") is True
    # wrong: probing an existing db with a dialect-invalid query
    assert probe_connection(spark, derby_url,
                            probe_query="SELECT 1 FROM RDB$DATABASE") is False
    # unreachable database: Derby without ;create refuses to open
    assert probe_connection(spark, "jdbc:derby:/nonexistent/nope",
                            probe_query="VALUES 1") is False


def test_cli_test_connection_flag(spark, derby_url, monkeypatch, capsys):
    """--test-connection probes and exits 0/1 without running the pipeline
    (reference main.py:614-620 parity)."""
    import sys

    from prac_data_pipelines_spark import pipeline

    monkeypatch.setattr(sys, "argv", [
        "pipeline", "--test-connection", derby_url,
        "--probe-query", "VALUES 1"])
    assert pipeline.main() == 0
    assert "exitosa" in capsys.readouterr().out

    monkeypatch.setattr(sys, "argv", [
        "pipeline", "--test-connection", "jdbc:derby:/nonexistent/nope",
        "--probe-query", "VALUES 1"])
    assert pipeline.main() == 1


def test_jdbc_write_roundtrip(spark, derby_url):
    """The return path: write a computed frame to a new Derby table, read
    it back, and get identical rows; append mode accumulates."""
    from prac_data_pipelines_spark.sinks.jdbc import write_jdbc_table
    from prac_data_pipelines_spark.sources.registry import load_jdbc_table

    from pyspark.sql import functions as F

    kpis = spark.createDataFrame(
        [(1, "DSO", 42.5), (2, "CEI", 0.91), (3, "MOROSIDAD", 0.07)],
        "id int, kpi string, valor double")
    write_jdbc_table(kpis, derby_url, "kpis_out", mode="overwrite",
                     properties=DERBY)
    # SELECT * — Spark creates the table with QUOTED (case-sensitive)
    # column names in Derby, so unquoted identifiers would not resolve
    back = load_jdbc_table(
        spark, derby_url, "SELECT * FROM kpis_out", properties=DERBY)
    assert sorted(tuple(r) for r in back.collect()) \
        == [(1, "DSO", 42.5), (2, "CEI", 0.91), (3, "MOROSIDAD", 0.07)]

    write_jdbc_table(kpis.withColumn("id", F.col("id") + 10),
                     derby_url, "kpis_out", mode="append", properties=DERBY)
    assert load_jdbc_table(spark, derby_url,
                           'SELECT count(*) AS "n" FROM kpis_out',
                           properties=DERBY).collect()[0][0] == 6
