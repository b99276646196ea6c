"""JDBC result sink: publish a frame back to a warehouse/ERP table.

The reference only READS from its database (``src/db_connector.py`` —
results go to Excel/PDF), but an engine that extracts over JDBC needs
the return path too: curated KPI tables written where the ERP's other
consumers can join them. Spark-first shape:

- each write partition opens one connection and batches inserts
  (``batchsize``) — parallelism = DataFrame partitions, so the write
  scales horizontally exactly like the partitioned read;
- for report-sized frames a single connection is right:
  ``coalesce_to`` caps the connection count (default 1 — KPI tables are
  small and many warehouses throttle concurrent writers);
- ``mode="overwrite"`` + ``truncate`` replaces contents while keeping
  the table's DDL (indexes, grants) — dropping and recreating a table
  the DBA owns is rude and loses types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc_table(df: DataFrame, url: str, table: str,
                     mode: str = "append",
                     properties: dict[str, str] | None = None,
                     coalesce_to: int | None = 1,
                     batchsize: int = 1000,
                     truncate: bool = True) -> None:
    """Write ``df`` into the JDBC ``table``. ``coalesce_to=None`` keeps
    the frame's own partitioning (one connection per partition — the
    scale path for large result sets); the default single connection is
    the polite path for report-sized outputs."""
    out = df.coalesce(coalesce_to) if coalesce_to else df
    writer = (out.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batchsize))
              .option("truncate", "true" if truncate else "false")
              .mode(mode))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
