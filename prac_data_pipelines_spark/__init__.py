"""prac_data_pipelines_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference accounts-receivable analytics pipeline (``frnc-crrd/prac_data_pipelines``),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
built-in JVM expressions in every hot path, zero row-at-a-time Python UDFs.

Layout
------
- ``session``    : SparkSession factory (AQE, shuffle sizing, UTC timezone)
- ``config``     : business constants (aging/collection buckets, anomaly thresholds)
- ``sources``    : table registry + parquet/JDBC loaders with explicit schemas
- ``operators``  : reusable relational operators (buckets, totals, dual-sort,
                   z-scores, windows, profile, dedup, similarity, text)
- ``plans``      : the business-level derived views (master assembly, operating
                   report, analytics, KPIs, audit) — reference-parity layer
- ``streaming``  : Structured Streaming surface over event streams
- ``sinks``      : driver-side report sinks (Excel/PDF) over collected finals
"""

__version__ = "0.1.0"
