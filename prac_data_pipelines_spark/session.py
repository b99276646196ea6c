"""SparkSession factory.

Scale stance: these defaults are written for a real cluster (1000 executors,
100 TB inputs) but work unchanged on local[N]:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  join-strategy switching) so one static ``spark.sql.shuffle.partitions``
  setting survives a 1000x scale-up.
- Arrow enabled for every pandas interchange (the only Python-side compute the
  engine allows is vectorized Pandas UDFs and driver-side report sinks).
- Session timezone pinned to UTC: distributed workers must not disagree with
  each other (or with the correctness oracle) about timestamp rendering.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app_name: str = "prac_data_pipelines_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``). On a real
    cluster the master/resource settings come from spark-submit instead; every
    config below is orthogonal to deployment mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter pushdown: a selective join side prunes the
        # large side's scan at execution time (big win on selective joins
        # over 100 TB facts; no-op when not profitable)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Some feeds carry nanosecond parquet timestamps (Spark's reader has no
        # nanos type): read as long and normalize in the source layer.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    return builder.getOrCreate()


def tune_for_input(spark: SparkSession, input_dir: str,
                   target_partition_bytes: int = 128 * 1024 * 1024) -> int:
    """Size shuffle parallelism from the actual input volume.

    One static ``spark.sql.shuffle.partitions`` cannot fit both sf0.01 and
    100 TB: too few partitions → spills and stragglers at scale; AQE can
    coalesce surplus partitions downward at runtime but can only split
    partitions the skew-join handler recognizes. So set the UPPER bound
    from data size — ceil(input_bytes / target) clamped to
    [2x cores, 20000] — and let AQE coalesce below it. Returns the value
    set. Local filesystem paths only (on a cluster, size the same formula
    from the catalog/object-store listing).
    """
    import math

    total = 0
    for root, _dirs, files in os.walk(input_dir):
        for name in files:
            if not name.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, name))
                except OSError:
                    pass
    cores = spark.sparkContext.defaultParallelism
    parts = max(2 * cores,
                min(20_000, math.ceil(total / target_partition_bytes)))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts
