"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we'd set on a real cluster where it
matters for plan shape (AQE, shuffle partitions, broadcast threshold,
UTC timestamps, Arrow for the Pandas-UDF slow path). At 100 TB the same
config applies per-executor; only the memory/parallelism numbers move.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "end_to_end_azure_databricks_data_engineering_project_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (falling back to ``*``).
    Shuffle partitions default to the core count — at local scale a
    32-way shuffle matches the 32 threads; on a real cluster this is
    superseded by AQE coalescing anyway.
    """
    cpus_s = str(cpus) if cpus else os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = shuffle_partitions or (int(cpus_s) if cpus_s.isdigit() else 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Scale knobs (guide §2.3/§6), parameterized with local-neutral
        # defaults so the driver's bench stays comparable: at 100 TB set
        # SPARK_GRAFT_IO_CODEC=zstd (shuffle bytes shrink markedly for
        # a bit more CPU — measure per workload) and
        # SPARK_GRAFT_MAX_PARTITION_BYTES=512m-1g (fewer, larger scan
        # tasks feeding any shuffle; local inputs are single small
        # files, so the default 128m is already one task per file).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
