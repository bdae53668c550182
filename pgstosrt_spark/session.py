"""SparkSession factory tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "pgstosrt_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """local[cpus] session with the engine's defaults.

    * AQE on (runtime re-plan, skew-join splitting, partition coalescing);
    * Arrow on, with a low ``maxRecordsPerBatch`` — media payloads are
      multi-KB..MB binaries, so small record batches bound Python-worker
      memory (SURVEY.md §4.3.2);
    * UTC session timezone (duckdb-oracle comparability);
    * shuffle partitions ~ cores for local mode (not the 200 default).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # CPU-bound kernels need even waves even when the corpus is small or
        # compacted: ask the file scan for >= 4x slots splits (a scan-level
        # knob — no shuffle, unlike repartition, whose round-robin mode
        # local-sorts every row including multi-KB payload bytes).  At
        # production scale input splits >> 4x slots, so this is a no-op.
        .config("spark.sql.files.minPartitionNum", str(4 * cpus))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
