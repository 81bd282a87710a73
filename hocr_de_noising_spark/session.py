"""SparkSession factory with the engine's tuned configs (SURVEY.md §4.4).

Designed for a multi-executor cluster at 10^12-document scale; in this
sandbox it runs on local[N]. Every config below is standard public
Spark configuration:

- Arrow-vectorized Python (pandas UDFs) with a bounded batch size so a
  pathologically large document cannot blow up one Arrow batch.
- AQE on (partition coalescing, runtime join switching, skew joins).
- Shuffle partitions sized to parallelism (caller passes cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hocr-de-noising",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records_per_batch: int = 1024,
    arrow_max_bytes_per_batch: str = "16m",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the span-denoise workload.

    ``cores=None`` → ``local[*]`` locally; on a real cluster the master
    comes from spark-submit and this builder only applies SQL configs.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8) if cores else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records_per_batch),
        )
        # byte-aware batch bound (Spark 4): a batch closes at EITHER
        # limit, so high row counts amortize per-batch Python overhead
        # on small docs while one giant document can never blow up a
        # single Arrow buffer (SURVEY §7.3 hard-part 5)
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            arrow_max_bytes_per_batch,
        )
        .config("spark.python.worker.reuse", "true")
        # sandbox-sized input splits so scan-stage parallelism tracks
        # core count even on tens-of-MB fixture files; a real cluster
        # run overrides these back to 128m+ via extra_conf
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
