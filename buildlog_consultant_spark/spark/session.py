"""SparkSession factory with the settings the pipeline assumes.

- AQE on (runtime re-plan, skew-join splitting)
- shuffle partitions sized to cores for local mode (the 200 default
  over-parallelizes small local runs and under-parallelizes clusters — on a
  real cluster this is overridden via spark-submit conf)
- Arrow enabled for the pandas-UDF boundary
- UTC session timezone (DuckDB-oracle comparability)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "buildlog-consultant-spark",
    shuffle_partitions: int | None = None,
    max_partition_bytes: str | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local["):-1]
            shuffle_partitions = 32 if inner == "*" else max(int(inner), 1)
        else:
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if max_partition_bytes:
        builder = builder.config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    return builder.getOrCreate()
