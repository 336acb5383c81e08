"""SparkSession factory with the engine's required configs.

Arrow execution is mandatory (every UDF in this engine is pandas/Arrow
vectorized); AQE stays on for runtime coalescing + skew handling of the
stats shuffles. ``shuffle.partitions`` defaults to the core count — posting
builds size their own partitioning explicitly (one partition per segment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | str = "*", app: str = "lucene_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    master = f"local[{cores}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    elif cores != "*":
        b = b.config("spark.sql.shuffle.partitions", str(max(int(cores), 8)))
    else:
        b = b.config("spark.sql.shuffle.partitions", "32")
    return b.getOrCreate()
