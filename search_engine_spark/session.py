"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a real cluster deployment would set per
executor; the parallelism knob exists so the bench harness can run the same
job at two parallelism levels (local[N] vs local[4N]) to evidence scaling
efficiency (BASELINE.json north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "search_engine_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    parallelism: number of local cores (``local[N]``). Defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``.
    """
    cores = parallelism or os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cores}]" if cores else "local[*]"
    shuffle = shuffle_partitions or (
        int(cores) if cores else DEFAULT_SHUFFLE_PARTITIONS
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
