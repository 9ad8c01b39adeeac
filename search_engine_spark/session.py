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
    # Python workers churn large numpy/Arrow buffers; with glibc defaults
    # every big temp is mmap'd and munmap'd, so its pages go back to the
    # OS (and, under virtualized free-page reporting, to the HOST) on
    # every free — each reuse then pays first-touch page faults, which on
    # a memory-pressured host cost ~100µs+ apiece. Pinning the arena
    # (never trim, no per-alloc mmap) makes each long-lived worker fault
    # its high-water mark ONCE and then recycle warm pages. Workers
    # inherit the JVM's env, which inherits ours, so exporting here covers
    # local mode; spark.executorEnv covers a real cluster.
    for var, val in (
        ("MALLOC_TRIM_THRESHOLD_", "-1"),
        ("MALLOC_MMAP_MAX_", "0"),
    ):
        os.environ.setdefault(var, val)
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
    for var in ("MALLOC_TRIM_THRESHOLD_", "MALLOC_MMAP_MAX_"):
        builder = builder.config(f"spark.executorEnv.{var}", os.environ[var])
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
