"""SparkSession factory with scale-appropriate defaults.

Tuned for the sandbox (local[N], single JVM) but every knob is the one
you would set on a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), shuffle partitions sized to cores, Arrow enabled
for all pandas UDF exchange, small broadcast threshold left default so
Catalyst broadcasts dimension-sized sides automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "database-delta-plugins-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches sized for KB-wide binary payloads (web pages):
        # the 10000-row default makes ~50MB batches per in-flight task —
        # at 16+ concurrent tasks that thrashes the shared executor heap
        # and pandas-UDF stages ANTI-scale (measured: extract_text over
        # 1.17M pages, local[16]: 44s at 10000 vs 6s at 2048; local[4]
        # barely moves). Size Arrow batches by bytes, not rows.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # off-heap column vectors: KB-wide binary payload scans allocate
        # GBs of short-lived vectors; keeping them off the GC heap cut
        # measured apply-path GC time ~2.5x at 8+ concurrent tasks.
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_OFFHEAP", "4g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
