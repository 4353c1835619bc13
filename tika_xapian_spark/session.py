"""SparkSession construction with the engine's standard configuration.

Tuned for correctness parity with the reference (UTC session timezone — the
reference normalizes dates to UTC RFC3339, /root/reference/src/tika_document.rs:48-66)
and for scale (AQE, Arrow, skew handling). On a real cluster the same conf
applies; only master/parallelism differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "tika-xapian-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    At cluster scale the caller passes no master and spark-submit provides it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic date semantics (reference normalizes to UTC)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas UDF boundaries (no per-row Python)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # runtime re-planning: partition coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # keep scans prunable: 128MB split targets (default, made explicit)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # split small files too: the 4MB default models spinning-disk open
        # cost and leaves a sub-4MB table as ONE split, serializing
        # CPU-heavy per-row operators (gopher folds, tokenize) onto one
        # core. 256KB matches page-cached NVMe; maxSplitBytes becomes
        # max(256KB, bytes/cores) so small tables parallelize while big
        # scans still get the full 128MB targets.
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM is the whole cluster — size the heap for
        # 32 concurrent tasks (8g measurably GC-throttled the 32-core runs)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
