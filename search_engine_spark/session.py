"""SparkSession construction with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "search_engine_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[N] session with AQE + Arrow on.

    On a real cluster these settings ride along unchanged: AQE coalesces
    the post-shuffle partition count and splits skewed partitions at run
    time, so the same job scales from local[8] to 1000 executors without
    re-tuning (the bench harness exploits exactly that to evidence the
    N→4N scaling rule).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is not None:
        sp = shuffle_partitions
    else:
        # 2 tasks per core: keeps reducers busy under stragglers; AQE
        # coalesces the excess. Scales with cluster size by construction.
        n = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() \
            else (int(cpus) if cpus.isdigit() else 32)
        sp = max(2 * n, 8)
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = one JVM for driver AND all executor threads; size
        # the heap for per-task execution memory × cores plus build-time
        # caches rather than Spark's 1g default (cluster deployments set
        # executor memory explicitly and override this).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
