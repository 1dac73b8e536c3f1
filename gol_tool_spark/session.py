"""SparkSession factory tuned for the local[N] sandbox.

At cluster scale the same settings apply per-executor; AQE + skew-join
handling are on by default so dense urban cells (the reference's hot z12
tiles) are split at runtime (SURVEY.md §4 "Skew handling").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gol_tool_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cpus: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(cpus, 32) — sized so sf0.1
    partitions fit comfortably in memory; at 100 TB scale this is set to
    ~2-3x total cores instead.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cpus}]"
        ncores = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the engine's skewed joins (hot urban tiles) usually feed a groupBy
        # on the same key, whose distribution requirement vetoes the skew
        # split unless forced — the extra shuffle is cheaper than a straggler
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # long-lived sessions running many queries accumulate orphaned
        # cache/localCheckpoint blocks that ContextCleaner only frees
        # after a driver GC; the default periodic-GC interval (30 min)
        # never fires inside a multi-minute batch session, so dead
        # blocks pile up in the block manager and later queries pay the
        # memory pressure.  A few minutes keeps cleanup ahead of
        # accumulation at any session length (env-overridable).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
