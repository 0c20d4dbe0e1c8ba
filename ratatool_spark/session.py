"""SparkSession factory tuned for the target execution profile.

Local testing runs on ``local[N]`` but every config choice is made for the
1000-executor / 100 TB case: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), explicit shuffle-partition sizing, Arrow
transfer for the few pandas-UDF paths, UTC session time zone so timestamp
semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ratatool_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to SPARK_GRAFT_CPUS (or 32). On a real
    cluster you would size this as ~2-3x total cores and let AQE coalesce;
    the setting here is the local-mode equivalent.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "4m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Long-lived driver hygiene (guide §5): broadcast/shuffle blocks are
        # reclaimed by the ContextCleaner only when driver GC collects their
        # references; on a large heap full GCs can lag far behind block
        # accumulation (in local mode those blocks share the one JVM with
        # execution memory, so a many-query session degrades measurably —
        # the default periodic-GC interval of 30min is longer than a whole
        # bench run). 2min bounds the lag at a negligible GC cost; the same
        # setting is the standard remedy for long-running drivers on
        # clusters, not a local-mode special.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores events.ts as TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, converted in sources.io.load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
