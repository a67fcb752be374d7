"""SparkSession factory tuned for the CDC engine.

Local mode is a single JVM; on a real cluster the same configs apply per
executor. AQE is always on: it handles runtime partition coalescing and
skew-join splitting, which matters for the MERGE shuffle at 10^10-event
scale (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bitcoin_etl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to the core count: at local scale the
    200-partition default over-parallelizes tiny shuffles; on a cluster
    callers pass ~2-3x total cores and let AQE coalesce.
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or cores
    # SPARK_GRAFT_MASTER overrides the master URL — used by the scaling
    # harness to run the SAME job on process-isolated executors
    # (local-cluster[K,cores,mem]: one JVM per executor, real shuffle
    # transport) instead of threads in one JVM.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE SMJ->shuffled-hash rewrite, guarded at RUNTIME per
        # partition: fires only when every post-shuffle partition fits
        # the local map threshold, so local-scale joins skip the two
        # sorts while 100 TB-scale partitions (>128 MB) keep the
        # spill-safe sort-merge automatically (guide §3.1). Override
        # with SPARK_GRAFT_SHJ_LOCAL_MAP; "0" restores the default-off.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP", "128m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # File-source streaming + many small commits: keep listing cheap.
        .config("spark.sql.streaming.schemaInference", "false")
        # Task-side output commit (v2): avoids the serial driver-side
        # rename storm on partitionBy writes with many bucket dirs —
        # dominant fixed cost per commit otherwise.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.sources.commitProtocolClass",
                "org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
