"""SparkSession factory.

Defaults are tuned for the local[32] test harness but every choice is
made for cluster scale: AQE on (runtime re-plan, skew-join splitting,
shuffle coalescing), UTC session timezone (parity with the DuckDB
oracle, whose timestamps are UTC-naive), Arrow enabled for the few
Pandas-UDF paths, and shuffle partitions sized to the local core count
(on a real cluster this is overridden by AQE's coalescing anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "streaming-recommendation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    All settings are plain public Spark configuration; nothing here is
    environment-specific beyond the local master used for tests.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Oracle parity: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: coalesce shuffles, split skewed joins.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for the Pandas-UDF paths (model scoring, grouped ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep driver results small; operators must never collect() big data.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # File-scan split slack: when a scan's total (estimated) bytes
        # are small, default packing yields exactly defaultParallelism
        # splits — zero slack, so a split whose rows carry more
        # downstream work than average (e.g. a hot IVF cell paired
        # with many probes) becomes the stage straggler. Asking for
        # 4x cores only shrinks splits when the scan is SMALL
        # (maxSplitBytes = min(maxPartitionBytes, max(openCost,
        # total/minPartitionNum))); at 100 TB splits are capped by
        # maxPartitionBytes and this is a no-op. Measured on the
        # compacted ANN base (36 MB, 1024 files): probe-query
        # straggler 20 s -> ~5 s with the finer splits.
        .config(
            "spark.sql.files.minPartitionNum",
            str(4 * int(os.environ.get("SPARK_GRAFT_CPUS", "32"))),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Managed-table warehouse outside the repo (bucketed tables)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        # Read TIMESTAMP(NANOS) parquet columns as long (Spark has no
        # nanos type); sources.testdata converts them back to proper
        # microsecond timestamps at the scan edge.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
