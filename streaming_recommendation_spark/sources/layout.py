"""Physical table layout: partitioning and bucketing.

The reference has one physical layout: whole CSV files read start to
finish (its "index" is an in-memory per-user sorted dict,
reference: api_service/behavior_lookup.py:17-29). At 100 TB, layout
IS the index:

  * ``write_partitioned`` — hive-style directory partitioning; query
    predicates on the partition column prune entire directories
    before any IO (verified: `PartitionFilters` in the scan node).
  * ``write_bucketed`` — pre-shuffle the table ONCE into N buckets by
    join/agg key (+ in-bucket sort). Every later equi-join or groupBy
    on that key skips its Exchange — the repeat-query answer to the
    reference's in-memory index, but disk-resident and
    cluster-shared. Bucketed tables are managed (saveAsTable); the
    warehouse dir comes from the session config.

Rules of thumb encoded here: partition by LOW-cardinality columns
only (dates, categories); bucket by HIGH-cardinality join keys
(user_id); bucket count ~ cluster cores at the target scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    df.write.partitionBy(*partition_cols).format(fmt).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (prior session's table; the in-memory
    # catalog forgot it) blocks managed-table creation — clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, table.split(".")[-1].lower())
    if os.path.isdir(stale):
        shutil.rmtree(stale)
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").mode("overwrite").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    partition_cols: list[str] | None = None,
    fmt: str = "parquet",
    num_files: int | None = None,
    salt_buckets: int = 1,
) -> None:
    """Small-file-safe write: bound BOTH file-count extremes.

    The two failure modes at 100 TB are (a) the small-files problem —
    a 2000-task stage writing into 500 hive partitions emits up to
    1M tiny files, wrecking later scan planning and the namenode —
    and (b) single giant files that cap scan parallelism. This write:

      * repartitions by the partition columns so each output
        directory is written by few tasks (not every task writing
        into every directory);
      * caps file size with ``maxRecordsPerFile`` so an oversized
        partition splits into parallel-scannable chunks rather than
        one monolith;
      * for a SKEWED partition column, ``salt_buckets > 1`` spreads
        each directory's rows over that many writing tasks (hot
        directories would otherwise serialize through one task —
        maxRecordsPerFile splits the files, not the work);
      * for an UNPARTITIONED write, ``num_files`` is REQUIRED — it is
        the explicit merge target (Spark cannot know row counts
        without an action, so silent non-compaction is an error, not
        a default).

    Row-count is the proxy for bytes here (parquet sizes vary with
    encoding); production pipelines tune target_rows_per_file to land
    near the 128-512 MB sweet spot.
    """
    from pyspark.sql import functions as F

    if partition_cols:
        keys = [F.col(c) for c in partition_cols]
        if salt_buckets > 1:
            keys.append(
                F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
            )
        w = df.repartition(*keys)
    else:
        if num_files is None:
            raise ValueError(
                "unpartitioned write_compacted needs num_files: without "
                "it maxRecordsPerFile only caps file size and the "
                "small-task spray is written through unchanged"
            )
        w = df.repartition(num_files)
    writer = (
        w.write.option("maxRecordsPerFile", target_rows_per_file)
        .format(fmt)
        .mode("overwrite")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
