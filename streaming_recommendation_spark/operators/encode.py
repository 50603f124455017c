"""Dictionary encoding at scale (SURVEY §2.3 J2).

q27's `dense_rank` over all distinct keys is the semantic spec but
funnels every key through ONE partition. ``dict_encode`` is the scale
path: count keys per sorted partition, prefix-sum the counts on the
driver (one tiny action over n_partitions integers), then assign
index = partition_offset + local row_number. Same contiguous 0..n-1
result, shuffle-parallel everywhere; only the per-partition counts
(not keys) touch the driver.

Determinism: keys are range-partitioned by sort order, so the mapping
equals the global sort order — identical to q27's dense_rank - 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dict_encode(
    df: DataFrame,
    key_col: str,
    index_col: str = "idx",
    num_partitions: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """(key) -> (key, idx) with contiguous indexes 0..n-1 in key sort
    order. Input rows are de-duplicated first. ``min_count`` keeps
    only keys occurring at least that often in ``df`` — the dedup
    already runs as a groupBy, so the occurrence filter costs nothing
    extra (used by operators/suffix.py to prune globally-unique
    blocks in the same pass that ranks the survivors)."""
    from ..plans.audit import checkpoint_partitioned

    if min_count > 1:
        keys = (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") >= min_count)
            .select(key_col)
        )
    else:
        keys = df.select(key_col).distinct()
    n = num_partitions or keys.sparkSession.sparkContext.defaultParallelism
    # materialize the range partitioning ONCE: the per-partition counts
    # and the final rank assignment below are separate executions, and
    # without this AQE may coalesce the distinct's shuffle differently
    # per execution — the offsets of execution A applied to the
    # partitioning of execution B silently duplicate indexes (found by
    # operators/suffix.py's false rank merges; the checkpoint pins one
    # physical layout for both passes). Vocabulary-sized, not
    # corpus-sized, so the materialization is bounded.
    parted = checkpoint_partitioned(
        keys.repartitionByRange(n, F.col(key_col)).sortWithinPartitions(key_col)
    )

    counts = parted.select(F.spark_partition_id().alias("pid")).groupBy("pid").count()
    sizes = {r.pid: r["count"] for r in counts.collect()}  # n integers only
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = keys.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "pid int, offset long"
        )
    )

    w = Window.partitionBy("pid").orderBy(key_col)
    local = parted.select(
        key_col, F.spark_partition_id().alias("pid")
    ).withColumn("local_rn", F.row_number().over(w) - 1)
    return (
        local.join(offsets_df, "pid")
        .select(key_col, (F.col("offset") + F.col("local_rn")).alias(index_col))
    )
