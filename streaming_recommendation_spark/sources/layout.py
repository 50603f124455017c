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
    path: str | None = None,
) -> None:
    """``path`` pins the table's storage location explicitly (an
    EXTERNAL bucketed table) — callers that must not depend on the
    session's warehouse config (e.g. q185 running under the driver's
    own SparkSession, whose warehouse would default to
    ./spark-warehouse in the driver's cwd) pass an absolute path."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (prior session's table; the in-memory
    # catalog forgot it) blocks table creation — clear it
    if path is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        stale = os.path.join(warehouse, table.split(".")[-1].lower())
    else:
        stale = path
    if os.path.isdir(stale):
        shutil.rmtree(stale)
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
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


def zorder_value(cols: list[str], bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column into one integer, expressed entirely in engine-neutral
    arithmetic (div/mod/multiply — no shift builtins), so any SQL
    engine reproduces the key bit-for-bit.

    Why this exists at 100 TB: range-partitioning by ONE column gives
    perfect file-level min/max pruning on that column and none on any
    other. Sorting by the interleaved key gives every participating
    column locality ~ 2^-bits of the keyspace per file, so parquet
    min/max stats prune multi-dimensional predicates — the same trick
    Delta/Iceberg ship as OPTIMIZE ZORDER, built here from plain
    column arithmetic. bits=16 and <=4 columns keeps the key in a
    BIGINT.

    Columns are first reduced mod 2^bits; callers with non-uniform
    domains should pre-bucket (e.g. rank- or range-quantize) before
    interleaving.
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if k * bits > 62:
        raise ValueError("z-value would overflow a signed 64-bit integer")
    terms = []
    for i, c in enumerate(cols):
        x = F.pmod(F.col(c).cast("long"), F.lit(1 << bits))
        for b in range(bits):
            bit = F.pmod((x / F.lit(1 << b)).cast("long"), F.lit(2))
            terms.append(bit * F.lit(1 << (b * k + i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Cluster the table on the Morton key of ``zorder_cols`` and
    write ``num_files`` range-partitioned, internally sorted files.

    Each column is first RANGE-QUANTIZED onto the full 2^bits grid
    (one min/max aggregate — 2 scalars per column to the driver).
    Interleaving raw values would let the widest-domain column own
    every high bit and the key degenerates to a single-column sort:
    a column spanning 10 values contributes nothing above bit 7
    while a 10^6-value column fills bits 0-19. On the common grid
    every column gets equal say in every bit position — the same
    normalization Delta/Iceberg apply before OPTIMIZE ZORDER.

    repartitionByRange samples the z-key to cut balanced file
    boundaries (skew in the original columns becomes balanced file
    sizes, not hot files); sortWithinPartitions tightens per-file
    min/max further. Each output file then covers a compact Z-curve
    segment — a small rectangle in the multi-dim space — which is
    what makes the parquet footer stats selective for predicates on
    ANY of the interleaved columns (asserted against a row-order
    baseline in tests/test_layout.py).

    NULL handling: a z-order column that is entirely NULL has no
    min/max and raises ``ValueError`` (clustering on it is a caller
    bug); rows with a NULL in any z-order column get quantized cell
    0 for that column — they cluster at the low end of the curve
    rather than producing NULL Morton keys that all collapse into
    one pseudo-file (ADVICE r3).
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in zorder_cols],
    ).collect()[0]
    grid = (1 << bits) - 1
    quantized = df
    qcols = []
    for c in zorder_cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column {c!r} is entirely NULL — it carries no "
                "ordering information; drop it from zorder_cols"
            )
        span = (hi - lo) or 1.0
        qc = f"__q_{c}"
        quantized = quantized.withColumn(
            qc,
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * grid
                ).cast("long"),
                F.lit(0),
            ),
        )
        qcols.append(qc)
    z = zorder_value(qcols, bits=bits)
    (
        quantized.withColumn("__z", z)
        .drop(*qcols)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
