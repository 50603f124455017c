"""Streaming vector-index maintenance: continuous embedding ingest
into an IVF-cell-partitioned ANN index, as a foreachBatch pipeline.

The IVF decomposition is naturally incremental ONCE THE CENTROIDS
ARE FIXED: cell assignment is a per-row pure function of the
broadcast landmark table, so indexing a batch never touches the
stored corpus — exactly the dedup-index shape (streaming/dedup.py),
with cells instead of LSH buckets:

  * the landmark table is captured ONCE from a seed corpus and
    persisted next to the index (a production system re-trains
    centroids offline and rebuilds — centroid drift is a rebuild
    decision, not a streaming concern; this module RAISES if the
    landmark file is missing rather than silently re-deriving
    different centroids, which would split the index across
    incompatible quantizers);
  * per batch: assign (one broadcast cross-join + per-vector argmin)
    and append under parquet partitions (batch_id=<b>/__lid=<cell>)
    — batch_id dynamic-overwrite keys redelivery idempotence,
    the __lid sub-partition lets probe reads prune whole cells
    off disk;
  * queries run ``similarity.ivf_knn_from_index`` over the stored
    index: n_probe cells per query are read, the rest pruned.

Batch twin: q135 builds the index in two batches with the full
corpus's landmark set and must equal q66's single-pass ivf_knn
answer bit-for-bit (assignment purity); the disk pipeline is pinned
across a multi-batch carry in tests/test_streaming_vectors.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ivf_assign,
    ivf_knn_from_index,
    ivf_landmarks,
)

_LANDMARK_SCHEMA = "__lid bigint, __lvec array<float>"


def _index_schema(id_type: str) -> str:
    return f"neighbor_id {id_type}, __cvec array<float>, batch_id bigint, __lid bigint"


class VectorIndexStream:
    """One continuously-maintained IVF vector index."""

    def __init__(
        self,
        index_dir: str,
        landmarks_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        id_type: str = "bigint",
    ):
        self.index_dir = index_dir
        self.landmarks_dir = landmarks_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.id_type = id_type

    def init_landmarks(self, seed_corpus: DataFrame, num_landmarks: int = 16) -> None:
        """Capture and persist the quantizer. Call once before
        ingesting; idempotent only in the sense that re-running with
        the SAME seed rewrites the same table."""
        ivf_landmarks(
            seed_corpus, num_landmarks, self.id_col, self.vec_col
        ).write.mode("overwrite").parquet(self.landmarks_dir)

    def _landmarks(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.landmarks_dir):
            raise RuntimeError(
                f"vector index landmarks missing at {self.landmarks_dir}; "
                "call init_landmarks(seed_corpus) first — deriving fresh "
                "centroids per batch would split the index across "
                "incompatible quantizers"
            )
        return spark.read.schema(_LANDMARK_SCHEMA).parquet(self.landmarks_dir)

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        assigned = ivf_assign(
            batch_df.select(
                F.col(self.id_col).alias("neighbor_id"),
                F.col(self.vec_col).alias("__cvec"),
            ),
            self._landmarks(spark),
            "neighbor_id",
            "__cvec",
            1,
        )
        (
            assigned.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "__lid")
            .parquet(self.index_dir)
        )

    def pipeline(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        trigger_available_now: bool = True,
    ):
        def process(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest_batch(batch_df, batch_id)

        writer = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read_index(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(_index_schema(self.id_type)).parquet(
            self.index_dir
        )

    def ann_query(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 3,
        query_id_col: str = "query_id",
        latest_only: bool = False,
    ) -> DataFrame:
        """Approximate top-k against the stored index; the probe join
        filter on __lid prunes unprobed cell partitions off disk.

        CONTRACT (ADVICE r5): ingest is APPEND-ONLY — each batch is
        expected to carry NEW vec_ids. Re-ingesting an existing id in
        a later batch leaves both the stale and the new copy in the
        index, and the default query path can return duplicate/stale
        neighbor rows for that id. ``latest_only=True`` dedups by
        neighbor_id keeping the max batch_id BEFORE scoring, so only
        the newest copy of each vector competes for the top-k — at
        the cost of a full-index aggregate that defeats cell-partition
        pruning (a global view is unavoidable because an updated
        vector may have moved cells). In production that dedup is a
        periodic COMPACTION job, not a per-query pass; use
        ``latest_only`` as the pre-compaction fallback.
        """
        index = self.read_index(spark)
        if latest_only:
            index = index.groupBy("neighbor_id").agg(
                F.max_by(
                    F.struct("__cvec", "__lid"), F.col("batch_id")
                ).alias("__s")
            ).select(
                "neighbor_id",
                F.col("__s.__cvec").alias("__cvec"),
                F.col("__s.__lid").alias("__lid"),
            )
        else:
            index = index.drop("batch_id")
        return ivf_knn_from_index(
            index,
            self._landmarks(spark),
            queries,
            k,
            n_probe,
            self.vec_col,
            query_id_col,
        )


__all__ = ["VectorIndexStream"]
