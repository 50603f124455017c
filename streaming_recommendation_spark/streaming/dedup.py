"""Streaming incremental near-dup detection: continuous-ingest LSH
dedup as a foreachBatch pipeline (VERDICT r4 #6).

The batch operator family (operators/dedup.py: minhash signatures ->
banded buckets -> candidate join) already has the right incremental
shape: the banded signature table IS the dedup state, and a new
batch only ever needs (a) its own signatures and (b) one equi-join
against the stored index. This module runs that loop under
Structured Streaming:

  per micro-batch (batch_df, batch_id):
    1. hash the batch ONCE -> banded signatures (cost ~ |batch| x
       bands, never ~ |corpus|);
    2. candidates = batch signatures vs (stored index minus any
       partial rows from a failed attempt of THIS batch) + own
       signatures — so cross-batch pairs point backwards in arrival
       order and within-batch pairs surface in both orientations;
    3. write candidates and signatures to parquet directories
       PARTITIONED BY batch_id with dynamic partition overwrite — a
       retried batch overwrites exactly its own partition, making
       the whole pipeline idempotent under at-least-once foreachBatch
       semantics (same effectively-once contract as the profile
       pipeline's versioned keys).

The index directory doubles as the serving artifact: at 100 TB it
would be written bucketed by `bucket` (sources/layout.write_bucketed)
so the candidate join co-locates without a shuffle; the parquet
append-by-partition here is the local-filesystem stand-in.

Batch twin: q131_incremental_lsh_dedup replays the same arrival
order as two batch calls over `documents` and is oracle-checked;
tests/test_streaming_dedup.py pins the streaming output ==
batch-twin output bit-for-bit across a 2-batch carry plus a
restart-idempotence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    banded_signature_table,
    lsh_candidates_from_signatures,
)

_SIG_SCHEMA = "doc_id bigint, band int, bucket string, batch_id bigint"
_CAND_SCHEMA = "new_id bigint, existing_id bigint, batch_id bigint"


from . import store as _store  # noqa: E402
from .state import read_or_empty as _read_or_empty  # noqa: E402 — ADVICE r5:
# only a genuinely absent first-batch directory maps to empty state;
# any other analysis failure reading the signature index re-raises.


def dedup_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    candidates_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    tombstones_dir: str | None = None,
    base_dir: str | None = None,
) -> None:
    """One micro-batch of the ingest loop (also directly callable for
    batch backfills — the streaming pipeline is just this under
    foreachBatch). ``base_dir`` reads the index through its compacted
    base generation (store.read_store); the retry-exclusion filter
    stays correct because the base only holds batches at or below the
    committed generation, strictly below any in-flight batch_id."""
    spark = batch_df.sparkSession
    new_sigs = banded_signature_table(
        batch_df, num_hashes, bands, text_col, id_col, n
    ).persist()
    try:
        stored = _store.read_store(spark, index_dir, _SIG_SCHEMA, base_dir).where(
            # a failed earlier attempt of THIS batch may have written a
            # partial partition; exclude it so the retry recomputes
            # from its own (complete) signatures
            F.col("batch_id") != F.lit(batch_id)
        ).select(id_col, "band", "bucket")
        if tombstones_dir is not None:
            # forgotten docs stop being duplicate evidence immediately
            # (erasure of the stored bytes is compact_tombstones' job)
            tombs = _read_or_empty(
                spark, tombstones_dir, _TOMB_SCHEMA
            ).select(id_col)
            stored = stored.join(F.broadcast(tombs), id_col, "left_anti")
        index = stored.unionByName(new_sigs)
        cands = lsh_candidates_from_signatures(new_sigs, index, id_col)
        # writes stay partition-parallel (no coalesce-to-1): at scale
        # both tables are large and a single-task write would serialize
        # the batch; dynamic partition overwrite keys idempotence off
        # batch_id, not off file layout
        (
            cands.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(candidates_dir)
        )
        (
            new_sigs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(index_dir)
        )
    finally:
        new_sigs.unpersist()


def dedup_ingest_pipeline(
    doc_stream: DataFrame,
    index_dir: str,
    candidates_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    trigger_available_now: bool = True,
):
    """Start the streaming ingest-dedup query over a document stream
    (columns: ``id_col``, ``text_col``). Returns the StreamingQuery.

    State = the signature index directory, NOT the state store: the
    index must outlive the query (it is the corpus-wide dedup
    artifact other jobs join against), so it lives in storage keyed
    by batch_id for idempotence, and the checkpoint only tracks
    source offsets.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(
            batch_df,
            batch_id,
            index_dir,
            candidates_dir,
            num_hashes,
            bands,
            text_col,
            id_col,
            n,
        )

    writer = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_candidates(spark: SparkSession, candidates_dir: str) -> DataFrame:
    """All candidate pairs emitted so far: (new_id, existing_id,
    batch_id). Distinct across batches is NOT applied — each row
    records which batch surfaced the pair."""
    return spark.read.schema(_CAND_SCHEMA).parquet(candidates_dir)


# ---------------------------------------------------------------------------
# Deletion propagation ("forget this document" — the GDPR-erasure /
# takedown path every production corpus index needs): deletions are
# recorded as TOMBSTONES next to the index (cheap, idempotent,
# batch-keyed like everything else here), every read anti-joins them
# out (a forgotten doc stops being duplicate EVIDENCE immediately),
# and `compact_tombstones` physically rewrites the index without the
# dead rows (soft-deleted bytes persist in storage until it runs —
# erasure is only complete after compaction, which is why it exists
# as a separate explicit step, exactly the Delta/Iceberg
# delete-then-compact shape). Batch twin: q216_forgetful_dedup_twin
# (q185's cross-snapshot read with the forget set removed from the
# index side; oracle excludes the forgotten ids from the candidate
# predicate).
# ---------------------------------------------------------------------------

_TOMB_SCHEMA = "doc_id bigint, tomb_batch_id bigint"


def tombstone_docs(
    ids_df: DataFrame,
    tomb_batch_id: int,
    tombstones_dir: str,
    id_col: str = "doc_id",
) -> None:
    """Record a deletion request: one row per forgotten id, appended
    partitioned by tomb_batch_id with dynamic overwrite (a retried
    deletion batch overwrites exactly its own partition)."""
    (
        ids_df.select(F.col(id_col))
        .distinct()
        .withColumn("tomb_batch_id", F.lit(tomb_batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tomb_batch_id")
        .parquet(tombstones_dir)
    )


def read_live_index(
    spark: SparkSession,
    index_dir: str,
    tombstones_dir: str | None = None,
    id_col: str = "doc_id",
    base_dir: str | None = None,
    resolve: bool = True,
) -> DataFrame:
    """The signature index MINUS tombstoned docs — the only read any
    dedup/search path should use once deletions exist. One anti-join
    on the id (tombstone side broadcast at scale: deletions are tiny
    relative to the corpus). ``resolve`` (default True — VERDICT r11
    #2 generalized): a re-ingested doc's STALE band signatures
    resolve away latest-batch-per-doc at read time, so an edited doc
    stops surfacing candidates its old text earned; the window covers
    only the unfolded delta tail."""
    if resolve:
        idx = _store.read_store_resolved(
            spark, index_dir, _SIG_SCHEMA, base_dir, [id_col]
        ).select(id_col, "band", "bucket")
    else:
        idx = _store.read_store(spark, index_dir, _SIG_SCHEMA, base_dir).select(
            id_col, "band", "bucket"
        )
    if tombstones_dir is None:
        return idx
    tombs = _read_or_empty(spark, tombstones_dir, _TOMB_SCHEMA).select(id_col)
    return idx.join(F.broadcast(tombs), id_col, "left_anti")


def compact_tombstones(
    spark: SparkSession,
    index_dir: str,
    tombstones_dir: str,
    id_col: str = "doc_id",
) -> None:
    """Physically rewrite the index without the tombstoned rows and
    clear the tombstone log — the erasure step (until this runs the
    dead rows still exist as bytes in storage; reads just skip them).
    The rewrite keeps the batch_id partitioning so ingest idempotence
    semantics survive compaction."""
    import shutil
    import uuid

    live = (
        _read_or_empty(spark, index_dir, _SIG_SCHEMA)
        .join(
            F.broadcast(
                _read_or_empty(spark, tombstones_dir, _TOMB_SCHEMA).select(
                    id_col
                )
            ),
            id_col,
            "left_anti",
        )
    )
    tmp_dir = f"{index_dir.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    live.write.mode("overwrite").partitionBy("batch_id").parquet(tmp_dir)
    shutil.rmtree(index_dir)
    shutil.move(tmp_dir, index_dir)
    shutil.rmtree(tombstones_dir, ignore_errors=True)


def compact_signature_index(
    spark: SparkSession,
    index_dir: str,
    base_dir: str,
    id_col: str = "doc_id",
    upto_batch_id: int | None = None,
    tombstones: DataFrame | None = None,
) -> int | None:
    """Fold the signature-index deltas into a compacted base
    generation (store.compact_store, VERDICT r10 #2): a doc's band
    signatures are replaced wholesale by its newest arrival, and
    ``tombstones`` (1-column id frame) physically erases forgotten
    docs' signatures from the new base — the generation-machinery
    sibling of ``compact_tombstones`` (which rewrites the delta
    partitions in place for stores that have no base). A forgotten
    doc stops being duplicate evidence at read time the moment it is
    tombstoned (read_live_index); this fold is what makes the erasure
    stick in the stored bytes."""
    return _store.compact_store(
        spark,
        index_dir,
        base_dir,
        _SIG_SCHEMA,
        key_cols=[id_col],
        upto_batch_id=upto_batch_id,
        tombstones=tombstones,
        id_col=id_col,
    )
