"""Shared generation-based compaction for the persisted streaming
stores (VERDICT r10 #2).

Every ingest pipeline in this package persists its state the same
way: one parquet partition per micro-batch (``batch_id=<b>/``,
dynamic-overwrite keyed so an at-least-once redelivery replaces
exactly its own attempt). That layout is right for ingest but wrong
for serving reads at scale — a store that only ever appends one
partition per batch accumulates millions of files over a long-lived
stream, and every search pays the listing. ``streaming/vectors.py``
grew the fix first (its measured win: 4,544 -> 1,024 files, probe
7.66 -> 5.59 s); this module is that machinery extracted so the
postings, positional, doc-vector, PQ-codes, passage-hash and
signature stores share ONE implementation instead of six private
copies:

  * deltas: ``delta_dir/batch_id=<b>/`` exactly as the ingests
    already write them — nothing about ingest changes;
  * base: ``base_dir/v=<gen>/`` compacted generations under the
    shared versioned-state contract (streaming/state.py): a
    generation is committed iff Spark's ``_SUCCESS`` marker exists,
    partial writes are ignored and rmtree-replaced, the previous
    generation is retained one cycle;
  * the logical store is ``base(newest committed gen G) union deltas
    with batch_id > G`` — deltas <= G are dead weight the compactor
    deletes as cleanup, and reads ignore them either way, so a crash
    between base commit and delta deletion is harmless;
  * ``compact_store`` folds deltas ``(G_prev, upto]`` into a new
    generation. ``upto`` defaults to ``max(delta ids) - 1``: the
    newest delta may be an in-flight foreachBatch attempt whose
    checkpoint has not committed, and folding it would let a
    crash-before-commit redelivery be silently shadowed by the base
    (the same in-flight-never-supersedes rule as state.prune_* —
    ADVICE r5 high). Pass the newest batch_id explicitly only when
    the stream is stopped/quiesced.

The SEMANTIC content of compaction is ``fold_deltas``: keep each
key's rows from its newest batch (the multi-row-per-key
generalization of vectors.latest_per_vector — a posting list or a
band-signature group is replaced wholesale by the key's newest
arrival, never row-merged across batches), then drop tombstoned keys
(VERDICT r10 #3 — physical erasure: once a forget set is folded
here, the forgotten rows do not exist in the new base's bytes, the
Delta/Iceberg delete-then-compact shape). The disk job is exactly
``fold_deltas`` plus versioned-state bookkeeping, which is why the
compaction twins (q220-q223) call ``fold_deltas`` itself — the
oracle equality pins the very code path the compactor runs.

Reference analog: the serving cascade reads compact precomputed
state (model_service/models.py:20-40), not a log of every arrival.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import state

_BATCH_RE = re.compile(r"^batch_id=(\d+)$")
# A generation dir is v=<cover> (written by a delta fold) or
# v=<cover>e<epoch> (written by an erasure-only rewrite at the SAME
# coverage point — ADVICE r11: compaction with tombstones must not
# silently skip erasure just because no delta needed folding, and an
# in-place rewrite of the only committed generation would open a
# crash window with NO committed base; a new dir at (cover, epoch+1)
# commits atomically via _SUCCESS exactly like a fold). Ordering is
# (cover, epoch); plain v=<cover> is epoch 0. state.versions() does
# not match the e-suffixed names, which is intentional — generation
# listing/pruning for stores lives here, not in state.py.
_GEN_RE = re.compile(r"^v=(\d+)(?:e(\d+))?$")


def delta_batch_ids(delta_dir: str) -> list[int]:
    """Sorted batch_ids with a delta partition under delta_dir."""
    if not os.path.isdir(delta_dir):
        return []
    out = []
    for name in os.listdir(delta_dir):
        m = _BATCH_RE.match(name)
        if m and os.path.isdir(os.path.join(delta_dir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _gen_label(cover: int, epoch: int) -> str:
    return f"v={cover}" if epoch == 0 else f"v={cover}e{epoch}"


def gen_entries(base_dir: str) -> list[tuple[int, int, str]]:
    """All generation dirs (committed or not) as sorted
    ``(cover, epoch, path)`` tuples — ordering is (cover, epoch), so
    an erasure rewrite at the same coverage sorts after the fold it
    rewrote."""
    if not os.path.isdir(base_dir):
        return []
    out = []
    for name in os.listdir(base_dir):
        m = _GEN_RE.match(name)
        p = os.path.join(base_dir, name)
        if m and os.path.isdir(p):
            out.append((int(m.group(1)), int(m.group(2) or 0), p))
    return sorted(out)


def committed_entries(base_dir: str) -> list[tuple[int, int, str]]:
    """gen_entries restricted to generations whose write COMMITTED
    (Spark's _SUCCESS marker) — a compactor crash mid-write leaves a
    markerless partial dir that reads ignore and a re-run
    rmtree-replaces."""
    return [
        e
        for e in gen_entries(base_dir)
        if os.path.exists(os.path.join(e[2], "_SUCCESS"))
    ]


def committed_gen(base_dir: str) -> int | None:
    """COVERAGE of the newest committed base generation: deltas with
    ``batch_id`` at or below this are folded in (reads skip them).
    The directory holding that generation may carry an erasure epoch
    suffix — path lookups must go through committed_gen_dir, never
    ``state.version_dir(base_dir, committed_gen(...))``."""
    entries = committed_entries(base_dir)
    return entries[-1][0] if entries else None


def committed_gen_dir(base_dir: str) -> str | None:
    """Path of the newest committed generation dir (the one read_store
    serves), or None if no generation has committed."""
    entries = committed_entries(base_dir)
    return entries[-1][2] if entries else None


def latest_batch_per_key(index: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keep each key's rows from its newest batch: the multi-row
    generalization of vectors.latest_per_vector. A key's newest
    arrival REPLACES its older copies wholesale (all the ingests here
    write a key's complete rows in one batch — a document's whole
    posting list, all its band signatures — so replacement, never
    row-merge, is the correct upsert). One shuffle on the key; the
    window max is computed per key group, map-side partial via AQE.
    For single-row-per-key stores this equals the max_by fold; for
    append-only set stores (the passage-hash index, whose ingest only
    ever writes genuinely new keys) it is the identity."""
    w = Window.partitionBy(*key_cols)
    return (
        index.withColumn("__maxb", F.max("batch_id").over(w))
        .where(F.col("batch_id") == F.col("__maxb"))
        .drop("__maxb")
    )


def fold_deltas(
    index: DataFrame,
    key_cols: list[str],
    tombstones: DataFrame | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """The pure semantic core of ``compact_store`` — latest batch per
    key, minus tombstoned keys. The compaction twins (q220-q223) run
    THIS function over in-memory unions so their oracle equality pins
    the exact fold the disk compactor executes. ``tombstones`` is a
    1-column frame of forgotten ``id_col`` values (broadcast: a
    forget set is tiny relative to the corpus)."""
    out = latest_batch_per_key(index, key_cols)
    if tombstones is not None:
        if id_col is None:
            id_col = tombstones.columns[0]
        out = out.join(
            F.broadcast(tombstones.select(id_col)), id_col, "left_anti"
        )
    return out


def read_store(
    spark: SparkSession,
    delta_dir: str,
    schema: str,
    base_dir: str | None = None,
) -> DataFrame:
    """The logical store: committed compacted base (if any) plus every
    delta batch newer than it. With ``base_dir=None`` this degrades to
    the plain union-of-deltas read every store shipped with — existing
    callers are untouched until they opt in."""
    deltas = state.read_or_empty(spark, delta_dir, schema)
    if base_dir is None:
        return deltas
    entries = committed_entries(base_dir)
    if not entries:
        return deltas
    cover, _epoch, gdir = entries[-1]
    base = spark.read.schema(schema).parquet(gdir)
    return base.unionByName(deltas.where(F.col("batch_id") > cover))


def resolve_with_tail(
    base: DataFrame, tail: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Pure core of ``read_store_resolved`` (VERDICT r11 #2 —
    cross-store generation consistency): serve every key present in
    the delta TAIL entirely from its newest tail batch, and every
    other key from the compacted base. Because the base is itself the
    fold of strictly OLDER batches, this equals
    ``fold_deltas(base UNION tail)`` row-for-row — but the window
    runs over the tail alone and the base pays one broadcast
    anti-join, so the resolved read costs ~|tail| extra, not |store|
    (the tail is bounded by ``compact_every`` batches). The q234
    mixed-generation twin calls THIS function so its oracle equality
    pins the exact resolution the serving read executes."""
    keys = tail.select(*key_cols).distinct()
    kept = base.join(F.broadcast(keys), key_cols, "left_anti")
    return kept.unionByName(latest_batch_per_key(tail, key_cols))


def read_store_resolved(
    spark: SparkSession,
    delta_dir: str,
    schema: str,
    base_dir: str | None,
    key_cols: list[str],
) -> DataFrame:
    """The SNAPSHOT-CONSISTENT serving read: read_store's base +
    newer-deltas union with upserts resolved latest-batch-per-key at
    read time. read_store serves a corrected key's old AND new rows
    between compactions (the documented interim state) — harmless for
    counts-over-log consumers, wrong for a serving search, and the
    reason two INDEPENDENTLY compacted stores could otherwise fuse
    into an answer matching no single point in time (one store's fold
    resolved a correction the other still double-serves). With this
    read, the served relation equals fold_deltas(full log) for ANY
    pair of per-store compaction points — generation-independence is
    what the injected-crash test and the q234 twin pin."""
    deltas = state.read_or_empty(spark, delta_dir, schema)
    entries = committed_entries(base_dir) if base_dir is not None else []
    if not entries:
        return latest_batch_per_key(deltas, key_cols)
    cover, _epoch, gdir = entries[-1]
    base = spark.read.schema(schema).parquet(gdir)
    return resolve_with_tail(
        base, deltas.where(F.col("batch_id") > cover), key_cols
    )


def compact_store(
    spark: SparkSession,
    delta_dir: str,
    base_dir: str,
    schema: str,
    key_cols: list[str],
    upto_batch_id: int | None = None,
    partition_by: list[str] | None = None,
    tombstones: DataFrame | None = None,
    id_col: str | None = None,
    fold_fn=None,
) -> int | None:
    """Fold delta partitions into a new compacted base generation.

    Crash-safe at every step (the vectors.py contract, now shared):
    base generations commit via Spark's _SUCCESS marker (partials are
    ignored and rmtree-replaced on re-run); reads ignore deltas <= the
    committed gen, so deleting folded deltas afterwards is pure
    cleanup; the previous base generation is retained one cycle by
    state.prune_snapshots' newest-prior protection. Returns the new
    committed generation (or the existing one if nothing folded).

    ``tombstones`` (optional 1-column id frame) composes physical
    erasure into the fold: because folding always rewrites the FULL
    base (previous generation unioned in), a tombstoned key is erased
    from the new base's bytes even if no delta touched it — after the
    old generation is pruned (one cycle later, or ``keep=1`` now on
    the next compact) the forgotten rows no longer exist on disk.
    ``fold_fn(df) -> df`` overrides the default latest-batch-per-key
    fold for stores with a cheaper equivalent (the vector index's
    single-row max_by).

    Erasure-only steady state (ADVICE r11): when ``tombstones`` is
    given but NO delta needs folding (the common case under in-stream
    ``compact_every`` — only the in-flight delta remains), the base is
    STILL rewritten, as a new committed generation at the SAME
    coverage with an incremented erasure epoch (``v=<cover>e<n>``).
    Skipping it silently would leave the 'physically erased' rows in
    the base bytes while returning the same gen as a successful
    erasure, and the documented erase-then-serve flow has no read-time
    tombstone filter to catch that. The epoch dir commits via
    _SUCCESS exactly like a fold — never an in-place overwrite of the
    only committed generation."""
    ids = delta_batch_ids(delta_dir)
    prev = committed_entries(base_dir)
    g_prev = prev[-1][0] if prev else None
    if upto_batch_id is None:
        upto_batch_id = max(ids) - 1 if ids else -1
    floor = g_prev if g_prev is not None else -1
    fold = [b for b in ids if floor < b <= upto_batch_id]
    if not fold:
        # still sweep deltas the base already covers: a crash between
        # a previous run's commit and its cleanup loop would otherwise
        # orphan them forever on an idle stream
        for b in ids:
            if b <= floor:
                shutil.rmtree(
                    os.path.join(delta_dir, f"batch_id={b}"),
                    ignore_errors=True,
                )
        if tombstones is None or not prev:
            return g_prev
        # erasure-only rewrite: same coverage, next epoch
        cover, epoch, gdir = prev[-1]
        base_prev = spark.read.schema(schema).parquet(gdir)
        tid = id_col or tombstones.columns[0]
        erased = base_prev.join(
            F.broadcast(tombstones.select(tid)), tid, "left_anti"
        )
        _write_gen(
            erased, os.path.join(base_dir, _gen_label(cover, epoch + 1)),
            partition_by,
        )
        _prune_gens(base_dir)
        return cover
    gen = max(fold)
    deltas = state.read_or_empty(spark, delta_dir, schema).where(
        (F.col("batch_id") > floor) & (F.col("batch_id") <= upto_batch_id)
    )
    merged = deltas
    if prev:
        base_prev = spark.read.schema(schema).parquet(prev[-1][2])
        merged = base_prev.unionByName(deltas)
    if fold_fn is not None:
        folded = fold_fn(merged)
        if tombstones is not None:
            tid = id_col or tombstones.columns[0]
            folded = folded.join(
                F.broadcast(tombstones.select(tid)), tid, "left_anti"
            )
    else:
        folded = fold_deltas(merged, key_cols, tombstones, id_col)
    _write_gen(
        folded, os.path.join(base_dir, _gen_label(gen, 0)), partition_by
    )
    _prune_gens(base_dir)
    # cleanup: folded deltas are no longer read (batch_id <= gen)
    for b in ids:
        if b <= gen:
            shutil.rmtree(
                os.path.join(delta_dir, f"batch_id={b}"), ignore_errors=True
            )
    return gen


def diff_states(
    prev: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    ignore_cols: tuple = ("batch_id",),
) -> DataFrame:
    """Exact multiset CONTENT diff between two store states — the
    pure core of ``generation_changes`` (the Delta/Iceberg
    change-data-feed shape re-expressed as one plan). Per key:

      * ``insert``  — key exists only in ``new``;
      * ``delete``  — key exists only in ``prev`` (tombstone erasure);
      * ``update``  — key in both but its row multiset differs;
      * unchanged keys are omitted entirely.

    No hashes and no engine-specific fingerprints: both sides are
    counted per FULL row (minus ``ignore_cols`` — batch_id by
    default, so a byte-identical redelivery is NOT an update), full-
    outer-joined on the row values, and a key is an update iff any
    row's multiplicity differs. Exact, order-free, and replayable on
    any engine — which is what lets the q239 twin be oracle-checked.
    Scale: one groupBy per side over the two generations + one
    equi-join on the row values + one per-key aggregation; never
    quadratic, no driver state."""
    cols = [c for c in new.columns if c not in ignore_cols]
    val_cols = [c for c in cols if c not in key_cols]
    pc = prev.select(cols).groupBy(cols).agg(
        F.count(F.lit(1)).alias("__np")
    )
    nc = new.select(cols).groupBy(cols).agg(F.count(F.lit(1)).alias("__nn"))
    j = pc.join(nc, cols, "full_outer").select(
        *key_cols,
        F.coalesce("__np", F.lit(0)).alias("__np"),
        F.coalesce("__nn", F.lit(0)).alias("__nn"),
    )
    per_key = j.groupBy(*key_cols).agg(
        F.sum("__np").cast("long").alias("rows_prev"),
        F.sum("__nn").cast("long").alias("rows_new"),
        F.sum(F.abs(F.col("__np") - F.col("__nn"))).cast("long").alias("__d"),
    )
    return (
        per_key.where(F.col("__d") > 0)
        .select(
            *key_cols,
            F.when(F.col("rows_new") == 0, F.lit("delete"))
            .when(F.col("rows_prev") == 0, F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("change"),
            "rows_prev",
            "rows_new",
        )
    )


def diff_rows(
    prev: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    ignore_cols: tuple = ("batch_id",),
) -> DataFrame:
    """Signed ROW deltas between two store states — diff_states'
    algebraic sibling: every row whose multiplicity changed, with
    ``delta`` = new count minus prev count (never 0). This is the
    feed INCREMENTAL VIEW MAINTENANCE consumes: any additive
    downstream aggregate (count/sum family — df, dl, token totals,
    source mixes) updates as ``agg += f(row) * delta`` without
    rescanning either generation's unchanged rows (q244 pins
    maintained == recomputed). Same exact full-outer multiset
    machinery as diff_states; ``key_cols`` only documents the store's
    key — the delta is per full row."""
    cols = [c for c in new.columns if c not in ignore_cols]
    pc = prev.select(cols).groupBy(cols).agg(
        F.count(F.lit(1)).alias("__np")
    )
    nc = new.select(cols).groupBy(cols).agg(F.count(F.lit(1)).alias("__nn"))
    return (
        pc.join(nc, cols, "full_outer")
        .select(
            *cols,
            (
                F.coalesce("__nn", F.lit(0)) - F.coalesce("__np", F.lit(0))
            )
            .cast("long")
            .alias("delta"),
        )
        .where(F.col("delta") != 0)
    )


def generation_change_rows(
    spark: SparkSession,
    base_dir: str,
    schema: str,
    key_cols: list[str],
) -> DataFrame:
    """diff_rows over the two retained committed generations — the
    row-level change feed of the last compaction (see
    generation_changes for the per-key classification and the
    <2-generations refusal, shared here)."""
    entries = committed_entries(base_dir)
    if len(entries) < 2:
        raise ValueError(
            f"generation_change_rows: {base_dir!r} holds "
            f"{len(entries)} committed generation(s); the change feed "
            "needs the serving generation AND its retained predecessor"
        )
    prev = spark.read.schema(schema).parquet(entries[-2][2])
    new = spark.read.schema(schema).parquet(entries[-1][2])
    return diff_rows(prev, new, key_cols)


def generation_changes(
    spark: SparkSession,
    base_dir: str,
    schema: str,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-feed between the two retained committed
    generations of a compacted store (state.prune keeps exactly the
    serving generation and its predecessor one cycle — this read is
    why that retention is useful beyond crash recovery): what did the
    last compaction change? Returns diff_states(previous, newest).
    Raises if fewer than two committed generations exist — a CDF over
    nothing would silently read as 'no changes'."""
    entries = committed_entries(base_dir)
    if len(entries) < 2:
        raise ValueError(
            f"generation_changes: {base_dir!r} holds "
            f"{len(entries)} committed generation(s); the change feed "
            "needs the serving generation AND its retained predecessor "
            "(run at least two compactions, and read before the next "
            "prune cycle)"
        )
    prev = spark.read.schema(schema).parquet(entries[-2][2])
    new = spark.read.schema(schema).parquet(entries[-1][2])
    return diff_states(prev, new, key_cols)


def _write_gen(df: DataFrame, gdir: str, partition_by=None) -> None:
    """Write one generation dir, fully replacing any partial earlier
    attempt of the same (cover, epoch) — the state.write_version
    contract, addressed by path because erasure-epoch dir names fall
    outside state.py's plain v=<int> namespace."""
    if partition_by and os.path.isdir(gdir):
        shutil.rmtree(gdir)
    if partition_by:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(gdir)
    else:
        df.write.mode("overwrite").parquet(gdir)


def _prune_gens(base_dir: str) -> None:
    """Generation retention (the state.prune_snapshots keep=1
    semantics, epoch-aware): keep the two newest COMMITTED generations
    — the serving one plus its predecessor for one cycle (the
    redelivery-input protection) — and delete everything else,
    including markerless partials from crashed writes (never read,
    single-writer)."""
    committed = committed_entries(base_dir)
    keep_paths = {e[2] for e in committed[-2:]}
    for _cover, _epoch, p in gen_entries(base_dir):
        if p not in keep_paths:
            shutil.rmtree(p, ignore_errors=True)


__all__ = [
    "delta_batch_ids",
    "gen_entries",
    "committed_entries",
    "committed_gen",
    "committed_gen_dir",
    "latest_batch_per_key",
    "fold_deltas",
    "resolve_with_tail",
    "diff_states",
    "diff_rows",
    "generation_changes",
    "generation_change_rows",
    "read_store",
    "read_store_resolved",
    "compact_store",
]
