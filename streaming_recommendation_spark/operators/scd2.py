"""SCD2 dimension maintenance: batch interval build + an INCREMENTAL
merge step for continuous CDC ingest (the warehouse slowly-changing-
dimension pattern, streamed).

``scd2_intervals`` is the batch builder behind q121 (gaps-and-
islands: collapse each key's consecutive same-value runs into
[valid_from, valid_to) rows, valid_to NULL = current). The streaming
question is: when change records arrive in batches, can the interval
table be maintained WITHOUT re-reading history? Yes — closed
intervals are immutable (a run only ends because a different value
followed; everything later is newer), so a new batch can only
  * extend a key's OPEN run (same value, run keeps its valid_from),
  * close it (different value => valid_to = the new run's start), and
  * append new runs.
``scd2_apply_batch`` does exactly that as a pure DataFrame plan over
(state, batch): each affected key's open interval becomes a weighted
pseudo-row (weight = its n_events) that is re-islanded together with
the batch rows; closed intervals and unaffected keys pass through
untouched. Cost per batch ~ |batch| + |affected open intervals|,
never ~ |history|.

IN-ORDER CONTRACT (enforced, not assumed): the open interval carries
(last_ts, last_event_id) — the max processed order key of its run —
and the merge RAISES map-side on any batch row at or before that
point for its key. Compressing a run into one pseudo-row forgets the
individual rows, so a late row landing inside an already-processed
run cannot be merged correctly; failing loudly beats silently
mis-counting (same contract style as connected_components'
non-convergence). Late data belongs upstream in a watermarked
reorder buffer (streaming/pipeline.py's watermark + dedup stage).

State columns = output columns + (last_ts, last_event_id);
``scd2_finalize`` drops the bookkeeping pair.

Merge-equivalence (incremental == full rebuild on ordered arrivals)
is oracle-checked by q134 against q121's SQL verbatim, and the
disk-backed pipeline (streaming/scd2.py) is pinned against the batch
builder across a multi-batch carry in tests/test_streaming_scd2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_EXTRAS = ["last_ts", "last_event_id"]


def _islands(
    rows: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """(key, value, valid_from, first_event_id, n_events, last_ts,
    last_event_id) runs of consecutive equal values per key, ordered
    by (ts, id). ``weight_col`` lets a pseudo-row stand for an
    already-compressed run."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    weight = F.col(weight_col) if weight_col else F.lit(1)
    marked = rows.withColumn(
        "__new_run",
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "__run",
        F.sum("__new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy(key_col, value_col, "__run").agg(
        F.min(ts_col).alias("valid_from"),
        F.min(id_col).alias("first_event_id"),
        F.sum(weight).alias("n_events"),
        # the run's processed frontier under the (ts, id) ORDER KEY:
        # max_by, not max(id) — with ids not monotone in ts, max(id)
        # would overstate the frontier and reject valid next rows
        F.max(ts_col).alias("last_ts"),
        F.expr(
            f"max_by({id_col}, struct({ts_col}, {id_col}))"
        ).alias("last_event_id"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch SCD2 build (q121 semantics) WITH the incremental-state
    bookkeeping columns; ``scd2_finalize`` strips them."""
    runs = _islands(df, key_col, value_col, ts_col, id_col)
    w = Window.partitionBy(key_col).orderBy("valid_from", "first_event_id")
    return runs.select(
        key_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        "first_event_id",
        "n_events",
        "last_ts",
        "last_event_id",
    )


def scd2_finalize(state: DataFrame) -> DataFrame:
    return state.drop(*STATE_EXTRAS)


def scd2_apply_batch(
    state: DataFrame,
    batch: DataFrame,
    key_col: str = "user_id",
    value_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Merge one batch of change records into an SCD2 state table
    (both in ``scd2_intervals`` column shape) — returns the new
    state. Pure plan, no side effects."""
    # LINEAGE DISCIPLINE: this function unavoidably combines state
    # rows with state-derived rebuilt rows, and an earlier version
    # that ALSO unioned a pseudo-row branch with a batch branch that
    # JOINED that same pseudo lineage (for the order guard) produced
    # a miscompiled composite plan — each branch evaluated correctly
    # alone, but the single-action union dropped the pseudo rows and
    # resurrected unfiltered state rows (caught by the randomized
    # split fuzz in tests/test_streaming_scd2.py). The structure
    # below keeps every state consumer a SINGLE linear pass:
    # `untouched` is one flag-join filter (no self-union), and the
    # order-guard frontier rides the union as columns instead of a
    # join back into the pseudo branch.
    keys = batch.select(key_col).distinct()
    hit = keys.withColumn("__hit", F.lit(True))
    untouched = (
        state.join(hit, key_col, "left")
        .where(~(F.col("__hit").isNotNull() & F.col("valid_to").isNull()))
        .drop("__hit")
    )
    ts_type = dict(batch.dtypes)[ts_col]
    id_type = dict(batch.dtypes)[id_col]
    # the open run, compressed to one weighted pseudo-row; its
    # processed frontier travels as (__f_ts, __f_id)
    pseudo = (
        state.join(keys, key_col, "left_semi")
        .where(F.col("valid_to").isNull())
        .select(
            key_col,
            F.col(value_col),
            F.col("valid_from").alias(ts_col),
            F.col("first_event_id").alias(id_col),
            F.col("n_events").alias("__w"),
            F.col("last_ts").alias("__f_ts"),
            F.col("last_event_id").alias("__f_id"),
        )
    )
    batch_rows = batch.select(
        key_col,
        value_col,
        ts_col,
        id_col,
        F.lit(1).cast("bigint").alias("__w"),
        F.lit(None).cast(ts_type).alias("__f_ts"),
        F.lit(None).cast(id_type).alias("__f_id"),
    )
    unioned = pseudo.unionByName(batch_rows)
    # ORDER GUARD: per key there is at most ONE pseudo row, so the
    # key-window max recovers its frontier on every row; a batch row
    # at or before that frontier cannot be merged into a compressed
    # run — raise on the executor rather than mis-count (see module
    # docstring). The window shares the island windows' key shuffle.
    wk = Window.partitionBy(key_col)
    combined = (
        unioned.withColumn("__fr_ts", F.max("__f_ts").over(wk))
        .withColumn("__fr_id", F.max("__f_id").over(wk))
        .withColumn(
            "__ok",
            F.when(
                F.col("__f_ts").isNull()  # batch rows only
                & F.col("__fr_ts").isNotNull()
                & (
                    (F.col(ts_col) < F.col("__fr_ts"))
                    | (
                        (F.col(ts_col) == F.col("__fr_ts"))
                        & (F.col(id_col) <= F.col("__fr_id"))
                    )
                ),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "scd2_apply_batch: out-of-order change record "
                            f"for {key_col}="
                        ),
                        F.col(key_col).cast("string"),
                        F.lit(" at or before the processed frontier; "
                              "reorder/watermark upstream"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True)),
        )
        .where(F.col("__ok"))
        .select(key_col, value_col, ts_col, id_col, "__w")
    )
    rebuilt = _islands(combined, key_col, value_col, ts_col, id_col, "__w")
    w = Window.partitionBy(key_col).orderBy("valid_from", "first_event_id")
    rebuilt_iv = rebuilt.select(
        key_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        "first_event_id",
        "n_events",
        "last_ts",
        "last_event_id",
    )
    return untouched.unionByName(rebuilt_iv)
