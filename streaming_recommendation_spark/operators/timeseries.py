"""Time-series resampling: irregular event streams onto fixed grids.

The registry's time-series legs cover aggregation on event time
(tumbling q21 / sliding q41 / session q108 windows), decay (EWMA
q100, exact-dyadic q127), and naive forecasting (q123) — all of which
DROP the irregular timeline and keep only buckets with data. What a
hypertable-style engine (TimescaleDB ``time_bucket_gapfill`` +
``locf``, InfluxDB ``fill(previous)``) adds is the DENSE grid:
every bucket between a series' first and last observation exists,
carrying the last observed value forward. That dense form is what
downstream consumers need — ML feature matrices join on bucket keys
(a missing row silently drops a training example where a carried one
was meant), and dashboards/anomaly detectors read gaps as zeros
unless filled.

Determinism policy: bucket edges are integer epoch-second arithmetic
(truncating division); the "last observation in a bucket" is a
struct-max over (ts, value) — a total order, so duplicate timestamps
break ties on value instead of partition order; carried values are
COPIED doubles (never summed/combined), so no float-reassociation
hazard exists anywhere and a SQL oracle replays the fill exactly.

Factored as bucket_last_obs -> (merge_obs)* -> locf_fill so the
streaming continuous aggregate (streaming/timeseries.py) replays the
IDENTICAL operators per batch: struct-max is commutative, associative
and idempotent, so incremental max-merge over any batch split — in
any arrival order, with any redelivery — equals the one-shot batch
computation. (Contrast streaming/itemcf.py, whose capped windows are
order-sensitive and need a frontier guard; a pure max-merge needs
none.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_last_obs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """(key, bucket_start, ts_us, value): each key-bucket's LAST
    observation — max over struct(ts, value), a total order (latest
    timestamp wins; duplicate timestamps break on the larger value),
    deterministic under any partitioning. ``bucket_start`` is BIGINT
    epoch seconds (left-closed edge); ``ts_us`` is the winning
    observation's epoch microseconds, kept so later ``merge_obs``
    calls resolve against it exactly. One groupBy(key, bucket)
    shuffle with map-side partial aggregation — raw events reduce to
    <= 1 row per bucket before anything downstream materializes."""
    # unix_timestamp truncates to whole epoch seconds (session TZ is
    # pinned UTC) — the NTZ-safe conversion; oracles must mirror it
    # as floor(epoch(ts))
    ts = F.col(ts_col).cast("timestamp")
    sec = F.unix_timestamp(ts)
    bucket = (sec - F.pmod(sec, F.lit(bucket_seconds))).alias("bucket_start")
    return (
        df.select(
            F.col(key_col),
            bucket,
            F.unix_micros(ts).alias("__ts_us"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key_col, "bucket_start")
        .agg(F.max(F.struct(F.col("__ts_us"), F.col("__v"))).alias("__last"))
        .select(
            key_col,
            "bucket_start",
            F.col("__last.__ts_us").alias("ts_us"),
            F.col("__last.__v").alias(value_col),
        )
    )


def merge_obs(
    a: DataFrame, b: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Fold two ``bucket_last_obs`` relations: per (key, bucket) the
    struct-max over (ts_us, value) wins. Commutative, associative,
    idempotent — so ANY batch split, arrival order, or redelivery
    folds to the same state as the one-shot computation (this is the
    exactness claim the q155 twin pins)."""
    return (
        a.unionByName(b)
        .groupBy(key_col, "bucket_start")
        .agg(
            F.max(
                F.struct(F.col("ts_us"), F.col(value_col).alias("__v"))
            ).alias("__last")
        )
        .select(
            key_col,
            "bucket_start",
            F.col("__last.ts_us").alias("ts_us"),
            F.col("__last.__v").alias(value_col),
        )
    )


def locf_fill(
    obs: DataFrame,
    key_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Dense grid + fill over a ``bucket_last_obs`` relation: every
    bucket between each key's first and last observed bucket exists,
    empty buckets carry the last observed value forward. Returns
    (key, bucket_start, value, is_observed).

    HARD PRECONDITION (ADVICE r12): ``obs`` must hold AT MOST ONE row
    per (key, bucket_start) — the ``bucket_last_obs`` / ``merge_obs``
    contract. A duplicate bucket makes ``lead`` return the tied
    bucket itself and the run explode raises an illegal-sequence-
    boundaries error at runtime (loud, not silent; the previous
    grid-join shape emitted silently duplicated rows instead). Dedup
    upstream with ``merge_obs`` if your source can repeat buckets.

    Scale shape (OPTIMIZATION_r12): ONE per-key window over the
    SPARSE observations (``lead`` finds each observation's successor
    bucket), then the dense grid generates map-side — each
    observation explodes into the buckets of its own run
    [bucket, next_bucket), carrying its value, so the DENSE rows
    never cross an exchange (the previous span-aggregate +
    grid/observation equi-join shuffled the dense grid twice). The
    residual ``last(ignorenulls)`` window only matters when observed
    values are themselves NULL (a null-valued observation must not
    terminate the carry of the previous non-null value); it shares
    the lead window's per-key partitioning, so downstream per-key
    windows (rolling_stats / rolling_anomalies) add sorts, not
    shuffles. Grid size is the one lever to watch:
    span/bucket_seconds rows per key — pick the bucket so the DENSE
    series, not the event count, fits the downstream budget (the
    dense output is the product; if it is too big, the bucket is too
    fine)."""
    o = obs.select(
        key_col, "bucket_start", F.col(value_col).alias("__obs_value")
    )
    w = Window.partitionBy(key_col).orderBy("bucket_start")
    runs = o.withColumn("__next", F.lead("bucket_start").over(w))
    dense = runs.select(
        key_col,
        "__obs_value",
        F.col("bucket_start").alias("__ob"),
        F.explode(
            F.sequence(
                F.col("bucket_start"),
                F.coalesce(
                    F.col("__next") - bucket_seconds, F.col("bucket_start")
                ),
                F.lit(bucket_seconds),
            )
        ).alias("bucket_start"),
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_obs = F.col("bucket_start") == F.col("__ob")
    return dense.select(
        key_col,
        "bucket_start",
        F.last(
            F.when(at_obs, F.col("__obs_value")), ignorenulls=True
        ).over(wf).alias(value_col),
        (at_obs & F.col("__obs_value").isNotNull()).alias("is_observed"),
    )


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Resample each key's irregular series onto a dense
    ``bucket_seconds`` grid spanning [first, last] observed bucket,
    filling empty buckets with the last observed value
    (last-observation-carried-forward). The one-shot composition of
    ``bucket_last_obs`` + ``locf_fill`` (see those for semantics and
    scale shape); ``value`` is named after ``value_col`` == "value"
    callers' convention: output columns are (key, bucket_start,
    value, is_observed) with ``value_col``'s name preserved."""
    obs = bucket_last_obs(df, key_col, ts_col, value_col, bucket_seconds)
    return locf_fill(obs, key_col, value_col, bucket_seconds)


def rolling_stats(
    dense: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    window_rows: int = 24,
    cents_scale: int = 100,
) -> DataFrame:
    """Trailing-window statistics over a DENSE series (gap_fill_locf
    output): for each row, the moving sum/average/max of the last
    ``window_rows`` rows (inclusive). Run on the dense grid, a
    row-window IS a time-window (24 rows == 24 hours) — the reason
    gap filling precedes rolling features: on the raw sparse buckets
    the same frame silently spans however long 24 observations took.

    Exactness — the sliding-sum trap: engines disagree on the
    ASSOCIATION ORDER of sliding-window float sums (Spark evaluates
    frames incrementally; DuckDB aggregates subtrees of a segment
    tree), so a double `sum` can differ in ULPs between engines even
    on identical inputs. The moving sum therefore runs on integer
    "cents" (round(value * cents_scale) as int64 — integer addition
    is associative) and the average is ONE division of that exact
    sum; `max` is order-free and stays on the raw doubles.

    Execution shape (OPTIMIZATION_r12): Spark has no retractable
    aggregates, so a bounded sliding SUM frame re-aggregates its whole
    buffer on every slide — O(rows x window_rows) per key. The moving
    sum/count are therefore cumulative sums differenced with ``lag``
    (exact int64 subtraction, identical values, O(rows)); only the
    non-invertible ``max`` keeps the sliding frame. All frames share
    the per-key sort, so the rewrite is the same single window pass.

    Returns (key, bucket, value, n_window, moving_sum_cents,
    moving_avg, moving_max). Scale: one per-key window pass over the
    dense series — no self-join; the window state is O(window_rows).
    """
    cents = F.round(F.col(value_col) * cents_scale, 0).cast("long")
    wo = Window.partitionBy(key_col).orderBy(bucket_col)
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmax = wo.rowsBetween(-(window_rows - 1), Window.currentRow)
    staged = dense.select(
        key_col,
        bucket_col,
        value_col,
        F.sum(cents).over(wcum).alias("__cum"),
        F.row_number().over(wo).alias("__rn"),
        F.max(value_col).over(wmax).alias("__mmax"),
    )
    msum = F.col("__cum") - F.coalesce(
        F.lag("__cum", window_rows).over(wo), F.lit(0)
    )
    n = F.least(F.col("__rn"), F.lit(window_rows)).cast("long")
    return staged.select(
        key_col,
        bucket_col,
        value_col,
        n.alias("n_window"),
        msum.alias("moving_sum_cents"),
        F.round(msum / (F.lit(cents_scale) * n), 6).alias("moving_avg"),
        F.col("__mmax").alias("moving_max"),
    )


def rolling_anomalies(
    dense: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    window_rows: int = 24,
    k_sigma: int = 2,
    min_baseline: int = 12,
    cents_scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly flags over a DENSE series (gap_fill_locf
    output): a point is anomalous when it deviates more than
    ``k_sigma`` standard deviations from the STRICTLY PRECEDING
    ``window_rows``-row window (the point never contaminates its own
    baseline — frame [-window, -1]). Points with fewer than
    ``min_baseline`` preceding rows are never flagged (cold start).

    Exactness — no sqrt, no float variance: with integer cents
    c = round(value * cents_scale), baseline sums s1 = sum(c),
    s2 = sum(c^2) over n rows, the test |c - mean| > k * std is
    cross-multiplied into the INTEGER comparison

        (n*c - s1)^2  >  k^2 * (n*s2 - s1^2)

    (both sides scaled by n^2; var >= 0 by Cauchy-Schwarz). Every
    operand is an exact int64, so engines agree bit-for-bit — the
    sqrt that makes naive z-scores irrational never happens. A
    zero-variance baseline flags ANY deviation (strict >), which is
    exactly right on LOCF-carried flats.

    Execution shape (OPTIMIZATION_r12): Spark has no retractable
    aggregates, so the bounded [-window, -1] SUM frames re-aggregate
    the whole buffer on every slide — O(rows x window) per key. The
    baseline sums are therefore cumulative sums differenced with
    ``lag`` (s over [-W, -1] = cum[-1] - cum[-(W+1)], exact int64
    subtraction, identical values, O(rows)); the baseline count is
    least(row_number - 1, W). All frames share the per-key sort, so
    this is still one window pass.

    Returns (key, bucket, value, n_baseline, is_anomaly). Scale: one
    per-key window pass over the dense series, O(window) state, no
    self-join — composes with rolling_stats on the same sort."""
    c = F.round(F.col(value_col) * cents_scale, 0).cast("long")
    wo = Window.partitionBy(key_col).orderBy(bucket_col)
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = dense.select(
        key_col,
        bucket_col,
        value_col,
        c.alias("__c"),
        F.sum(c).over(wcum).alias("__cum1"),
        F.sum(c * c).over(wcum).alias("__cum2"),
        # cumulative NON-NULL count (ADVICE r12): the sliding-frame
        # semantics this rewrite replaced produced a NULL frame-sum
        # (=> never anomalous) when every baseline value was NULL;
        # the coalesce'd cum/lag differences read 0 there instead and
        # would flag the first non-null row. Tracking the windowed
        # non-null count restores the old behavior exactly.
        F.sum(F.when(c.isNotNull(), F.lit(1)).otherwise(F.lit(0)))
        .over(wcum)
        .alias("__cumn"),
        F.row_number().over(wo).alias("__rn"),
    )
    s1 = F.coalesce(F.lag("__cum1", 1).over(wo), F.lit(0)) - F.coalesce(
        F.lag("__cum1", window_rows + 1).over(wo), F.lit(0)
    )
    s2 = F.coalesce(F.lag("__cum2", 1).over(wo), F.lit(0)) - F.coalesce(
        F.lag("__cum2", window_rows + 1).over(wo), F.lit(0)
    )
    nn = F.coalesce(F.lag("__cumn", 1).over(wo), F.lit(0)) - F.coalesce(
        F.lag("__cumn", window_rows + 1).over(wo), F.lit(0)
    )
    # rows in the strictly-preceding frame: all prior rows, capped at W
    n = F.least(F.col("__rn") - 1, F.lit(window_rows)).cast("long")
    dev = n * F.col("__c") - s1
    var_n2 = n * s2 - s1 * s1
    return staged.select(
        key_col,
        bucket_col,
        value_col,
        n.alias("n_baseline"),
        F.when(
            (n >= min_baseline)
            & (nn > 0)
            & (dev * dev > F.lit(k_sigma * k_sigma) * var_n2),
            F.lit(True),
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
