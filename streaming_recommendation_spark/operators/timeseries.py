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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    (last-observation-carried-forward).

    Returns (key, bucket_start, value, is_observed):
      * ``bucket_start``: BIGINT epoch seconds, left-closed bucket
        edge (integer arithmetic end to end — a TIMESTAMP output
        would hang cross-engine parity on timezone dtype quirks);
      * ``value``: the bucket's last observation, or the carried one;
      * ``is_observed``: False on carried rows.

    Per-bucket "last" = max over struct(ts, value): latest timestamp
    wins, duplicate timestamps break on the larger value — a total
    order, deterministic under any partitioning.

    Scale shape: one groupBy(key, bucket) shuffle reduces the raw
    events to <= one row per bucket BEFORE any grid materializes
    (map-side partial aggregation collapses hot buckets early); the
    grid generates JVM-side per key (``sequence`` + explode — its
    size is the key's time span over ``bucket_seconds``, independent
    of event count); the fill is one per-key window running
    ``last(ignorenulls)`` over the grid, never a self-join. All
    shuffles key on ``key_col``. Grid size is the one lever to watch:
    span/bucket_seconds rows per key — pick the bucket so the DENSE
    series, not the event count, fits the downstream budget (the
    dense output is the product; if it is too big, the bucket is too
    fine).
    """
    # unix_timestamp truncates to whole epoch seconds (session TZ is
    # pinned UTC) — the NTZ-safe conversion; oracles must mirror it
    # as floor(epoch(ts))
    sec = F.unix_timestamp(F.col(ts_col))
    bucket = (sec - F.pmod(sec, F.lit(bucket_seconds))).alias("bucket_start")
    obs = (
        df.select(F.col(key_col), bucket, F.col(ts_col), F.col(value_col))
        .groupBy(key_col, "bucket_start")
        .agg(
            F.max(F.struct(F.col(ts_col), F.col(value_col))).alias("__last")
        )
        .select(
            key_col,
            "bucket_start",
            F.col(f"__last.{value_col}").alias("__obs_value"),
        )
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket_start").alias("__mn"), F.max("bucket_start").alias("__mx")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(bucket_seconds))
        ).alias("bucket_start"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "bucket_start"], "left")
        .select(
            key_col,
            "bucket_start",
            F.last("__obs_value", ignorenulls=True).over(w).alias("value"),
            F.col("__obs_value").isNotNull().alias("is_observed"),
        )
    )


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

    Returns (key, bucket, value, n_window, moving_sum_cents,
    moving_avg, moving_max). Scale: one per-key window pass over the
    dense series — no self-join; the window state is O(window_rows).
    """
    cents = F.round(F.col(value_col) * cents_scale, 0).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    return dense.select(
        key_col,
        bucket_col,
        value_col,
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(cents).over(w).alias("moving_sum_cents"),
        F.round(
            F.sum(cents).over(w) / (F.lit(cents_scale) * F.count(F.lit(1)).over(w)),
            6,
        ).alias("moving_avg"),
        F.max(value_col).over(w).alias("moving_max"),
    )
