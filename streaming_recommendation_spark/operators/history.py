"""Per-user history operators (SURVEY §2.4 A1, §2.5 W2-W4).

The reference builds per-user time-sorted histories by loading a whole
CSV into a defaultdict and sorting per user (reference:
api_service/behavior_lookup.py:17-29; data_processing/
generate_training_data.py:84-108), truncates to the most recent 50
(behavior_lookup.py:40), and generates training samples by sliding a
stride-2 prefix window over each history
(generate_training_data.py:163-178).

Spark-first shapes:
  * collect_history — one groupBy + sort_array(collect_list(struct)):
    a single shuffle on user_id; the sort is per-group, in-memory,
    spill-safe.
  * last_n_events — row_number over a user window; Spark >= 3.5
    rewrites rank<=k filters to WindowGroupLimit (per-partition top-k
    heaps), so no full per-user sort materializes.
  * sliding_window_samples — posexplode over the collected history:
    the "growing prefix" frame expressed as array slices, one shuffle
    total, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tail_slice(arr: Column, n: int) -> Column:
    """Last n elements, order preserved. (A bare slice(arr, -n, n)
    returns EMPTY when the array is shorter than n — Spark treats the
    out-of-range negative start as no-match.)"""
    return F.when(F.size(arr) <= n, arr).otherwise(F.slice(arr, -n, n))


def collect_history(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "item_id",
    max_len: int | None = None,
) -> DataFrame:
    """user -> chronologically sorted [(ts, item), ...] (A1/W2/W3).

    Ties on ts break by item value ascending (deterministic; the
    reference inherits file order, documented divergence).
    Returns (user_col, history: array<struct<ts,item>>).
    """
    collected = df.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(item_col).alias("item")))
        ).alias("history")
    )
    if max_len is not None:
        # keep the most recent max_len, preserving chronological order
        collected = collected.withColumn(
            "history", tail_slice(F.col("history"), max_len)
        )
    return collected


def last_n_events(
    df: DataFrame,
    n: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Most recent n rows per user (W3), deterministic tie-break."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(user_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def sliding_window_samples(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "item_id",
    start: int = 1,
    stride: int = 2,
    max_history: int = 50,
    strategy: str = "array",
    truncate: int | None = None,
    active_start: int | None = None,
) -> DataFrame:
    """W4: stride-S prefix-window training samples.

    For each user's chronological item sequence h[0..L-1], emit one
    sample per position p in {start, start+stride, ...}: the prefix
    h[0..p-1] (tail-truncated to max_history) as history and h[p] as
    the positive candidate. Mirrors generate_training_data.py:163-178
    (start index 1, stride 2, history cap 50).

    Reference-parity knobs (generate_training_data.py:139-162):
      truncate     — keep only each user's LAST `truncate` events
                     BEFORE windowing (the reference truncates to
                     max_history_len first, so heavy users emit
                     windows over the truncated tail only).
      active_start — users whose ORIGINAL (pre-truncation) event
                     count >= active_start begin the window at index
                     active_start (the reference's min_history_len=10
                     for high-activity users); lighter users keep
                     `start`. None = `start` for everyone.

    Returns (user, history: array, candidate, pos).

    strategy:
      "array"  — collect each user's items once, posexplode (one
                 shuffle; per-user array bounded by 5-core-style
                 activity).
      "window" — whale-safe: a sliding collect_list frame of at most
                 `max_history` rows per output row; no full-history
                 array ever materializes, so a user with 10^6 events
                 costs memory O(max_history) per row instead of
                 O(user_events). Same output, same single shuffle
                 (the truncate/active_start windows share the
                 partition key, so Catalyst adds sorts, not
                 exchanges).
    """

    def start_expr(cnt_col):
        if active_start is None:
            return F.lit(start)
        return F.when(cnt_col >= active_start, F.lit(active_start)).otherwise(
            F.lit(start)
        )

    if strategy == "window":
        order = [F.col(ts_col).asc(), F.col(item_col).asc()]
        pre = df
        if truncate is not None or active_start is not None:
            w_cnt = Window.partitionBy(user_col)
            pre = pre.withColumn("__cnt", F.count(F.lit(1)).over(w_cnt))
        if truncate is not None:
            w_desc = Window.partitionBy(user_col).orderBy(
                F.col(ts_col).desc(), F.col(item_col).desc()
            )
            pre = pre.withColumn("__rdesc", F.row_number().over(w_desc)).where(
                F.col("__rdesc") <= truncate
            ).drop("__rdesc")
        w_pos = Window.partitionBy(user_col).orderBy(*order)
        w_hist = w_pos.rowsBetween(-max_history, -1)
        st = start_expr(F.col("__cnt")) if active_start is not None else F.lit(start)
        return (
            pre.select(
                F.col(user_col),
                F.col(item_col).alias("candidate"),
                (F.row_number().over(w_pos) - 1).alias("pos"),
                F.collect_list(F.col(item_col)).over(w_hist).alias("history"),
                st.alias("__start"),
            )
            .where(
                (F.col("pos") >= F.col("__start"))
                & ((F.col("pos") - F.col("__start")) % stride == 0)
            )
            .select(user_col, "history", "candidate", "pos")
        )

    hist = collect_history(df, user_col, ts_col, item_col)
    items = hist.select(
        F.col(user_col),
        F.transform("history", lambda s: s["item"]).alias("__items"),
    )
    items = items.withColumn("__cnt", F.size("__items"))
    if truncate is not None:
        items = items.withColumn("__items", tail_slice(F.col("__items"), truncate))
    exploded = items.select(
        F.col(user_col),
        F.col("__items"),
        start_expr(F.col("__cnt")).alias("__start"),
        F.posexplode("__items").alias("pos", "candidate"),
    )
    return (
        exploded.where(
            (F.col("pos") >= F.col("__start"))
            & ((F.col("pos") - F.col("__start")) % stride == 0)
        )
        .select(
            F.col(user_col),
            tail_slice(F.slice("__items", 1, F.col("pos")), max_history).alias(
                "history"
            ),
            F.col("candidate"),
            F.col("pos"),
        )
    )


def session_sequences(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session ordered item sequences — the training corpus for
    session-based recommenders (GRU4Rec/SASRec-style next-item data),
    and the sequence form of q20's session COUNTS: events split into
    sessions at inactivity gaps > ``gap_seconds``, each session's
    items pipe-joined in (ts, tiebreak) order — a TOTAL order, so
    duplicate timestamps are deterministic. Returns (user, session_idx,
    n_events, start_us, seq) with session_idx numbering each user's
    sessions chronologically from 1.

    Scale shape: ONE shuffle by user drives everything — the lag +
    running-sum session numbering and the (user, session_idx)
    aggregation all share the user partitioning; sequences build as
    sorted struct arrays groupBy-side (bounded by session length, the
    same bounded-array discipline as collect_history). Session LENGTH
    is the lever to watch: a bot with one endless session makes one
    fat row — cap upstream with last_n_events-style truncation if the
    source allows it."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    marked = df.withColumn(
        "__new",
        F.when(
            F.lag(us).over(w).isNull()
            | (us - F.lag(us).over(w) > F.lit(int(gap_seconds) * 1_000_000)),
            1,
        ).otherwise(0),
    ).withColumn(
        "__sid",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy(user_col, F.col("__sid").alias("session_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("start_us"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                us.alias("us"),
                                F.col(tiebreak_col).alias("tb"),
                                F.col(item_col).alias("it"),
                            )
                        )
                    ),
                    lambda s: s["it"],
                ),
                "|",
            ).alias("seq"),
        )
        .select(user_col, "session_idx", "n_events", "start_us", "seq")
    )
