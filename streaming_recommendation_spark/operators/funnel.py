"""Event-sequence analytics: conversion funnels, cohort retention,
and Markov transition matrices over an event log — the product-
analytics reads (Amplitude/Mixpanel-style) a recommendation pipeline
runs next to its training-data ETL: the funnel tells you WHERE users
drop out of view->click->purchase, retention tells you whether they
come back, and the transition matrix is the first-order behavior
model session-based recommenders start from.

Funnel semantics — "strict order of firsts": a user reaches stage k
iff every stage 1..k has occurred, each stage's FIRST occurrence is
no earlier than the previous stage's first occurrence, and each
consecutive gap is within ``step_window_seconds`` (inclusive). This
is the classic product-analytics definition and it is deliberately a
function of the per-(user, stage) MINIMUM timestamp only — which
makes the maintained state mergeable: elementwise min is commutative,
associative and idempotent, so the streaming twin
(streaming/funnel.py) folds batches in ANY order with ANY redelivery
and reads the identical funnel (same structural argument as the
continuous aggregate's struct-max, operators/timeseries.py). A
subtler "re-entrant" funnel (any view followed by any later click)
depends on full event history and is NOT expressible over bounded
per-user state; the order-of-firsts form is the one that scales.

Determinism policy: timestamps compare as integer epoch microseconds;
stage/user counts are exact int64; every ratio (conversion,
transition probability) is ONE IEEE division of two exact integers —
no float accumulation anywhere, so a SQL oracle replays every value
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stage_firsts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, stage_idx, first_us): the earliest occurrence of each
    funnel stage per user, as epoch microseconds. ``stages[i]`` maps
    to ``stage_idx`` i+1; non-stage events drop at the scan. One
    groupBy(user, stage_idx) min — map-side partial aggregation
    reduces each partition to <= |stages| rows per user before the
    shuffle. This relation is the funnel's ENTIRE state: elementwise
    min-mergeable (see module docstring), which is what the streaming
    twin maintains incrementally."""
    idx = F.lit(None).cast("int")
    for i, s in enumerate(reversed(stages)):
        idx = F.when(F.col(type_col) == s, F.lit(len(stages) - i)).otherwise(idx)
    return (
        events.select(
            F.col(user_col),
            idx.alias("stage_idx"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        )
        .where(F.col("stage_idx").isNotNull())
        .groupBy(user_col, "stage_idx")
        .agg(F.min("__us").alias("first_us"))
    )


def merge_firsts(a: DataFrame, b: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Fold two ``stage_firsts`` relations: per (user, stage) the
    earlier first-occurrence wins. Commutative, associative,
    idempotent — any batch split, arrival order, or redelivery folds
    to the one-shot state (the q160 twin pins this externally)."""
    return (
        a.unionByName(b)
        .groupBy(user_col, "stage_idx")
        .agg(F.min("first_us").alias("first_us"))
    )


def funnel_reach(
    firsts: DataFrame,
    stages: list[str],
    step_window_seconds: int = 86400,
    user_col: str = "user_id",
) -> DataFrame:
    """Per-stage funnel counts from a ``stage_firsts`` relation:
    (stage, stage_idx, users, conv_from_prev). ``users`` at stage k
    counts users reaching k under order-of-firsts semantics (module
    docstring); ``conv_from_prev`` is users_k / users_{k-1} (stage 1
    reads 1.0; NULL when the previous stage emptied) — one IEEE
    division of exact counts.

    Scale shape: one pivot groupBy(user) (|stages| conditional mins),
    one count aggregation to a SINGLE |stages|-wide row, then a
    |stages|-row unpivot — the only single-partition work is over
    that one row."""
    k = len(stages)
    win_us = F.lit(int(step_window_seconds) * 1_000_000)
    pivoted = firsts.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col("stage_idx") == i + 1, F.col("first_us"))).alias(
                f"__t{i + 1}"
            )
            for i in range(k)
        ]
    )
    reach = F.col("__t1").isNotNull()
    flags = [reach.cast("long").alias("__r1")]
    for i in range(2, k + 1):
        t, prev = F.col(f"__t{i}"), F.col(f"__t{i - 1}")
        reach = reach & t.isNotNull() & (t >= prev) & (t - prev <= win_us)
        flags.append(reach.cast("long").alias(f"__r{i}"))
    # coalesce: sum over ZERO rows is NULL, but the funnel read over
    # an empty firsts relation must report 0 users per stage (the
    # count(*) FILTER oracle semantics) — batch, stream, and oracle
    # all agree on empty input (ADVICE r7).
    totals = pivoted.select(*flags).agg(
        *[
            F.coalesce(F.sum(f"__r{i}"), F.lit(0)).alias(f"__u{i}")
            for i in range(1, k + 1)
        ]
    )
    # unpivot the single totals row into (stage, stage_idx, users)
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(s).alias("stage"),
                F.lit(i + 1).alias("stage_idx"),
                F.col(f"__u{i + 1}").alias("users"),
                (F.col(f"__u{i}") if i > 0 else F.lit(None).cast("long")).alias(
                    "__prev"
                ),
            )
            for i, s in enumerate(stages)
        ]
    )
    return totals.select(F.explode(stage_rows).alias("r")).select(
        F.col("r.stage").alias("stage"),
        F.col("r.stage_idx").alias("stage_idx"),
        F.col("r.users").alias("users"),
        F.when(F.col("r.stage_idx") == 1, F.lit(1.0))
        .when(F.col("r.__prev") > 0, F.col("r.users") / F.col("r.__prev"))
        .alias("conv_from_prev"),
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    step_window_seconds: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One-shot funnel over an event log: ``stage_firsts`` +
    ``funnel_reach`` (see those for semantics and scale shape)."""
    return funnel_reach(
        stage_firsts(events, stages, user_col, ts_col, type_col),
        stages,
        step_window_seconds,
        user_col,
    )


def cohort_retention(
    events: DataFrame,
    activity_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention on one activity type: (cohort,
    week_offset, users) where ``cohort`` is the Monday-truncated week
    of each user's FIRST activity and ``users`` counts distinct users
    active ``week_offset`` weeks after their cohort week. Offsets are
    exact integer arithmetic on epoch seconds of the week-truncated
    timestamps (both Monday-aligned, so the division is exact — no
    engine-specific week-diff semantics).

    Scale shape: events reduce to distinct (user, week) FIRST (the
    activity filter and the distinct both run before anything joins),
    then min-per-user and the activity-week join reuse the same
    user_id hash partitioning; the final (cohort, offset) aggregation
    is over <= |users| x |weeks| rows."""
    wk = F.date_trunc("week", F.col(ts_col).cast("timestamp"))
    active = (
        events.where(F.col(type_col) == activity_type)
        .select(F.col(user_col), wk.alias("wk"))
        .distinct()
    )
    cohort = active.groupBy(user_col).agg(F.min("wk").alias("cohort"))
    return (
        active.join(cohort, user_col)
        .select(
            "cohort",
            (
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort"))
                / F.lit(604800)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, cnt, prob) where ``cnt`` counts
    adjacent (ordered by ``ts`` then ``tiebreak_col`` — a TOTAL order,
    so duplicate timestamps are deterministic) event-type pairs within
    each user's timeline and ``prob`` is row-stochastic: cnt / total
    outgoing transitions of ``from_type`` — one IEEE division of exact
    int64 counts.

    Scale shape: one per-user window pass (lead) forms the pairs —
    never a sequence self-join; the pair aggregation is over
    |event_types|^2 keys; the row-normalizing window runs over that
    tiny aggregate, not the events."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    row_total = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "cnt",
        (F.col("cnt") / F.sum("cnt").over(row_total)).alias("prob"),
    )
