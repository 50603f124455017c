"""Event-sequence analytics (operators/funnel.py): order-of-firsts
funnel semantics (ordering, step-window edges, missing stages),
cohort retention offsets, and transition-matrix determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    merge_firsts,
    stage_firsts,
    transition_counts,
)

SCHEMA = "user_id bigint, event_id bigint, ts timestamp, event_type string"
STAGES = ["view", "click", "purchase"]


def _t(d, h=0, m=0):
    return dt.datetime(2024, 1, d, h, m)


def _ev(rows):
    return [(u, i, ts, ty) for i, (u, ts, ty) in enumerate(rows)]


def _funnel_map(df):
    return {r.stage: (r.stage_idx, r.users, r.conv_from_prev) for r in df.collect()}


def test_ordered_user_reaches_all_stages(spark):
    rows = _ev(
        [
            (1, _t(1, 0), "view"),
            (1, _t(1, 5), "click"),
            (1, _t(1, 23), "purchase"),
        ]
    )
    got = _funnel_map(funnel_counts(spark.createDataFrame(rows, SCHEMA), STAGES))
    assert got == {
        "view": (1, 1, 1.0),
        "click": (2, 1, 1.0),
        "purchase": (3, 1, 1.0),
    }


def test_first_click_before_first_view_blocks_stage2(spark):
    """Order-of-firsts is strict: the user's FIRST click precedes the
    first view, so stage 2 is not reached even though a later click
    exists inside the window — the documented (and mergeable-state)
    semantics."""
    rows = _ev(
        [
            (1, _t(1, 0), "click"),
            (1, _t(1, 1), "view"),
            (1, _t(1, 2), "click"),
        ]
    )
    got = _funnel_map(funnel_counts(spark.createDataFrame(rows, SCHEMA), STAGES))
    assert got["view"] == (1, 1, 1.0)
    assert got["click"][1] == 0
    assert got["purchase"][1] == 0


def test_step_window_boundary_inclusive(spark):
    rows = _ev(
        [
            (1, _t(1, 0), "view"),
            (1, _t(2, 0), "click"),  # exactly 24h -> included
            (2, _t(1, 0), "view"),
            (2, _t(2, 0, 1), "click"),  # 24h + 1min -> excluded
        ]
    )
    got = _funnel_map(
        funnel_counts(
            spark.createDataFrame(rows, SCHEMA), STAGES, step_window_seconds=86400
        )
    )
    assert got["view"][1] == 2
    assert got["click"] == (2, 1, 0.5)


def test_missing_middle_stage_blocks_chain(spark):
    """A purchase within 24h of the view does NOT reach stage 3
    without a click — the chain is sequential, not any-subset."""
    rows = _ev([(1, _t(1, 0), "view"), (1, _t(1, 6), "purchase")])
    got = _funnel_map(funnel_counts(spark.createDataFrame(rows, SCHEMA), STAGES))
    assert got["click"][1] == 0
    assert got["purchase"][1] == 0


def test_empty_input_reads_zero_users_not_null(spark):
    """ADVICE r7: sum over zero rows is NULL, but the funnel read on
    an empty relation must report 0 users per stage — the oracle's
    count(*) FILTER semantics; batch, stream, and oracle agree."""
    empty = spark.createDataFrame([], SCHEMA)
    got = _funnel_map(funnel_counts(empty, STAGES))
    assert got["view"] == (1, 0, 1.0)
    assert got["click"] == (2, 0, None)
    assert got["purchase"] == (3, 0, None)


def test_empty_prev_stage_yields_null_conversion(spark):
    rows = _ev([(1, _t(1, 0), "view")])
    got = _funnel_map(funnel_counts(spark.createDataFrame(rows, SCHEMA), STAGES))
    assert got["click"] == (2, 0, 0.0)
    assert got["purchase"][2] is None  # 0/0: conversion undefined


def test_merge_firsts_commutes_and_is_idempotent(spark):
    rows = _ev(
        [
            (1, _t(3), "view"),
            (1, _t(1), "view"),
            (1, _t(2), "click"),
            (2, _t(5), "purchase"),
        ]
    )
    ev = spark.createDataFrame(rows, SCHEMA)
    a = stage_firsts(ev.where(F.col("event_id") % 2 == 0), STAGES)
    b = stage_firsts(ev.where(F.col("event_id") % 2 == 1), STAGES)
    whole = {tuple(r) for r in stage_firsts(ev, STAGES).collect()}
    assert {tuple(r) for r in merge_firsts(a, b).collect()} == whole
    assert {tuple(r) for r in merge_firsts(b, a).collect()} == whole
    # idempotent: folding a side twice changes nothing
    assert {
        tuple(r) for r in merge_firsts(merge_firsts(a, b), b).collect()
    } == whole


def test_cohort_retention_offsets(spark):
    # user 1 first purchases week of Jan 1 (Mon), active again week of
    # Jan 15 (+2); user 2 first purchases week of Jan 8, active +0 only;
    # clicks never count.
    rows = _ev(
        [
            (1, _t(2), "purchase"),
            (1, _t(17), "purchase"),
            (1, _t(10), "click"),
            (2, _t(9), "purchase"),
            (2, _t(11), "purchase"),  # same week -> same (cohort, 0) row
        ]
    )
    got = {
        (r.cohort, r.week_offset): r.users
        for r in cohort_retention(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == {
        (_t(1), 0): 1,
        (_t(1), 2): 1,
        (_t(8), 0): 1,
    }


def test_transition_counts_and_row_stochastic_prob(spark):
    rows = _ev(
        [
            (1, _t(1), "view"),
            (1, _t(2), "click"),
            (1, _t(3), "view"),
            (1, _t(4), "click"),
            (2, _t(1), "view"),
            (2, _t(2), "purchase"),
        ]
    )
    got = {
        (r.from_type, r.to_type): (r.cnt, r.prob)
        for r in transition_counts(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got[("view", "click")] == (2, 2 / 3)
    assert got[("view", "purchase")] == (1, 1 / 3)
    assert got[("click", "view")] == (1, 1.0)
    # user boundaries never pair: no ("click", "view") across users 1->2
    assert sum(c for c, _ in got.values()) == 4


def test_transition_tiebreak_on_event_id(spark):
    """Two events at the SAME timestamp order by event_id — the total
    order makes the pair set deterministic under any partitioning."""
    rows = [
        (1, 10, _t(1), "view"),
        (1, 11, _t(1), "click"),
        (1, 12, _t(2), "purchase"),
    ]
    got = {
        (r.from_type, r.to_type): r.cnt
        for r in transition_counts(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}


def test_merge_firsts_random_splits_equal_one_shot(spark):
    """Randomized split-parity (the BPE randomized-corpora precedent):
    for seeded random event sets and random 3-way splits, folding the
    parts through merge_firsts in a random order equals the one-shot
    stage_firsts — the mergeability claim the streaming funnel rides,
    exercised beyond hand-built cases."""
    import random

    rng = random.Random(20260815)
    for _ in range(3):
        rows = [
            (
                rng.randrange(6),  # user
                i,
                _t(1 + rng.randrange(20), rng.randrange(24)),
                rng.choice(STAGES + ["signup", "error"]),
            )
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        whole = {tuple(r) for r in stage_firsts(df, STAGES).collect()}
        part_of = [rng.randrange(3) for _ in rows]
        # filler rows use a NON-stage type ("error"): they keep every
        # part non-empty but provably contribute no firsts rows
        parts = [
            spark.createDataFrame(
                [r for r, p in zip(rows, part_of) if p == j]
                or [(99, 0, _t(1), "error")],
                SCHEMA,
            )
            for j in range(3)
        ]
        order = [0, 1, 2]
        rng.shuffle(order)
        merged = stage_firsts(parts[order[0]], STAGES)
        for j in order[1:]:
            merged = merge_firsts(merged, stage_firsts(parts[j], STAGES))
        assert {tuple(r) for r in merged.collect()} == whole
