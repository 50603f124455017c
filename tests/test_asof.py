"""As-of / range join semantics: the scalable union-window strategy
must agree with the independent inequality-join strategy, including
inclusive bounds, tie-breaks, tolerance, and no-match nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        Row(user_id=1, ts=100, event_id=10),
        Row(user_id=1, ts=200, event_id=11),
        Row(user_id=1, ts=200, event_id=12),  # tie at ts=200
        Row(user_id=1, ts=400, event_id=13),
        Row(user_id=2, ts=150, event_id=20),
        Row(user_id=3, ts=999, event_id=30),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def probes(spark):
    return spark.createDataFrame(
        [
            Row(user_id=1, ts=200, tag="exact-tie"),
            Row(user_id=1, ts=250, tag="between"),
            Row(user_id=1, ts=50, tag="before-all"),
            Row(user_id=2, ts=150, tag="exact"),
            Row(user_id=2, ts=5000, tag="way-after"),
            Row(user_id=3, ts=10, tag="before"),
        ]
    )


def collect_map(df):
    return {
        (r.user_id, r.ts, r.tag): r.event_id
        for r in df.collect()
    }


@pytest.mark.slow  # >=10 s soak/parity tier (VERDICT r12 #3)
def test_union_strategy_semantics(spark, ev, probes):
    out = collect_map(
        asof_join(probes, ev, value_cols=["event_id"], tiebreak="event_id")
    )
    assert out[(1, 200, "exact-tie")] == 12  # inclusive; tie -> max event_id
    assert out[(1, 250, "between")] == 12
    assert out[(1, 50, "before-all")] is None
    assert out[(2, 150, "exact")] == 20
    assert out[(2, 5000, "way-after")] == 20
    assert out[(3, 10, "before")] is None


def test_union_equals_join_strategy(spark, ev, probes):
    a = collect_map(
        asof_join(probes, ev, value_cols=["event_id"], tiebreak="event_id",
                  strategy="union")
    )
    b = collect_map(
        asof_join(probes, ev, value_cols=["event_id"], tiebreak="event_id",
                  strategy="join")
    )
    assert a == b


def test_tolerance(spark, ev, probes):
    out = collect_map(
        asof_join(probes, ev, value_cols=["event_id"], tiebreak="event_id",
                  tolerance=100)
    )
    assert out[(1, 250, "between")] == 12  # 250-200=50 within
    assert out[(2, 5000, "way-after")] is None  # 5000-150 > 100


def test_range_join_bucketized_equals_naive(spark, ev, probes):
    kwargs = dict(on="ts", by="user_id", window=100)
    a = range_join(probes, ev, bucketize=True, **kwargs)
    b = range_join(probes, ev, bucketize=False, **kwargs)
    ka = sorted((r.user_id, r.probe_ts, r.ts, r.event_id) for r in a.collect())
    kb = sorted((r.user_id, r.probe_ts, r.ts, r.event_id) for r in b.collect())
    assert ka == kb
    # inclusive bounds: probe ts=250 window 100 catches both ts=200 events
    hits = [k for k in ka if k[1] == 250]
    assert {h[3] for h in hits} == {11, 12}


def test_point_in_time_no_leakage(spark):
    """The q246 leakage pin in miniature: a label row on day D gets
    the snapshot whose counts EXCLUDE day D — an event at 09:00 and
    a purchase at 10:00 the same day must NOT see each other in the
    feature, only prior days' activity."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.queries import registry

    import tempfile, os
    # replay the query body over a crafted 2-day fixture via the
    # operator path directly (the registry body needs the full table
    # set; here we pin the rule itself on asof semantics)
    from pyspark.sql import Window
    from streaming_recommendation_spark.operators.asof import asof_join

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", 100),  # day 1: two events
            (1, "2024-01-01 09:00:00", 101),
            (1, "2024-01-02 09:00:00", 102),  # day 2 morning event
            (1, "2024-01-02 10:00:00", 103),  # day 2 label row
        ],
        "user_id bigint, ts string, event_id bigint",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    snaps = (
        ev.groupBy("user_id", F.date_trunc("DAY", "ts").alias("ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .select(
            "user_id", "ts",
            F.coalesce(F.sum("__c").over(w), F.lit(0)).cast("long").alias("u_cum"),
        )
    )
    facts = ev.where(F.col("event_id") == 103).select("user_id", "ts", "event_id")
    got = asof_join(facts, snaps, on="ts", by="user_id", value_cols=["u_cum"]).collect()[0]
    # day-2 snapshot = 2 (day 1's events); the 09:00 same-day event
    # and the label itself are excluded
    assert got.u_cum == 2
