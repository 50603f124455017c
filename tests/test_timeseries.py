"""Gap-filled LOCF resampling (operators/timeseries.py): dense grid,
carry-forward semantics, deterministic last-in-bucket, span bounds."""

from __future__ import annotations

import datetime as dt

from streaming_recommendation_spark.operators.timeseries import gap_fill_locf


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gap_fill_dense_grid_and_carry(spark):
    rows = [
        (1, _ts(0, 30), 10.0),
        (1, _ts(3, 15), 30.0),   # hours 1,2 are gaps -> carry 10.0
        (2, _ts(5, 0), 99.0),    # single-bucket series
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.bucket_start): (r.value, r.is_observed)
        for r in gap_fill_locf(df, "user_id", "ts", "value", 3600).collect()
    }
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    # user 1: hours 0..3 all exist; 1 and 2 carried
    assert out[(1, base + 0)] == (10.0, True)
    assert out[(1, base + 3600)] == (10.0, False)
    assert out[(1, base + 7200)] == (10.0, False)
    assert out[(1, base + 10800)] == (30.0, True)
    # user 2: exactly one bucket, observed
    assert out[(2, base + 5 * 3600)] == (99.0, True)
    assert len(out) == 5


def test_gap_fill_last_in_bucket_is_struct_max(spark):
    """Within one bucket the LATEST ts wins; duplicate ts breaks the
    tie on the larger value (total order, partition-independent)."""
    rows = [
        (1, _ts(0, 10), 5.0),
        (1, _ts(0, 50), 7.0),   # later -> wins
        (2, _ts(0, 20), 3.0),
        (2, _ts(0, 20), 9.0),   # same ts -> larger value wins
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        r.user_id: r.value
        for r in gap_fill_locf(df, "user_id", "ts", "value", 3600).collect()
    }
    assert out == {1: 7.0, 2: 9.0}


def test_gap_fill_grid_bounded_by_span(spark):
    """No buckets materialize before a key's first or after its last
    observation, and every bucket between them exists exactly once."""
    rows = [(1, _ts(2), 1.0), (1, _ts(9), 2.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sorted(
        r.bucket_start
        for r in gap_fill_locf(df, "user_id", "ts", "value", 3600).collect()
    )
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == [base + h * 3600 for h in range(2, 10)]


def test_rolling_stats_window_math(spark):
    """Hand-checked trailing-3 window over one dense series: exact
    integer cents sum, single-division average, order-free max,
    partial frames at the series head."""
    from streaming_recommendation_spark.operators.timeseries import (
        rolling_stats,
    )

    rows = [(1, b, v) for b, v in enumerate([1.0, 2.0, 3.0, 4.0])]
    df = spark.createDataFrame(rows, "k long, b long, v double")
    out = {
        r.b: (r.n_window, r.moving_sum_cents, r.moving_avg, r.moving_max)
        for r in rolling_stats(df, "k", "b", "v", window_rows=3).collect()
    }
    assert out[0] == (1, 100, 1.0, 1.0)
    assert out[1] == (2, 300, 1.5, 2.0)
    assert out[2] == (3, 600, 2.0, 3.0)
    assert out[3] == (3, 900, 3.0, 4.0)  # 1.0 slid out


def test_rolling_stats_composes_with_gap_fill(spark):
    """Carried buckets participate in the rolling frame — the dense
    composition keeps the window time-true."""
    import datetime as dt2

    from streaming_recommendation_spark.operators.timeseries import (
        gap_fill_locf,
        rolling_stats,
    )

    rows = [
        (1, dt2.datetime(2024, 1, 1, 0), 10.0),
        (1, dt2.datetime(2024, 1, 1, 3), 40.0),  # 2 carried hours between
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    dense = gap_fill_locf(df, "k", "ts", "v", 3600)
    # the filled column keeps the caller's value_col name ("v")
    out = rolling_stats(
        dense.select("k", "bucket_start", "v"),
        "k", "bucket_start", "v", window_rows=4,
    ).orderBy("bucket_start").collect()
    # frame at the last hour covers 10,10,10,40 (carried rows count)
    assert out[-1].moving_sum_cents == 7000
    assert out[-1].moving_avg == 17.5
    assert out[-1].n_window == 4
