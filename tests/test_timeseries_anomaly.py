"""Rolling anomaly flags (operators/timeseries.py::rolling_anomalies):
baseline exclusion, cold start, zero-variance flats, and the exact
integer cross-multiplied z-test."""

from __future__ import annotations

from streaming_recommendation_spark.operators.timeseries import (
    rolling_anomalies,
)


def _run(spark, vals, **kw):
    df = spark.createDataFrame(
        [(1, i * 3600, float(v)) for i, v in enumerate(vals)],
        "user_id bigint, bucket_start bigint, value double",
    )
    args = dict(window_rows=4, k_sigma=2, min_baseline=3)
    args.update(kw)
    return {
        r.bucket_start // 3600: (r.n_baseline, r.is_anomaly)
        for r in rolling_anomalies(
            df, "user_id", "bucket_start", "value", **args
        ).collect()
    }


def test_spike_after_flat_baseline_flags(spark):
    got = _run(spark, [1.0, 1.0, 1.0, 1.0, 5.0, 1.0])
    # cold start: rows 0-2 have < 3 baseline rows -> never flagged
    assert got[0] == (0, False)
    assert got[1] == (1, False)
    assert got[2] == (2, False)
    # row 3 matches its flat baseline exactly -> dev 0, strict > fails
    assert got[3] == (3, False)
    # row 4 spikes off a zero-variance baseline -> any deviation flags
    assert got[4] == (4, True)
    # row 5 returns to 1.0; baseline now contains the spike -> its
    # variance absorbs the return (4*var >= dev^2)
    n, flag = got[5]
    assert n == 4 and flag is False


def test_exact_threshold_boundary(spark):
    """Cross-multiplied test is STRICT >: a point exactly k sigma out
    is NOT an anomaly. Baseline cents (100, 300) -> n=2, s1=400,
    s2=100000, n^2*var = 2*100000 - 160000 = 40000 -> sigma*n = 200;
    dev = 2c - 400. c=600: dev=800, 800^2 = 640000 > 4*40000 -> flag;
    c=400: dev=400, 160000 = 4*40000 (exactly 2 sigma) -> NOT."""
    base = [1.0, 3.0]
    got = _run(spark, base + [4.0], min_baseline=2, window_rows=4)
    assert got[2] == (2, False)  # exactly 2 sigma -> strict > fails
    got = _run(spark, base + [6.0], min_baseline=2, window_rows=4)
    assert got[2] == (2, True)  # beyond 2 sigma -> flags


def test_q171_non_degenerate_on_testdata(spark):
    from streaming_recommendation_spark.queries import registry

    from .conftest import SF_DIR

    rows = registry()["q171_rolling_anomalies"].fn(spark, SF_DIR)
    flags = {r.is_anomaly for r in rows.select("is_anomaly").distinct().collect()}
    assert flags == {True, False}
