"""Deterministic HLL: register math, merge property, and accuracy
with the client-side linear-counting correction."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.sketch import (
    hll_constants,
    hll_distinct,
)


def corrected(m, est_raw, nonzero):
    """The standard small-range fix the operator deliberately leaves
    out of the oracle-checked plan (ln() determinism policy)."""
    empty = m - nonzero
    if est_raw <= 2.5 * m and empty > 0:
        return m * math.log(m / empty)
    return est_raw


def test_hll_accuracy_with_correction(spark):
    m, _ = hll_constants(8)
    rows = [Row(g="a", k=i) for i in range(150)] + [
        Row(g="b", k=i) for i in range(2000)
    ]
    out = {r.g: r for r in hll_distinct(
        spark.createDataFrame(rows), "k", ["g"]
    ).collect()}
    est_a = corrected(m, out["a"].hll_estimate, out["a"].nonzero_registers)
    est_b = corrected(m, out["b"].hll_estimate, out["b"].nonzero_registers)
    # ~6.5% std error at p=8; allow 3 sigma
    assert abs(est_a - 150) / 150 < 0.2
    assert abs(est_b - 2000) / 2000 < 0.2


def test_hll_deterministic_and_duplicate_insensitive(spark):
    rows = [Row(g="x", k=i % 500) for i in range(10_000)]
    df = spark.createDataFrame(rows)
    a = hll_distinct(df, "k", ["g"]).collect()[0]
    b = hll_distinct(df.repartition(13), "k", ["g"]).collect()[0]
    # same registers regardless of partitioning or duplication factor
    assert a.z_scaled == b.z_scaled == a.z_scaled
    assert a.hll_estimate == b.hll_estimate


def test_hll_merge_is_register_max(spark):
    """Sketch(A ∪ B) == register-wise max of Sketch(A), Sketch(B) —
    the mergeability contract (checked through z_scaled equality)."""
    ra = [Row(g="x", k=i) for i in range(400)]
    rb = [Row(g="x", k=i) for i in range(200, 700)]
    both = hll_distinct(
        spark.createDataFrame(ra + rb), "k", ["g"]
    ).collect()[0]
    # recompute by unioning raw frames (same keys, different dup mix)
    again = hll_distinct(
        spark.createDataFrame(rb + ra + ra), "k", ["g"]
    ).collect()[0]
    assert both.z_scaled == again.z_scaled


def test_cms_one_sided_error(spark):
    """CMS never underestimates; a deliberately narrow sketch
    (width 16, 200 keys) must overestimate somewhere, and exactly by
    the colliding keys' mass."""
    from streaming_recommendation_spark.operators.sketch import (
        cms_counts,
        cms_estimate,
    )

    rows = [Row(k=i % 200) for i in range(5000)]  # each key 25x
    df = spark.createDataFrame(rows)
    sketch = cms_counts(df, "k", width=16, depth=3)
    keys = df.select("k").distinct()
    est = {r.k: r.cms_count for r in
           cms_estimate(sketch, keys, "k", width=16, depth=3).collect()}
    assert all(v >= 25 for v in est.values())  # one-sided
    assert any(v > 25 for v in est.values())   # width 16 must collide
    # every estimate is a multiple of the uniform key mass
    assert all(v % 25 == 0 for v in est.values())


def test_cms_exact_when_wide(spark):
    from streaming_recommendation_spark.operators.sketch import (
        cms_counts,
        cms_estimate,
    )

    rows = [Row(k=i) for i in range(30) for _ in range(i + 1)]
    df = spark.createDataFrame(rows)
    sketch = cms_counts(df, "k", width=4096, depth=3)
    est = {r.k: r.cms_count for r in cms_estimate(
        sketch, df.select("k").distinct(), "k", width=4096, depth=3
    ).collect()}
    assert est == {i: i + 1 for i in range(30)}


def test_kmv_set_stats_partial_overlap(spark):
    from streaming_recommendation_spark.operators.sketch import kmv_set_stats

    a = spark.createDataFrame([Row(k=i) for i in range(1000)])
    b = spark.createDataFrame([Row(k=i) for i in range(500, 2000)])
    r = kmv_set_stats(a, b, "k", k=64).collect()[0]
    # truth: |A|=1000, |B|=1500, |A|B|=2000, J=500/2000=0.25
    assert abs(r.ndv_a_est - 1000) / 1000 < 0.4   # k=64 -> ~12.5% sigma
    assert abs(r.ndv_b_est - 1500) / 1500 < 0.4
    assert abs(r.union_est - 2000) / 2000 < 0.4
    assert 0.05 < r.jaccard_est < 0.5
    assert 100 < r.intersection_est < 1000


def test_kmv_exact_below_k(spark):
    from streaming_recommendation_spark.operators.sketch import kmv_set_stats

    a = spark.createDataFrame([Row(k=i) for i in range(10)])
    b = spark.createDataFrame([Row(k=i) for i in range(5, 15)])
    r = kmv_set_stats(a, b, "k", k=64).collect()[0]
    # sketches ARE the sets: everything exact
    assert r.ndv_a_est == 10.0 and r.ndv_b_est == 10.0
    assert r.union_est == 15.0
    assert abs(r.jaccard_est - 5 / 15) < 1e-4  # output rounds to 4dp
    assert abs(r.intersection_est - 5.0) < 1e-9


def test_kmv_rejects_out_of_range_keys(spark):
    """ADVICE r3: keys outside [0, 2^32) break the hash bijection —
    the sketch must fail loudly, not silently merge congruent keys."""
    import pytest

    from streaming_recommendation_spark.operators.sketch import kmv_set_stats

    a = spark.createDataFrame([Row(k=1), Row(k=(1 << 32) + 1)])
    b = spark.createDataFrame([Row(k=2)])
    with pytest.raises(Exception, match="kmv_set_stats"):
        kmv_set_stats(a, b, "k", k=8).collect()
    neg = spark.createDataFrame([Row(k=-5)])
    with pytest.raises(Exception, match="kmv_set_stats"):
        kmv_set_stats(neg, b, "k", k=8).collect()


def test_kmv_null_and_noncastable_keys(spark):
    """ADVICE r4: NULL keys are excluded (COUNT(DISTINCT) semantics)
    and a non-null key that casts to NULL (non-numeric string) raises
    — previously both made the range guard predicate NULL and slipped
    into the sketch as NULL minima."""
    import pytest
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from streaming_recommendation_spark.operators.sketch import kmv_set_stats

    int_schema = StructType([StructField("k", IntegerType(), True)])
    a = spark.createDataFrame([(1,), (2,), (None,), (3,)], int_schema)
    b = spark.createDataFrame([(2,), (None,), (3,), (4,)], int_schema)
    r = kmv_set_stats(a, b, "k", k=64).collect()[0]
    # NULLs excluded: A={1,2,3}, B={2,3,4}, exact below k
    assert r.ndv_a_est == 3.0 and r.ndv_b_est == 3.0
    assert r.union_est == 4.0
    assert abs(r.intersection_est - 2.0) < 1e-9

    str_schema = StructType([StructField("k", StringType(), True)])
    bad = spark.createDataFrame([("7",), ("not-a-number",)], str_schema)
    ok = spark.createDataFrame([("9",)], str_schema)
    with pytest.raises(Exception, match="kmv_set_stats"):
        kmv_set_stats(bad, ok, "k", k=8).collect()
    # castable strings are fine (and NULL-free after exclusion)
    r2 = kmv_set_stats(ok, ok, "k", k=8).collect()[0]
    assert r2.ndv_a_est == 1.0 and r2.union_est == 1.0
