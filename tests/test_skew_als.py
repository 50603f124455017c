"""Salted-join equivalence and the MLlib ALS recall alternative."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.skew import salted_join
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, "events", SF_DIR)
    # heavy-hitter shape: user dim with per-user attributes
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("activity"))
    plain = ev.join(users, "user_id")
    salted = salted_join(ev, users, "user_id", salt_buckets=5)
    assert sorted(map(tuple, plain.select(sorted(plain.columns)).collect())) == sorted(
        map(tuple, salted.select(sorted(salted.columns)).collect())
    )


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=2, v="c"), Row(k=3, v="d")]
    )
    small = spark.createDataFrame([Row(k=1, w="x"), Row(k=2, w="y")])
    out = salted_join(big, small, "k", salt_buckets=3, how="left")
    got = sorted((r.k, r.v, r.w) for r in out.collect())
    assert got == [(1, "a", "x"), (1, "b", "x"), (2, "c", "y"), (3, "d", None)]


def test_als_recall_end_to_end(spark):
    """ALS trains on lineitem interactions and produces the cascade's
    recall contract: k ranked items per user, factor frames in the
    engine's vector-column convention."""
    from streaming_recommendation_spark.cascade.als import (
        als_recommendations,
        train_als_recall,
    )

    li = load_table(spark, "lineitem", SF_DIR)
    inter = li.select(
        F.col("l_suppkey").cast("int").alias("user_id"),
        F.col("l_partkey").cast("int").alias("item_id"),
    )
    model, uf, itf = train_als_recall(inter, rank=4, max_iter=2)
    assert uf.columns == ["id", "features"]
    assert len(uf.first().features) == 4

    recs = als_recommendations(model, k=5)
    assert recs.columns == ["user_id", "item_id", "rank"]
    per_user = recs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r.n == 5 for r in per_user)
    n_users = inter.select("user_id").distinct().count()
    assert len(per_user) == n_users


def test_salted_join_rejects_outer(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.skew import salted_join

    big = spark.createDataFrame([Row(k=1, v="a")])
    small = spark.createDataFrame([Row(k=1, w="x"), Row(k=2, w="y")])
    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(big, small, "k", how="full_outer")
    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(big, small, "k", how="right")
    # left_anti is in the safe set and must not duplicate
    anti = salted_join(
        spark.createDataFrame([Row(k=1, v="a"), Row(k=3, v="c")]),
        small.select("k"),
        "k",
        how="left_anti",
    ).collect()
    assert [(r.k, r.v) for r in anti] == [(3, "c")]


def test_pagerank_quantized_properties(spark):
    """Star graph: the hub must outrank every leaf; total mass stays
    within quantization loss of 1.0; two runs are bit-identical."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.graph import (
        RANK_SCALE,
        pagerank_quantized,
    )

    edges = spark.createDataFrame(
        [Row(src=0, dst=i) for i in range(1, 9)]
        + [Row(src=100, dst=101)]  # detached pair
    )
    out = {r.node: r.rank for r in pagerank_quantized(edges, rounds=3).collect()}
    assert len(out) == 11  # hub + 8 leaves + detached pair
    hub, leaves = out[0], [out[i] for i in range(1, 9)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    # mass conservation up to truncation: <= 1 unit lost per div
    assert 0.8 * RANK_SCALE < sum(out.values()) <= RANK_SCALE
    out2 = {r.node: r.rank for r in pagerank_quantized(edges, rounds=3).collect()}
    assert out == out2
