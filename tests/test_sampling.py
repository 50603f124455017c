"""Sampling operator properties (SURVEY §5.5): rate tolerance, exact
partition, negative-sampling invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.sampling import (
    hash_split,
    negative_sample,
)
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_hash_split_rate_and_partition(spark):
    keys = spark.range(0, 20000).withColumnRenamed("id", "k")
    kept = hash_split(keys, "k", 0.2)
    dropped = hash_split(keys, "k", 0.2, invert=True)
    n_kept, n_dropped = kept.count(), dropped.count()
    assert n_kept + n_dropped == 20000
    assert abs(n_kept / 20000 - 0.2) < 0.02  # within 2 points of target
    # exact partition: no overlap
    assert kept.join(dropped, "k", "left_semi").count() == 0


def test_hash_split_salt_gives_distinct_stream(spark):
    keys = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_split(keys, "k", 0.2, salt=0).collect()}
    b = {r.k for r in hash_split(keys, "k", 0.2, salt=99).collect()}
    # salted integer streams are distinct (interval shift), not
    # independent — assert distinctness + similar rate, not overlap
    assert a != b
    assert abs(len(b) / 20000 - 0.2) < 0.02
    # string keys re-hash through md5 -> effectively independent
    skeys = keys.select(F.concat(F.lit("u"), F.col("k")).alias("k"))
    sa = {r.k for r in hash_split(skeys, "k", 0.2, string_key=True, salt=0).collect()}
    sb = {r.k for r in hash_split(skeys, "k", 0.2, string_key=True, salt=99).collect()}
    overlap = len(sa & sb) / len(sa)
    assert 0.1 < overlap < 0.3  # ~rate for independent 20% selections


def test_negative_sample_invariants(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    items = load_table(spark, "part", SF_DIR).select(
        F.col("p_partkey").alias("item_id")
    )
    inter = li.select(
        F.col("l_suppkey").alias("user_id"), F.col("l_partkey").alias("item_id")
    )
    negs = negative_sample(inter, items, k_per_user=5, pool_cap=500)
    rows = negs.collect()

    # exactly k per user (pool >> positives here)
    from collections import Counter

    per_user = Counter(r.user_id for r in rows)
    n_users = inter.select("user_id").distinct().count()
    assert len(per_user) == n_users
    assert all(v == 5 for v in per_user.values())

    # no sampled negative is a positive interaction
    pos = {(r.user_id, r.item_id) for r in inter.distinct().collect()}
    assert not pos & {(r.user_id, r.item_id) for r in rows}

    # deterministic
    again = sorted(map(tuple, negative_sample(inter, items, 5, pool_cap=500).collect()))
    assert sorted(map(tuple, rows)) == again
