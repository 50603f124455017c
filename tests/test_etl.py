"""ETL parity tests on FIXTURES.md-shaped reviews/item_meta fixtures:
schema parity with the reference's CSVs plus the invariants SURVEY §5.2
calls out (negatives never in user history, k-per-positive counts,
stride positions, price-cleaning edge cases, hash ranges)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.etl import (
    build_excluded_behavior,
    build_item_embeddings,
    build_lightgcn_data,
    build_train_data,
    split_users,
)


@pytest.fixture(scope="module")
def reviews(spark):
    rows = []
    # 12 users, deterministic interleaved histories; user ids follow the
    # reference's Amazon format loosely
    for u in range(12):
        uid = f"A{u:03d}USER"
        n = 5 + (u % 4) * 5  # 5..20 reviews
        for i in range(n):
            rows.append(
                Row(
                    reviewerID=uid,
                    asin=f"B{(u * 7 + i * 3) % 40:04d}",
                    overall=float(1 + (u + i) % 5),
                    unixReviewTime=1_500_000_000 + i * 86_400 + u,
                )
            )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def item_meta(spark):
    return spark.createDataFrame(
        [
            Row(asin="B0000", categories=[["Books", "Fiction", "Mystery"]], brand="Acme", price="$12.34"),
            Row(asin="B0001", categories=[["Books", "SciFi"]], brand=None, price="1,234.56"),
            Row(asin="B0002", categories=[], brand="Biz", price=""),
            Row(asin="B0003", categories=[["Books"]], brand="Acme", price="N/A"),
            Row(asin="B9999", categories=[["Other"]], brand="X", price="7.5"),  # not in reviews
        ]
    )


def test_split_users_deterministic_partition(spark, reviews):
    excluded = split_users(reviews, 0.2)
    again = split_users(reviews, 0.2)
    assert sorted(r.user_id for r in excluded.collect()) == sorted(
        r.user_id for r in again.collect()
    )
    all_users = reviews.select(F.col("reviewerID").alias("user_id")).distinct()
    kept = all_users.join(excluded, "user_id", "left_anti")
    assert kept.count() + excluded.count() == all_users.count()


def test_excluded_behavior_schema_and_scope(spark, reviews):
    excluded = split_users(reviews, 0.3)
    beh = build_excluded_behavior(reviews, excluded)
    assert beh.columns == ["user_id", "item_id", "timestamp"]
    # only excluded users appear
    extra = beh.join(excluded, "user_id", "left_anti")
    assert extra.count() == 0


def test_item_embeddings_ranges_and_unk(spark, item_meta):
    emb = build_item_embeddings(item_meta)
    assert emb.columns == ["item_id", "category_hash", "brand_hash", "price_scaled"]
    rows = {r.item_id: r for r in emb.collect()}
    assert "UNK" in rows and rows["UNK"].price_scaled == 0.0
    for r in rows.values():
        assert 0.0 <= r.category_hash < 1.0
        assert 0.0 <= r.brand_hash < 1.0
        assert 0.0 <= r.price_scaled <= 1.0
    # dirty price handling: max price 1234.56 scales to 1.0, N/A & "" -> 0.0
    assert rows["B0001"].price_scaled == 1.0
    assert rows["B0002"].price_scaled == rows["B0003"].price_scaled == 0.0


def test_lightgcn_data_invariants(spark, reviews):
    excluded = split_users(reviews, 0.2)
    lg = build_lightgcn_data(reviews, excluded)
    assert lg.columns == ["user_id", "item_id"]
    assert lg.count() == lg.dropDuplicates(["user_id", "item_id"]).count()
    assert lg.join(excluded, "user_id", "left_semi").count() == 0
    # every pair comes from a rating >= 4 review
    low = reviews.where(F.col("overall") < 4).select(
        F.col("reviewerID").alias("user_id"), F.col("asin").alias("item_id")
    )
    high = reviews.where(F.col("overall") >= 4).select(
        F.col("reviewerID").alias("user_id"), F.col("asin").alias("item_id")
    )
    only_low = low.join(high, ["user_id", "item_id"], "left_anti")
    assert lg.join(only_low, ["user_id", "item_id"], "left_semi").count() == 0


def test_train_data_invariants(spark, reviews):
    excluded = spark.createDataFrame([Row(user_id="A000USER")])
    td = build_train_data(
        reviews, excluded, max_history=5, stride=2, negatives_per_positive=2,
        rate_active=1.0, rate_light=1.0,  # keep everyone: test structure, not sampling
    )
    assert td.columns == ["user_id", "history_items", "candidate_item", "label"]
    rows = td.collect()
    assert rows, "train data must be non-empty"
    assert {r.label for r in rows} == {0, 1}

    # negatives per positive: exactly 2 for every user's positive count
    from collections import Counter

    pos = Counter(r.user_id for r in rows if r.label == 1)
    neg = Counter(r.user_id for r in rows if r.label == 0)
    for uid, np_ in pos.items():
        assert neg[uid] == 2 * np_, f"{uid}: {np_} positives, {neg[uid]} negatives"

    # no negative candidate ever appears in that user's full item set
    user_items = {
        r.user_id: set(r.items)
        for r in reviews.groupBy(F.col("reviewerID").alias("user_id"))
        .agg(F.collect_set("asin").alias("items"))
        .collect()
    }
    for r in rows:
        if r.label == 0:
            assert r.candidate_item not in user_items[r.user_id]
        else:
            assert r.candidate_item in user_items[r.user_id]
        # history: pipe-joined, <= 5 items, no empties
        hist = r.history_items.split("|") if r.history_items else []
        assert len(hist) <= 5
    # excluded user contributes nothing
    assert not [r for r in rows if r.user_id == "A000USER"]


def test_train_data_deterministic(spark, reviews):
    excluded = split_users(reviews, 0.2)
    a = sorted(map(tuple, build_train_data(reviews, excluded).collect()))
    b = sorted(map(tuple, build_train_data(reviews, excluded).collect()))
    assert a == b


def test_ewma_by_key_recurrence_and_group_isolation(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.grouped_pandas import (
        ewma_by_key,
    )

    rows = [
        Row(user_id=1, event_id=1, ts=1, value=4.0),
        Row(user_id=1, event_id=2, ts=2, value=0.0),
        Row(user_id=1, event_id=3, ts=3, value=8.0),
        Row(user_id=2, event_id=4, ts=1, value=100.0),
    ]
    out = {r.event_id: r.ewma for r in
           ewma_by_key(spark.createDataFrame(rows)).collect()}
    # y1=4; y2=0.5*4+0.5*0=2; y3=0.5*2+0.5*8=5 — exact halving
    assert out[1] == 4.0 and out[2] == 2.0 and out[3] == 5.0
    # user 2's sequence never bleeds into user 1's
    assert out[4] == 100.0


def test_ewma_sorted_matches_grouped_with_tiny_batches(spark):
    """The mapInPandas scale path must be bit-equal to the
    applyInPandas form even when Arrow batches split groups (forced
    here with a 7-row batch cap so the carry logic actually runs)."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.grouped_pandas import (
        ewma_by_key,
        ewma_by_key_sorted,
    )

    rows = [
        Row(user_id=u, event_id=u * 1000 + i, ts=i, value=float((u * 31 + i * 17) % 97))
        for u in range(1, 6)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        a = {r.event_id: r.ewma for r in ewma_by_key(df).collect()}
        b = {r.event_id: r.ewma for r in ewma_by_key_sorted(df).collect()}
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    assert a == b  # bit-equal, not approx
