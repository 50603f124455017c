"""Round-trip tests for the reference-format IO layer (S2-S10):
write -> read preserves schema and values; Kafka payloads parse back
through the streaming schema."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.sources import reference_io as rio
from streaming_recommendation_spark.streaming.pipeline import (
    PROFILE_SCHEMA,
)


def test_reviews_json_roundtrip(spark, tmp_path):
    lines = [
        {"reviewerID": "A1", "asin": "B1", "overall": 5.0, "unixReviewTime": 1600000000,
         "extra_field": "ignored"},
        {"reviewerID": "A2", "asin": "B2", "overall": 3.0, "unixReviewTime": 1600000100},
    ]
    p = tmp_path / "reviews.json"
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\nnot json at all\n")
    df = rio.read_reviews_json(spark, str(p))
    rows = df.where(F.col("reviewerID").isNotNull()).collect()
    assert {(r.reviewerID, r.asin, r.overall) for r in rows} == {
        ("A1", "B1", 5.0), ("A2", "B2", 3.0),
    }
    assert df.schema == rio.REVIEWS_SCHEMA


def test_item_meta_nested_categories(spark, tmp_path):
    meta = {"asin": "B1", "categories": [["Books", "Fiction"]], "brand": None,
            "price": "$12.34"}
    p = tmp_path / "meta.json"
    p.write_text(json.dumps(meta) + "\n")
    r = rio.read_item_meta_json(spark, str(p)).collect()[0]
    assert r.categories == [["Books", "Fiction"]]
    assert r.price == "$12.34"


def test_csv_roundtrip_behavior(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(user_id="u1", item_id="i1", timestamp=100),
         Row(user_id="u2", item_id="i2", timestamp=200)],
        schema=rio.BEHAVIOR_SCHEMA,
    )
    out = str(tmp_path / "behavior_csv")
    rio.write_csv(df, out, single_file=True)
    back = rio.read_behavior_csv(spark, out)
    assert back.schema == rio.BEHAVIOR_SCHEMA
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_dense_embeddings_wide_to_array(spark, tmp_path):
    header = "item_id," + ",".join(f"emb_{i}" for i in range(4))
    rows = ["I1,0.1,0.2,0.3,0.4", "I2,1.0,0.0,0.0,0.0"]
    p = tmp_path / "emb.csv"
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    df = rio.read_dense_embeddings_csv(spark, str(p), "item_id", dim=4)
    got = {r.item_id: r.embedding for r in df.collect()}
    assert got["I2"] == [1.0, 0.0, 0.0, 0.0]
    assert dict(df.dtypes)["embedding"] == "array<float>"


def test_id_list_trim_and_skip_blank(spark, tmp_path):
    p = tmp_path / "ids.txt"
    p.write_text("  A1 \nA2\n\n   \nA3\n")
    ids = sorted(r.user_id for r in rio.read_id_list(spark, str(p)).collect())
    assert ids == ["A1", "A2", "A3"]


def test_kafka_records_parse_back(spark):
    df = spark.createDataFrame(
        [Row(user_id="u1", history_items=["a", "b"], timestamp=1700000000)]
    )
    rec = rio.to_kafka_records(df).collect()[0]
    assert rec.key == "u1"
    parsed = (
        spark.createDataFrame([Row(value=rec.value)])
        .select(F.from_json("value", PROFILE_SCHEMA).alias("d"))
        .select("d.*")
        .collect()[0]
    )
    assert (parsed.user_id, parsed.history_items, parsed.timestamp) == (
        "u1", ["a", "b"], 1700000000,
    )


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    rows = [
        Row(user_id=f"u{i}", item_id=f"i{i % 3}", timestamp=1_700_000_000 + i)
        for i in range(30)
    ]
    path = str(tmp_path / "behavior_orc")
    rio.write_orc(spark.createDataFrame(rows), path, partition_by=["item_id"])

    back = rio.read_orc(spark, path)
    assert back.count() == 30
    assert {r.item_id for r in back.select("item_id").distinct().collect()} == {
        "i0",
        "i1",
        "i2",
    }
    # partition pruning: an item_id filter reads only that directory
    pruned = back.where(F.col("item_id") == "i1")
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "i1" in plan  # partition filter reached the scan
