"""In-stream cascade scoring (ST7 replacement) and the
applyInPandasWithState running-history operator."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.sources.testdata import load_table
from streaming_recommendation_spark.streaming import JsonlDirSink
from streaming_recommendation_spark.streaming.scoring import (
    recommendation_pipeline,
    score_batch,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def items(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    return emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec")
    ).cache()


def profile_messages():
    return [
        {"user_id": "100", "history_items": ["1", "2", "3"], "timestamp": 1_700_000_100},
        {"user_id": "200", "history_items": ["10", "20"], "timestamp": 1_700_000_200},
    ]


def test_score_batch_contract(spark, items):
    profiles = spark.createDataFrame(profile_messages())
    from streaming_recommendation_spark.cascade import CascadeConfig

    out = score_batch(profiles, items, CascadeConfig(k_final=5))
    recs = {r.key: json.loads(r.value) for r in out.collect()}
    assert set(recs) == {
        "recommendation_result:100:1700000100",
        "recommendation_result:200:1700000200",
    }
    for key, item_list in recs.items():
        assert len(item_list) == 5
    # history exclusion: user 100's seen items {1,2,3} never recommended
    assert not {"1", "2", "3"} & set(recs["recommendation_result:100:1700000100"])


def test_recommendation_pipeline_streaming(spark, items, tmp_path):
    msgs = tmp_path / "msgs"
    msgs.mkdir()
    (msgs / "m.txt").write_text(
        "\n".join(json.dumps(m) for m in profile_messages()) + "\n"
    )
    sink = JsonlDirSink(str(tmp_path / "kv"))
    raw = spark.readStream.text(str(msgs))
    q = recommendation_pipeline(raw, items, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kv = sink.read_all()
    assert "recommendation_result:100:1700000100" in kv
    assert len(json.loads(kv["recommendation_result:100:1700000100"])) == 10


def test_running_history_state(spark, tmp_path):
    """Incremental one-item-per-message events accumulate into bounded
    per-user profiles across micro-batches (maxFilesPerTrigger=1
    forces two batches)."""
    from streaming_recommendation_spark.streaming.stateful import (
        running_history_state,
    )

    d = tmp_path / "ev"
    d.mkdir()
    batch1 = [{"user_id": "u1", "item": f"i{k}", "timestamp": 1000 + k} for k in range(3)]
    batch2 = [
        {"user_id": "u1", "item": f"j{k}", "timestamp": 2000 + k} for k in range(4)
    ] + [{"user_id": "u2", "item": "x", "timestamp": 2500}]
    (d / "a.txt").write_text("\n".join(json.dumps(m) for m in batch1) + "\n")
    (d / "b.txt").write_text("\n".join(json.dumps(m) for m in batch2) + "\n")
    # the file source orders batches by modification time — pin it
    import os, time

    now = time.time()
    os.utime(d / "a.txt", (now - 100, now - 100))
    os.utime(d / "b.txt", (now, now))

    schema = "user_id string, item string, timestamp long"
    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(d))
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
    )
    # evict_idle=False: bounded run must drain and self-terminate
    # (with eviction on, timeout-evaluation batches run forever)
    out = running_history_state(raw, max_items=5, evict_idle=False)
    # state-store maintenance cost scales with state partitions; 2 is
    # plenty for 2 users and cuts this test from ~2min to seconds
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("hist_state")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_state"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows = spark.sql("SELECT * FROM hist_state").collect()
    # u1 appears once per micro-batch that touched it; the LAST emission
    # carries the accumulated, truncated history
    u1 = sorted((r for r in rows if r.user_id == "u1"), key=lambda r: r.timestamp)
    assert u1, rows
    final = u1[-1]
    if len(u1) > 1:  # state carried across batches
        assert u1[0].history_items == ["i0", "i1", "i2"]
    assert final.timestamp == 2003
    # last-5 of [i0 i1 i2 j0 j1 j2 j3]
    assert final.history_items == ["i2", "j0", "j1", "j2", "j3"]
    u2 = [r for r in rows if r.user_id == "u2"]
    assert u2 and u2[0].history_items == ["x"]


def test_ingest_throughput_meets_baseline(spark, tmp_path):
    """BASELINE.md target: >= 50 profiles/sec sustained through parse
    -> dedup -> executor-side KV writes, on one node. 10k messages
    through the full pipeline must clear it with a wide margin."""
    import time

    from streaming_recommendation_spark.streaming import (
        JsonlDirSink,
        profile_pipeline,
    )

    d = tmp_path / "bulk"
    d.mkdir()
    n = 10_000
    lines = [
        json.dumps(
            {
                "user_id": f"u{i % 500}",
                "history_items": [f"i{(i + k) % 1000}" for k in range(10)],
                "timestamp": 1_700_000_000 + i,
            }
        )
        for i in range(n)
    ]
    (d / "bulk.txt").write_text("\n".join(lines) + "\n")

    sink = JsonlDirSink(str(tmp_path / "kv"))
    t0 = time.perf_counter()
    q = profile_pipeline(
        spark.readStream.text(str(d)), sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    elapsed = time.perf_counter() - t0
    written = len(sink.read_all())
    assert written == n  # all (user, ts) pairs unique by construction
    rate = written / elapsed
    assert rate >= 50, f"{rate:.0f} profiles/sec < 50 target"


def test_score_batch_keeps_profile_versions_separate(spark, items):
    """Two versions of the same user in one micro-batch must each be
    scored against exactly their own history (older versions
    previously got blended histories and the newer history's
    exclusions)."""
    profiles = spark.createDataFrame(
        [
            {"user_id": "300", "history_items": ["1", "2"], "timestamp": 1_700_000_100},
            {"user_id": "300", "history_items": ["50", "51", "52"], "timestamp": 1_700_000_200},
        ]
    )
    from streaming_recommendation_spark.cascade import CascadeConfig

    out = score_batch(profiles, items, CascadeConfig(k_final=5))
    recs = {r.key: json.loads(r.value) for r in out.collect()}
    assert set(recs) == {
        "recommendation_result:300:1700000100",
        "recommendation_result:300:1700000200",
    }
    v1 = recs["recommendation_result:300:1700000100"]
    v2 = recs["recommendation_result:300:1700000200"]
    # each version excludes ONLY its own history
    assert not {"1", "2"} & set(v1)
    assert not {"50", "51", "52"} & set(v2)
    # different histories -> different user vectors -> different lists
    assert v1 != v2


def test_ewma_state_matches_batch_across_microbatches(spark, tmp_path):
    """Streaming EWMA with keyed state must be bit-equal to the batch
    operator regardless of how events split into micro-batches
    (maxFilesPerTrigger=1 forces two batches; state carries the
    recurrence boundary)."""
    import json as _json

    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.grouped_pandas import (
        ewma_by_key,
    )
    from streaming_recommendation_spark.streaming.stateful import ewma_state

    rows = [
        dict(user_id=u, event_id=u * 100 + i, ts=i,
             value=float((u * 13 + i * 7) % 29) + 0.5)
        for u in (1, 2)
        for i in range(6)
    ]
    d = tmp_path / "ev"
    d.mkdir()
    # split mid-user so the carry actually crosses a batch boundary
    (d / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows if r["ts"] < 3) + "\n"
    )
    (d / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in rows if r["ts"] >= 3) + "\n"
    )
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    sink_dir = str(tmp_path / "out")
    q = (
        ewma_state(stream)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain in 120s"
    got = {
        r.event_id: r.ewma for r in spark.read.parquet(sink_dir).collect()
    }
    batch = {
        r.event_id: r.ewma
        for r in ewma_by_key(spark.createDataFrame(
            [Row(**r) for r in rows]
        )).collect()
    }
    assert got == batch  # bit-equal, every event emitted exactly once
