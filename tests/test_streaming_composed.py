"""Composition test: one event stream drives THREE stateful legs in a
single foreachBatch — SCD2 dimension maintenance, HLL cardinality,
and CMS frequency — each with its own independently-idempotent state
(bucket-versioned intervals; versioned sketch snapshots). Pins that
the round-5 state patterns compose in one micro-batch loop and that
every leg equals its batch-computed answer after a multi-batch
carry."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.scd2 import (
    scd2_finalize,
    scd2_intervals,
)
from streaming_recommendation_spark.operators.sketch import (
    cms_counts,
    hll_distinct,
)
from streaming_recommendation_spark.streaming.scd2 import Scd2Stream
from streaming_recommendation_spark.streaming.sketches import (
    CmsStreamSketch,
    HllStreamSketch,
    read_sketch_state,
    sketch_ingest_batch,
)

SCHEMA = "user_id bigint, event_type string, ts bigint, event_id bigint"


def _rows():
    out = []
    for k in range(360):
        out.append((k % 23, f"t{(k // 40) % 3}", 100 + k, 1000 + k))
    return out


def test_one_stream_three_stateful_legs(spark, tmp_path):
    rows = _rows()
    d = tmp_path / "cdc"
    d.mkdir()
    for fi in range(3):
        chunk = rows[fi * 120 : (fi + 1) * 120]
        p = d / f"b{fi}.jsonl"
        p.write_text(
            "\n".join(
                json.dumps(dict(zip(("user_id", "event_type", "ts", "event_id"), r)))
                for r in chunk
            )
            + "\n"
        )
        now = p.stat().st_mtime
        os.utime(p, (now - 300 + fi * 100, now - 300 + fi * 100))

    dim = Scd2Stream(str(tmp_path / "scd2"), n_buckets=4)
    hll = HllStreamSketch("user_id", ["event_type"],
                          group_schema="event_type string")
    cms = CmsStreamSketch("user_id")
    hll_dir = str(tmp_path / "hll")
    cms_dir = str(tmp_path / "cms")

    def process(batch_df, batch_id):
        batch_df = batch_df.persist()
        try:
            dim.ingest_batch(batch_df, batch_id)
            sketch_ingest_batch(batch_df, batch_id, hll, hll_dir)
            sketch_ingest_batch(batch_df, batch_id, cms, cms_dir)
        finally:
            batch_df.unpersist()

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 3

    full = spark.createDataFrame(rows, SCHEMA)
    got_scd2 = sorted(
        map(tuple, scd2_finalize(dim.read_state(spark)).collect()), key=repr
    )
    want_scd2 = sorted(
        map(tuple, scd2_finalize(scd2_intervals(full)).collect()), key=repr
    )
    assert got_scd2 == want_scd2

    got_hll = sorted(
        map(
            tuple,
            hll.finalize(read_sketch_state(spark, hll_dir, hll.schema())).collect(),
        )
    )
    want_hll = sorted(
        map(tuple, hll_distinct(full, "user_id", ["event_type"]).collect())
    )
    assert got_hll == want_hll

    got_cms = sorted(
        map(tuple, read_sketch_state(spark, cms_dir, cms.schema()).collect())
    )
    want_cms = sorted(map(tuple, cms_counts(full, "user_id").collect()))
    assert got_cms == want_cms
