"""Composed-ingest soak: ONE event stream drives three stateful legs
in a single foreachBatch — SCD2 dimension maintenance, HLL
cardinality, and CMS frequency — at moderate scale, measuring
per-batch wall time and final state sizes.

What this evidences beyond tests/test_streaming_composed.py (which
pins correctness at toy scale): the three state patterns compose
without per-batch cost growing with accumulated state — SCD2 writes
touch affected buckets, sketch snapshots are constant-size, so
per-batch time should track batch size. Run:
  python scripts/composed_soak.py [n_batches] [events_per_batch]
Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(n_batches: int, per_batch: int) -> None:
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.operators.scd2 import scd2_finalize
    from streaming_recommendation_spark.streaming.scd2 import Scd2Stream
    from streaming_recommendation_spark.streaming.sketches import (
        CmsStreamSketch,
        HllStreamSketch,
        read_sketch_state,
        sketch_ingest_batch,
    )

    spark = get_spark(app_name="composed-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="composed_soak_")
    dim = Scd2Stream(f"{work}/scd2", n_buckets=16)
    hll = HllStreamSketch(
        "user_id", ["event_type"], group_schema="event_type string"
    )
    cms = CmsStreamSketch("user_id")

    def batch_frame(b: int):
        lo = b * per_batch
        return spark.range(lo, lo + per_batch).select(
            (F.col("id") % 5000).alias("user_id"),
            F.concat(
                F.lit("t"), F.pmod(F.xxhash64((F.col("id") / 50).cast("long")), F.lit(4))
            ).alias("event_type"),
            F.col("id").alias("ts"),
            F.col("id").alias("event_id"),
        )

    times = []
    for b in range(n_batches):
        df = batch_frame(b).persist()
        t0 = time.perf_counter()
        dim.ingest_batch(df, b)
        sketch_ingest_batch(df, b, hll, f"{work}/hll")
        sketch_ingest_batch(df, b, cms, f"{work}/cms")
        times.append(round(time.perf_counter() - t0, 2))
        df.unpersist()

    intervals = scd2_finalize(dim.read_state(spark)).count()
    hll_rows = read_sketch_state(spark, f"{work}/hll", hll.schema()).count()
    cms_rows = read_sketch_state(spark, f"{work}/cms", cms.schema()).count()
    shutil.rmtree(work, ignore_errors=True)
    early = sum(times[1:4]) / 3 if n_batches >= 4 else times[-1]
    late = sum(times[-3:]) / 3
    print(
        json.dumps(
            {
                "metric": "composed_soak_batch_seconds",
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "n_batches": n_batches,
                "events_per_batch": per_batch,
                "scd2_intervals": intervals,
                "hll_state_rows": hll_rows,
                "cms_state_rows": cms_rows,
            }
        )
    )


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    main(nb, per)
