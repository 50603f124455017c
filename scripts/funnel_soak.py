"""Streaming funnel + target-encode soak: N event micro-batches
through streaming/funnel.py and streaming/encode.py, measuring
PER-BATCH wall time and the states' row counts as events accumulate.

The scale claims under test:
  * FunnelStream state is BOUNDED at |users| x |stages| rows no
    matter how many events fold in (each batch re-delivers activity
    for a cycling user cohort — min-merge keeps one row per
    (user, stage));
  * TargetEncodeStream state is |categories| rows (additive counts
    grow in VALUE, never in cardinality beyond the category universe);
  * per-batch cost ~ the touched buckets' rewrite, NOT ~ accumulated
    event volume — a super-linear trend means the fold re-derives
    history.
Run:
  python scripts/funnel_soak.py [n_batches] [events_per_batch]
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
    from streaming_recommendation_spark.streaming.encode import (
        TargetEncodeStream,
    )
    from streaming_recommendation_spark.streaming.funnel import FunnelStream

    spark = get_spark(app_name="funnel-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="funnel_soak_")
    stages = ["view", "click", "purchase"]
    n_users = 20_000  # fixed universe; cohorts cycle through it

    def batch_frame(b: int):
        # each batch delivers per_batch events for a rotating cohort;
        # event times advance with the batch, types hash-deterministic
        rows = spark.range(per_batch).select(
            (
                (F.col("id") * 13 + b * 7919) % n_users
            ).alias("user_id"),
            (F.col("id") + b * per_batch).alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + b * 3600 + F.pmod(F.col("id"), F.lit(3600))
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(s) for s in stages + ["signup", "error"]]),
                (F.pmod(F.xxhash64(F.col("id") + b), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
        )
        return rows

    fs = FunnelStream(
        f"{work}/funnel", stages=stages, n_buckets=16, keep_versions=2
    )
    te = TargetEncodeStream(
        f"{work}/encode",
        category_col="user_id",
        target_predicate=lambda df: F.col("event_type") == "purchase",
        smoothing=100,
        n_buckets=16,
        keep_versions=2,
    )
    times = []
    for b in range(n_batches):
        df = batch_frame(b).persist()
        df.count()
        t0 = time.time()
        fs.ingest_batch(df, b)
        te.ingest_batch(df, b)
        times.append(round(time.time() - t0, 2))
        df.unpersist()

    firsts_rows = fs.read_firsts(spark).count()
    counts_rows = te.read_counts(spark).count()
    t0 = time.time()
    funnel = {
        r.stage: r.users for r in fs.funnel(spark).collect()
    }
    t_funnel = round(time.time() - t0, 2)
    t0 = time.time()
    enc_rows = te.encoding(spark).count()
    t_enc = round(time.time() - t0, 2)

    # codegen/JVM warmup dominates batch 0; compare steady slices
    steady = times[1:] or times
    k = min(3, len(steady))
    early = sum(steady[:k]) / k
    late = sum(steady[-k:]) / k
    print(
        json.dumps(
            {
                "metric": "funnel_soak",
                "n_batches": n_batches,
                "events_per_batch": per_batch,
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "events_total": n_batches * per_batch,
                "firsts_rows": firsts_rows,
                "firsts_bound": n_users * len(stages),
                "encode_rows": counts_rows,
                "funnel_users": funnel,
                "funnel_query_sec": t_funnel,
                "encoding_query_sec": t_enc,
                "events_per_sec": round(
                    n_batches * per_batch / max(sum(times), 1e-9)
                ),
            }
        )
    )
    assert firsts_rows <= n_users * len(stages), "funnel state unbounded!"
    assert counts_rows <= n_users, "encode state unbounded!"
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    main(n, m)
