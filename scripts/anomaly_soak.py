"""Streaming continuous-aggregate + alerting-read soak: N event
micro-batches through streaming/timeseries.py::TimeBucketStream,
then the q173 rolling-anomaly read over the maintained state.

The scale claims under test:
  * per-batch fold cost is FLAT — each batch reduces map-side to
    <= 1 row per (key, bucket) BEFORE touching state, and merges
    against only the buckets it touches (a super-linear trend means
    the fold re-derives history);
  * obs state grows with TIME BUCKETS (the rollup contract:
    <= |keys| x |hours covered| rows), never with raw event volume —
    each batch's events collapse ~50:1 here;
  * the alerting read (dense LOCF + rolling z-flags) runs over the
    maintained state in seconds, without rescanning event history.
Run:
  python scripts/anomaly_soak.py [n_batches] [events_per_batch]
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
    from streaming_recommendation_spark.streaming.timeseries import (
        TimeBucketStream,
    )

    spark = get_spark(app_name="anomaly-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="anomaly_soak_")
    n_keys = 2_000  # fixed key universe; each batch advances one hour

    def batch_frame(b: int):
        # per batch: per_batch events spread over n_keys keys inside
        # hour b; values hash-deterministic, with a PER-KEY spike
        # (~n_keys/499 keys per hour) so the spiked value survives the
        # last-obs-per-bucket reduction and the alerting read has
        # something to flag (an event-level spike almost never lands
        # on the bucket's final observation — the first soak run
        # measured exactly that: 0 flags)
        key = F.pmod(F.col("id") * 31 + b, F.lit(n_keys))
        return spark.range(per_batch).select(
            key.alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + b * 3600 + F.pmod(F.col("id"), F.lit(3600))
            ).alias("ts"),
            (
                F.pmod(F.xxhash64(F.col("id") + b * 7919), F.lit(100)).cast(
                    "double"
                )
                + F.when(
                    F.pmod(key + b, F.lit(499)) == 0, F.lit(5000.0)
                ).otherwise(F.lit(0.0))
            ).alias("value"),
        )

    ts = TimeBucketStream(
        f"{work}/state", bucket_seconds=3600, n_buckets=16, keep_versions=2
    )
    times = []
    for b in range(n_batches):
        df = batch_frame(b).persist()
        df.count()
        t0 = time.time()
        ts.ingest_batch(df, b)
        times.append(round(time.time() - t0, 2))
        df.unpersist()

    obs_rows = ts.read_obs(spark).count()
    t0 = time.time()
    flags = ts.anomalies(spark, window_rows=24, k_sigma=2, min_baseline=12)
    n_anom = flags.where(F.col("is_anomaly")).count()
    t_read = round(time.time() - t0, 2)

    steady = times[1:] or times
    k = min(3, len(steady))
    early = sum(steady[:k]) / k
    late = sum(steady[-k:]) / k
    print(
        json.dumps(
            {
                "metric": "anomaly_soak",
                "n_batches": n_batches,
                "events_per_batch": per_batch,
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "events_total": n_batches * per_batch,
                "obs_rows": obs_rows,
                "obs_bound_keys_x_hours": n_keys * n_batches,
                "anomalies_flagged": n_anom,
                "alerting_read_sec": t_read,
                "events_per_sec": round(
                    n_batches * per_batch / max(sum(times), 1e-9)
                ),
            }
        )
    )
    assert obs_rows <= n_keys * n_batches, "obs state exceeds rollup bound!"
    assert n_anom > 0, "soak degenerate: no anomalies flagged"
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    main(n, m)
