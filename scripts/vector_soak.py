"""Vector-index ingest soak with periodic compaction: continuous
embedding batches (10% of each batch RE-INGESTS earlier ids — the
mutable-upsert case) through VectorIndexStream, measuring per-batch
ingest wall time, ANN query latency on three paths (default over
deltas, latest_only fallback, default post-compaction), and index
file/row counts before vs after compaction.

What this evidences beyond tests/test_streaming_vectors.py (which
pins correctness at toy scale): ingest cost tracks batch size (cell
assignment never touches the stored corpus), the latest_only
fallback's full-index aggregate is measurably more expensive than a
probe over the compacted base, and compaction bounds both index size
(latest copy per id) and file count (one generation instead of N
delta partitions). Run:
  python scripts/vector_soak.py [n_batches] [vectors_per_batch]
Prints one JSON line.
"""
from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(n_batches: int, per_batch: int) -> None:
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.vectors import VectorIndexStream

    spark = get_spark(app_name="vector-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="vector_soak_")
    dim = 64

    def vecs(ids):
        return ids.select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(1000)) / 500.0
                    - 1.0
                ).cast("float"),
            ).alias("embedding"),
        )

    def batch_frame(b: int):
        lo = b * per_batch
        fresh = spark.range(lo, lo + per_batch)
        if b == 0:
            return vecs(fresh)
        # 10% re-ingest of ids from the previous batch (new vectors
        # would be the realistic case; identical ones measure the
        # same code path)
        re_lo = (b - 1) * per_batch
        redo = spark.range(re_lo, re_lo + per_batch // 10)
        return vecs(fresh.union(redo))

    vix = VectorIndexStream(f"{work}/index", f"{work}/lm")
    vix.init_landmarks(vecs(spark.range(0, per_batch)), num_landmarks=32)

    ingest_times = []
    for b in range(n_batches):
        df = batch_frame(b).persist()
        df.count()
        t0 = time.time()
        vix.ingest_batch(df, b)
        ingest_times.append(round(time.time() - t0, 2))
        df.unpersist()

    queries = vecs(spark.range(0, 50)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).persist()
    queries.count()

    def q(**kw):
        t0 = time.time()
        n = vix.ann_query(spark, queries, k=10, n_probe=4, **kw).count()
        return round(time.time() - t0, 2), n

    pre_files = len(glob.glob(f"{vix.index_dir}/**/*.parquet", recursive=True))
    pre_rows = vix.read_index(spark).count()
    t_default_pre, _ = q()
    t_latest_only, _ = q(latest_only=True)

    t0 = time.time()
    gen = vix.compact(spark, upto_batch_id=n_batches - 1)  # quiesced
    t_compact = round(time.time() - t0, 2)
    post_rows = vix.read_index(spark).count()
    post_files = len(
        glob.glob(f"{vix.base_dir}/v={gen}/**/*.parquet", recursive=True)
    )
    t_default_post, _ = q()

    early = sum(ingest_times[1:4]) / 3 if n_batches >= 4 else ingest_times[-1]
    late = sum(ingest_times[-3:]) / 3
    print(
        json.dumps(
            {
                "metric": "vector_soak",
                "n_batches": n_batches,
                "vectors_per_batch": per_batch,
                "ingest_per_batch_sec": ingest_times,
                "ingest_flatness_late_over_early": round(late / early, 2),
                "index_rows_pre_compact": pre_rows,
                "index_rows_post_compact": post_rows,
                "parquet_files_pre": pre_files,
                "parquet_files_post": post_files,
                "query_default_over_deltas_sec": t_default_pre,
                "query_latest_only_sec": t_latest_only,
                "query_default_post_compact_sec": t_default_post,
                "compact_sec": t_compact,
                "base_generation": gen,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    main(n, m)
