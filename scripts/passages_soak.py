"""Streaming passage-dedup soak: N micro-batches through
streaming/passages.py, measuring PER-BATCH wall time as the stored
passage-hash index grows.

The scale claims under test: (a) per-batch cost ~ |batch| passages
(map-side chunking + one batch-local hash window + one equi-join
against the index), NOT ~ |corpus| — per-batch latency should stay
near-flat as the index grows; (b) the index is a SET bounded by
content NOVELTY: re-sent passages add zero index rows. Run:
  python scripts/passages_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds, the flatness ratio
(mean of last 3 / mean of batches 2-4; batch 1 pays codegen),
throughput, the index size vs total passages seen, and the planted
duplicate tally (exactness check: every planted cross-batch copy and
only those must flag).
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

    from streaming_recommendation_spark.streaming.passages import (
        passage_ingest_batch,
        read_manifests,
    )
    from streaming_recommendation_spark.session import get_spark

    spark = get_spark(app_name="passages-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="passages_soak_")
    index_dir = f"{work}/index"
    manifest_dir = f"{work}/manifests"

    # synthetic stream: every doc is 3 passages of 16 k-seeded words
    # (pairwise-distinct with overwhelming probability); docs with
    # k % 10 == 3 (past batch 0) REPLAY the doc from one batch earlier
    # — all 3 of their passages must flag as dups; everything else
    # must not
    import random

    def doc_text(k: int) -> str:
        if k % 10 == 3 and k >= per_batch:
            return doc_text(k - per_batch)
        rng = random.Random(k)
        return " ".join(f"w{rng.randrange(100000)}" for _ in range(48))

    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        passage_ingest_batch(batch, b, index_dir, manifest_dir)
        times.append(round(time.perf_counter() - t0, 2))

    m = read_manifests(spark, manifest_dir)
    total_passages = m.agg(F.sum("n_passages")).collect()[0][0]
    total_dups = m.agg(F.sum("n_dup_passages")).collect()[0][0]
    # exactness: the planted replays are ids k%10==3 with k>=per_batch
    # (3 dup passages each); nothing else may flag
    planted = m.where(
        (F.col("doc_id") % 10 == 3) & (F.col("doc_id") >= per_batch)
    )
    planted_bad = planted.where(F.col("n_dup_passages") != 3).count()
    others_bad = m.where(
        ~((F.col("doc_id") % 10 == 3) & (F.col("doc_id") >= per_batch))
        & (F.col("n_dup_passages") != 0)
    ).count()
    index_rows = spark.read.parquet(index_dir).count()
    shutil.rmtree(work, ignore_errors=True)
    early = sum(times[1:4]) / 3 if n_batches >= 4 else times[-1]
    late = sum(times[-3:]) / 3
    total = n_batches * per_batch
    print(
        json.dumps(
            {
                "metric": "passages_soak_batch_seconds",
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "docs_per_sec": round(total / sum(times), 1),
                "index_rows": index_rows,
                "total_passages_seen": total_passages,
                "total_dup_passages": total_dups,
                "planted_with_wrong_dup_count": planted_bad,
                "false_positive_docs": others_bad,
            }
        )
    )


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(nb, per)
