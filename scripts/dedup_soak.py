"""Streaming incremental-dedup soak: N micro-batches of documents
through streaming/dedup.py, measuring PER-BATCH wall time as the
stored signature index grows.

The scale claim under test: per-batch cost is ~ |batch| x bands (the
batch is hashed once and equi-joined against the index), NOT
~ |corpus| — so per-batch latency should stay near-flat as the index
accumulates batches. A super-linear trend here would mean the index
join re-derives or re-shuffles history. Run:
  python scripts/dedup_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds and the flatness ratio
(mean of last 3 batches / mean of batches 2-4; batch 1 pays codegen).
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(n_batches: int, per_batch: int) -> None:
    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.dedup import (
        dedup_ingest_batch,
        read_candidates,
    )

    spark = get_spark(app_name="dedup-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dedup_soak_")
    index_dir = f"{work}/index"
    cands_dir = f"{work}/cands"

    # synthetic stream: ~10% of each batch duplicates a doc from an
    # earlier batch (cross-batch near-dups the join must find); the
    # rest are k-seeded random word sequences over a 5000-word
    # vocabulary — pairwise-distinct with overwhelming probability,
    # so candidate volume tracks the INJECTED duplicates, not an
    # everything-collides degenerate corpus
    import random

    def doc_text(k: int) -> str:
        if k % 10 == 3 and k > per_batch:
            return doc_text(k - per_batch)  # duplicate of previous batch
        rng = random.Random(k)
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(30))

    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        dedup_ingest_batch(batch, b, index_dir, cands_dir)
        times.append(round(time.perf_counter() - t0, 2))

    total_cands = read_candidates(spark, cands_dir).count()
    index_rows = spark.read.parquet(index_dir).count()
    shutil.rmtree(work, ignore_errors=True)
    early = sum(times[1:4]) / 3 if n_batches >= 4 else times[-1]
    late = sum(times[-3:]) / 3
    print(
        json.dumps(
            {
                "metric": "dedup_soak_batch_seconds",
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "index_rows": index_rows,
                "candidate_rows": total_cands,
            }
        )
    )


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(nb, per)
