"""Streaming inverted-index (postings) soak: N micro-batches through
streaming/postings.py, measuring PER-BATCH wall time as the stored
postings table grows, then searching the accumulated index.

The scale claims under test: (a) per-batch ingest cost ~ |batch|
tokens (one batch-local (doc, term) aggregation + one partitioned
append — there is NO cross-batch join in the ingest, so per-batch
latency should stay flat as the store grows); (b) the accumulated
store equals one-shot whole-corpus tokenization exactly (the
union-of-batches identity); (c) a BM25 search over the final store
matches the batch bm25_search on the same corpus bit-for-bit. Run:
  python scripts/postings_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds, the flatness ratio
(mean of last 3 / mean of batches 2-4; batch 1 pays codegen),
throughput, store-vs-one-shot row parity, and search parity.
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

    from streaming_recommendation_spark.operators.text import bm25_search
    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.postings import (
        bm25_query,
        postings_batch,
        postings_ingest_batch,
        read_postings,
    )

    spark = get_spark(app_name="postings-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="postings_soak_")
    pdir = f"{work}/postings"

    # synthetic stream: ~40-word docs over a 5000-word vocabulary so
    # terms repeat across batches (df/T keep moving as the index grows)
    import random

    def doc_text(k: int) -> str:
        rng = random.Random(k)
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(40))

    all_rows = []
    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        all_rows.extend(rows)
        bdf = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        postings_ingest_batch(bdf, b, pdir)
        times.append(round(time.perf_counter() - t0, 3))

    store = read_postings(spark, pdir)
    whole = spark.createDataFrame(all_rows, "doc_id bigint, text string")
    oneshot = postings_batch(whole)
    store_rows = store.count()
    parity = (
        store.select("doc_id", "term", "tf")
        .exceptAll(oneshot)
        .unionByName(oneshot.exceptAll(store.select("doc_id", "term", "tf")))
        .count()
        == 0
    )

    qids = whole.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_doc")
    )
    t0 = time.perf_counter()
    from_disk = sorted(
        map(tuple, bm25_query(spark, pdir, qids, k=10).collect())
    )
    search_s = round(time.perf_counter() - t0, 3)
    batch = sorted(
        map(tuple, bm25_search(whole, F.col("doc_id") < 3, k=10).collect())
    )

    early = sum(times[1:4]) / 3
    late = sum(times[-3:]) / 3
    out = {
        "metric": "postings_soak",
        "batches": n_batches,
        "docs_per_batch": per_batch,
        "per_batch_sec": times,
        "flatness_late_over_early": round(late / early, 2),
        "docs_per_sec": round(n_batches * per_batch / sum(times), 1),
        "store_rows": store_rows,
        "store_equals_oneshot": parity,
        "search_from_disk_equals_batch": from_disk == batch,
        "search_sec": search_s,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    assert parity and from_disk == batch and from_disk


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pb = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(nb, pb)
