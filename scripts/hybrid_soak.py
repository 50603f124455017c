"""Store-backed hybrid retrieval soak: N micro-batches through BOTH
ingest stores (streaming/postings.py tf index + streaming/hybrid.py
doc-vector store), measuring PER-BATCH wall time as both stores grow,
then answering the RRF hybrid search from the accumulated state.

The scale claims under test: (a) per-batch ingest cost for each store
~ |batch| (one batch-local aggregation / one map-side projection + a
partitioned append — NO cross-batch join at ingest, so per-batch
latency stays flat as the stores grow); (b) the hybrid search from
the two persisted stores equals the one-shot batch fusion (q199's
arithmetic) bit-for-bit on the same corpus. Run:
  python scripts/hybrid_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds per store, the flatness
ratio (mean of last 3 / mean of batches 2-4; batch 1 pays codegen),
throughput, and search parity.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(n_batches: int, per_batch: int) -> None:
    import random

    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.features import (
        doc_hash_embed,
    )
    from streaming_recommendation_spark.operators.similarity import (
        cosine_topk_i64,
    )
    from streaming_recommendation_spark.operators.text import (
        bm25_search,
        rrf_fuse,
    )
    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.hybrid import (
        hybrid_query,
        vectors_ingest_batch,
    )
    from streaming_recommendation_spark.streaming.postings import (
        postings_ingest_batch,
    )

    spark = get_spark(app_name="hybrid-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="hybrid_soak_")
    pdir, vdir = f"{work}/postings", f"{work}/vectors"

    def doc_text(k: int) -> str:
        rng = random.Random(k)
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(40))

    all_rows = []
    t_post, t_vec = [], []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        all_rows.extend(rows)
        bdf = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        postings_ingest_batch(bdf, b, pdir)
        t_post.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        vectors_ingest_batch(bdf, b, vdir)
        t_vec.append(round(time.perf_counter() - t0, 3))

    whole = spark.createDataFrame(all_rows, "doc_id bigint, text string")
    qids = whole.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_doc")
    )
    t0 = time.perf_counter()
    from_disk = sorted(
        map(tuple, hybrid_query(spark, pdir, vdir, qids, k_leg=20, k=10).collect())
    )
    search_s = round(time.perf_counter() - t0, 3)

    # one-shot batch fusion (q199's shape) as the expected value
    bm = bm25_search(whole, F.col("doc_id") < 3, k=20, scale=1000).select(
        "query_doc", "doc_id", F.col("rank").alias("bm25_rank")
    )
    emb = doc_hash_embed(whole, n_features=64)
    qs = emb.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_doc"), F.col("vec").alias("__qv")
    )
    er = cosine_topk_i64(
        qs, emb.select("doc_id", F.col("vec").alias("__cv")), k=20
    )
    batch = sorted(map(tuple, rrf_fuse(bm, er, k=10).collect()))

    def flat(ts):
        return round((sum(ts[-3:]) / 3) / (sum(ts[1:4]) / 3), 2)

    out = {
        "metric": "hybrid_soak",
        "batches": n_batches,
        "docs_per_batch": per_batch,
        "postings_per_batch_sec": t_post,
        "vectors_per_batch_sec": t_vec,
        "postings_flatness": flat(t_post),
        "vectors_flatness": flat(t_vec),
        "docs_per_sec": round(
            n_batches * per_batch / (sum(t_post) + sum(t_vec)), 1
        ),
        "hybrid_from_stores_equals_batch": from_disk == batch,
        "search_sec": search_s,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    assert from_disk == batch and from_disk


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pb = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(nb, pb)
