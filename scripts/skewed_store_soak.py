"""Skewed-corpus store-read stress (VERDICT r11 #4): the hybrid and
passage serving reads under a POWER-LAW term distribution — one hot
term present in ~30% of all documents (the q130 skew discipline
applied to the store reads instead of a join key).

What could break at 100 TB: a query containing the hot term scores
~0.3 x |corpus| candidate rows; if the per-query top-k ran as one
naive window partition, ONE reducer would process all of them. The
design defense is already structural — the query side broadcasts
into the postings scan (no shuffle keyed on term anywhere), the
(query_doc, doc) aggregation is partial map-side, and the rank<=k
window compiles to WindowGroupLimit (partial per-map-partition
top-k BEFORE the query_doc shuffle, so the final window sees
<= k x n_partitions rows, not 0.3 x |corpus|). This soak MEASURES
that: hot-query vs cold-query serving latency over the compacted
stores, the candidate volumes behind them, and the plan pins
(WindowGroupLimit present, hot-term shuffle absent). The latency
spread should track candidate volume sub-linearly (the scan
dominates; the skewed tail collapses map-side) — recorded for
BASELINE.md; the structural pin lives in
tests/test_plan_audit.py::test_skewed_store_read_plan.

Run:  python scripts/skewed_store_soak.py [n_batches] [per_batch]
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

HOT = "hotterm"


def doc_text(k: int) -> str:
    rng = random.Random(k)
    words = [f"w{rng.randrange(5000)}" for _ in range(30)]
    if k % 10 < 3:  # 30% of docs carry the hot term, 3 occurrences
        for slot in (3, 11, 23):
            words[slot] = HOT
    return " ".join(words)


def main(n_batches: int, per_batch: int) -> None:
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.text import (
        best_passage_from_positions,
    )
    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming import store
    from streaming_recommendation_spark.streaming.hybrid import (
        compact_doc_vectors,
        hybrid_query,
        vectors_ingest_batch,
    )
    from streaming_recommendation_spark.streaming.postings import (
        compact_positional,
        compact_postings,
        positional_ingest_batch,
        postings_ingest_batch,
    )

    spark = get_spark(app_name="skewed-store-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="skewed_store_")
    pdir, pb = f"{work}/post", f"{work}/postb"
    vdir, vb = f"{work}/vec", f"{work}/vecb"
    odir, ob = f"{work}/pos", f"{work}/posb"

    n_docs = n_batches * per_batch
    t0 = time.time()
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        postings_ingest_batch(df, b, pdir)
        vectors_ingest_batch(df, b, vdir)
        positional_ingest_batch(df, b, odir)
    t_ingest = time.time() - t0
    compact_postings(spark, pdir, pb, upto_batch_id=n_batches - 1)
    compact_doc_vectors(spark, vdir, vb, upto_batch_id=n_batches - 1)
    compact_positional(spark, odir, ob, upto_batch_id=n_batches - 1)

    tf_schema = "doc_id bigint, term string, tf bigint, batch_id bigint"
    tf = store.read_store_resolved(spark, pdir, tf_schema, pb, ["doc_id"])
    n_hot_docs = tf.where(F.col("term") == HOT).count()

    # doc 0 carries the hot term (0 % 10 < 3); doc 5 does not
    hot_q = spark.createDataFrame([(0,)], "query_doc bigint")
    cold_q = spark.createDataFrame([(5,)], "query_doc bigint")

    def timed(fn):
        best = None
        for _ in range(2):
            t = time.perf_counter()
            n = fn().count()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        return round(best, 3), n

    t_hyb_hot, _ = timed(
        lambda: hybrid_query(
            spark, pdir, vdir, hot_q, k_leg=20, k=10,
            postings_base_dir=pb, vectors_base_dir=vb,
        )
    )
    t_hyb_cold, _ = timed(
        lambda: hybrid_query(
            spark, pdir, vdir, cold_q, k_leg=20, k=10,
            postings_base_dir=pb, vectors_base_dir=vb,
        )
    )

    pos_schema = "doc_id bigint, term string, pos int, batch_id bigint"

    def passage_read(q):
        pos = store.read_store_resolved(
            spark, odir, pos_schema, ob, ["doc_id"]
        ).drop("batch_id")
        return best_passage_from_positions(pos, q, window=16, k_docs=5)

    t_pas_hot, _ = timed(lambda: passage_read(hot_q))
    t_pas_cold, _ = timed(lambda: passage_read(cold_q))

    # plan pins on the served read (the test_plan_audit pin, asserted
    # here too so the soak fails loudly if the structure regresses)
    plan = hybrid_query(
        spark, pdir, vdir, hot_q, k_leg=20, k=10,
        postings_base_dir=pb, vectors_base_dir=vb,
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "top-k lost its partial pushdown"
    assert "CartesianProduct" not in plan

    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "skewed_store_soak": {
                    "n_docs": n_docs,
                    "hot_doc_fraction": round(n_hot_docs / n_docs, 3),
                    "ingest_s": round(t_ingest, 1),
                    "hybrid_hot_s": t_hyb_hot,
                    "hybrid_cold_s": t_hyb_cold,
                    "hybrid_spread": round(t_hyb_hot / t_hyb_cold, 2),
                    "passage_hot_s": t_pas_hot,
                    "passage_cold_s": t_pas_cold,
                    "passage_spread": round(t_pas_hot / t_pas_cold, 2),
                    "window_group_limit_pinned": True,
                }
            }
        )
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1000,
    )
