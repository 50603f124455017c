"""Streaming gate-at-ingest curation soak: N micro-batches through
streaming/curation.py, measuring PER-BATCH wall time as the stored
quality-passing signature index grows.

The scale claims under test: (a) per-batch cost is ~ |batch| x bands
(map-side quality gate + one hash of the batch + equi-joins against
the index), NOT ~ |corpus| — per-batch latency should stay near-flat;
(b) quality-failed docs never reach the signature stage, so a
junk-heavy stream costs LESS per batch, not the same. Run:
  python scripts/curation_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds, the flatness ratio
(mean of last 3 / mean of batches 2-4; batch 1 pays codegen),
throughput, and the verdict tallies.
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
    from streaming_recommendation_spark.streaming.curation import (
        curation_ingest_batch,
        read_verdicts,
    )

    spark = get_spark(app_name="curation-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="curation_soak_")
    index_dir = f"{work}/index"
    verdicts_dir = f"{work}/verdicts"

    # synthetic stream: ~10% cross-batch duplicates (the join must
    # find them), ~10% junk (punct salad — must fail the quality gate
    # and never be hashed), the rest stopword-bearing k-seeded
    # sentences over a 5000-word vocabulary (pass the gate,
    # pairwise-distinct with overwhelming probability)
    import random

    def doc_text(k: int) -> str:
        if k % 10 == 3 and k > per_batch:
            return doc_text(k - per_batch)  # duplicate of previous batch
        if k % 10 == 7:
            return "@@@ ### !!! $$$ %%% ^^^"  # junk: quality-rejected
        rng = random.Random(k)
        words = [f"w{rng.randrange(5000)}" for _ in range(26)]
        # interleave stopwords so the quality gate's stop_ratio clears
        # the threshold for genuine docs
        out = []
        for i, w in enumerate(words):
            out.append(w)
            if i % 2 == 0:
                out.append("the" if i % 4 == 0 else "and")
        return " ".join(out)

    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        curation_ingest_batch(batch, b, index_dir, verdicts_dir)
        times.append(round(time.perf_counter() - t0, 2))

    v = read_verdicts(spark, verdicts_dir)
    tallies = {
        r["k"]: r["n"]
        for r in v.select(
            F.concat_ws(
                "_",
                F.col("quality_kept").cast("string"),
                F.col("is_dup").cast("string"),
            ).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    index_rows = spark.read.parquet(index_dir).count()
    n_admitted = v.where(F.col("admitted") == 1).count()
    shutil.rmtree(work, ignore_errors=True)
    early = sum(times[1:4]) / 3 if n_batches >= 4 else times[-1]
    late = sum(times[-3:]) / 3
    total = n_batches * per_batch
    print(
        json.dumps(
            {
                "metric": "curation_soak_batch_seconds",
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "docs_per_sec": round(total / sum(times), 1),
                "index_rows": index_rows,
                "admitted": n_admitted,
                "verdict_tallies(quality_dup)": tallies,
            }
        )
    )


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(nb, per)
