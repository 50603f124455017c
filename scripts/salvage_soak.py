"""Streaming passage-salvage soak: N micro-batches through the full
composed ingest (streaming/curation.py::salvage_ingest_batch — quality
gate -> signature-index dup check -> passage-index dedup of admitted
docs), measuring PER-BATCH wall time as BOTH indexes grow.

The scale claims under test: (a) per-batch cost ~ |batch| (map-side
gates + batch-local windows + two index equi-joins), NOT ~ |corpus| —
per-batch latency stays near-flat as the signature AND passage
indexes accumulate; (b) the planted stream structure lands exactly:
junk rejected on quality and never hashed, cross-batch doc dups
rejected on the signature index, and PARTIALLY-duplicated admitted
docs salvaged (shared passage dropped, unique remainder kept). Run:
  python scripts/salvage_soak.py [n_batches] [docs_per_batch]
Prints one JSON line with per-batch seconds, the flatness ratio
(mean of last 3 / mean of batches 2-4; batch 1 pays codegen),
throughput, index sizes, and the verdict/salvage tallies.
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

    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.curation import (
        read_salvage_manifests,
        salvage_ingest_batch,
    )

    spark = get_spark(app_name="salvage-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="salvage_soak_")
    sig_dir, pas_dir, man_dir = (
        f"{work}/sigs",
        f"{work}/passages",
        f"{work}/manifests",
    )

    # shared 16-word passage planted into ~10% of GENUINE docs (k%10==5)
    # so they pass the doc gate but salvage drops their first window
    SHARED = " ".join(f"s{i}" for i in range(16))

    def doc_text(k: int) -> str:
        if k % 10 == 3 and k > per_batch:
            return doc_text(k - per_batch)  # cross-batch doc duplicate
        if k % 10 == 7:
            return "@@@ ### !!! $$$ %%% ^^^"  # junk: quality-rejected
        rng = random.Random(k)
        words = [f"w{rng.randrange(5000)}" for _ in range(26)]
        out = []
        for i, w in enumerate(words):
            out.append(w)
            if i % 2 == 0:
                out.append("the" if i % 4 == 0 else "and")
        body = " ".join(out)
        if k % 10 == 5:
            return SHARED + " " + body  # partially duplicated: salvage
        return body

    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        t0 = time.perf_counter()
        salvage_ingest_batch(batch, b, sig_dir, pas_dir, man_dir)
        times.append(round(time.perf_counter() - t0, 2))

    m = read_salvage_manifests(spark, man_dir)
    n_admitted = m.where(F.col("admitted") == 1).count()
    n_salvaged = m.where(
        (F.col("admitted") == 1) & (F.col("n_dup_passages") > 0)
    ).count()
    n_quality_rejected = m.where(F.col("quality_kept") == 0).count()
    n_dups = m.where(F.col("is_dup") == 1).count()
    sig_rows = spark.read.parquet(sig_dir).count()
    pas_rows = spark.read.parquet(pas_dir).count()
    shutil.rmtree(work, ignore_errors=True)
    early = sum(times[1:4]) / 3 if n_batches >= 4 else times[-1]
    late = sum(times[-3:]) / 3
    total = n_batches * per_batch
    print(
        json.dumps(
            {
                "metric": "salvage_soak_batch_seconds",
                "per_batch_sec": times,
                "flatness_late_over_early": round(late / early, 2),
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "docs_per_sec": round(total / sum(times), 1),
                "sig_index_rows": sig_rows,
                "passage_index_rows": pas_rows,
                "admitted": n_admitted,
                "salvaged": n_salvaged,
                "quality_rejected": n_quality_rejected,
                "doc_dups": n_dups,
            }
        )
    )


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pb = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(nb, pb)
