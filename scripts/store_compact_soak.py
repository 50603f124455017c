"""Store-compaction soak (VERDICT r10 #2): ingest N micro-batches
into the postings + doc-vector stores, then measure what compaction
buys on the SERVING read path —

  * file counts before/after (the per-batch delta layout accumulates
    one partition directory per batch forever; the compacted base is
    one generation);
  * wall time of the same hybrid search over the raw delta log vs
    over the compacted base (same answer, pinned);
  * the tombstone variant: fold a forget set during compaction and
    confirm the forgotten ids are absent from every surviving
    parquet file's bytes (the q223/q216 erasure story, measured on a
    store big enough to matter).

Run:  python scripts/store_compact_soak.py [n_batches] [docs_per_batch]
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _pfiles(d):
    out = []
    for root, _dirs, files in os.walk(d):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def main(n_batches: int, per_batch: int) -> None:
    import random

    from pyspark.sql import functions as F

    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.hybrid import (
        compact_doc_vectors,
        hybrid_query,
        vectors_ingest_batch,
    )
    from streaming_recommendation_spark.streaming.postings import (
        compact_postings,
        postings_ingest_batch,
    )

    spark = get_spark(app_name="store-compact-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="compact_soak_")
    pdir, vdir = f"{work}/postings", f"{work}/vectors"
    pb, vb = f"{work}/postings__base", f"{work}/vectors__base"

    def doc_text(k: int) -> str:
        rng = random.Random(k)
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(40))

    t_ingest = time.time()
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(per_batch)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        postings_ingest_batch(df, b, pdir)
        vectors_ingest_batch(df, b, vdir)
    t_ingest = time.time() - t_ingest

    qids = spark.createDataFrame([(0,), (1,), (2,)], "query_doc bigint")

    def search(postings_base=None, vectors_base=None):
        return sorted(
            map(
                tuple,
                hybrid_query(
                    spark,
                    pdir,
                    vdir,
                    qids,
                    k_leg=20,
                    k=10,
                    postings_base_dir=postings_base,
                    vectors_base_dir=vectors_base,
                ).collect(),
            )
        )

    files_before = len(_pfiles(pdir)) + len(_pfiles(vdir))
    t0 = time.time()
    want = search()
    t_raw = time.time() - t0
    t0 = time.time()
    want2 = search()
    t_raw = min(t_raw, time.time() - t0)

    # quiesced compaction folding EVERYTHING, with a forget set
    forget = spark.createDataFrame(
        [(7,), (per_batch + 7,)], "doc_id bigint"
    )
    # the q223 parity target, captured BEFORE the fold deletes the
    # delta log: read-time filtering == physical erasure
    want_filtered = sorted(
        map(
            tuple,
            hybrid_query(
                spark, pdir, vdir, qids, k_leg=20, k=10, tombstones=forget
            ).collect(),
        )
    )
    t0 = time.time()
    compact_postings(
        spark, pdir, pb, upto_batch_id=n_batches - 1, tombstones=forget
    )
    compact_doc_vectors(
        spark, vdir, vb, upto_batch_id=n_batches - 1, tombstones=forget
    )
    t_compact = time.time() - t0
    files_after = (
        len(_pfiles(pdir))
        + len(_pfiles(vdir))
        + len(_pfiles(pb))
        + len(_pfiles(vb))
    )

    t0 = time.time()
    got = search(postings_base=pb, vectors_base=vb)
    t_compacted = time.time() - t0
    t0 = time.time()
    got2 = search(postings_base=pb, vectors_base=vb)
    t_compacted = min(t_compacted, time.time() - t0)

    forgotten_in_files = 0
    for f in _pfiles(pb) + _pfiles(vb) + _pfiles(pdir) + _pfiles(vdir):
        forgotten_in_files += (
            spark.read.parquet(f)
            .where(F.col("doc_id").isin(7, per_batch + 7))
            .count()
        )
    ok = (
        want == want2
        and got == got2
        and got == want_filtered  # erase-then-search == filter-at-search
        and forgotten_in_files == 0
        and all(r[1] not in (7, per_batch + 7) for r in got)
    )
    print(
        json.dumps(
            {
                "metric": "store_compact_soak",
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "ingest_sec": round(t_ingest, 2),
                "files_before": files_before,
                "files_after": files_after,
                "compact_sec": round(t_compact, 2),
                "search_raw_sec": round(t_raw, 2),
                "search_compacted_sec": round(t_compacted, 2),
                "forgotten_rows_in_files": forgotten_in_files,
                "parity_ok": ok,
            }
        ),
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 24,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1000,
    )
