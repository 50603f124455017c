"""Retention-policy soak (VERDICT r11 #3): the last lifecycle leg
without a long-run number — does the versioned-state machinery keep
DISK bounded over a long stream, and does pruning ever resurrect or
lose data?

Leg A — generation store (streaming/store.py): N micro-batches into
the postings store with in-stream compaction every ``compact_every``
batches (default upto = newest-1, the in-flight rule), a rolling
UPSERT (doc 0 re-ingested with fresh text every batch — the case
retention could corrupt: an old version resurrecting would serve
stale text), and a tombstone folded from mid-run onward (an erased
doc resurrecting is the GDPR failure). After every batch we record
total bytes/files under delta+base and the generation-dir count;
the soak FAILS if any invariant breaks at any point:

  * committed generation dirs <= 2 (serving + one-cycle retention);
  * delta partitions <= compact_every + 1;
  * after every compaction: doc 0 reads EXACTLY its newest text
    (no upsert resurrection), the tombstoned doc reads absent
    (no erasure regression);
  * disk high-water stays bounded: with a growing corpus the bound
    is high_water <= final_size + one pre-compaction delta window +
    one retained generation (~2x final) — reported, and checked
    against 3x as a loose alarm.

Leg B — per-bucket versioned state (state.fold_bucketed, the
itemcf/funnel skeleton): N batches of a toy per-key counter with
``keep_versions`` retention; records version-dir count and bytes,
and checks the final read equals the full-log aggregate (pruning
dropped only superseded bucket copies).

Run:  python scripts/retention_soak.py [n_batches] [per_batch]
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _du(*dirs) -> tuple[int, int]:
    """(total bytes, parquet file count) under dirs."""
    bts = files = 0
    for d in dirs:
        for root, _dn, fns in os.walk(d):
            for f in fns:
                p = os.path.join(root, f)
                try:
                    bts += os.path.getsize(p)
                except OSError:
                    pass
                if f.endswith(".parquet"):
                    files += 1
    return bts, files


def leg_a(spark, n_batches: int, per_batch: int, compact_every: int) -> dict:
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.streaming import store
    from streaming_recommendation_spark.streaming.postings import (
        compact_postings,
        postings_ingest_batch,
    )

    work = tempfile.mkdtemp(prefix="retention_a_")
    pdir, pb = f"{work}/postings", f"{work}/postings__base"
    forget_from = n_batches // 4
    forget = spark.createDataFrame([(7,)], "doc_id bigint")

    def doc_text(k: int, salt: int = 0) -> str:
        rng = random.Random((k << 20) | salt)
        return " ".join(f"w{rng.randrange(5000)}" for _ in range(30))

    hw_bytes = hw_files = 0
    max_gens = max_deltas = 0
    t0 = time.time()
    checks = 0
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, doc_text(b * per_batch + i))
            for i in range(1, per_batch)
        ]
        # rolling upsert: doc 0 re-ingested every batch with new text
        rows.append((0, doc_text(0, salt=b + 1)))
        postings_ingest_batch(
            spark.createDataFrame(rows, "doc_id bigint, text string"), b, pdir
        )
        if b > 0 and b % compact_every == 0:
            compact_postings(
                spark, pdir, pb,
                tombstones=forget if b >= forget_from else None,
            )
            # invariants at every compaction point
            live = store.read_store_resolved(
                spark, pdir,
                "doc_id bigint, term string, tf bigint, batch_id bigint",
                pb, ["doc_id"],
            )
            d0 = sorted(
                r.term for r in live.where(F.col("doc_id") == 0).collect()
            )
            want0 = sorted(set(doc_text(0, salt=b + 1).split()))
            assert d0 == want0, f"upsert resurrection at batch {b}"
            if b >= forget_from:
                n7 = live.where(F.col("doc_id") == 7).count()
                assert n7 == 0, f"erasure regression at batch {b}"
            checks += 1
        bts, fls = _du(pdir, pb)
        hw_bytes, hw_files = max(hw_bytes, bts), max(hw_files, fls)
        n_gens = len(store.gen_entries(pb))
        n_deltas = len(store.delta_batch_ids(pdir))
        max_gens = max(max_gens, n_gens)
        max_deltas = max(max_deltas, n_deltas)
        assert n_gens <= 2, f"generation retention leak at batch {b}"
        assert n_deltas <= compact_every + 1, f"delta sweep leak at {b}"
    # quiesced final fold + the final no-resurrection read
    compact_postings(
        spark, pdir, pb, upto_batch_id=n_batches - 1, tombstones=forget
    )
    final = store.read_store_resolved(
        spark, pdir, "doc_id bigint, term string, tf bigint, batch_id bigint",
        pb, ["doc_id"],
    )
    from pyspark.sql import functions as F  # noqa: F811

    n_docs = final.select("doc_id").distinct().count()
    assert final.where(F.col("doc_id") == 7).count() == 0
    fin_bytes, fin_files = _du(pdir, pb)
    shutil.rmtree(work, ignore_errors=True)
    # growing corpus: HW is bounded by final + one delta window + one
    # retained generation; 3x final is the loose alarm line
    assert hw_bytes <= 3 * fin_bytes, "disk high-water unbounded"
    return {
        "n_batches": n_batches,
        "per_batch": per_batch,
        "compact_every": compact_every,
        "wall_s": round(time.time() - t0, 1),
        "n_docs_final": n_docs,
        "hw_bytes": hw_bytes,
        "final_bytes": fin_bytes,
        "hw_over_final": round(hw_bytes / fin_bytes, 3),
        "hw_files": hw_files,
        "final_files": fin_files,
        "max_gen_dirs": max_gens,
        "max_delta_parts": max_deltas,
        "compaction_checks": checks,
    }


def leg_b(spark, n_batches: int, keys_per_batch: int, keep: int) -> dict:
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.streaming import state

    work = tempfile.mkdtemp(prefix="retention_b_")
    sdir = f"{work}/counts"
    schema = "k bigint, n bigint, bucket int"
    rng = random.Random(1234)
    truth: dict[int, int] = {}

    def merge(stored, batch):
        return (
            stored.drop("bucket")
            .unionByName(batch)
            .groupBy("k")
            .agg(F.sum("n").alias("n"))
        )

    hw_bytes = 0
    max_versions = 0
    t0 = time.time()
    for b in range(n_batches):
        ks = [rng.randrange(500) for _ in range(keys_per_batch)]
        for k in ks:
            truth[k] = truth.get(k, 0) + 1
        batch = (
            spark.createDataFrame([(k,) for k in ks], "k bigint")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        state.fold_bucketed(
            batch, "k", sdir, schema, b, n_buckets=8, merge_fn=merge,
            keep_versions=keep,
        )
        bts, _f = _du(sdir)
        hw_bytes = max(hw_bytes, bts)
        nv = len(state.versions(sdir))
        max_versions = max(max_versions, nv)
        # touched buckets get a fresh copy each batch; stale copies
        # prune after `keep` — the version-dir count stays bounded by
        # keep plus the protected window, never grows with b
        assert nv <= keep + 2, f"version retention leak at batch {b}"
    got = {
        r.k: r.n
        for r in state.read_bucketed(spark, sdir, schema).collect()
    }
    assert got == truth, "bucketed state diverged from the full-log truth"
    fin_bytes, _ = _du(sdir)
    shutil.rmtree(work, ignore_errors=True)
    return {
        "n_batches": n_batches,
        "keys_per_batch": keys_per_batch,
        "keep_versions": keep,
        "wall_s": round(time.time() - t0, 1),
        "n_keys": len(truth),
        "hw_bytes": hw_bytes,
        "final_bytes": fin_bytes,
        "hw_over_final": round(hw_bytes / fin_bytes, 3),
        "max_version_dirs": max_versions,
    }


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from streaming_recommendation_spark.session import get_spark

    spark = get_spark(app_name="retention-soak")
    spark.sparkContext.setLogLevel("ERROR")
    a = leg_a(spark, n_batches, per_batch, compact_every=10)
    b = leg_b(spark, n_batches, keys_per_batch=50, keep=3)
    print(json.dumps({"retention_soak": {"store": a, "bucketed": b}}))


if __name__ == "__main__":
    main()
