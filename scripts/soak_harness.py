"""File-stream soak: measured throughput of the full ingest pipeline
(parse -> watermark dedup -> versioned KV writes on executors)
WITHOUT a Kafka broker — the broker leg itself stays untested in this
container (no broker binary / connector jars; see BASELINE.md).

This measures everything DOWNSTREAM of the source: the reference's
own >= 50 profiles/sec target covers Kafka -> parse -> Redis, and the
parse/dedup/sink stages are the compute; a real broker adds network
ingress, not plan work. The number is labeled as harness throughput,
never as the broker soak. Run:
  python scripts/soak_harness.py [n_messages] [n_files] [--rocksdb] [--crash]
--rocksdb: run the stateful stages on the RocksDB state store
  provider and report state rows / memory from the query progress.
--crash:   mid-stream kill/restart audit (VERDICT r4 #5) — process
  half the files, hard-stop the query, restart from the SAME
  checkpoint, and assert written keys == input exactly once.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(n: int, n_files: int, rocksdb: bool = False, crash: bool = False) -> None:
    from streaming_recommendation_spark.session import get_spark
    from streaming_recommendation_spark.streaming.pipeline import profile_pipeline
    from streaming_recommendation_spark.streaming.sink import JsonlDirSink

    spark = get_spark(app_name="soak-harness")
    spark.sparkContext.setLogLevel("ERROR")
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    base_ts = 1_700_000_000
    work = tempfile.mkdtemp(prefix="soak_")
    msg_dir = f"{work}/msgs"
    import os

    os.makedirs(msg_dir)
    per = n // n_files
    # distinct (user, ts) pairs so the watermark dedup keeps all n —
    # the sink write count then audits end-to-end delivery
    for f in range(n_files):
        with open(f"{msg_dir}/batch{f:04d}.txt", "w") as fh:
            for i in range(per):
                k = f * per + i
                fh.write(
                    json.dumps(
                        {
                            "user_id": f"u{k % 5000}",
                            "history_items": [f"i{k % 97}", f"i{(k + 1) % 97}"],
                            "timestamp": base_ts + k,
                        }
                    )
                    + "\n"
                )
    total = per * n_files
    sink = JsonlDirSink(f"{work}/kv")
    t0 = time.perf_counter()
    if crash:
        # leg 1: stop the query after roughly half the files commit —
        # a mid-stream kill, not a clean availableNow drain
        raw = (
            spark.readStream.option("maxFilesPerTrigger", max(1, n_files // 8))
            .text(msg_dir)
        )
        q = profile_pipeline(raw, sink, checkpoint_dir=f"{work}/ckpt")
        while True:
            progressed = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(progressed) >= 4 or not q.isActive:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(120)
        interrupted = len(sink.read_all())
        assert interrupted < total, "crash leg consumed everything; raise n"
        # leg 2: recover from the same checkpoint
        raw = spark.readStream.text(msg_dir)
        q = profile_pipeline(raw, sink, checkpoint_dir=f"{work}/ckpt")
        finished = q.awaitTermination(600)
    else:
        raw = spark.readStream.text(msg_dir)
        q = profile_pipeline(raw, sink, checkpoint_dir=f"{work}/ckpt")
        finished = q.awaitTermination(600)
    wall = time.perf_counter() - t0
    if not finished:
        # stop BEFORE tearing down dirs under a live query, and make
        # the failure read as what it is (timeout, not data loss)
        q.stop()
        shutil.rmtree(work, ignore_errors=True)
        raise RuntimeError(
            f"soak did not finish within 600 s ({total} messages); "
            "reduce n_messages or raise the timeout"
        )
    state = {}
    for prog in q.recentProgress:
        for op in prog["stateOperators"]:
            state = {
                "state_operator": op.get("operatorName"),
                "state_rows": op.get("numRowsTotal"),
                "state_memory_bytes": op.get("memoryUsedBytes"),
                "rocksdb_metrics": sorted(
                    m for m in op.get("customMetrics", {}) if m.startswith("rocksdb")
                )[:3],
            }
    written = len(sink.read_all())
    shutil.rmtree(work, ignore_errors=True)
    assert written == total, (written, total)
    print(
        json.dumps(
            {
                "metric": "harness_profiles_per_sec",
                "value": round(total / wall, 1),
                "unit": "profiles/sec",
                "n_profiles": total,
                "wall_sec": round(wall, 2),
                "note": "file-stream harness (no broker): parse+dedup+sink only",
                "provider": "rocksdb" if rocksdb else "hdfs",
                "mode": "crash-recovery" if crash else "clean",
                **({"interrupted_keys": interrupted} if crash else {}),
                **state,
            }
        )
    )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    n = int(args[0]) if len(args) > 0 else 50_000
    nf = int(args[1]) if len(args) > 1 else 25
    main(n, nf, rocksdb="--rocksdb" in flags, crash="--crash" in flags)
