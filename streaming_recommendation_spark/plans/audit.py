"""Physical-plan auditing.

The engine's performance discipline: after an operator is correct,
read its plan and keep iterating until it's the plan you'd want on a
1000-executor cluster. This module turns that from eyeballing
``explain()`` output into assertable facts — tests pin them
(tests/test_plan_audit.py) so a regression that, say, un-broadcasts a
dimension join or blocks predicate pushdown fails CI, not production.

Extracted facts:
  n_exchanges          shuffle count (every Exchange is a stage boundary)
  n_broadcast_joins    dims that stayed broadcast
  n_sortmerge_joins    large-table joins
  has_window_group_limit  rank-filter top-k compiled to per-group heaps
  has_take_ordered     global top-k compiled to TakeOrderedAndProject
  pushed_filters       predicates that reached the parquet scan
  codegen_stages       whole-stage-codegen span count (JVM-compiled)
  bnl_joins            broadcast-nested-loop joins (usually a smell:
                       a non-equi join that missed its equi rewrite)
  has_dynamic_partition_pruning  fact-scan PartitionFilters carry a
                       dynamicpruning subquery from the dim side
  has_bloom_filter_pruning  runtime bloom filter probed on the fact
                       side before its shuffle (might_contain)
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    node = lambda name: len(re.findall(rf"\(\d+\) {name}\b", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "n_exchanges": node("Exchange"),
        "n_broadcast_joins": node("BroadcastHashJoin"),
        "n_sortmerge_joins": node("SortMergeJoin"),
        "n_shuffled_hash_joins": node("ShuffledHashJoin"),
        "bnl_joins": node("BroadcastNestedLoopJoin"),
        "has_window_group_limit": "WindowGroupLimit" in plan,
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        # runtime row-group/partition pruning injected by the optimizer:
        # a partitioned scan whose PartitionFilters carry a subquery on
        # the other join side (DPP), and a bloom filter built from the
        # filtered build side and probed before the fact-side shuffle
        "has_dynamic_partition_pruning": "dynamicpruningexpression" in plan,
        "has_bloom_filter_pruning": "might_contain" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        # NOTE: under AQE the pre-execution formatted plan omits
        # codegen ids; this only counts them on executed plans
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "plan": plan,
    }


def checkpoint_partitioned(df):
    """``localCheckpoint`` that KEEPS the DataFrame's hash
    partitioning. Under AQE, ``Dataset.checkpoint`` records
    ``UnknownPartitioning`` (the adaptive plan can still re-coalesce,
    so Spark won't promise a layout) and every later join against the
    checkpoint re-shuffles it. Iterative operators (PageRank,
    connected components) checkpoint a STATIC side once and join it
    every round — re-shuffling it per round is the exact cost the
    checkpoint was meant to avoid. Materializing with AQE briefly off
    makes the LogicalRDD carry ``hashpartitioning(key, n)``, so each
    superstep reuses the layout (one message shuffle per round, the
    Pregel shape). On a real cluster the equivalent durable form is a
    table bucketed by the join key (sources/layout.py).

    Caveat: the AQE flag is session-global, so a query PLANNED by a
    concurrent thread/stream during the (brief, eager) materialization
    would also skip AQE. The engine's operators run checkpoints
    sequentially on the driver thread; if you embed them under a
    multi-threaded scheduler, serialize calls or use a separate
    SparkSession (newSession()) per thread.
    """
    sess = df.sparkSession
    old = sess.conf.get("spark.sql.adaptive.enabled")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", old)
