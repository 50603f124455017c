"""Runtime pruning the optimizer injects at plan time: dynamic
partition pruning (DPP) and runtime bloom-filter join pruning.

At 100 TB these are the difference between scanning a whole
date-partitioned fact table and scanning only the partitions a
filtered dimension actually joins to — and between shuffling every
fact row into a join vs dropping the 99% that can't match before the
exchange. Both are free when the plan is declarative; these tests pin
the shapes that trigger them (and the near-miss shapes that don't) so
the knowledge survives refactors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.plans.audit import audit
from streaming_recommendation_spark.sources.layout import write_partitioned
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


EVENT_KINDS = [
    ("purchase", "conversion"),
    ("cart", "conversion"),
    ("view", "browse"),
    ("click", "browse"),
    ("like", "browse"),
]


def test_dynamic_partition_pruning(spark, tmp_path):
    """Fact partitioned by event_type joined to a dim filtered with an
    EqualTo predicate: the fact scan's PartitionFilters must carry a
    dynamicpruning subquery (only the joined partitions are read)."""
    ev = load_table(spark, "events", SF_DIR)
    fact_path = str(tmp_path / "events_by_type")
    write_partitioned(ev, fact_path, ["event_type"])
    fact = spark.read.parquet(fact_path)

    dim_path = str(tmp_path / "event_kinds")
    spark.createDataFrame(
        EVENT_KINDS, "event_type string, kind string"
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    pruned = fact.join(dim.where(F.col("kind") == "conversion"), "event_type")
    assert audit(pruned)["has_dynamic_partition_pruning"]

    expected = ev.where(F.col("event_type").isin("purchase", "cart")).count()
    assert pruned.count() == expected


def test_dpp_needs_selective_predicate(spark, tmp_path):
    """Near-miss pin: Spark's PartitionPruning rule only fires when the
    dim side has a LIKELY-SELECTIVE predicate (comparison/IN/LIKE). A
    bare boolean column filter does not qualify, so no DPP — anyone
    refactoring a dim filter into a precomputed flag loses the pruning."""
    ev = load_table(spark, "events", SF_DIR)
    fact_path = str(tmp_path / "events_by_type")
    write_partitioned(ev, fact_path, ["event_type"])
    fact = spark.read.parquet(fact_path)

    dim_path = str(tmp_path / "event_flags")
    spark.createDataFrame(
        [(t, k == "conversion") for t, k in EVENT_KINDS],
        "event_type string, is_conversion boolean",
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    flagged = fact.join(dim.where(F.col("is_conversion")), "event_type")
    assert not audit(flagged)["has_dynamic_partition_pruning"]


def test_runtime_bloom_filter_join_pruning(spark):
    """Selective dim filter on a non-broadcast equi-join: the optimizer
    builds a bloom filter over the filtered orders keys and probes it
    on the lineitem side BEFORE the shuffle, so non-matching fact rows
    never enter the exchange. Thresholds are production-scale defaults
    (10 MB build / 10 GB probe) — lowered here so sf-scale data
    triggers the same plan a 100 TB run gets for free."""
    def build():
        # rebuilt per conf change: a DataFrame memoizes its optimized
        # plan, so conf toggles only affect fresh plans
        li = load_table(spark, "lineitem", SF_DIR)
        orders = load_table(spark, "orders", SF_DIR)
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        return li.join(urgent, li.l_orderkey == urgent.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_orderpriority"
        )

    expected = build().count()  # default plan (broadcast, no bloom)

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        joined = build()
        facts = audit(joined)
        assert facts["has_bloom_filter_pruning"], facts["plan"]
        assert "bloom_filter_agg" in facts["plan"]
        assert joined.count() == expected

        # control: disabling the rule removes the probe
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert not audit(build())["has_bloom_filter_pruning"]
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)
