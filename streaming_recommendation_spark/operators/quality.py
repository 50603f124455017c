"""Data-quality audits a production training pipeline runs before it
trusts a snapshot: foreign-key edge profiling (orphan detection +
parent coverage — the dbt ``relationships`` test plus the coverage
statistic that tells you whether a dimension is actually exercised).
An orphan count of zero is the PASS state; the profile's information
lives in the varying columns around it (row counts, distinct keys,
coverage — e.g. the testdata generator leaves a few percent of
orders with no lineitems, so coverage discriminates between edges
even on orphan-free data).

Determinism: counts are exact int64; coverage is ONE IEEE division
of two exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_profile(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    edge: str,
) -> DataFrame:
    """One-row profile of a foreign-key edge: (edge, child_rows,
    distinct_fk, orphan_rows, orphan_keys, parents, coverage) where
    ``orphan_*`` counts child rows/keys whose FK has no parent and
    ``coverage`` = referenced parents / all parents.

    Scale shape: the child reduces to per-FK counts FIRST (one
    groupBy with map-side partials — the join then ships |distinct
    fk| rows, not |child|); the parent side ships only its DISTINCT
    key column (a parent with duplicate primary keys — exactly the
    corrupt-snapshot condition this audit exists to catch — must not
    multiply the join and inflate the child counts; ``parents``
    counts distinct keys for the same reason); parent totals ride as
    a broadcast singleton. NULL FKs count as orphans (a NULL never
    equi-joins its parent — the usual DQ convention)."""
    per_key = child.groupBy(F.col(fk).alias("__fk")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    parent_keys = parent.select(F.col(pk).alias("__fk")).distinct()
    joined = per_key.join(
        parent_keys.withColumn("__hit", F.lit(1)),
        "__fk",
        "left",
    )
    stats = joined.agg(
        F.sum("__cnt").alias("child_rows"),
        F.count(F.lit(1)).alias("distinct_fk"),
        F.sum(F.when(F.col("__hit").isNull(), F.col("__cnt")).otherwise(0)).alias(
            "orphan_rows"
        ),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
            "orphan_keys"
        ),
    )
    parents = parent_keys.agg(F.count(F.lit(1)).alias("parents"))
    return stats.crossJoin(F.broadcast(parents)).select(
        F.lit(edge).alias("edge"),
        "child_rows",
        "distinct_fk",
        "orphan_rows",
        "orphan_keys",
        "parents",
        (
            (F.col("distinct_fk") - F.col("orphan_keys"))
            / F.col("parents")
        ).alias("coverage"),
    )


def fk_profile_suite(edges) -> DataFrame:
    """Union the per-edge profiles of ``edges`` — an iterable of
    (child, fk, parent, pk, name) tuples — into one audit relation.
    Each edge is an independent subplan; Spark runs them as parallel
    stages of one job."""
    out = None
    for child, fk, parent, pk, name in edges:
        row = fk_profile(child, fk, parent, pk, name)
        out = row if out is None else out.unionByName(row)
    return out
