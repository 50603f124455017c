"""Skew mitigation for power-law keys.

The reference's user/item activity is power-law (Amazon 5-core data;
SURVEY §4 flags this). On a cluster, a shuffled join where one key
holds 1% of all rows pins one reducer. First-line defenses are free
and already on in this engine: partial (map-side) aggregation for
associative aggs, AQE skew-join splitting for sort-merge joins,
broadcast for small sides. ``salted_join`` covers the remaining
case — a shuffled equi-join of two LARGE tables with heavy-hitter
keys where AQE can't kick in (e.g. streaming micro-batch joins):

  big side:   key -> (key, salt = det-hash(row) % n)   [splits a hot
              key's rows across n reducers]
  small side: each row replicated to all n salts
  join on (key, salt); result identical to the plain join.

The salt is derived from a deterministic row hash, so results are
reproducible. Replication multiplies the small side by n — pick n
~ the skew factor, not the cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys split across
    ``salt_buckets`` reducers. Output columns = big's + small's
    (minus the duplicate key), same as ``big.join(small, on, how)``.

    Only inner/left/left_semi/left_anti are supported: the small side
    is replicated once per salt, so a right/full outer join would
    surface each UNMATCHED small-side row ``salt_buckets`` times as
    null-extended duplicates. (left_anti is safe — a big row matches
    the replica carrying its own salt iff the key exists at all.)
    """
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows are replicated per salt and would "
            "duplicate in outer results; use AQE skew handling instead"
        )
    salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("__salt", F.pmod(salt_src, F.lit(salt_buckets)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [on, "__salt"], how).drop("__salt")
