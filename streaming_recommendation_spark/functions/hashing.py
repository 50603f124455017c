"""Deterministic cross-engine hashing.

The reference encodes features with Python's salted ``hash()``
(reference: data_processing/generate_training_data.py:57,61), which is
non-reproducible across processes. Our engine replaces it with hashes
that are (a) deterministic, (b) computable by BOTH Spark and ANSI SQL
engines (the DuckDB oracle) from the same expression, so sampling /
bucketing queries can be correctness-checked bit-for-bit:

* integer keys  -> Knuth multiplicative hash mod 2^32
* string keys   -> first 8 hex chars of md5, parsed as a long
                   (md5 is identical everywhere)

Both are also skew-free enough for partitioning / salting use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * (golden ratio - 1)
MOD32 = 4294967296  # 2^32


def det_hash_long(col: Column | str) -> Column:
    """Deterministic hash of an integer column -> [0, 2^32).

    SQL equivalent: ``(col * 2654435761) % 4294967296``.
    Callers must ensure col >= 0 (all testdata keys are).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("long") * F.lit(KNUTH)) % F.lit(MOD32)


def det_hash_str(col: Column | str) -> Column:
    """Deterministic hash of a string column -> [0, 2^32).

    First 8 hex chars of md5 parsed base-16. SQL (DuckDB):
    ``CAST(concat('0x', substr(md5(col), 1, 8)) AS BIGINT)`` or
    equivalently via from_hex; Spark: ``conv(substring(md5(col),1,8),16,10)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def det_unit(col: Column | str, *, string: bool = False, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform double in [0, 1) from a key column.

    Used for reproducible Bernoulli sampling / splits (SURVEY §2.6
    SA1-SA4): ``det_unit(key) < rate`` selects a stable ~rate fraction.
    ``salt`` derives a DIFFERENT deterministic stream from the same
    key (for integer keys it shifts the multiplicative hash, so salted
    streams are distinct but not statistically independent; string
    keys re-hash through md5, which IS effectively independent).
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = c.cast("long") + F.lit(salt) if not string else F.concat(c, F.lit(str(salt)))
    h = det_hash_str(c) if string else det_hash_long(c)
    return (h % F.lit(MOD32)) / F.lit(float(MOD32))
