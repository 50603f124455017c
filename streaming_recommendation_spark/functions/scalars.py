"""Scalar function library (SURVEY §2.7 F1-F13).

Every function returns a Column built from pyspark.sql.functions
built-ins — JVM-side, whole-stage-codegen friendly. No Python UDFs.

Reference citations (files under /root/reference/):
  F1  clean_price          data_processing/generate_training_data.py:34-41,63-70
  F2  minmax_scale         generate_training_data.py:43-46,69
  F3  hash_bucket          generate_training_data.py:57,61 (salted hash() replaced
                           by deterministic md5-based hash — documented divergence)
  F4  last_category        generate_training_data.py:54-56
  F5  pipe_join            generate_training_data.py:172,178
  F6  pipe_split           model_training/din/utils.py:66
  F8  key_format           deploy_datapipeline/.../spark_stream/consumer.py:66
  F11 pad_array            model_training/din/utils.py:78
  F13 zero_vector_default  model_training/din/utils.py:44-47
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import det_hash_str


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_price(col: Column | str) -> Column:
    """F1: strip '$', ',' and whitespace; invalid -> 0.0."""
    cleaned = F.regexp_replace(F.trim(_c(col).cast("string")), r"[$,]", "")
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain
    # cast of 'not-a-number' throw instead of yielding null.
    return F.coalesce(cleaned.try_cast("double"), F.lit(0.0))


def minmax_scale(col: Column | str, min_col: Column, max_col: Column) -> Column:
    """F2: (x - min) / (max - min); degenerate range -> 0.0."""
    x = _c(col)
    rng = max_col - min_col
    return F.when(rng > 0, (x - min_col) / rng).otherwise(F.lit(0.0))


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """F3: deterministic hash-bucket encode to [0, 1)."""
    return (det_hash_str(_c(col)) % F.lit(buckets)) / F.lit(float(buckets))


def last_category(col: Column | str, sep: str = "_") -> Column:
    """F4: categories array<array<string>> -> last element of each path, joined."""
    return F.array_join(F.transform(_c(col), lambda p: F.element_at(p, -1)), sep)


def pipe_join(col: Column | str) -> Column:
    """F5: array -> pipe-joined string (the reference's CSV array encoding)."""
    return F.concat_ws("|", _c(col))


def pipe_split(col: Column | str) -> Column:
    """F6: pipe-joined string -> array<string>."""
    return F.split(_c(col), r"\|")


def key_format(prefix: str, *cols: Column | str) -> Column:
    """F8: 'prefix:a:b' Redis-style key formatting."""
    return F.concat_ws(":", F.lit(prefix), *[_c(c).cast("string") for c in cols])


def pad_array(col: Column | str, length: int, fill: str = "UNK") -> Column:
    """F11: right-pad an array to a fixed length (truncates if longer)."""
    arr = F.slice(_c(col), 1, length)
    padding = F.array_repeat(F.lit(fill), length)
    return F.slice(F.concat(arr, padding), 1, length)


def zero_vector_default(col: Column | str, dim: int) -> Column:
    """F13: null feature vector -> zeros(dim)."""
    return F.coalesce(_c(col), F.array_repeat(F.lit(0.0), dim))
