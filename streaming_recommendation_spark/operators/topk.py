"""Top-k operators (SURVEY §2.5 W5-W8, §2.4 A5).

The reference's top-k is torch.topk over a dense score vector
(reference: model_service/models.py:55; eval_online/main/
inference.py:83) and pandas value_counts().index[:N]
(model_training/lightgcn/utils.py:38,46).

Spark shapes:
  * global top-k  -> orderBy + limit: Catalyst compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows only — no global sort).
  * per-group top-k -> row_number over window + rank filter: Spark
    3.5+ applies WindowGroupLimit so each shuffle partition keeps a
    k-heap per group instead of sorting whole groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, k: int, *order: Column) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    *order: Column,
    rank_col: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def frequency_top_n(
    df: DataFrame, key_col: str, n: int, count_alias: str = "cnt"
) -> DataFrame:
    """A5: N most frequent values of key_col, deterministic tie-break
    by key ascending. Partial (map-side) aggregation then a k-row
    TakeOrderedAndProject — the whole table never sorts."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .orderBy(F.col(count_alias).desc(), F.col(key_col).asc())
        .limit(n)
    )
