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


def category_capped_topk(
    recs: DataFrame,
    categories: DataFrame,
    k: int = 5,
    max_per_cat: int = 2,
    group_col: str = "user_id",
    item_col: str = "item_id",
    cat_col: str = "category",
    rank_col: str = "rank",
) -> DataFrame:
    """Slate BUSINESS RULE: at most ``max_per_cat`` items of any one
    category per recommendation list, preserving score order — the
    diversity constraint every production recommender ships (category
    caps, brand caps, seller caps) between ranking and response.

    The greedy walk ("take the next item iff its category has fewer
    than cap items taken so far, stop at k") has a CLOSED FORM —
    when an item is scanned, the number of same-category items
    already taken is exactly its within-category rank minus one, so
    greedy-keep == ``row_number over (group, category) ordered by
    rank <= cap``; the final slate is the first k kept rows
    re-ranked. No iteration, no checkpoints: two WindowGroupLimit
    windows (the q227 MMR machinery is for PAIRWISE constraints —
    per-category caps never need it). Returns (group, item, category,
    orig_rank, rank 1..k). Scale: one broadcast category-dim join +
    two per-list windows over k-bounded rows."""
    j = recs.join(F.broadcast(categories), item_col)
    wcat = Window.partitionBy(group_col, cat_col).orderBy(
        F.asc(rank_col), F.asc(item_col)
    )
    wall = Window.partitionBy(group_col).orderBy(
        F.asc(rank_col), F.asc(item_col)
    )
    kept = j.withColumn("__rc", F.row_number().over(wcat)).where(
        F.col("__rc") <= max_per_cat
    )
    return (
        kept.withColumn("__rn", F.row_number().over(wall))
        .where(F.col("__rn") <= k)
        .select(
            group_col,
            item_col,
            cat_col,
            F.col(rank_col).cast("int").alias("orig_rank"),
            F.col("__rn").cast("int").alias("rank"),
        )
    )
