"""MLlib ALS — the Spark-native recall alternative (SURVEY §7 M5).

The reference trains LightGCN in PyTorch for its recall stage
(reference: model_training/lightgcn/). The engine-native path with
the same contract — (user, item) interactions in, per-user top-k
recommendations + embedding matrices out — is MLlib's distributed
ALS: implicit-feedback factorization, block-partitioned normal
equations, no Python in the loop. The resulting factor DataFrames
drop straight into the cascade (user_vec / item_vec columns) and the
similarity operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_als_recall(
    interactions: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str | None = None,
    rank: int = 16,
    max_iter: int = 5,
    reg: float = 0.1,
    implicit: bool = True,
    seed: int = 42,
):
    """Fit ALS on (user, item[, rating]) interactions.

    Returns (model, user_factors, item_factors) where the factor
    frames have (id, features: array<float>) — the same vector-column
    convention as the embeddings table, so knn_brute_force / lsh_knn
    / cascade consume them unchanged.
    """
    from pyspark.ml.recommendation import ALS

    df = interactions
    if rating_col is None:
        df = df.groupBy(user_col, item_col).agg(F.count(F.lit(1)).alias("rating"))
        rating_col = "rating"
    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=implicit,
        seed=seed,
        coldStartStrategy="drop",
    )
    model = als.fit(df)
    return model, model.userFactors, model.itemFactors


def als_recommendations(model, k: int = 10) -> DataFrame:
    """Per-user top-k as (user_id, item_id, rank) — the cascade's
    recall-stage contract. recommendForAllUsers returns
    (userCol, recommendations: array<struct<itemCol, rating>>)."""
    recs = model.recommendForAllUsers(k)
    user_col = recs.columns[0]
    item_field = recs.schema["recommendations"].dataType.elementType.names[0]
    return recs.select(
        F.col(user_col).alias("user_id"),
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user_id",
        F.col("rec")[item_field].alias("item_id"),
        (F.col("pos") + 1).alias("rank"),
    )
