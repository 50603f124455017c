"""Batch ETL: raw reviews + metadata -> the reference's training tables.

Re-expresses the reference's single-process, line-at-a-time ETL
(reference: data_processing/generate_training_data.py ~200 LoC;
split_users.py; generate_excluded_users_behavior.py;
generate_lightgcn_data.py) as distributed DataFrame plans producing
the SAME output schemas (FIXTURES.md §3-§7):

  split_users              SA1   split_users.py:22-29
  build_excluded_behavior  P6+W1 generate_excluded_users_behavior.py:39-45
  build_item_embeddings    F1-F4+A6  generate_training_data.py:27-80,196-203
  build_lightgcn_data      P4+P5+A3  generate_lightgcn_data.py:22-45
  build_train_data         A1+SA3+W4+SA4  generate_training_data.py:82-191

Documented divergences from the reference (SURVEY §7 risk 4): every
random choice is a deterministic key-hash (the reference uses
unseeded shuffle / salted hash() / np.random), so outputs are
reproducible across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import det_unit
from ..functions.scalars import clean_price, hash_bucket, last_category, pipe_join
from ..operators.history import sliding_window_samples, tail_slice
from ..operators.sampling import hash_split


def split_users(reviews: DataFrame, holdout_rate: float = 0.2) -> DataFrame:
    """SA1: deterministic ~20% user hold-out -> (user_id) of excluded
    users (reference split_users.py writes excluded_users.txt)."""
    users = reviews.select(F.col("reviewerID").alias("user_id")).distinct()
    return hash_split(users, "user_id", holdout_rate, string_key=True)


def build_excluded_behavior(reviews: DataFrame, excluded: DataFrame) -> DataFrame:
    """(user_id, item_id, timestamp) for excluded users, sorted by
    (user_id, timestamp) — generate_excluded_users_behavior.py:39-45."""
    return (
        reviews.select(
            F.col("reviewerID").alias("user_id"),
            F.col("asin").alias("item_id"),
            F.col("unixReviewTime").alias("timestamp"),
        )
        .join(F.broadcast(excluded), "user_id", "left_semi")
        .orderBy("user_id", "timestamp")
    )


def build_item_embeddings(item_meta: DataFrame) -> DataFrame:
    """(item_id, category_hash, brand_hash, price_scaled) + UNK row.

    Two-pass shape like the reference (fit price bounds, then
    transform — generate_training_data.py:29-80) but the "passes" are
    one agg + one broadcast join; the scan runs once thanks to
    column pruning.

    Fit/transform parity (generate_training_data.py:30-41,64-70): the
    min/max FIT sees only parseable prices — a missing price defaults
    to 0.0 (parseable, in the fit), an unparseable string (\"N/A\",
    \"\") is skipped. At TRANSFORM time unparseable prices emit the
    literal 0.0, never a scaled value.
    """
    # null only for unparseable strings; raw-missing -> 0.0 like the
    # reference's item.get('price', 0.0)
    parsed = F.when(F.col("price").isNull(), F.lit(0.0)).otherwise(
        F.regexp_replace(F.trim(F.col("price").cast("string")), r"[$,]", "")
        .try_cast("double")
    )
    cleaned = item_meta.select(
        F.col("asin").alias("item_id"),
        hash_bucket(
            F.coalesce(last_category(F.col("categories")), F.lit(""))
        ).alias("category_hash"),
        hash_bucket(F.coalesce(F.col("brand"), F.lit("Unknown"))).alias("brand_hash"),
        parsed.alias("price"),
    )
    bounds = cleaned.where(F.col("price").isNotNull()).agg(
        F.min("price").alias("mn"), F.max("price").alias("mx")
    )
    scaled = cleaned.crossJoin(F.broadcast(bounds)).select(
        "item_id",
        "category_hash",
        "brand_hash",
        F.when(
            F.col("price").isNotNull() & (F.col("mx") > F.col("mn")),
            (F.col("price") - F.col("mn")) / (F.col("mx") - F.col("mn")),
        )
        .otherwise(F.lit(0.0))
        .alias("price_scaled"),
    )
    unk = scaled.sparkSession.createDataFrame(
        [("UNK", 0.0, 0.0, 0.0)],
        "item_id string, category_hash double, brand_hash double, price_scaled double",
    )
    return scaled.unionByName(unk)


def build_lightgcn_data(reviews: DataFrame, excluded: DataFrame) -> DataFrame:
    """(user_id, item_id): rating >= 4, non-excluded users, dedup —
    generate_lightgcn_data.py:22-45 (P4 + P5 + A3)."""
    return (
        reviews.where(F.col("overall") >= 4)
        .select(
            F.col("reviewerID").alias("user_id"), F.col("asin").alias("item_id")
        )
        .join(F.broadcast(excluded), "user_id", "left_anti")
        .dropDuplicates(["user_id", "item_id"])
    )


def build_train_data(
    reviews: DataFrame,
    excluded: DataFrame,
    max_history: int = 50,
    stride: int = 2,
    negatives_per_positive: int = 2,
    activity_threshold: int = 10,
    rate_active: float = 0.5,
    rate_light: float = 0.1,
    negative_pool_cap: int = 5000,
) -> DataFrame:
    """(user_id, history_items, candidate_item, label) — the DIN/
    RankNet training table (generate_training_data.py:82-191).

    Pipeline: exclude hold-out users (P5) -> activity-tiered user
    sampling (SA3) -> stride-2 prefix windows with rating>=4 positives
    (W4+P4) -> k hash-deterministic negatives per positive, never an
    item in the user's full history (SA4/J3) -> pipe-encoded history
    (F5).

    Scale shape: the negative draw is rank-by-pair-hash over a capped
    hash-ranked item pool joined per POSITIVE (not per user x all
    items); the anti-membership check is an array_contains against
    the user's collected history (bounded by the 5-core user activity)
    — no |users| x |items| blowup.
    """
    base = reviews.select(
        F.col("reviewerID").alias("user_id"),
        F.col("asin").alias("item_id"),
        F.col("overall").alias("rating"),
        F.col("unixReviewTime").alias("ts"),
    ).join(F.broadcast(excluded), "user_id", "left_anti")

    # SA3: per-user activity-tiered keep decision (deterministic).
    counts = base.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    rate = F.when(F.col("cnt") >= activity_threshold, F.lit(rate_active)).otherwise(
        F.lit(rate_light)
    )
    kept_users = counts.where(det_unit("user_id", string=True, salt=3) < rate).select(
        "user_id"
    )
    sampled = base.join(F.broadcast(kept_users), "user_id", "left_semi")

    # W4: prefix-window samples; positives gated on rating >= 4 of the
    # candidate (the reference checks the NEXT item's rating,
    # generate_training_data.py:171). Window parity
    # (generate_training_data.py:139-162): each user's sequence is
    # truncated to the last max_history events BEFORE windowing, and
    # active users (original count >= activity_threshold — the
    # reference's min_history_len) start the window at that index
    # while light users start at 1.
    # MAX rating per (user, item): the reference gates on the rating of
    # the specific occurrence at the window position; after collecting
    # item-only histories that occurrence is gone, and dropDuplicates
    # would pick an ARBITRARY occurrence (nondeterministic). Max is the
    # deterministic choice (documented divergence: a pair is positive
    # if ANY occurrence rated >= 4).
    ratings = sampled.groupBy("user_id", "item_id").agg(
        F.max("rating").alias("rating")
    )
    samples = sliding_window_samples(
        sampled, "user_id", "ts", "item_id", start=1, stride=stride,
        max_history=max_history, truncate=max_history,
        active_start=activity_threshold,
    )
    positives = (
        samples.join(
            ratings,
            (samples.user_id == ratings.user_id)
            & (samples.candidate == ratings.item_id),
        )
        .where(F.col("rating") >= 4)
        .select(samples.user_id, "history", "candidate", "pos")
    )

    # Full per-user item set for the negative-membership check.
    user_items = sampled.groupBy("user_id").agg(
        F.collect_set("item_id").alias("all_items")
    )

    # SA4: hash-ranked capped item pool; per positive, probe a SMALL
    # deterministic window of the pool (start = hash(positive), walk
    # probe_width slots) and keep the first k items not in the user's
    # history. Cost is |positives| x probe_width — linear — instead of
    # |positives| x pool_cap. With probe_width >> k the chance of not
    # finding k clean negatives is negligible (requires the user to
    # have seen nearly the whole probed window); the reference's own
    # capped-pool draw has the same best-effort property.
    # orderBy+limit compiles to TakeOrderedAndProject (distributed
    # k-heaps), so the full item dim is never globally sorted; the
    # single-partition row_number window then runs on <= pool_cap rows.
    capped = (
        sampled.select("item_id")
        .distinct()
        .withColumn("__h", det_unit("item_id", string=True, salt=11))
        .orderBy(F.col("__h").asc(), F.col("item_id").asc())
        .limit(negative_pool_cap)
    )
    w_pool = Window.orderBy(F.col("__h").asc(), F.col("item_id").asc())
    pool_idx = capped.withColumn("idx", F.row_number().over(w_pool) - 1).select(
        F.col("item_id").alias("neg_item"), "idx"
    )
    pool_size = pool_idx.count()  # tiny driver action (<= pool_cap)
    probe_width = min(pool_size, max(16, 8 * negatives_per_positive))

    pos_keyed = positives.withColumn("pos_id", F.concat_ws("#", "user_id", "pos"))
    probes = (
        pos_keyed.withColumn(
            "base",
            (det_unit("pos_id", string=True, salt=13) * pool_size).cast("int"),
        )
        .withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(probe_width - 1))))
        .withColumn("idx", (F.col("base") + F.col("off")) % pool_size)
    )
    neg_cands = (
        probes.join(F.broadcast(pool_idx), "idx")
        .join(user_items, "user_id")
        .where(~F.array_contains(F.col("all_items"), F.col("neg_item")))
    )
    w = Window.partitionBy("pos_id").orderBy(F.col("off").asc())
    negatives = (
        neg_cands.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= negatives_per_positive)
        .select(
            "user_id",
            "history",
            F.col("neg_item").alias("candidate"),
            F.lit(0).alias("label"),
        )
    )

    pos_rows = positives.select(
        "user_id", "history", "candidate", F.lit(1).alias("label")
    )
    return (
        pos_rows.unionByName(negatives)
        .select(
            "user_id",
            pipe_join(tail_slice(F.col("history"), max_history)).alias("history_items"),
            F.col("candidate").alias("candidate_item"),
            F.col("label").cast("int").alias("label"),
        )
    )
