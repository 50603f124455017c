"""Deterministic sampling & split operators (SURVEY §2.6).

The reference's sampling is non-reproducible (unseeded random.shuffle,
reference: data_processing/split_users.py:24; np.random.choice pools,
model_training/lightgcn/utils.py:306-311). Our engine makes every
sample a pure function of the row key via the cross-engine hash in
functions.hashing, so (a) results are stable across runs/cluster
sizes, (b) the DuckDB oracle can verify them bit-for-bit, and (c) no
shuffle or driver round-trip is needed — sampling is a map-side
filter.

  SA1 hash_split             split_users.py:22-29 (80/20 user split)
  SA3 bernoulli_by_activity  generate_training_data.py:139-147
  SA4 negative_sample        generate_training_data.py:152-156,174-178
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import det_unit


def hash_split(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    string_key: bool = False,
    salt: int = 0,
    invert: bool = False,
) -> DataFrame:
    """SA1/SA2: deterministic ~rate fraction selected by key hash.

    ``invert=True`` returns the complement — the two halves partition
    the input exactly (unlike randomSplit, which is only approximate
    and non-deterministic across repartitioning).
    """
    u = det_unit(key_col, string=string_key, salt=salt)
    cond = u < F.lit(rate)
    return df.where(~cond if invert else cond)


def bernoulli_by_activity(
    df: DataFrame,
    key_col: str,
    count_col: str,
    threshold: int = 10,
    rate_active: float = 0.5,
    rate_light: float = 0.1,
    salt: int = 1,
) -> DataFrame:
    """SA3: keep active keys (count >= threshold) at rate_active, the
    rest at rate_light — deterministic per key."""
    rate = F.when(F.col(count_col) >= threshold, F.lit(rate_active)).otherwise(
        F.lit(rate_light)
    )
    return df.where(det_unit(key_col, salt=salt) < rate)


def negative_sample(
    interactions: DataFrame,
    items: DataFrame,
    k_per_user: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    pool_cap: int = 5000,
    salt: int = 7,
) -> DataFrame:
    """SA4/J3: k negatives per user, never an item the user touched.

    Scale-first shape (SURVEY §7 risk 2): instead of materializing
    all_items − user_items per user (O(|users|·|items|)), draw a
    deterministic hash-ordered candidate stream per (user, item) pair
    from a capped item pool, anti-join the user's positives, then keep
    the first k by hash rank. The candidate pool is `pool_cap` items
    (hash-ranked, stable), so the cross join is |users| × pool_cap —
    bounded — and the anti-join is a broadcast when positives are
    small.

    Deterministic: same output on every run and any cluster layout.
    """
    from ..functions.hashing import det_hash_long

    pool = (
        items.select(item_col)
        .distinct()
        .withColumn("__h", det_hash_long(item_col))
        .orderBy("__h")
        .limit(pool_cap)
        .drop("__h")
    )
    users = interactions.select(user_col).distinct()
    cands = users.join(F.broadcast(pool), how="cross")
    # rank candidates per user by a pair-hash; filter out positives
    pair_hash = det_unit(
        (F.col(user_col).cast("long") * F.lit(1000003) + F.col(item_col).cast("long")),
        salt=salt,
    )
    cands = cands.withColumn("__u", pair_hash)
    positives = interactions.select(user_col, item_col).distinct()
    negatives = cands.join(positives, [user_col, item_col], "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col("__u").asc(), F.col(item_col).asc())
    return (
        negatives.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k_per_user)
        .drop("__u", "__rn")
    )


def leave_last_out(
    df: DataFrame,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    n_test: int = 1,
) -> DataFrame:
    """Leave-last-out evaluation split: each user's ``n_test`` most
    recent rows (by ``order_cols`` descending — include a unique
    tie-break column, making the order TOTAL and the split
    deterministic) are 'test', the rest 'train' — the standard
    offline-eval protocol for sequential/next-item recommenders
    (train on history, predict the held-out last interaction).
    Adds a ``split`` string column; one per-user window pass
    (WindowGroupLimit-style ranking), never a max-join."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "split",
            F.when(F.col("__rn") <= n_test, F.lit("test")).otherwise(
                F.lit("train")
            ),
        )
        .drop("__rn")
    )


def eval_negatives(
    users: DataFrame,
    items: DataFrame,
    interactions: DataFrame,
    k: int = 5,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Sampled-metrics evaluation negatives: for each user, ``k``
    deterministic uniform draws from the item vocabulary, minus the
    user's own interactions — the standard "score the held-out item
    against N sampled negatives" offline-eval protocol (the sampled
    HR@k/NDCG@k setup). Returns (user, j, neg_item) with <= k rows
    per user: draws colliding with the user's history are DROPPED by
    one anti-join (deterministic; re-drawing to exactly k would need
    data-dependent iteration — the documented trade, standard in
    published eval code).

    Draws reuse the q151 Knuth recipe (hash of (user, j) mod |items|
    through indexed_vocab's dense bijection — no RNG state, every
    engine/retry draws identically). Scale: draws are a pure
    expression over |users| x k exploded rows; the index join keys on
    idx; the history exclusion is one (user, item) anti-join."""
    from ..functions.hashing import KNUTH, MOD32
    from .graph import indexed_vocab

    if k < 1:
        # F.sequence(1, 0) would auto-step -1 and emit [1, 0] — junk
        # draws that silently diverge from the oracle's empty series
        raise ValueError(f"eval_negatives needs k >= 1, got {k}")
    two31 = 2147483648
    vocab = items.select(F.col(item_col).alias("node")).distinct()
    idx = indexed_vocab(vocab)
    n_frame = idx.agg(F.count(F.lit(1)).alias("__n"))

    def kh(col):
        return F.pmod(F.pmod(col, F.lit(two31)) * F.lit(KNUTH), F.lit(MOD32))

    drawn = (
        users.select(F.col(user_col))
        .distinct()
        .crossJoin(F.broadcast(n_frame))
        .select(
            user_col,
            "__n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
        )
        .withColumn(
            "__draw",
            F.pmod(
                kh(
                    F.pmod(
                        kh(F.col(user_col)) + F.col("j") * F.lit(1000003) + F.lit(7),
                        F.lit(two31),
                    )
                ),
                F.col("__n"),
            ),
        )
    )
    negs = drawn.join(
        idx.select(F.col("idx").alias("__draw"), F.col("node").alias("neg_item")),
        "__draw",
    ).select(user_col, "j", "neg_item")
    hist = interactions.select(
        F.col(user_col), F.col(item_col).alias("neg_item")
    ).distinct()
    return negs.join(hist, [user_col, "neg_item"], "left_anti")


def largest_remainder_quota(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Hamilton / largest-remainder apportionment of an integer
    ``budget`` across groups proportionally to ``weight_col`` — the
    deterministic quota step of training-mixture construction (give
    each source floor(budget * w / total) sampling slots, then hand
    the leftover slots to the largest fractional remainders): the
    unique proportional allocation that is exact-integer end to end,
    always sums to the budget, and never strands a slot on rounding.

    All arithmetic is int64 (budget * w must stay under 2^63 — at a
    1e6 budget that allows ~9e12 total weight; cast up earlier if a
    deployment exceeds it), remainders tie-break on the key
    ascending, so the allocation replays bit-for-bit on any engine.
    Scale: one groupBy-sum if the input is per-row, then the
    apportionment runs over |groups| rows — the window is a
    deliberate single |groups|-row pass (domains number in the
    dozens, not the billions; the 100 TB cost lives in the upstream
    weight aggregation, which is map-side partial)."""
    from pyspark.sql import Window

    w = df.groupBy(key_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    tot = w.agg(F.sum("__w").alias("__tw"))
    base = w.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.col("__w"),
        F.expr(f"CAST(({budget} * __w) div __tw AS BIGINT)").alias(
            "quota_floor"
        ),
        F.expr(f"CAST(({budget} * __w) % __tw AS BIGINT)").alias("__rem"),
    )
    leftover = base.agg(
        (F.lit(budget).cast("long") - F.sum("quota_floor")).alias("__l")
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("__rem").desc(), F.col(key_col).asc())
    )
    return (
        base.withColumn("__rn", rn)
        .crossJoin(F.broadcast(leftover))
        .select(
            key_col,
            F.col("__w").alias("total_weight"),
            "quota_floor",
            F.when(F.col("__rn") <= F.col("__l"), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("extra"),
            (
                F.col("quota_floor")
                + F.when(F.col("__rn") <= F.col("__l"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("quota"),
        )
    )
