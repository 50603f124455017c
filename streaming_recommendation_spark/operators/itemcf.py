"""Item-item neighborhood collaborative filtering (co-occurrence CF).

The reference's recall paths are model-based — embedding similarity
(eval_online/main/inference.py) and LightGCN/ALS factors
(model_training/lightgcn/) — with no neighborhood method. Item-item
co-occurrence ("users who interacted with X also interacted with Y")
is the classic complement a recommendation engine at this scale needs:
trainable with zero ML, updatable by pure count addition, and the
standard cold-model fallback while factor models retrain.

Scale design (the whole operator is three bounded shuffles):

1. **Per-user history cap is THE lever.** An uncapped user with H
   items contributes H*(H-1)/2 pairs — a single crawler/power user
   with 1M events would emit 5e11 pairs and no cluster survives.
   ``capped_histories`` ranks each user's items by recency and keeps
   the newest ``max_items`` (WindowGroupLimit: each shuffle partition
   keeps a per-user k-heap, whole histories never sort), so pair
   volume is <= |users| * C(max_items, 2) by construction.
2. **Pairs are generated JVM-side from a bounded array, not by a
   self-join.** groupBy(user).collect_list over the CAPPED set yields
   arrays of <= max_items elements; nested ``transform`` + ``slice``
   + ``flatten`` expands ordered pairs inside whole-stage codegen.
   A self-join on user_id would shuffle the interaction table twice
   and re-materialize each user's history |history| times; the array
   form pays one user-shuffle and one pair-shuffle, total.
3. **Similarity normalization joins on item keys** (cnt tables are
   |items| rows). Not unconditionally broadcast: at 100 TB the item
   dim can be 1e8+ rows — the session's 64 MB autoBroadcast threshold
   + AQE decide, and the pair table arrives already aggregated
   (item_a, item_b, count), the smallest it can be.

Co-occurrence counts are ADDITIVE (a new interaction batch only adds
pairs within its users' updated capped windows), which is what makes
the streaming variant a pure sum-merge — same mergeable-state family
as the HLL/CMS/histogram sketches in streaming/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import top_k_per_group


def capped_histories(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    recency_col: str,
    max_items: int = 50,
    keep_recency: bool = False,
) -> DataFrame:
    """(user, item) pairs deduplicated and capped to each user's
    ``max_items`` most recent items (recency = max(recency_col) per
    pair; ties broken by item ascending so the cap is deterministic).
    ``keep_recency=True`` also returns the per-pair max recency under
    the original column name — the streaming window state needs it to
    re-rank on the next batch."""
    dedup = interactions.groupBy(user_col, item_col).agg(
        F.max(recency_col).alias("__rec")
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("__rec").desc(), F.col(item_col).asc()
    )
    capped = dedup.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= max_items
    )
    if keep_recency:
        return capped.select(
            user_col, item_col, F.col("__rec").alias(recency_col)
        )
    return capped.select(user_col, item_col)


def user_pairs(capped: DataFrame, user_col: str, item_col: str) -> DataFrame:
    """(user, item_a, item_b) with item_a < item_b: each unordered
    item pair inside one user's capped history, emitted once. Input
    must be (user, item)-distinct. One groupBy(user) shuffle builds a
    sorted bounded array; ordered pairs expand JVM-side (nested
    transform over slice — the sort guarantees a < b)."""
    arrs = capped.groupBy(user_col).agg(
        F.sort_array(F.collect_list(item_col)).alias("__items")
    )
    items = F.col("__items")
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return arrs.select(user_col, F.explode(pairs).alias("__p")).select(
        user_col,
        F.col("__p.a").alias("item_a"),
        F.col("__p.b").alias("item_b"),
    )


def item_cooccurrence(
    capped: DataFrame, user_col: str, item_col: str
) -> DataFrame:
    """(item_a, item_b, pair_users) with item_a < item_b: the number
    of users whose capped history contains both items. Input must be
    (user, item)-distinct — ``capped_histories`` output.

    ``user_pairs`` expands ordered pairs from a bounded sorted array;
    one groupBy(pair) shuffle counts, with map-side partial
    aggregation collapsing the per-user expansion before it moves.
    """
    return (
        user_pairs(capped, user_col, item_col)
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_users"))
    )


def pair_deltas(
    old_windows: DataFrame,
    new_windows: DataFrame,
    user_col: str,
    item_col: str,
) -> DataFrame:
    """(item_a, item_b, __delta): SIGNED pair-count changes between
    two window snapshots of the same users — +1 per user gaining the
    pair, -1 per user losing it (window eviction RETRACTS pairs; the
    recency cap makes co-occurrence counts non-monotone). This is
    the incremental unit streaming/itemcf.py maintains and the q141
    twin replays — one implementation so the twin pins the streamed
    code path."""
    oldp = user_pairs(old_windows, user_col, item_col)
    newp = user_pairs(new_windows, user_col, item_col)
    added = newp.join(oldp, [user_col, "item_a", "item_b"], "left_anti")
    removed = oldp.join(newp, [user_col, "item_a", "item_b"], "left_anti")
    return (
        added.select("item_a", "item_b", F.lit(1).alias("__d"))
        .unionByName(removed.select("item_a", "item_b", F.lit(-1).alias("__d")))
        .groupBy("item_a", "item_b")
        .agg(F.sum("__d").alias("__delta"))
    )


def apply_pair_deltas(counts: DataFrame, deltas: DataFrame) -> DataFrame:
    """Fold signed deltas into (item_a, item_b, pair_users) by one
    outer-join sum; pairs whose count reaches zero are dropped."""
    return (
        counts.join(deltas, ["item_a", "item_b"], "full_outer")
        .select(
            "item_a",
            "item_b",
            (
                F.coalesce(F.col("pair_users"), F.lit(0))
                + F.coalesce(F.col("__delta"), F.lit(0))
            ).alias("pair_users"),
        )
        .where(F.col("pair_users") > 0)
    )


def item_counts(capped: DataFrame, item_col: str) -> DataFrame:
    """Per-item user count over the SAME capped universe the pairs
    were drawn from (using raw counts would deflate every hot item's
    cosine by whatever the cap removed)."""
    return capped.groupBy(F.col(item_col).alias("item_id")).agg(
        F.count(F.lit(1)).alias("users")
    )


def item_similarity(
    cooc: DataFrame,
    counts: DataFrame,
    normalization: str = "cosine",
    min_pair_users: int = 1,
) -> DataFrame:
    """Normalize pair counts into a similarity score.

    cosine  = pair / sqrt(users_a * users_b)
    jaccard = pair / (users_a + users_b - pair)

    Both are exact integer-derived doubles — bit-stable across
    engines (one sqrt + one division, no reassociation).
    """
    if normalization not in ("cosine", "jaccard"):
        raise ValueError(f"unknown normalization: {normalization}")
    ca = counts.select(
        F.col("item_id").alias("item_a"), F.col("users").alias("__ua")
    )
    cb = counts.select(
        F.col("item_id").alias("item_b"), F.col("users").alias("__ub")
    )
    pair = F.col("pair_users")
    score = (
        pair / F.sqrt(F.col("__ua") * F.col("__ub"))
        if normalization == "cosine"
        else pair / (F.col("__ua") + F.col("__ub") - pair)
    )
    return (
        cooc.where(pair >= min_pair_users)
        .join(ca, "item_a")
        .join(cb, "item_b")
        .select("item_a", "item_b", "pair_users", score.alias("score"))
    )


def itemcf_topk(sim: DataFrame, k: int = 10) -> DataFrame:
    """(item_id, neighbor_id, rank): each item's top-k most similar
    items. Similarity is symmetric but stored once (item_a < item_b),
    so both orientations union first; ranks are float-free output
    (ties broken by neighbor ascending) so results are stable across
    engines. WindowGroupLimit keeps a k-heap per item per partition —
    no full sort of the pair table."""
    fwd = sim.select(
        F.col("item_a").alias("item_id"),
        F.col("item_b").alias("neighbor_id"),
        "score",
    )
    rev = sim.select(
        F.col("item_b").alias("item_id"),
        F.col("item_a").alias("neighbor_id"),
        "score",
    )
    return top_k_per_group(
        fwd.unionByName(rev),
        k,
        ["item_id"],
        F.col("score").desc(),
        F.col("neighbor_id").asc(),
        rank_col="rank",
    ).select("item_id", "neighbor_id", "rank")
