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


def association_rules(
    interactions: DataFrame,
    basket_col: str,
    item_col: str,
    recency_col: str,
    max_items: int = 20,
    min_support: int = 2,
    min_confidence_pct: int = 0,
) -> DataFrame:
    """Pairwise association rules (market-basket analysis): for every
    directed item pair (antecedent -> consequent) co-occurring in
    >= ``min_support`` baskets, the classic rule statistics

        support(a, c)   = # baskets containing both
        confidence(a->c) = support(a, c) / support(a)
        lift(a->c)       = support(a, c) * N / (support(a) * support(c))

    This is the frequent-pattern leg the co-occurrence family
    (item_cooccurrence / swing) was missing: confidence/lift turn raw
    counts into DIRECTED implication strength, the cross-sell /
    "frequently bought together" primitive.

    Exactness: all supports are integers from the same capped basket
    universe; confidence and lift are each ONE double division of
    int64 products (no reassociation — bit-identical on any engine),
    rounded to 6; the ``min_confidence_pct`` threshold is applied by
    integer cross-multiplication (support * 100 >= pct * ante), never
    on the rounded float, so the cut cannot flake at a boundary ULP.

    Scale shape: identical to item_cooccurrence — the per-basket item
    cap bounds pair volume at |baskets| * C(max_items, 2); pairs
    expand JVM-side from bounded sorted arrays; supports join on item
    keys (|items|-row tables, AQE/broadcast decide); N arrives as a
    1-row broadcast (no driver action). Returns (antecedent,
    consequent, pair_support, ante_support, cons_support, n_baskets,
    confidence, lift).
    """
    capped = capped_histories(
        interactions, basket_col, item_col, recency_col, max_items=max_items
    )
    cooc = item_cooccurrence(capped, basket_col, item_col).where(
        F.col("pair_users") >= min_support
    )
    counts = item_counts(capped, item_col)
    n_baskets = capped.agg(
        F.countDistinct(basket_col).alias("n_baskets")
    )
    rules = cooc.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("pair_users").alias("pair_support"),
    ).unionByName(
        cooc.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            F.col("pair_users").alias("pair_support"),
        )
    )
    sa = counts.select(
        F.col("item_id").alias("antecedent"), F.col("users").alias("ante_support")
    )
    sc = counts.select(
        F.col("item_id").alias("consequent"), F.col("users").alias("cons_support")
    )
    out = (
        rules.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
    )
    if min_confidence_pct:
        out = out.where(
            F.col("pair_support") * 100
            >= F.lit(min_confidence_pct) * F.col("ante_support")
        )
    return out.select(
        "antecedent",
        "consequent",
        "pair_support",
        "ante_support",
        "cons_support",
        "n_baskets",
        F.round(F.col("pair_support") / F.col("ante_support"), 6).alias(
            "confidence"
        ),
        F.round(
            (F.col("pair_support") * F.col("n_baskets"))
            / (F.col("ante_support") * F.col("cons_support")),
            6,
        ).alias("lift"),
    )


def capped_audiences(
    capped_with_rec: DataFrame,
    user_col: str,
    item_col: str,
    recency_col: str,
    max_users: int = 20,
) -> DataFrame:
    """Dual of ``capped_histories``: per ITEM, keep the ``max_users``
    most recent users (ties by user ascending). Input is
    ``capped_histories(..., keep_recency=True)`` output — the doubly-
    capped relation bounds BOTH expansions: user-side pair volume at
    C(max_items, 2) per user, item-side user-pair volume at
    C(max_users, 2) per item (an item with 100M users would otherwise
    emit 5e15 user pairs in swing)."""
    w = Window.partitionBy(item_col).orderBy(
        F.col(recency_col).desc(), F.col(user_col).asc()
    )
    return (
        capped_with_rec.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_users)
        .select(user_col, item_col)
    )


def swing_similarity(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    recency_col: str,
    alpha: int = 1,
    max_items: int = 20,
    max_users: int = 20,
    min_user_pairs: int = 1,
) -> DataFrame:
    """Swing similarity (Alibaba's i2i recall): item pair (i, j)
    scores the sum over USER PAIRS (u, v) that both interacted with
    both items of 1 / (alpha + |I_u intersect I_v|) — a user pair
    that co-occurs on many items is a weak (likely spurious or bot)
    signal and is damped by its own overlap, which plain
    co-occurrence (``item_cooccurrence``) cannot express.

    EXACT integer arithmetic: with integer ``alpha`` and the user cap
    bounding |I_u intersect I_v| <= max_items, every weight
    1/(alpha+c) is one of <= max_items rationals — scores are summed
    as ``swing_scaled`` = sum of LCM/(alpha+c) in 64-bit integers
    (LCM over the closed denominator range divides exactly), so the
    result is order-independent and bit-identical on any engine;
    float summation here would be partition-order-dependent. The
    true score is swing_scaled / LCM (also returned, rounded).

    Scale shape: the doubly-capped relation (``capped_histories`` +
    ``capped_audiences``) bounds per-item user pairs at
    C(max_users, 2); those expand JVM-side from bounded sorted
    arrays (``user_pairs`` transposed). The (i, j) candidates come
    from a self-equi-join of the per-item user-pair table ON the
    user pair — group size = |items common to (u, v)| <= max_items,
    so the join output is sum over user pairs of C(c, 2), never a
    cartesian. Returns (item_a, item_b, n_user_pairs, swing_scaled,
    swing_scale, swing).
    """
    import math

    denoms = range(alpha + 1, alpha + max_items + 1)
    lcm = 1
    for d in denoms:
        lcm = lcm * d // math.gcd(lcm, d)

    r = capped_histories(
        interactions, user_col, item_col, recency_col,
        max_items=max_items, keep_recency=True,
    )
    r2 = capped_audiences(r, user_col, item_col, recency_col, max_users)
    # per-item user pairs: user_pairs with the roles transposed
    iup = user_pairs(r2, item_col, user_col).select(
        F.col(item_col),
        F.col("item_a").alias("__u"),
        F.col("item_b").alias("__v"),
    )
    # |I_u intersect I_v| over the SAME doubly-capped universe
    cuv = iup.groupBy("__u", "__v").agg(F.count(F.lit(1)).alias("__c"))
    a = iup.select(F.col(item_col).alias("item_a"), "__u", "__v")
    b = iup.select(F.col(item_col).alias("item_b"), "__u", "__v")
    pairs = (
        a.join(b, ["__u", "__v"])
        .where(F.col("item_a") < F.col("item_b"))
        .join(cuv, ["__u", "__v"])
    )
    # exact integer weights via a literal lookup (LCM divides each
    # denominator exactly; double division would lose exactness once
    # LCM crosses 2^53 at larger caps)
    wmap = F.create_map(
        *[
            x
            for c in range(1, max_items + 1)
            for x in (F.lit(c), F.lit(lcm // (alpha + c)))
        ]
    )
    weight = F.element_at(wmap, F.col("__c").cast("int"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("n_user_pairs"),
            F.sum(weight).alias("swing_scaled"),
        )
        .where(F.col("n_user_pairs") >= min_user_pairs)
        .select(
            "item_a",
            "item_b",
            "n_user_pairs",
            "swing_scaled",
            F.lit(lcm).alias("swing_scale"),
            F.round(F.col("swing_scaled") / F.lit(lcm), 6).alias("swing"),
        )
    )
