"""Evaluation-metric operators (SURVEY §2.4 A11).

The reference computes Recall/Precision/NDCG@K, pairwise accuracy,
MRR, AUC, logloss row-at-a-time in Python (reference:
model_training/lightgcn/utils.py:157-231 — NDCG at :216-222;
din/utils.py:285-316; ranknet/utils.py:321-375). Here each metric is
a window-rank + conditional-aggregation DataFrame plan: one shuffle
on the user key for the per-user family, one global agg for AUC —
partial aggregation map-side, no Python in the loop.

Input contract: (user, score, label) predictions; label is 0/1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    df: DataFrame,
    k: int = 5,
    user_col: str = "user_id",
    score_col: str = "score",
    label_col: str = "label",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user precision@k, recall@k, NDCG@k, MRR.

    Deterministic: ties on score break by `tiebreak_col` ascending.
    Users with zero relevant items get recall/ndcg/mrr = 0.
    """
    order = [F.col(score_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))

    rel = F.col(label_col) == 1
    in_k = F.col("__rn") <= k
    dcg = F.sum(F.when(rel & in_k, 1.0 / F.log2(F.col("__rn") + 1)).otherwise(0.0))
    n_rel = F.sum(F.when(rel, 1).otherwise(0))
    hits_k = F.sum(F.when(rel & in_k, 1).otherwise(0))
    first_rel = F.min(F.when(rel, F.col("__rn")))

    per_user = ranked.groupBy(user_col).agg(
        hits_k.alias("__hits"),
        n_rel.alias("__nrel"),
        dcg.alias("__dcg"),
        first_rel.alias("__first"),
    )
    # ideal DCG for min(k, n_rel) relevant items at the top
    idcg = F.when(
        F.col("__nrel") > 0,
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("__nrel"), F.lit(k))),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i + 1),
        ),
    ).otherwise(F.lit(None))

    return per_user.select(
        user_col,
        F.round(F.col("__hits") / k, 6).alias(f"precision_at_{k}"),
        F.round(
            F.when(F.col("__nrel") > 0, F.col("__hits") / F.col("__nrel")).otherwise(
                0.0
            ),
            6,
        ).alias(f"recall_at_{k}"),
        F.round(
            F.coalesce(F.col("__dcg") / idcg, F.lit(0.0)), 6
        ).alias(f"ndcg_at_{k}"),
        F.round(
            F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
        ).alias("mrr"),
    )


def binary_metrics(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
    eps: float = 1e-15,
    auc_score_decimals: int | None = None,
) -> DataFrame:
    """One-row (auc, accuracy, logloss, n_pos, n_neg).

    AUC by the Mann-Whitney rank-sum with tie-averaged ranks,
    computed over DISTINCT-SCORE GROUPS: aggregate (n, n_pos) per
    score first (map-side combinable), then a window over the group
    rows assigns each tie group its average rank = rows_before +
    (n+1)/2. The single-partition window touches |distinct scores|
    rows, not |rows| — for model scores that's the quantized score
    space.

    For truly CONTINUOUS scores (|distinct| ~ |rows|), pass
    ``auc_score_decimals`` to quantize scores to that many decimals
    for the AUC ranking only: the window then touches at most
    10^decimals + 1 rows regardless of data size, and the AUC error
    is bounded by the mass of pairs within half a quantum of each
    other (<= ~10^-decimals for score distributions without point
    masses; exact when scores are already that coarse). accuracy /
    logloss are always computed on unquantized scores.
    """
    auc_score = F.col(score_col)
    if auc_score_decimals is not None:
        auc_score = F.round(auc_score, auc_score_decimals)
    groups = df.groupBy(auc_score.alias(score_col)).agg(
        F.count(F.lit(1)).alias("__n_in_tie"),
        F.sum(F.col(label_col)).alias("__pos_in_tie"),
    )
    w = Window.orderBy(F.col(score_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    tie_avg = groups.withColumn(
        "__avg_rank",
        F.coalesce(F.sum("__n_in_tie").over(w), F.lit(0))
        + (F.col("__n_in_tie") + 1) / 2.0,
    )
    pos_rank_sum = F.sum(F.col("__avg_rank") * F.col("__pos_in_tie"))
    np_ = F.sum("__pos_in_tie")
    nn_ = F.sum(F.col("__n_in_tie") - F.col("__pos_in_tie"))

    clamped = F.greatest(F.least(F.col(score_col), F.lit(1 - eps)), F.lit(eps))
    base = df.agg(
        F.round(
            F.avg(
                F.when(
                    (F.col(score_col) >= threshold) == (F.col(label_col) == 1), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("accuracy"),
        F.round(
            -F.avg(
                F.col(label_col) * F.log(clamped)
                + (1 - F.col(label_col)) * F.log(1 - clamped)
            ),
            6,
        ).alias("logloss"),
    )
    auc = tie_avg.agg(
        F.round(
            (pos_rank_sum - np_ * (np_ + 1) / 2) / (np_ * nn_), 6
        ).alias("auc"),
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
    )
    return auc.crossJoin(base).select(
        "auc", "accuracy", "logloss", "n_pos", "n_neg"
    )


def calibration_bins(
    preds: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram bins: partition predictions into equal-width
    score bins and report per-bin count, positives, mean score, and
    empirical positive rate — the data behind a calibration curve /
    expected-calibration-error computation.

    Scale shape: one groupBy on the derived bin key with map-side
    partial aggregation — a single shuffle of n_bins rows per
    partition regardless of input size; the 100 TB cost is the scan.
    floor(score * n_bins) is the same IEEE double op on every engine,
    so bin assignment replays exactly; scores are clamped into
    [0, n_bins): 1.0 (and anything above) folds into the top bin (the
    standard closed-right final interval), negatives into bin 0.
    """
    b = F.greatest(
        F.least(F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)),
        F.lit(0),
    )
    return preds.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.round(F.avg(score_col), 6).alias("mean_score"),
        F.round(F.avg(F.col(label_col).cast("double")), 6).alias("pos_rate"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[tuple[int, int]] = ((1, 2), (19, 20), (99, 100)),
    n_bins: int = 256,
) -> DataFrame:
    """Quantiles from a fixed-width histogram sketch — the mergeable
    one-pass shape for percentiles at 100 TB, where the exact
    percentile (q15) needs a per-group sort of every value.

    Two aggregation passes: (1) per-group min/max fixes the bin
    width; (2) per-(group, bin) integer counts — map-side
    combinable, so each executor ships at most ``n_bins`` partial
    counts per group regardless of row count, and sketches merge by
    addition (the same contract as t-digest/HDR histograms, with a
    deterministic layout instead of a data-dependent one).

    Each quantile (num, den) reports the LOWER EDGE of the first bin
    whose cumulative count reaches ceil(num/den * n) — a value-space
    answer within (max-min)/n_bins of the exact quantile.

    Determinism: bin ids are per-row IEEE floor((v-min)/w) (scalar
    arithmetic, no float aggregation), ranks are exact integer
    ceil-divisions, and edges are single IEEE multiply-adds — the
    whole sketch replays bit-for-bit in the q117 oracle.
    """
    layout = histogram_layout(df, value_col, group_cols)
    bins = histogram_bins(df, layout, value_col, group_cols, n_bins)
    return histogram_from_bins(bins, layout, group_cols, quantiles, n_bins)


def histogram_layout(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group (``__mn``, ``__mx``): the FIXED bin layout every
    partial histogram must share — the sketch-family analogue of the
    IVF landmark table (streaming/vectors.py): partials built against
    different layouts cannot merge, so a streaming histogram captures
    the layout ONCE from a seed corpus and keeps it."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    )


def histogram_bins(
    df: DataFrame,
    layout: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 256,
    strict_groups: bool = False,
) -> DataFrame:
    """Per-(group, bin) integer counts under the given layout — the
    mergeable partial state. Values outside the layout's range (a
    streaming batch after layout capture) clamp to the edge bins, the
    standard fixed-layout histogram behavior; when the layout comes
    from the same data (the one-pass batch path) the clamp is
    provably a no-op.

    ``strict_groups=True`` (the streaming path, where the layout is
    FIXED from a seed corpus): a non-NULL group with no layout row
    raises IN-PLAN via raise_error — the inner join would silently
    drop the whole group, and values clamp but groups must fail
    loudly. Rows whose group columns contain NULL drop in both modes
    (NULL keys never equi-join; a layout re-seed could never match
    them either)."""
    gks = [F.col(c) for c in group_cols]
    w = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    base = df.where(F.col(value_col).isNotNull())
    if strict_groups:
        for c in group_cols:
            base = base.where(F.col(c).isNotNull())
        # left join + guarded __mn: the guard feeds the bin math so
        # the optimizer can't prune it — fails at execution time with
        # the offending group, no second scan of the batch
        joined = base.join(layout, group_cols, "left").withColumn(
            "__mn",
            F.when(
                F.col("__mn").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "histogram batch contains group ("
                        ),
                        F.concat_ws(
                            ", ", *[F.col(c).cast("string") for c in group_cols]
                        ),
                        F.lit(
                            ") absent from the fixed bin layout; re-seed "
                            "the layout (new sketch) for new groups — "
                            "merging partials built on different layouts "
                            "is unsound"
                        ),
                    )
                ).cast("double"),
            ).otherwise(F.col("__mn")),
        )
    else:
        joined = base.join(layout, group_cols)
    return (
        joined
        .withColumn(
            "__bin",
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.floor((F.col(value_col) - F.col("__mn")) / w),
                        F.lit(n_bins - 1),
                    ),
                )
            ).cast("int"),
        )
        .groupBy(*gks, F.col("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def merge_histogram_bins(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Histogram merge = per-(group, bin) count SUM (associative;
    retry safety comes from the versioned-snapshot state, same as
    CMS)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "__bin")
        .agg(F.sum("__c").alias("__c"))
    )


def histogram_from_bins(
    bins: DataFrame,
    layout: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[int, int]] = ((1, 2), (19, 20), (99, 100)),
    n_bins: int = 256,
) -> DataFrame:
    """Finalize: quantile lower edges from merged bin counts. ``n``
    is derived from the bins (sum of counts == count of non-null
    values), so the mergeable state is exactly (group, bin, count)."""
    gks = [F.col(c) for c in group_cols]
    n = bins.groupBy(*gks).agg(F.sum("__c").alias("__n"))
    from pyspark.sql import Window

    cum = (
        bins.withColumn(
            "__cum",
            F.sum("__c").over(
                Window.partitionBy(*group_cols)
                .orderBy("__bin")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .join(layout, group_cols)
        .join(n, group_cols)
    )
    out_cols = list(group_cols) + [F.col("__n").alias("n")]
    agg_cols = []
    for num, den in quantiles:
        rank = F.expr(f"({num} * __n + {den} - 1) div {den}")
        edge = F.col("__mn") + F.min(
            F.when(F.col("__cum") >= rank, F.col("__bin"))
        ) * ((F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins)))
        agg_cols.append(
            F.round(edge, 6).alias(f"p{num * 100 // den}_lo")
        )
    return (
        cum.groupBy(*gks, F.col("__n"), F.col("__mn"), F.col("__mx"))
        .agg(*agg_cols)
        .select(*out_cols, *[f"p{num * 100 // den}_lo" for num, den in quantiles])
    )


def sampled_holdout_eval(
    interactions: DataFrame,
    item_qvecs: DataFrame,
    order_cols: tuple[str, ...],
    user_col: str = "user_id",
    item_col: str = "item_id",
    k_neg: int = 10,
    k: int = 10,
) -> DataFrame:
    """End-to-end offline cascade evaluation (VERDICT r7 #3) — the
    reference's actual eval loop (reference: model_training/lightgcn/
    utils.py:119-231) as ONE composed plan instead of the piecewise
    q167/q168/q40/q47 coverage:

    1. ``leave_last_out`` holds out each user's most recent
       interaction (by ``order_cols`` descending — include unique
       tie-breaks so the order is TOTAL);
    2. users with an empty training history are excluded (nothing to
       pool — the standard >= 2-interactions protocol filter);
    3. ``eval_negatives`` draws ``k_neg`` deterministic uniform
       candidates per user minus the user's full history (collisions
       with history drop, the q168 contract), then DEDUPED on
       (user, item): two draw indices j can hash to the same item,
       and keeping both would double-count it in ``n_cands`` and
       inflate ``pos_rank`` — the protocol is without-replacement
       (ADVICE r8);
    4. each candidate (the held-out positive + the negatives) is
       scored with the CASCADE'S RANK-STAGE MODEL: cosine between the
       user's history profile and the item vector. The profile is the
       SUM of the train items' quantized vectors — cosine is
       scale-invariant, so sum-pooling ranks identically to the
       cascade's mean-pool (cascade/recommend.py rank stage) while
       keeping every coordinate an exact int64 (no 1/n float);
    5. per-user sampled ranking metrics of the positive among the
       candidates: (user, pos_item, n_cands, pos_rank, hit_at_k,
       ndcg_at_k, mrr).

    Exactness: profile coordinates and dot products are exact int64
    sums; each norm is one sqrt of an exact int64; the score is one
    IEEE division (the q35/q66 cosine recipe); ndcg/mrr are one
    log2/division each, rounded to 6 decimals like q47. The held-out
    rank is therefore bit-replayable by a SQL oracle. Operand bound:
    the profile norm squares per-dim sums, so |coordinate| must stay
    under ~3.8e8 for the 64-dim sum of squares to fit int64 — with
    the q88 scale of 4096 that is ~93k train interactions per user;
    cap per-user history (q11's operator) or lower the scale before
    that regime.

    Scale shape: the split is one per-user window pass; negatives are
    |users| x k_neg generated rows through the indexed-vocab equi-join
    (no global sort); profiles reduce train rows map-side to
    |users| x d coordinates before one groupBy; scoring joins the
    bounded candidate set (|users| x (k_neg+1) x d rows) — nothing is
    corpus x corpus, no item broadcast, no crossJoin beyond the two
    singleton count frames.

    Coverage contract (ADVICE r8): ``item_qvecs`` must cover the
    interaction item vocabulary. The candidate->qvec and
    train->qvec joins are INNER, so a held-out positive with no
    qvec row — or a user whose entire train history lacks vectors —
    silently drops that user from the output rather than erroring.
    Callers mapping items onto a smaller vector table must do the
    mod-assignment BEFORE calling (the q172 recipe maps item mod
    |embeddings| so every item has a vector by construction)."""
    from .sampling import eval_negatives, leave_last_out

    inter = interactions.select(user_col, item_col, *order_cols)
    split = leave_last_out(inter, user_col=user_col, order_cols=order_cols)
    pos = split.where(F.col("split") == "test").select(user_col, item_col)
    train = split.where(F.col("split") == "train").select(user_col, item_col)
    eligible = train.select(user_col).distinct()
    pos = pos.join(eligible, user_col)
    negs = eval_negatives(
        eligible,
        item_qvecs.select(item_col),
        inter.select(user_col, item_col),
        k=k_neg,
        user_col=user_col,
        item_col=item_col,
    )
    # distinct: two draw indices can hash to the same item; the
    # protocol is without-replacement (docstring point 3, ADVICE r8)
    cands = pos.withColumn("is_pos", F.lit(1)).unionByName(
        negs.select(user_col, F.col("neg_item").alias(item_col))
        .distinct()
        .withColumn("is_pos", F.lit(0))
    )
    # profiles and dots stay in ARRAY form: the sums are the same
    # exact int64s a long-form (user, dim) explode would produce
    # (integer addition is commutative/associative, so collect_list
    # order is irrelevant), but the profile shuffle carries one
    # 64-long array per TRAIN ROW instead of 64 exploded rows, and
    # each candidate's dot is one JVM zip_with fold instead of a
    # d-way join — measured 20 s -> ~2 s for the profile stage at
    # sf0.1 (the first long-form draft shuffled 36.5M rows)
    zero = F.array_repeat(
        F.lit(0).cast("long"),
        F.size(F.element_at(F.col("__vs"), 1)),
    )
    add = lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y)
    uvecs = (
        train.join(item_qvecs, item_col)
        .groupBy(user_col)
        .agg(F.collect_list("qvec").alias("__vs"))
        .select(
            user_col,
            F.aggregate(F.col("__vs"), zero, add).alias("__uv"),
        )
        .select(
            user_col,
            "__uv",
            F.sqrt(
                F.aggregate(
                    F.col("__uv"),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x * x,
                )
            ).alias("__nu"),
        )
    )
    items_n = item_qvecs.select(
        item_col,
        F.col("qvec").alias("__iv"),
        F.sqrt(
            F.aggregate(
                F.col("qvec"),
                F.lit(0).cast("long"),
                lambda a, x: a + x * x,
            )
        ).alias("__ni"),
    )
    dp = F.aggregate(
        F.zip_with(F.col("__uv"), F.col("__iv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = cands.join(uvecs, user_col).join(items_n, item_col).select(
        user_col,
        item_col,
        "is_pos",
        F.when(
            F.col("__nu") * F.col("__ni") > 0,
            dp / (F.col("__nu") * F.col("__ni")),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("score").desc(), F.col(item_col).asc()
    )
    wc = Window.partitionBy(user_col)
    ranked = scored.withColumn("pos_rank", F.row_number().over(w)).withColumn(
        "n_cands", F.count(F.lit(1)).over(wc)
    )
    r = F.col("pos_rank")
    return ranked.where(F.col("is_pos") == 1).select(
        user_col,
        F.col(item_col).alias("pos_item"),
        F.col("n_cands").cast("long").alias("n_cands"),
        r.cast("long").alias("pos_rank"),
        F.when(r <= k, F.lit(1)).otherwise(F.lit(0)).alias(f"hit_at_{k}"),
        F.round(
            F.when(r <= k, F.lit(1.0) / F.log2(r + 1)).otherwise(F.lit(0.0)), 6
        ).alias(f"ndcg_at_{k}"),
        F.round(F.lit(1.0) / r, 6).alias("mrr"),
    )


def intra_list_diversity(
    recs: DataFrame,
    item_vecs: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    vec_col: str = "item_vec",
    quant: int = 1_000_000,
) -> DataFrame:
    """Beyond-accuracy list metric #1 — intra-list diversity (ILD):
    mean pairwise cosine DISTANCE inside each user's recommendation
    list (Ziegler et al. 2005's diversification target). A cascade
    tuned only on accuracy often converges to near-duplicate lists;
    this is the read that shows it.

    Exactness: each pairwise cosine is the standard one-division
    float (both engines produce the identical double), then
    QUANTIZED to ``round(cos * quant)`` int64 — the per-user SUM is
    exact integer arithmetic regardless of pair order (a float sum
    of 45 pair cosines would reassociate), and the final
    ild = 1 - sum/(n_pairs * quant) is a fixed two-op IEEE tree.

    Returns (user, n_pairs, sum_qcos, ild). Scale: pairs form
    per-user from k-row lists (k*(k-1)/2 per user, k bounded by the
    recommender), vectors join on the item key with norms computed
    once per row (cosine_from_norms)."""
    from ..functions.vectors import cosine_from_norms, l2_norm

    v = item_vecs.select(
        F.col(item_col),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
    )
    a = recs.select(F.col(user_col), F.col(item_col).alias("__ia")).join(
        v.select(
            F.col(item_col).alias("__ia"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
        ),
        "__ia",
    )
    b = recs.select(F.col(user_col), F.col(item_col).alias("__ib")).join(
        v.select(
            F.col(item_col).alias("__ib"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
        ),
        "__ib",
    )
    pairs = a.join(b, user_col).where(F.col("__ia") < F.col("__ib"))
    qc = F.round(
        cosine_from_norms("__va", "__vb", "__na", "__nb") * F.lit(int(quant))
    ).cast("long")
    return (
        pairs.select(F.col(user_col), qc.alias("__qc"))
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("__qc").alias("sum_qcos"),
        )
        .select(
            user_col,
            "n_pairs",
            "sum_qcos",
            F.round(
                F.lit(1.0)
                - F.col("sum_qcos")
                / (F.col("n_pairs") * F.lit(float(quant))),
                6,
            ).alias("ild"),
        )
    )


def recommendation_coverage(
    recs: DataFrame,
    items: DataFrame,
    item_col: str = "item_id",
) -> DataFrame:
    """Beyond-accuracy list metric #2 — catalog coverage and
    concentration: one row with (items_recommended, catalog_items,
    coverage, total_slots, max_item_slots). A recommender that
    serves 10 lists from 40 distinct items has a popularity-bias
    problem accuracy metrics never show; ``max_item_slots`` (the
    most-recommended item's slot count) is the concentration red
    flag. Exact counts; coverage is ONE IEEE division. Scale: one
    groupBy(item) over the k-per-user rec lists + two singleton
    aggregates broadcast together."""
    per_item = recs.groupBy(F.col(item_col)).agg(
        F.count(F.lit(1)).alias("__c")
    )
    stats = per_item.agg(
        F.count(F.lit(1)).alias("items_recommended"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("total_slots"),
        F.coalesce(F.max("__c"), F.lit(0)).alias("max_item_slots"),
    )
    catalog = items.agg(F.count(F.lit(1)).alias("catalog_items"))
    return stats.crossJoin(F.broadcast(catalog)).select(
        F.col("items_recommended").cast("long").alias("items_recommended"),
        F.col("catalog_items").cast("long").alias("catalog_items"),
        F.round(
            F.col("items_recommended") / F.col("catalog_items"), 6
        ).alias("coverage"),
        F.col("total_slots").cast("long").alias("total_slots"),
        F.col("max_item_slots").cast("long").alias("max_item_slots"),
    )
