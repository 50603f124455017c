"""Round-12 optimization equivalence pins: each test re-implements the
PRE-optimization algorithm inline (the shape the operator had before
the round-12 performance rework) and asserts the optimized operator
returns bit-identical results.

Covered rewrites (OPTIMIZATION_r12.md):
  * _pq_train_quantized — per-(subspace, round) update jobs batched
    into one job per round (subspaces are independent).
  * kmeans_refined_landmarks — crossJoin + top-1-window assignment
    replaced by a map-side argmin over plan-literal centroids.
  * locf_fill — span-aggregate + grid/observation equi-join replaced
    by a lead window over the sparse observations + map-side explode
    of each observation's run.
  * rolling_stats / rolling_anomalies — bounded sliding SUM frames
    (O(rows x window) re-aggregation; Spark has no retractable
    aggregates) replaced by cumulative sums differenced with lag.
  * suffix prefix-doubling — dict_encode dense ranks (range
    repartition + driver offset collect per round) replaced by
    min-occurrence representative ranks (equality-preserving; ranks
    are only ever compared for equality).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.similarity import (
    _int_l2_structs,
    _pq_quantized,
    _pq_train_quantized,
    ivf_landmarks,
    kmeans_refined_landmarks,
)
from streaming_recommendation_spark.operators.topk import top_k_per_group
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


def _reference_pq_train(qv, m, k, n_iter, sub):
    """The pre-round-12 per-subspace training loop, verbatim."""
    from streaming_recommendation_spark.functions.hashing import KNUTH, MOD32

    seed_rows = (
        qv.orderBy(
            ((F.col("__vid") * F.lit(KNUTH)) % F.lit(MOD32)).asc(),
            F.col("__vid").asc(),
        )
        .limit(k)
        .collect()
    )
    books = []
    for s in range(m):
        cents = [list(r["__qv"][s * sub : (s + 1) * sub]) for r in seed_rows]
        for _ in range(n_iter):
            sl = F.slice("__qv", s * sub + 1, sub)
            best = qv.select(
                F.array_min(_int_l2_structs(sl, cents))["c"].alias("__cid"),
                sl.alias("__sl"),
            )
            stats = (
                best.select(
                    "__cid", F.posexplode("__sl").alias("__dim", "__val")
                )
                .groupBy("__cid", "__dim")
                .agg(F.sum("__val").alias("__s"), F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            new = {}
            for r in stats:
                vec = new.setdefault(r["__cid"], [0] * sub)
                s_, n_ = r["__s"], r["__n"]
                vec[r["__dim"]] = -((-s_) // n_) if s_ < 0 else s_ // n_
            cents = [new.get(cid, c) for cid, c in enumerate(cents)]
        books.append(cents)
    return books


def test_batched_pq_train_matches_per_subspace_loop(spark, emb):
    qv = _pq_quantized(emb, 64, 1 << 20, 2.0, "vec_id", "embedding")
    for n_iter in (1, 2):
        got = _pq_train_quantized(qv, m=4, k=8, n_iter=n_iter, sub=16)
        ref = _reference_pq_train(qv, m=4, k=8, n_iter=n_iter, sub=16)
        assert got == ref, f"books diverge at n_iter={n_iter}"


def test_batched_pq_train_on_negative_residual_like_input(spark):
    # negative values exercise the truncating-division branch the
    # ivf_pq_adc_knn residual path depends on
    rows = [(i, [((i * 37 + d * 13) % 41) - 20 for d in range(8)])
            for i in range(60)]
    qv = spark.createDataFrame(rows, "__vid long, __qv array<long>")
    got = _pq_train_quantized(qv, m=2, k=4, n_iter=2, sub=4)
    ref = _reference_pq_train(qv, m=2, k=4, n_iter=2, sub=4)
    assert got == ref


def _reference_kmeans_landmarks(spark, corpus, k, n_iter, dim,
                                scale=1 << 20, offset=2.0,
                                id_col="vec_id", vec_col="embedding"):
    """The pre-round-12 crossJoin + top-1-window Lloyd loop, verbatim."""
    fscale = float(scale)

    def quantize(col):
        return F.transform(
            col, lambda x: F.round((x + F.lit(offset)) * F.lit(fscale)).cast("long")
        )

    qv = corpus.select(
        F.col(id_col).alias("__vid"), quantize(F.col(vec_col)).alias("__qv")
    )
    seeds = ivf_landmarks(corpus, k, id_col, vec_col).select(
        "__lid", quantize(F.col("__lvec")).alias("__qc")
    )
    cents = {r["__lid"]: list(r["__qc"]) for r in seeds.collect()}
    for _ in range(n_iter):
        cdf = spark.createDataFrame(
            [(lid, qc) for lid, qc in sorted(cents.items())],
            "__lid long, __qc array<long>",
        )
        scored = qv.crossJoin(F.broadcast(cdf)).select(
            "__vid",
            "__qv",
            "__lid",
            F.aggregate(
                F.zip_with("__qv", "__qc", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("__d"),
        )
        best = top_k_per_group(
            scored, 1, ["__vid"], F.col("__d").asc(), F.col("__lid").asc()
        )
        stats = (
            best.select("__lid", F.posexplode("__qv").alias("__dim", "__val"))
            .groupBy("__lid", "__dim")
            .agg(F.sum("__val").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        new_cents = {}
        for r in stats:
            vec = new_cents.setdefault(r["__lid"], [0] * dim)
            vec[r["__dim"]] = r["__s"] // r["__n"]
        cents = {lid: new_cents.get(lid, qc) for lid, qc in cents.items()}
    return sorted((lid, [v / fscale - offset for v in qc])
                  for lid, qc in cents.items())


def test_mapside_kmeans_matches_crossjoin_window(spark, emb):
    small = emb.where(F.col("vec_id") < 400)
    got = sorted(
        (r["__lid"], list(r["__lvec"]))
        for r in kmeans_refined_landmarks(small, k=8, n_iter=2, dim=64).collect()
    )
    ref = _reference_kmeans_landmarks(spark, small, k=8, n_iter=2, dim=64)
    assert got == ref


# ---------------------------------------------------------------------------
# timeseries: locf_fill lead-explode + rolling cum/lag rewrites
# ---------------------------------------------------------------------------


def _reference_locf_fill(obs, key_col, value_col, bucket_seconds=3600):
    """The pre-round-12 span-aggregate + grid-join fill, verbatim."""
    o = obs.select(
        key_col, "bucket_start", F.col(value_col).alias("__obs_value")
    )
    span = o.groupBy(key_col).agg(
        F.min("bucket_start").alias("__mn"), F.max("bucket_start").alias("__mx")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(bucket_seconds))
        ).alias("bucket_start"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(o, [key_col, "bucket_start"], "left").select(
        key_col,
        "bucket_start",
        F.last("__obs_value", ignorenulls=True).over(w).alias(value_col),
        F.col("__obs_value").isNotNull().alias("is_observed"),
    )


@pytest.fixture(scope="module")
def ragged_obs(spark):
    """Irregular per-key bucketed observations: gaps, runs, duplicate
    buckets resolved upstream, and NULL observed values (a null obs
    must not terminate the carry of the previous non-null value)."""
    import random

    rng = random.Random(99)
    rows = []
    for key in range(6):
        b = 0
        for _ in range(rng.randint(1, 40)):
            b += rng.choice([3600, 3600, 7200, 36000])
            val = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
            rows.append((key, b, val))
    # ADVICE r12 adversarial key: >= 3 leading NULL-valued buckets
    # before the first non-null observation — the all-NULL-baseline
    # frame where the old sliding sum said "never anomalous" and an
    # unguarded cum/lag difference would flag the first real value
    # (verified to discriminate: without rolling_anomalies' non-null
    # count guard this key flips the parity assertion)
    rows += [
        (100, 3600, None),
        (100, 7200, None),
        (100, 10800, None),
        (100, 14400, 4.25),
        (100, 18000, 4.5),
    ]
    return spark.createDataFrame(
        rows, "user_id int, bucket_start long, value double"
    ).cache()


def test_lead_explode_locf_matches_grid_join(spark, ragged_obs):
    from streaming_recommendation_spark.operators.timeseries import locf_fill

    got = locf_fill(ragged_obs, "user_id", "value", 3600)
    ref = _reference_locf_fill(ragged_obs, "user_id", "value", 3600)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_cum_lag_rolling_stats_matches_sliding_frames(spark, ragged_obs):
    from streaming_recommendation_spark.operators.timeseries import (
        locf_fill,
        rolling_stats,
    )

    dense = locf_fill(
        ragged_obs.where(F.col("value").isNotNull()), "user_id", "value", 3600
    ).select("user_id", "bucket_start", "value")
    got = rolling_stats(dense, "user_id", "bucket_start", "value", 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(-4, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    ref = dense.select(
        "user_id",
        "bucket_start",
        "value",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(cents).over(w).alias("moving_sum_cents"),
        F.round(
            F.sum(cents).over(w) / (F.lit(100) * F.count(F.lit(1)).over(w)), 6
        ).alias("moving_avg"),
        F.max("value").over(w).alias("moving_max"),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_cum_lag_rolling_anomalies_matches_sliding_frames(spark, ragged_obs):
    # ADVICE r12: keep the fixture's NULL observed values — a key
    # whose leading buckets carry NULL (null-valued first
    # observations) exercises the all-NULL-baseline case where the
    # old sliding frame produced a NULL sum (never anomalous) and a
    # naive cum/lag difference reads 0 (falsely anomalous); the
    # windowed non-null count guard must reproduce the old verdicts.
    from streaming_recommendation_spark.operators.timeseries import (
        locf_fill,
        rolling_anomalies,
    )

    dense = locf_fill(ragged_obs, "user_id", "value", 3600).select(
        "user_id", "bucket_start", "value"
    )
    got = rolling_anomalies(
        dense, "user_id", "bucket_start", "value", 6, 2, 3
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(-6, -1)
    )
    c = F.round(F.col("value") * 100, 0).cast("long")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(c).over(w)
    s2 = F.sum(c * c).over(w)
    dev = n * c - s1
    var_n2 = n * s2 - s1 * s1
    ref = dense.select(
        "user_id",
        "bucket_start",
        "value",
        n.alias("n_baseline"),
        F.when((n >= 3) & (dev * dev > F.lit(4) * var_n2), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# suffix: min-representative ranks vs the dict_encode dense-rank rounds
# ---------------------------------------------------------------------------


@pytest.mark.slow  # >=10 s soak/parity tier (VERDICT r12 #3)
def test_rep_rank_doubling_matches_dense_rank_reference(spark):
    """Old pipeline inline: dict_encode dense ranks with the -1
    PAST_END sentinel; the optimized operator's per-doc outputs must
    match on a corpus with cross-doc, intra-doc and truncated
    repeats."""
    from streaming_recommendation_spark.operators.dedup import (
        normalize_text,
        span_coverage,
        spread,
    )
    from streaming_recommendation_spark.operators.encode import dict_encode
    from streaming_recommendation_spark.operators.suffix import (
        exact_substring_duplicates,
    )
    from streaming_recommendation_spark.plans.audit import (
        checkpoint_partitioned,
    )

    def ref_exact_substring(df, min_len, id_col="doc_id"):
        words = F.split(normalize_text(F.col("text")), " ")
        toks = checkpoint_partitioned(
            spread(df, None).select(
                F.col(id_col), F.posexplode(words).alias("pos", "__tok")
            )
        )
        vocab = dict_encode(toks, "__tok", index_col="r")
        ranks = checkpoint_partitioned(
            toks.join(vocab, "__tok")
            .select(id_col, "pos", "r")
            .repartition(id_col, "pos")
        )
        base = ranks.groupBy(id_col).agg((F.max("pos") + 1).alias("n_tokens"))
        base_rounds = (min_len - 1).bit_length()
        if (1 << base_rounds) > min_len:
            base_rounds -= 1
        block = 1 << base_rounds

        def at_offset(r, offset):
            shifted = r.select(
                F.col(id_col),
                (F.col("pos") - offset).alias("pos"),
                F.col("r").alias("__r2"),
            )
            return r.join(shifted, [id_col, "pos"], "left").select(
                F.col(id_col), "pos", "r",
                F.coalesce("__r2", F.lit(-1)).alias("__r2"),
            )

        for k in range(base_rounds):
            joined = at_offset(ranks, 1 << k).where(F.col("__r2") != -1)
            paired = joined.withColumn("__key", F.struct("r", "__r2"))
            vocab = dict_encode(paired, "__key", index_col="__nr", min_count=2)
            ranks = checkpoint_partitioned(
                paired.join(vocab, "__key")
                .select(id_col, "pos", F.col("__nr").alias("r"))
                .repartition(id_col, "pos")
            )
        if min_len == block:
            keyed = ranks.select(
                id_col, "pos",
                F.struct("r", F.col("r").alias("__r2")).alias("__key"),
            )
        else:
            keyed = (
                at_offset(ranks, min_len - block)
                .where(F.col("__r2") != -1)
                .select(id_col, "pos", F.struct("r", "__r2").alias("__key"))
            )
        dup_keys = (
            keyed.groupBy("__key")
            .agg(F.count(F.lit(1)).alias("__occ"))
            .where(F.col("__occ") >= 2)
            .select("__key")
        )
        dup_pos = keyed.join(dup_keys, "__key").select(id_col, "pos")
        cov = span_coverage(dup_pos, id_col=id_col, n=min_len)
        return base.join(cov, id_col, "left").select(
            id_col,
            "n_tokens",
            F.greatest(
                F.col("n_tokens") - (min_len - 1), F.lit(0)
            ).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_token_ratio"),
        )

    import random

    rng = random.Random(4242)
    docs = [
        (i, " ".join(rng.choice(["a", "b", "c", "ab"])
                     for _ in range(rng.randint(1, 40))))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for min_len in (3, 4, 6):
        got = exact_substring_duplicates(df, min_len=min_len)
        ref = ref_exact_substring(df, min_len)
        assert got.exceptAll(ref).count() == 0, min_len
        assert ref.exceptAll(got).count() == 0, min_len
