"""Round-12 optimization equivalence pins: each test re-implements the
PRE-optimization algorithm inline (the shape the operator had before
the round-12 performance rework) and asserts the optimized operator
returns bit-identical results.

Covered rewrites (OPTIMIZATION_r12.md):
  * _pq_train_quantized — per-(subspace, round) update jobs batched
    into one job per round (subspaces are independent).
  * kmeans_refined_landmarks — crossJoin + top-1-window assignment
    replaced by a map-side argmin over plan-literal centroids.
"""

from __future__ import annotations

import pytest
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
