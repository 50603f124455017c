"""Hand-computed sanity checks for the metric operators (the oracle
tests cross-check them against DuckDB on the full events table)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.metrics import (
    binary_metrics,
    ranking_metrics,
)


def test_ranking_metrics_hand_computed(spark):
    # user A: items ranked by score -> labels [1, 0, 1]; k=2
    rows = [
        Row(user_id="A", score=0.9, label=1, item="x"),
        Row(user_id="A", score=0.8, label=0, item="y"),
        Row(user_id="A", score=0.7, label=1, item="z"),
        Row(user_id="B", score=0.5, label=0, item="p"),
    ]
    out = {
        r.user_id: r
        for r in ranking_metrics(
            spark.createDataFrame(rows), k=2, tiebreak_col="item"
        ).collect()
    }
    a = out["A"]
    assert a.precision_at_2 == 0.5  # 1 hit of 2
    assert a.recall_at_2 == 0.5  # 1 of 2 relevant
    # dcg = 1/log2(2) = 1.0; idcg(min(2,2)) = 1 + 1/log2(3)
    exp_ndcg = 1.0 / (1 + 1 / math.log2(3))
    assert abs(a.ndcg_at_2 - exp_ndcg) < 1e-6
    assert a.mrr == 1.0
    b = out["B"]
    assert (b.precision_at_2, b.recall_at_2, b.ndcg_at_2, b.mrr) == (0, 0, 0, 0)


def test_binary_metrics_hand_computed(spark):
    # scores: pos {0.9, 0.6}, neg {0.6, 0.2}: one tie across classes
    rows = [
        Row(score=0.9, label=1),
        Row(score=0.6, label=1),
        Row(score=0.6, label=0),
        Row(score=0.2, label=0),
    ]
    m = binary_metrics(spark.createDataFrame(rows)).collect()[0]
    # ranks asc: 0.2->1, 0.6 tie -> (2+3)/2=2.5 each, 0.9->4
    # pos rank sum = 2.5 + 4 = 6.5; auc = (6.5 - 2*3/2) / (2*2) = 0.875
    assert m.auc == 0.875
    assert m.n_pos == 2 and m.n_neg == 2
    # threshold 0.5: predictions [1,1,1,0] vs labels [1,1,0,0] -> 3/4
    assert m.accuracy == 0.75


def test_binary_metrics_quantized_auc_close_to_exact(spark):
    """auc_score_decimals bounds the AUC window at 10^d+1 rows for
    continuous scores; the quantized AUC must track the exact one."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 4000
    labels = rng.integers(0, 2, size=n)
    # informative continuous scores: every value distinct
    scores = np.clip(
        labels * 0.25 + rng.normal(0.4, 0.22, size=n), 1e-6, 1 - 1e-6
    )
    rows = [
        Row(user_id="u", score=float(s), label=int(l))
        for s, l in zip(scores, labels)
    ]
    df = spark.createDataFrame(rows)
    exact = binary_metrics(df).collect()[0]
    quant = binary_metrics(df, auc_score_decimals=3).collect()[0]
    assert abs(exact.auc - quant.auc) < 2e-3
    # accuracy/logloss unaffected by quantization
    assert exact.accuracy == quant.accuracy
    assert exact.logloss == quant.logloss
    # the ranking window now touches a bounded score space
    n_groups = df.select(F.round("score", 3).alias("s")).distinct().count()
    assert n_groups <= 10 ** 3 + 1


def test_calibration_bins_exact(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.metrics import (
        calibration_bins,
    )

    rows = [
        Row(score=0.05, label=0),
        Row(score=0.05, label=1),
        Row(score=0.55, label=1),
        Row(score=1.0, label=1),  # folds into top bin
    ]
    out = {r.bin: r for r in
           calibration_bins(spark.createDataFrame(rows)).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 2 and out[0].n_pos == 1 and out[0].pos_rate == 0.5
    assert out[5].n == 1 and out[5].mean_score == 0.55
    assert out[9].n == 1  # score 1.0 in bin 9, not bin 10


def test_histogram_quantiles_uniform(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.metrics import (
        histogram_quantiles,
    )

    # 256 values 0..255 in one group: bin i holds exactly value i
    rows = [Row(g="a", v=float(i)) for i in range(256)]
    out = histogram_quantiles(
        spark.createDataFrame(rows), "v", ["g"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 256
    # ceil(0.5*256)=128 -> bin 127 edge = 127*(255/256)
    assert abs(r.p50_lo - 127 * (255.0 / 256)) < 1e-6
    assert abs(r.p95_lo - 243 * (255.0 / 256)) < 1e-6
    assert abs(r.p99_lo - 253 * (255.0 / 256)) < 1e-6


def test_histogram_quantiles_constant_and_groups(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.metrics import (
        histogram_quantiles,
    )

    rows = [Row(g="c", v=5.0)] * 10 + [Row(g="u", v=float(i)) for i in range(100)]
    out = {r.g: r for r in histogram_quantiles(
        spark.createDataFrame(rows), "v", ["g"]
    ).collect()}
    assert out["c"].p50_lo == 5.0 and out["c"].p99_lo == 5.0
    assert out["u"].n == 100
    # sketch answer within one bin width of the exact quantile
    w = 99.0 / 256
    assert abs(out["u"].p95_lo - 94.05) <= w + 1e-6


def test_sampled_holdout_eval_hand_computed(spark):
    """Composed offline-eval protocol (q172): the held-out item, the
    >= 2-interactions filter, and the rank math are pinned with
    candidate scores arranged so every assertion is independent of
    WHICH negatives the deterministic draws produce."""
    from streaming_recommendation_spark.operators.metrics import (
        sampled_holdout_eval,
    )

    inter = spark.createDataFrame(
        [
            # user 1: last interaction (ts=2) is item 2; train = {1}
            (1, 1, 1),
            (1, 2, 2),
            # user 2: single interaction -> excluded (empty train)
            (2, 1, 1),
            # user 3: ts tie at 9 -> item_id desc tiebreak holds out 7
            (3, 5, 9),
            (3, 7, 9),
        ],
        "user_id long, item_id long, ts long",
    )
    qv = spark.createDataFrame(
        [
            (1, [4, 0]),
            (2, [0, 4]),
            (5, [3, 3]),
            (7, [2, 1]),
        ],
        "item_id long, qvec array<long>",
    )
    out = {
        r.user_id: r
        for r in sampled_holdout_eval(
            inter, qv, order_cols=("ts", "item_id"), k_neg=4, k=10
        ).collect()
    }
    assert set(out) == {1, 3}  # user 2 excluded

    # user 1: profile = qvec(1) = [4, 0]; pos item 2 scores cos = 0
    # while every possible negative ({5, 7}) scores > 0 -> the
    # positive ranks LAST whatever the draws were
    r1 = out[1]
    assert r1.pos_item == 2
    assert r1.pos_rank == r1.n_cands
    assert r1.mrr == round(1.0 / r1.pos_rank, 6)
    assert r1.ndcg_at_10 == round(1.0 / math.log2(r1.pos_rank + 1), 6)

    # user 3: profile = qvec(5) = [3, 3]; pos item 7 scores cos ~0.949
    # while every possible negative ({1, 2}) scores ~0.707 -> the
    # positive ranks FIRST whatever the draws were
    r3 = out[3]
    assert r3.pos_item == 7  # item_id desc broke the ts tie
    assert (r3.pos_rank, r3.hit_at_10, r3.ndcg_at_10, r3.mrr) == (1, 1, 1.0, 1.0)


def test_intra_list_diversity_hand_computed(spark):
    """Orthogonal pair -> ild 1; identical-direction pair -> ild 0;
    3-item list mixes exactly to 1 - (1e6 / 3e6)."""
    from streaming_recommendation_spark.operators.metrics import (
        intra_list_diversity,
    )

    recs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1), (3, 2), (3, 3)],
        "user_id long, item_id long",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [2.0, 0.0])],
        "item_id long, item_vec array<float>",
    )
    out = {
        r.user_id: (r.n_pairs, r.sum_qcos, r.ild)
        for r in intra_list_diversity(recs, vecs).collect()
    }
    assert out[1] == (1, 0, 1.0)
    assert out[2] == (1, 1_000_000, 0.0)
    assert out[3] == (3, 1_000_000, round(1 - 1 / 3, 6))


def test_recommendation_coverage_hand_computed(spark):
    from streaming_recommendation_spark.operators.metrics import (
        recommendation_coverage,
    )

    recs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "user_id long, item_id long"
    )
    items = spark.createDataFrame(
        [(i,) for i in range(5)], "item_id long"
    )
    r = recommendation_coverage(recs, items).collect()[0]
    assert (
        r.items_recommended,
        r.catalog_items,
        r.coverage,
        r.total_slots,
        r.max_item_slots,
    ) == (2, 5, 0.4, 3, 2)
