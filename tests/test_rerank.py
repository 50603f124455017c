"""MMR diversified re-ranking: diversity-vs-relevance tradeoff on
crafted candidate sets, k-bound, determinism."""

from __future__ import annotations

import pytest

from streaming_recommendation_spark.operators.rerank import mmr_rerank


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, item_id long, rel long, qvec array<int>"
    )


def test_mmr_position1_is_relevance_argmax(spark):
    df = _df(spark, [
        (1, 10, 100, [1, 0]),
        (1, 11, 90, [1, 0]),
        (1, 12, 80, [0, 1]),
    ])
    out = {r.position: r for r in mmr_rerank(df, k=3).collect()}
    assert out[1].item_id == 10
    assert out[1].mmr_score == 1000  # rel * lambda_den


def test_mmr_prefers_diverse_over_redundant(spark):
    # item 11 is a near-clone of the top pick; item 12 is slightly
    # less relevant but orthogonal -> MMR must pick 12 second
    df = _df(spark, [
        (1, 10, 100, [10, 0]),
        (1, 11, 99, [10, 0]),
        (1, 12, 90, [0, 10]),
    ])
    rows = sorted(mmr_rerank(df, k=2).collect(), key=lambda r: r.position)
    assert [r.item_id for r in rows] == [10, 12]
    # score of pick 2: 7*90 - 3*max_sim(12, {10}) = 630 - 3*0
    assert rows[1].mmr_score == 630


def test_mmr_pure_relevance_when_lambda_full(spark):
    df = _df(spark, [
        (1, 10, 100, [10, 0]),
        (1, 11, 99, [10, 0]),
        (1, 12, 90, [0, 10]),
    ])
    rows = sorted(
        mmr_rerank(df, k=3, lambda_num=10, lambda_den=10).collect(),
        key=lambda r: r.position,
    )
    assert [r.item_id for r in rows] == [10, 11, 12]


def test_mmr_caps_at_candidate_count_and_isolates_users(spark):
    df = _df(spark, [
        (1, 10, 100, [1, 0]),
        (1, 11, 90, [0, 1]),
        (2, 20, 50, [1, 1]),
    ])
    out = mmr_rerank(df, k=5).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    assert {r.item_id for r in by_user[2]} == {20}


def test_mmr_tie_breaks_on_item_id(spark):
    df = _df(spark, [
        (1, 12, 100, [1, 0]),
        (1, 10, 100, [1, 0]),
        (1, 11, 100, [1, 0]),
    ])
    rows = sorted(mmr_rerank(df, k=3).collect(), key=lambda r: r.position)
    assert rows[0].item_id == 10  # equal rel -> smallest id first
    # identical vectors: later rounds tie too -> id order throughout
    assert [r.item_id for r in rows] == [10, 11, 12]


def test_mmr_rejects_bad_lambda():
    with pytest.raises(ValueError):
        mmr_rerank(None, lambda_num=0)
    with pytest.raises(ValueError):
        mmr_rerank(None, lambda_num=11, lambda_den=10)


def test_mmr_negative_similarity_not_clamped(spark):
    """max-sim to the selected set can be NEGATIVE (anti-correlated
    vectors) and must enter the score as-is: item 12 (sim -100 to the
    top pick) should beat item 11 (sim 0) despite lower relevance."""
    df = _df(spark, [
        (1, 10, 100, [10, 0]),
        (1, 11, 96, [0, 10]),    # orthogonal: max_sim 0
        (1, 12, 90, [-10, 0]),   # anti-correlated: max_sim -100
    ])
    rows = sorted(mmr_rerank(df, k=2).collect(), key=lambda r: r.position)
    # scores: 11 -> 7*96 - 3*0 = 672 ; 12 -> 7*90 - 3*(-100) = 930
    assert [r.item_id for r in rows] == [10, 12]
    assert rows[1].mmr_score == 930


def test_mmr_string_ids_schema_derived(spark):
    """ADVICE r3: output id types must follow the input schema, not a
    hardcoded long — string user/item ids round-trip unchanged."""
    df = spark.createDataFrame(
        [
            ("u1", "itemA", 100, [10, 0]),
            ("u1", "itemB", 90, [10, 0]),
            ("u1", "itemC", 80, [0, 10]),
        ],
        "user_id string, item_id string, rel long, qvec array<int>",
    )
    out = mmr_rerank(df, k=2).collect()
    assert {f.name: f.dataType.simpleString() for f in
            mmr_rerank(df, k=2).schema} == {
        "user_id": "string", "item_id": "string",
        "position": "int", "mmr_score": "bigint",
    }
    by_pos = {r.position: r for r in out}
    assert by_pos[1].item_id == "itemA" and by_pos[1].user_id == "u1"
    # diversity: itemC (orthogonal) beats near-clone itemB at pos 2
    assert by_pos[2].item_id == "itemC"
