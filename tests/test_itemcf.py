"""Item-item co-occurrence CF (operators/itemcf.py): correctness vs a
naive self-join re-derivation, cap semantics, both normalizations,
and the top-k symmetry/determinism contract."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators import itemcf


def _interactions(spark):
    # u1: a,b,c  u2: a,b  u3: a,d  (recency = ts; duplicate (u1,a))
    rows = [
        Row(u=1, i="a", ts=10),
        Row(u=1, i="a", ts=3),  # dup interaction, keeps max ts
        Row(u=1, i="b", ts=9),
        Row(u=1, i="c", ts=8),
        Row(u=2, i="a", ts=5),
        Row(u=2, i="b", ts=4),
        Row(u=3, i="a", ts=2),
        Row(u=3, i="d", ts=1),
    ]
    return spark.createDataFrame(rows)


def test_capped_histories_dedups_and_caps_by_recency(spark):
    df = _interactions(spark)
    capped = itemcf.capped_histories(df, "u", "i", "ts", max_items=2)
    got = sorted((r.u, r.i) for r in capped.collect())
    # u1 keeps its 2 most recent items (a@10, b@9 — c@8 dropped)
    assert got == [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "d")]


def test_cooccurrence_matches_naive_self_join(spark):
    df = _interactions(spark)
    capped = itemcf.capped_histories(df, "u", "i", "ts", max_items=10)
    got = {
        (r.item_a, r.item_b): r.pair_users
        for r in itemcf.item_cooccurrence(capped, "u", "i").collect()
    }
    x = capped.alias("x")
    y = capped.alias("y")
    naive = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.i") < F.col("y.i")))
        .groupBy(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
        .count()
    )
    want = {(r.a, r.b): r["count"] for r in naive.collect()}
    assert got == want == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1, ("a", "d"): 1}


def test_similarity_formulas(spark):
    df = _interactions(spark)
    capped = itemcf.capped_histories(df, "u", "i", "ts", max_items=10)
    cooc = itemcf.item_cooccurrence(capped, "u", "i")
    cnt = itemcf.item_counts(capped, "i")
    cos = {
        (r.item_a, r.item_b): r.score
        for r in itemcf.item_similarity(cooc, cnt, "cosine").collect()
    }
    # users per item: a=3, b=2, c=1, d=1
    assert math.isclose(cos[("a", "b")], 2 / math.sqrt(3 * 2))
    assert math.isclose(cos[("a", "c")], 1 / math.sqrt(3 * 1))
    jac = {
        (r.item_a, r.item_b): r.score
        for r in itemcf.item_similarity(cooc, cnt, "jaccard").collect()
    }
    assert math.isclose(jac[("a", "b")], 2 / (3 + 2 - 2))
    assert math.isclose(jac[("b", "c")], 1 / (2 + 1 - 1))


def test_min_pair_users_filters(spark):
    df = _interactions(spark)
    capped = itemcf.capped_histories(df, "u", "i", "ts", max_items=10)
    cooc = itemcf.item_cooccurrence(capped, "u", "i")
    cnt = itemcf.item_counts(capped, "i")
    sim = itemcf.item_similarity(cooc, cnt, "cosine", min_pair_users=2)
    assert [(r.item_a, r.item_b) for r in sim.collect()] == [("a", "b")]


def test_topk_symmetric_ranked_and_bounded(spark):
    df = _interactions(spark)
    capped = itemcf.capped_histories(df, "u", "i", "ts", max_items=10)
    cooc = itemcf.item_cooccurrence(capped, "u", "i")
    cnt = itemcf.item_counts(capped, "i")
    sim = itemcf.item_similarity(cooc, cnt, "cosine")
    out = itemcf.itemcf_topk(sim, k=2).collect()
    by_item = {}
    for r in out:
        by_item.setdefault(r.item_id, []).append((r.rank, r.neighbor_id))
    # every stored a<b pair surfaced in BOTH orientations
    assert set(by_item) == {"a", "b", "c", "d"}
    assert all(len(v) <= 2 for v in by_item.values())
    # a's neighbors: b (2/sqrt(6)=.816) then c=d (1/sqrt(3)=.577,
    # tie broken by neighbor asc -> c)
    assert sorted(by_item["a"]) == [(1, "b"), (2, "c")]
    # d's only neighbor is a
    assert by_item["d"] == [(1, "a")]


def test_swing_matches_bruteforce_reference(spark):
    """swing_scaled equals a pure-Python brute-force computation of
    sum over shared user pairs of LCM/(alpha+|I_u ∩ I_v|), on a frame
    small enough that no cap binds."""
    from itertools import combinations

    from streaming_recommendation_spark.operators.itemcf import (
        swing_similarity,
    )

    rows = [
        (1, "a", 1), (1, "b", 2), (1, "c", 3),
        (2, "a", 1), (2, "b", 2),
        (3, "a", 1), (3, "b", 2), (3, "c", 3),
        (4, "c", 1),
    ]
    df = spark.createDataFrame(rows, "u string, i string, ts long")
    got = {
        (r.item_a, r.item_b): (r.n_user_pairs, r.swing_scaled)
        for r in swing_similarity(
            df, "u", "i", "ts", alpha=1, max_items=20, max_users=20
        ).collect()
    }
    # brute force
    import math

    lcm = 1
    for d in range(2, 22):
        lcm = lcm * d // math.gcd(lcm, d)
    items_of = {}
    for u, i, _ in rows:
        items_of.setdefault(u, set()).add(i)
    users_of = {}
    for u, i, _ in rows:
        users_of.setdefault(i, set()).add(u)
    want = {}
    for i, j in combinations(sorted(users_of), 2):
        shared = users_of[i] & users_of[j]
        acc, n = 0, 0
        for u, v in combinations(sorted(shared), 2):
            c = len(items_of[u] & items_of[v])
            acc += lcm // (1 + c)
            n += 1
        if n:
            want[(i, j)] = (n, acc)
    assert got == want
    # sanity on one cell: (a,b) shared by users 1,2,3 -> pairs
    # (1,2):c=2, (1,3):c=3, (2,3):c=2
    assert got[("a", "b")] == (3, lcm // 3 + lcm // 4 + lcm // 3)


def test_swing_audience_cap_bounds_pairs(spark):
    """max_users=2 keeps only the 2 most recent users per item — an
    item seen by many users contributes C(2,2)=1 user pair."""
    from streaming_recommendation_spark.operators.itemcf import (
        swing_similarity,
    )

    rows = [(u, i, 10 - u) for u in range(1, 6) for i in ("x", "y")]
    df = spark.createDataFrame(rows, "u long, i string, ts long")
    out = swing_similarity(
        df, "u", "i", "ts", max_items=20, max_users=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    # audiences capped to users {1,2} (most recent ts) for both items
    assert (r.item_a, r.item_b, r.n_user_pairs) == ("x", "y", 1)


def test_association_rules_statistics(spark):
    """Confidence and lift match hand-computed values; both rule
    directions surface; the support cut drops singleton pairs."""
    df = _interactions(spark)  # baskets: 1:{a,b,c} 2:{a,b} 3:{a,d}
    out = {
        (r.antecedent, r.consequent): r
        for r in itemcf.association_rules(
            df, "u", "i", "ts", max_items=10, min_support=2
        ).collect()
    }
    # only (a,b) has support >= 2; both directions emitted
    assert set(out) == {("a", "b"), ("b", "a")}
    ab, ba = out[("a", "b")], out[("b", "a")]
    # supports: a=3 baskets, b=2, pair=2, N=3
    assert (ab.pair_support, ab.ante_support, ab.cons_support, ab.n_baskets) == (
        2, 3, 2, 3,
    )
    assert math.isclose(ab.confidence, round(2 / 3, 6))
    assert math.isclose(ab.lift, 1.0)  # 2*3/(3*2)
    assert math.isclose(ba.confidence, 1.0)  # 2/2
    assert math.isclose(ba.lift, 1.0)


def test_association_rules_confidence_cut_is_integer_exact(spark):
    """min_confidence_pct filters by integer cross-multiplication:
    confidence exactly at the threshold is KEPT (>=), and the cut
    never consults the rounded float."""
    df = _interactions(spark)
    out = itemcf.association_rules(
        df, "u", "i", "ts", max_items=10, min_support=2,
        min_confidence_pct=100,
    ).collect()
    # only b->a has confidence 2/2 = 100%
    assert [(r.antecedent, r.consequent) for r in out] == [("b", "a")]


def test_q144_nondegenerate(spark):
    from streaming_recommendation_spark.queries import registry

    from .conftest import SF_DIR

    assert registry()["q144_association_rules"].fn(spark, SF_DIR).count() > 0


def test_q143_nondegenerate(spark):
    """The registered swing query must return rows at every SF — a
    min_user_pairs=2 cut silently emptied it (0 rows at sf>=0.01, a
    vacuous 0==0 oracle match); pin > 0."""
    from streaming_recommendation_spark.queries import registry

    from .conftest import SF_DIR

    assert registry()["q143_swing_similarity"].fn(spark, SF_DIR).count() > 0
