"""Retrieval leg: BM25 multi-term search, doc-level hash embedding,
RRF hybrid fusion, hard-negative mining — hand-computed exactness,
planted-scenario semantics, and plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.features import (
    chunk_hash_embed,
    doc_hash_embed,
)
from streaming_recommendation_spark.operators.text import (
    bm25_hard_negatives,
    bm25_search,
)
from streaming_recommendation_spark.plans import audit
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_search_hand_computed(spark):
    """Milliscore sums match the integer formula computed by hand:
    term_milli = (22*D*T*tf*1000) div (df*(10*T*tf + 3*T + 9*dl*D)),
    summed per doc; ranking by (score_milli desc, doc asc)."""
    df = _docs(spark, [
        (0, "x y"),        # the query: terms {x, y}
        (1, "x y z"),      # matches both
        (2, "x a b"),      # matches x
        (3, "a b c"),      # matches none -> absent
        (4, "y y y y"),    # matches y, tf 4 (saturation)
    ])
    out = {r.doc_id: r for r in
           bm25_search(df, F.col("doc_id") == 0, k=10).collect()}
    # D=5, T=15; df(x)=3, df(y)=3
    # term_milli(tf, dl, df) = 1650000*tf // (df*(150*tf + 45 + 45*dl))
    def tm(tf, dl, dfreq):
        return (1650000 * tf) // (dfreq * (150 * tf + 45 + 45 * dl))

    assert set(out) == {1, 2, 4}  # query doc excluded, doc3 no match
    assert out[1].score_milli == tm(1, 3, 3) + tm(1, 3, 3) == 3332
    assert out[1].n_terms_matched == 2
    assert out[2].score_milli == tm(1, 3, 3) == 1666
    assert out[4].score_milli == tm(4, 4, 3) == 2666
    assert [out[d].rank for d in (1, 4, 2)] == [1, 2, 3]
    assert out[1].score == 3.332


def test_bm25_search_k_bound_and_multi_query(spark):
    df = _docs(spark, [
        (0, "x"), (1, "y"),
        (2, "x y"), (3, "x y"), (4, "x"), (5, "y"),
    ])
    out = bm25_search(df, F.col("doc_id") < 2, k=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_doc, []).append(r)
    assert set(per_q) == {0, 1}
    for q, rows in per_q.items():
        assert len(rows) <= 2
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # queries never retrieve themselves or each other's slot rows
        assert all(r.doc_id != q for r in rows)


def test_bm25_search_no_python_and_broadcast_query_side(spark):
    docs = load_table(spark, "documents", SF_DIR)
    a = audit(bm25_search(docs, F.col("doc_id") < 3, k=10))
    assert "BatchEvalPython" not in a["plan"]
    assert "ArrowEvalPython" not in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    # query-term table and totals ride as broadcasts into the corpus scan
    assert a["n_broadcast_joins"] + a["bnl_joins"] >= 2


def test_doc_hash_embed_equals_single_chunk(spark):
    """doc_hash_embed is chunk_hash_embed with the chunking removed:
    for docs shorter than the window the chunk-0 vector is identical."""
    docs = load_table(spark, "documents", SF_DIR)
    whole = {r.doc_id: list(r.vec)
             for r in doc_hash_embed(docs, n_features=64).collect()}
    chunked = chunk_hash_embed(
        docs, window=4096, stride=4096, n_features=64
    ).collect()
    assert {r.chunk_idx for r in chunked} == {0}
    for r in chunked:
        assert list(r.vec) == whole[r.doc_id], r.doc_id
    assert len(whole) == len(chunked)


def test_doc_hash_embed_zero_shuffle_plan(spark):
    docs = load_table(spark, "documents", SF_DIR)
    a = audit(doc_hash_embed(docs, n_features=64))
    assert a["n_exchanges"] == 0
    assert (
        a["n_broadcast_joins"] + a["n_sortmerge_joins"]
        + a["n_shuffled_hash_joins"] + a["bnl_joins"] == 0
    )
    assert "BatchEvalPython" not in a["plan"]
    assert "ArrowEvalPython" not in a["plan"]


def test_hard_negatives_exclude_planted_positive(spark):
    """The near-copy of the query is BM25 rank 1 AND the Jaccard
    ground-truth positive -> it must be excluded; the
    lexically-overlapping junk docs survive as the hard negatives."""
    df = _docs(spark, [
        (0, "alpha beta gamma delta"),            # query
        (1, "alpha beta gamma delta epsilon"),    # near-copy: positive
        (2, "alpha beta junk1 junk2"),            # hard negative 1
        (3, "alpha junk3 junk4 junk5"),           # hard negative 2
        (4, "filler1 filler2 filler3"),
        (5, "filler4 filler5 filler6"),
    ])
    out = bm25_hard_negatives(
        df, F.col("doc_id") == 0, k_cand=10, k_pos=1, k_neg=8
    ).collect()
    by_doc = {r.doc_id: r for r in out}
    assert 1 not in by_doc           # the true positive is mined OUT
    assert 0 not in by_doc           # the query never self-retrieves
    assert set(by_doc) == {2, 3}     # fillers share no term -> no score
    # doc 2 (2 shared terms) outranks doc 3 (1 shared term)
    assert by_doc[2].neg_rank == 1 and by_doc[3].neg_rank == 2
    # bm25_rank provenance proves the positive occupied rank 1
    assert by_doc[2].bm25_rank == 2
    assert by_doc[3].bm25_rank == 3


def test_hard_negatives_neg_rank_contiguous_on_testdata(spark):
    docs = load_table(spark, "documents", SF_DIR)
    out = bm25_hard_negatives(
        docs, F.col("doc_id") < 3, k_cand=20, k_pos=5, k_neg=8
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_doc, []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 8
        scores = [r.score_milli for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fusion_arithmetic_and_provenance(spark):
    """q199 on testdata: rrf_ppm recomputes exactly from the two rank
    columns (1000000 div (60+rank), absent leg contributes 0), every
    row has at least one leg, per-query output is rrf-ordered."""
    from streaming_recommendation_spark.queries import _REGISTRY

    out = _REGISTRY["q199_hybrid_rrf_fusion"].fn(spark, SF_DIR).collect()
    assert out
    per_q = {}
    for r in out:
        assert r.bm25_rank is not None or r.emb_rank is not None
        expect = 0
        if r.bm25_rank is not None:
            expect += 1000000 // (60 + r.bm25_rank)
        if r.emb_rank is not None:
            expect += 1000000 // (60 + r.emb_rank)
        assert r.rrf_ppm == expect, (r.query_doc, r.doc_id)
        per_q.setdefault(r.query_doc, []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) <= 10
        keys = [(-r.rrf_ppm, r.doc_id) for r in rows]
        assert keys == sorted(keys)
    # fusion is non-degenerate: at least one row fused BOTH legs and
    # at least one row came from a single leg
    both = [r for r in out if r.bm25_rank is not None and r.emb_rank is not None]
    single = [r for r in out if (r.bm25_rank is None) != (r.emb_rank is None)]
    assert both and single


def test_prf_expansion_bridges_vocabulary_mismatch(spark):
    """The PRF claim in one scenario: doc 2 shares NO term with the
    query ('automobile highway' vs 'car road') so plain BM25 cannot
    retrieve it; expansion pulls 'automobile' from the feedback docs
    and round 2 finds it."""
    from streaming_recommendation_spark.operators.text import bm25_prf_search

    df = _docs(spark, [
        (0, "car road"),
        (1, "car road automobile"),   # feedback doc carrying the synonym
        (2, "automobile highway"),    # vocabulary-mismatched target
        (3, "car tree"),
        (4, "x y"),
        (5, "z w"),
    ])
    plain = {r.doc_id for r in
             bm25_search(df, F.col("doc_id") == 0, k=10).collect()}
    assert 2 not in plain
    expanded = {r.doc_id: r for r in bm25_prf_search(
        df, F.col("doc_id") == 0, k_fb=3, n_exp=2, k=10
    ).collect()}
    assert 2 in expanded
    assert 0 not in expanded  # still never self-retrieves
    # doc 2 matched exactly one (expansion) term
    assert expanded[2].n_terms_matched == 1


def test_prf_changes_ranking_on_testdata(spark):
    """Non-degeneracy on the real corpus: the expanded ranking
    differs from the plain one for EVERY query (the doc claim)."""
    from streaming_recommendation_spark.queries import _REGISTRY

    plain = _REGISTRY["q198_bm25_search"].fn(spark, SF_DIR).collect()
    prf = _REGISTRY["q202_prf_query_expansion"].fn(spark, SF_DIR).collect()
    p = {}
    for r in plain:
        p.setdefault(r.query_doc, []).append((r.rank, r.doc_id))
    e = {}
    for r in prf:
        e.setdefault(r.query_doc, []).append((r.rank, r.doc_id))
    assert set(p) == set(e)
    for q in p:
        assert sorted(p[q]) != sorted(e[q]), q


def test_best_passage_finds_term_cluster_and_breaks_ties_early(spark):
    """The SHIPPED q203 operator on a crafted doc: the query terms
    cluster in the SECOND 4-token window, so it must win; on an exact
    tie the earliest window wins."""
    from streaming_recommendation_spark.operators.text import best_passage

    df = _docs(spark, [
        (0, "alpha beta"),                                  # query
        # windows of 4: [f1 f2 f3 f4] [alpha beta f5 f6] [f7 f8 f9 f10]
        (1, "f1 f2 f3 f4 alpha beta f5 f6 f7 f8 f9 f10"),
        # tie: alpha in window 0 AND alpha in window 1 -> window 0 wins
        (2, "alpha g1 g2 g3 alpha g4 g5 g6"),
    ])
    best = {r.doc_id: r for r in best_passage(
        df, F.col("doc_id") == 0, window=4, k_docs=5
    ).collect()}
    assert best[1].chunk_idx == 1 and best[1].n_hits == 2
    assert best[2].chunk_idx == 0 and best[2].n_hits == 1  # earliest tie


def test_best_passage_covers_every_retrieved_doc(spark):
    """Every (query, retrieved doc) pair gets exactly one snippet with
    n_hits >= 1 (a retrieved doc matched >= 1 query term, and that
    term sits in some window)."""
    from streaming_recommendation_spark.queries import _REGISTRY

    docs = load_table(spark, "documents", SF_DIR)
    retrieved = {
        (r.query_doc, r.doc_id)
        for r in bm25_search(docs, F.col("doc_id") < 3, k=5).collect()
    }
    out = _REGISTRY["q203_best_passage"].fn(spark, SF_DIR).collect()
    assert {(r.query_doc, r.doc_id) for r in out} == retrieved
    assert all(r.n_hits >= 1 for r in out)


def test_retrieval_ablation_metric_arithmetic(spark):
    """q204's metrics are internally consistent: 3 retrievers x 3
    queries, prec5_ppm == n_hits * 200000, MRR positive iff any hit,
    and the three retrievers are not all identical."""
    from streaming_recommendation_spark.queries import _REGISTRY

    rows = _REGISTRY["q204_retrieval_ablation"].fn(spark, SF_DIR).collect()
    assert len(rows) == 9
    assert {r.retriever for r in rows} == {"bm25", "prf", "hybrid"}
    for r in rows:
        assert r.prec5_ppm == r.n_hits * 200000
        assert 0 <= r.n_hits <= 5
        assert (r.mrr_ppm > 0) == (r.n_hits > 0)
        if r.mrr_ppm:
            assert r.mrr_ppm >= 200000  # first hit within rank 5
    per = {}
    for r in rows:
        per.setdefault(r.retriever, set()).add(
            (r.query_doc, r.n_hits, r.mrr_ppm)
        )
    assert len({frozenset(v) for v in per.values()}) > 1


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_bm25_search_matches_python_reference_on_random_corpus(spark, seed):
    """Exactness across random corpora: the engine's milliscore sums
    and ranking equal an independent pure-Python recomputation of the
    same integer formula, word for word."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
        for i in range(15)
    ]
    df = _docs(spark, docs)
    got = {
        (r.query_doc, r.doc_id): (r.score_milli, r.n_terms_matched, r.rank)
        for r in bm25_search(df, F.col("doc_id") < 2, k=50).collect()
    }

    # independent reference
    tf, dl = {}, {}
    for i, text in docs:
        for w in text.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
            dl[i] = dl.get(i, 0) + 1
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    D, T = len(dl), sum(dl.values())
    want = {}
    for q in (0, 1):
        qterms = {w for (i, w) in tf if i == q}
        scores = {}
        for (i, w), t in tf.items():
            if i == q or w not in qterms:
                continue
            milli = (22 * D * T * t * 1000) // (
                dfreq[w] * (10 * T * t + 3 * T + 9 * dl[i] * D)
            )
            s, n = scores.get(i, (0, 0))
            scores[i] = (s + milli, n + 1)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for rank, (i, (s, n)) in enumerate(ranked, 1):
            want[(q, i)] = (s, n, rank)
    assert got == want, seed


def test_learned_rerank_hand_computed_and_reorders(spark):
    """The rerank slot's integer arithmetic replays by hand, and the
    overlap feature provably REORDERS the fusion prior: candidate B
    carries a better rrf_ppm, but candidate A shares more distinct
    words with the query, and w_overlap prices that above the prior
    gap."""
    from streaming_recommendation_spark.operators.text import learned_rerank

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # query: 4 distinct words
            (1, "alpha beta gamma zeta eta theta"),  # A: overlap 3
            (2, "alpha iota kappa"),                 # B: overlap 1
        ],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame(
        [(0, 1, 10_000), (0, 2, 12_000)],  # B has the better prior
        "query_doc bigint, doc_id bigint, rrf_ppm bigint",
    )
    got = {
        r.doc_id: (r.n_overlap, r.rrf_ppm, r.n_tokens, r.rerank_score, r.rerank)
        for r in learned_rerank(docs, cands, k=2).collect()
    }
    # score = 2000*overlap + rrf_ppm - 3*n_tokens
    assert got[1] == (3, 10_000, 6, 2000 * 3 + 10_000 - 3 * 6, 1)
    assert got[2] == (1, 12_000, 3, 2000 * 1 + 12_000 - 3 * 3, 2)
    # the rerank inverted the prior order (B led on rrf_ppm)
    assert got[1][4] < got[2][4] and got[2][1] > got[1][1]


def test_trained_rerank_hand_computed_weights(spark):
    """The one-pass trained weights replay by hand: w_j = S1_j*n0 -
    S0_j*n1 over the labeled candidate pairs, and the trained model
    ranks the positive above a negative with a better fusion prior
    (it learns to discount the prior when truth anti-correlates)."""
    from streaming_recommendation_spark.operators.text import trained_rerank

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),            # query
            (1, "alpha beta gamma zeta eta theta"),   # A: overlap 3, pos
            (2, "alpha iota kappa"),                  # B: overlap 1, neg
            (3, "mu nu xi"),                          # C: overlap 0, neg
        ],
        "doc_id bigint, text string",
    )
    # the TRUE doc carries the WORST prior — trainable signal
    cands = spark.createDataFrame(
        [(0, 1, 5_000), (0, 2, 12_000), (0, 3, 9_000)],
        "query_doc bigint, doc_id bigint, rrf_ppm bigint",
    )
    truth = spark.createDataFrame(
        [(0, 1)], "query_doc bigint, doc_id bigint"
    )
    rows = {
        r.doc_id: r for r in trained_rerank(docs, cands, truth, k=3).collect()
    }
    # features: A=(3, 5000, 6) y=1; B=(1, 12000, 3) y=0; C=(0, 9000, 3) y=0
    # n1=1, n0=2; S1=(3,5000,6), S0=(1,21000,6)
    w_ov, w_rrf, w_len = 3 * 2 - 1 * 1, 5000 * 2 - 21000 * 1, 6 * 2 - 6 * 1
    assert (w_ov, w_rrf, w_len) == (5, -11000, 6)
    for d in (1, 2, 3):
        assert (rows[d].w_overlap, rows[d].w_rrf, rows[d].w_len) == (
            w_ov, w_rrf, w_len,
        )
    score = lambda ov, rrf, ln: w_ov * ov + w_rrf * rrf + w_len * ln
    assert rows[1].rerank_score == score(3, 5_000, 6)
    assert rows[2].rerank_score == score(1, 12_000, 3)
    assert rows[3].rerank_score == score(0, 9_000, 3)
    # the positive wins despite the worst prior (negative w_rrf)
    assert rows[1].rerank == 1


def test_trained_rerank_degenerate_labels_deterministic(spark):
    """n1 = 0 (no candidate is in the truth list): the weights
    collapse to -S0_j * n1 = 0... no — to S1*n0 - S0*n1 with S1 = 0
    AND n1 = 0, i.e. all-zero weights, every score 0, and the
    ranking falls back to the deterministic id tie-break. Still
    well-defined, still oracle-replayable."""
    from streaming_recommendation_spark.operators.text import trained_rerank

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma"), (2, "beta delta")],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame(
        [(0, 1, 10_000), (0, 2, 20_000)],
        "query_doc bigint, doc_id bigint, rrf_ppm bigint",
    )
    truth = spark.createDataFrame([], "query_doc bigint, doc_id bigint")
    rows = sorted(
        (r.rerank, r.doc_id, r.rerank_score)
        for r in trained_rerank(docs, cands, truth, k=2).collect()
    )
    assert rows == [(1, 1, 0), (2, 2, 0)]


def test_mmr_diversify_hand_computed_demotes_near_copy(spark):
    """MMR hand-replay: B out-ranks C on relevance but is a near-copy
    of the already-picked A, so round 2 picks C — and the scores
    replay exactly (first pick redundancy 0; later picks
    700*rel - 300*max_sim)."""
    from streaming_recommendation_spark.operators.text import mmr_diversify

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # A
            (2, "alpha beta gamma epsilon"),      # B: Jaccard(A,B)=3/5
            (3, "zeta eta theta iota"),           # C: disjoint from A,B
        ],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame(
        [(0, 1, 30_000), (0, 2, 29_000), (0, 3, 20_000)],
        "query_doc bigint, doc_id bigint, rrf_ppm bigint",
    )
    rows = {r.mmr_rank: r for r in mmr_diversify(docs, cands, k=3).collect()}
    sim_ab = 1_000_000 * 3 // 5  # 600000 ppm
    assert (rows[1].doc_id, rows[1].mmr_score) == (1, 700 * 30_000)
    # round 2: B = 700*29000 - 300*600000 < 0; C = 700*20000 - 0
    assert (rows[2].doc_id, rows[2].mmr_score) == (3, 700 * 20_000)
    assert (rows[3].doc_id, rows[3].mmr_score) == (
        2,
        700 * 29_000 - 300 * sim_ab,
    )


def test_graded_ndcg_hand_computed(spark):
    """nDCG replay by hand: retriever A finds the top truth doc at
    rank 1 (gain 5); retriever B finds only the 5th truth doc there
    (gain 1) — same binary hits@5, different nDCG, which is the
    point of the graded readout."""
    from streaming_recommendation_spark.operators.text import (
        NDCG_DISC_PPM,
        graded_ndcg_at_k,
    )

    lists = spark.createDataFrame(
        [("A", 0, 10, 1), ("A", 0, 99, 2), ("B", 0, 14, 1), ("B", 0, 98, 2)],
        "retriever string, query_doc bigint, doc_id bigint, rank int",
    )
    truth = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (0, 13, 4), (0, 14, 5)],
        "query_doc bigint, doc_id bigint, truth_rank int",
    )
    got = {r.retriever: r for r in graded_ndcg_at_k(lists, truth, k=5).collect()}
    idcg = sum((6 - r) * NDCG_DISC_PPM[r - 1] for r in range(1, 6))
    assert got["A"].dcg_ppm == 5 * NDCG_DISC_PPM[0]
    assert got["B"].dcg_ppm == 1 * NDCG_DISC_PPM[0]
    assert got["A"].idcg_ppm == idcg == got["B"].idcg_ppm
    assert got["A"].ndcg_ppm == 1_000_000 * 5 * NDCG_DISC_PPM[0] // idcg
    assert got["A"].ndcg_ppm > got["B"].ndcg_ppm


def test_largest_remainder_quota_invariants(spark):
    """Hamilton apportionment by hand: quotas sum to the budget
    exactly, leftovers go to the largest remainders, ties on key."""
    from streaming_recommendation_spark.operators.sampling import (
        largest_remainder_quota,
    )

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3), ("d", 1)], "source string, w bigint"
    )
    got = {
        r.source: (r.quota_floor, r.extra, r.quota)
        for r in largest_remainder_quota(df, "source", "w", budget=10).collect()
    }
    # weights 5,3,3,1 of 12; 10*w/12 = 4.166, 2.5, 2.5, 0.833
    # floors 4,2,2,0 (sum 8, leftover 2); remainders 2,6,6,10 ->
    # d first (10), then b (6, ties c on key asc)
    assert got == {
        "a": (4, 0, 4),
        "b": (2, 1, 3),
        "c": (2, 0, 2),
        "d": (0, 1, 1),
    }
    assert sum(q for _, _, q in got.values()) == 10


def test_intralist_diversity_hand_computed(spark):
    from streaming_recommendation_spark.operators.text import (
        candidate_pair_sims,
        intralist_diversity,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id bigint, text string",
    )
    cand = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 0), (0, 3, 0)],
        "query_doc bigint, doc_id bigint, rrf_ppm bigint",
    )
    lists = spark.createDataFrame(
        [("L", 0, 1, 1), ("L", 0, 2, 2), ("L", 0, 3, 3)],
        "retriever string, query_doc bigint, doc_id bigint, rank int",
    )
    sims = candidate_pair_sims(docs, cand)
    got = intralist_diversity(lists, sims).collect()[0]
    # pairs: (1,2) jac 3/5 both directions; (1,3),(2,3) disjoint -> 0
    sim12 = 1_000_000 * 3 // 5
    mean_sim = (2 * sim12 + 0 + 0 + 0 + 0) // 6
    assert got.diversity_ppm == 1_000_000 - mean_sim


def test_graded_ndcg_oversized_truth_never_negative(spark):
    """ADVICE r11: a truth frame graded DEEPER than the readout's k
    must not inject negative gains (k+1 - truth_rank < 0) into DCG —
    truth beyond rank k contributes 0, mirroring the IDCG leg."""
    from streaming_recommendation_spark.operators.text import (
        NDCG_DISC_PPM,
        graded_ndcg_at_k,
    )

    lists = spark.createDataFrame(
        [("A", 0, 10, 1), ("A", 0, 17, 2)],
        "retriever string, query_doc bigint, doc_id bigint, rank int",
    )
    # truth graded to depth 8; doc 17 sits at truth_rank 7 (> k=5)
    truth = spark.createDataFrame(
        [(0, 10, 1)] + [(0, 10 + i, i) for i in range(2, 9)],
        "query_doc bigint, doc_id bigint, truth_rank int",
    )
    got = {r.retriever: r for r in graded_ndcg_at_k(lists, truth, k=5).collect()}
    # doc 17 (truth_rank 7) would have contributed (6-7)*disc[1] < 0
    assert got["A"].dcg_ppm == 5 * NDCG_DISC_PPM[0]
    assert got["A"].ndcg_ppm >= 0


def test_maxsim_partial_surface_match_beats_disjoint(spark):
    """The late-interaction claim, pinned: a doc sharing only a
    MORPHOLOGICAL VARIANT of the query term ('recommendation' vs
    'recommender') outscores a surface-disjoint doc — the case where
    BM25's exact-term channel reads 0 for both."""
    from streaming_recommendation_spark.operators.text import maxsim_rerank

    docs = spark.createDataFrame(
        [
            (0, "recommender systems"),
            (1, "recommendation engines at scale"),
            (2, "quarterly finance report"),
        ],
        "doc_id bigint, text string",
    )
    shortlist = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_doc bigint, doc_id bigint"
    )
    got = {
        r.doc_id: r.maxsim_score
        for r in maxsim_rerank(docs, shortlist, k=2).collect()
    }
    assert got[1] > got[2]


def test_maxsim_hand_computed_single_term(spark):
    """One-term query against one-term docs: score == the exact int
    dot of the two char-3-gram hash vectors (replayed with the
    operator's own embedding), and identical terms maximize it."""
    import itertools

    from streaming_recommendation_spark.operators.text import (
        maxsim_rerank,
        term_hash_embed,
    )

    docs = spark.createDataFrame(
        [(0, "fox"), (1, "fox"), (2, "box")],
        "doc_id bigint, text string",
    )
    shortlist = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_doc bigint, doc_id bigint"
    )
    vecs = {
        r.term: list(r.__tvec) if hasattr(r, "__tvec") else list(r["__tvec"])
        for r in term_hash_embed(
            spark.createDataFrame([("fox",), ("box",)], "term string")
        ).collect()
    }
    want_same = sum(a * b for a, b in zip(vecs["fox"], vecs["fox"]))
    want_diff = sum(a * b for a, b in zip(vecs["fox"], vecs["box"]))
    got = {
        r.doc_id: r.maxsim_score
        for r in maxsim_rerank(docs, shortlist, k=2).collect()
    }
    assert got[1] == want_same and got[2] == want_diff
    assert got[1] > got[2]


def test_team_draft_interleave_hand_computed(spark):
    """Deterministic team draft replayed by hand: A = [10, 11, 12],
    B = [11, 13, 10]. Picks: A takes 10; B takes 11; A's 11 is gone
    so A takes 12; B's 10 is gone so B takes 13. Credit with truth
    {11, 13}: BOTH relevant docs were contributed by B (picks 2 and
    4) -> clicks 0 vs 2, winner B — the readout punishes A for
    ranking the relevant docs lower even though 11 was in its list
    too, which is exactly team draft's point."""
    from streaming_recommendation_spark.operators.text import (
        interleaved_credit,
        team_draft_interleave,
    )

    la = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_doc bigint, doc_id bigint, rank int",
    )
    lb = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)],
        "query_doc bigint, doc_id bigint, rank int",
    )
    inter = team_draft_interleave(la, lb, k=4)
    got = sorted((r.pos, r.doc_id, r.team) for r in inter.collect())
    assert got == [(1, 10, "A"), (2, 11, "B"), (3, 12, "A"), (4, 13, "B")]
    truth = spark.createDataFrame(
        [(0, 11), (0, 13)], "query_doc bigint, doc_id bigint"
    )
    cr = interleaved_credit(inter, truth).collect()[0]
    assert (cr.clicks_a, cr.clicks_b, cr.winner) == (0, 2, "B")
