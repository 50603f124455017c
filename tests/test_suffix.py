"""Prefix-doubling exact substring dedup vs a pure-Python brute
force, plus agreement with the hashed n-gram operator where both are
exact."""

from __future__ import annotations

import pytest

from streaming_recommendation_spark.operators.dedup import duplicate_ngram_spans
from streaming_recommendation_spark.operators.suffix import (
    exact_substring_duplicates,
    prefix_doubling_ranks,
    token_rank_table,
)

DOCS = [
    # 0/1 share an 8-token run; 2 repeats a 4-token phrase internally;
    # 3 is unique; 4 is shorter than every min_len tested; 5 == 6
    (0, "the quick brown fox jumps over the lazy dog while rain falls"),
    (1, "we saw the quick brown fox jumps over the lazy dog yesterday evening"),
    (2, "alpha beta gamma delta alpha beta gamma delta omega psi"),
    (3, "completely unique tokens here nothing repeats at all ever once"),
    (4, "tiny doc"),
    (5, "same exact document content in both places here padding tokens"),
    (6, "same exact document content in both places here padding tokens"),
]


def brute(docs, min_len):
    words = {i: t.split() for i, t in docs}
    from collections import Counter

    occ = Counter()
    for i, w in words.items():
        for p in range(len(w) - min_len + 1):
            occ[tuple(w[p : p + min_len])] += 1
    out = {}
    for i, w in words.items():
        flagged = [
            p
            for p in range(len(w) - min_len + 1)
            if occ[tuple(w[p : p + min_len])] >= 2
        ]
        covered = set()
        spans = 0
        prev_end = -1
        for p in flagged:
            if p > prev_end:
                spans += 1
            prev_end = max(prev_end, p + min_len - 1)
            covered.update(range(p, p + min_len))
        out[i] = (
            len(w),
            max(len(w) - min_len + 1, 0),
            len(flagged),
            spans,
            len(covered),
        )
    return out


@pytest.mark.parametrize("min_len", [2, 3, 4, 8])
def test_matches_bruteforce(spark, min_len):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_grams"],
            r["n_dup_grams"],
            r["n_dup_spans"],
            r["dup_tokens"],
        )
        for r in exact_substring_duplicates(df, min_len=min_len).collect()
    }
    assert got == brute(DOCS, min_len)


def test_rank_equality_is_content_equality(spark):
    # after 2 rounds, rank equality must partition positions exactly by
    # their 4-token block content (truncated blocks rank separately)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ranks = prefix_doubling_ranks(token_rank_table(df), rounds=2).collect()
    words = {i: t.split() for i, t in DOCS}
    by_rank = {}
    for r in ranks:
        block = tuple(words[r["doc_id"]][r["pos"] : r["pos"] + 4])
        by_rank.setdefault(r["r"], set()).add(block)
    assert all(len(blocks) == 1 for blocks in by_rank.values())
    # and distinct ranks never share content
    seen = {}
    for rk, blocks in by_rank.items():
        b = next(iter(blocks))
        assert b not in seen, f"content {b} got two ranks"
        seen[b] = rk


def test_agrees_with_hashed_ngram_operator(spark):
    # at n = min_len = 8 with occurrence counting, the md5 path and the
    # rank-exact path must agree on this corpus (no collisions at this
    # size, so both are exact)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {
        r["doc_id"]: (r["n_dup_grams"], r["n_dup_spans"], r["dup_tokens"])
        for r in exact_substring_duplicates(df, min_len=8).collect()
    }
    b = {
        r["doc_id"]: (r["n_dup_grams"], r["n_dup_spans"], r["dup_tokens"])
        for r in duplicate_ngram_spans(df, n=8, count_within_doc=True).collect()
    }
    assert a == b


def test_randomized_corpora_match_bruteforce(spark):
    # seeded random corpora over a 3-word alphabet — dense collisions,
    # runs, cross-doc and intra-doc repeats all occur by construction
    import random

    rng = random.Random(1234)
    for trial in range(3):
        docs = [
            (
                i,
                " ".join(
                    rng.choice(["a", "b", "ab"])
                    for _ in range(rng.randint(0, 30))
                ),
            )
            for i in range(12)
        ]
        docs = [(i, t if t else "x") for i, t in docs]
        min_len = rng.choice([2, 3, 5])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_grams"],
                r["n_dup_grams"],
                r["n_dup_spans"],
                r["dup_tokens"],
            )
            for r in exact_substring_duplicates(df, min_len=min_len).collect()
        }
        assert got == brute(docs, min_len), (trial, min_len, docs)


def test_dup_length_profile_matches_bruteforce(spark):
    from streaming_recommendation_spark.operators.suffix import (
        dup_length_profile,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_at_2"], r["dup_at_4"], r["dup_at_8"])
        for r in dup_length_profile(df, max_len=8).collect()
    }
    from collections import Counter

    words = {i: t.split() for i, t in DOCS}
    for i, w in words.items():
        want = [len(w)]
        for L in (2, 4, 8):
            occ = Counter()
            for j, ww in words.items():
                for p in range(len(ww) - L + 1):
                    occ[tuple(ww[p : p + L])] += 1
            want.append(
                sum(1 for p in range(len(w) - L + 1) if occ[tuple(w[p : p + L])] >= 2)
            )
        assert got[i] == tuple(want), (i, got[i], want)
    # cumulative-in-length: longer dup counts never exceed shorter
    for i, (n, d2, d4, d8) in got.items():
        assert d2 >= d4 >= d8
