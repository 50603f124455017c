"""Text-analysis operator checks: language-ID accuracy against the
documents table's own lang labels, quality-score bounds, token stats."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.text import (
    STOPWORDS,
    language_id,
    pii_scrub,
    quality_score,
    tfidf_top_terms,
    token_stats,
)
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_language_id_runs_on_corpus(spark):
    """The synthetic documents table is vocabulary-uniform across its
    lang labels (verified: 'de'-labeled docs contain English-ish
    database terms), so label accuracy is not measurable there — the
    clear-cases test below carries the semantic check. Here: the
    detector runs corpus-wide, yields only known codes, and every doc
    gets exactly one prediction."""
    docs = load_table(spark, "documents", SF_DIR)
    out = language_id(docs)
    assert out.count() == docs.count()
    codes = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert codes <= set(STOPWORDS) | {"und"}


def test_language_id_clear_cases(spark):
    rows = [
        Row(doc_id=1, text="the cat sat on the mat and it was happy for a while"),
        Row(doc_id=2, text="der hund ist nicht auf der wiese und das ist gut"),
        Row(doc_id=3, text="le chat est dans la maison et il est content pour une heure"),
        Row(doc_id=4, text="el perro y el gato no una amistad por una casa con los"),
        Row(doc_id=5, text="zzz qqq xxx www"),  # no stopwords at all
    ]
    out = {r.doc_id: r.pred_lang for r in language_id(spark.createDataFrame(rows)).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"


def test_quality_score_bounds_and_ordering(spark):
    rows = [
        Row(doc_id=1, text="the report describes the method and it is clear "
                           "that the results in the study are sound for use"),
        Row(doc_id=2, text="!!! ??? ***"),
        Row(doc_id=3, text="word"),
    ]
    out = {r.doc_id: r for r in quality_score(spark.createDataFrame(rows)).collect()}
    for r in out.values():
        assert 0.0 <= r.quality <= 1.0
    assert out[1].quality > out[2].quality
    assert out[1].quality > out[3].quality


def test_token_stats_counts(spark):
    rows = [Row(doc_id=1, text="Hello, world! 42 times"), Row(doc_id=2, text="")]
    out = {r.doc_id: r for r in token_stats(spark.createDataFrame(rows)).collect()}
    assert out[1].n_tokens == 4  # whitespace tokens
    # BPE-ish: Hello , world ! 42 times
    assert out[1].n_bpe_tokens == 6
    assert out[2].n_tokens == 0


def test_pii_scrub_redacts_and_counts(spark):
    rows = [
        Row(doc_id=1, text="mail a.user+tag@sub.example.org or b@x.io today"),
        Row(doc_id=2, text="server 192.168.1.254 then call 555-867-5309"),
        Row(doc_id=3, text="nothing sensitive here"),
        # the IP must be scrubbed as an IP, never half-matched as a phone
        Row(doc_id=4, text="ip 100.200.300.400"),
    ]
    out = {r.doc_id: r for r in pii_scrub(spark.createDataFrame(rows)).collect()}
    assert out[1].n_email == 2 and "@" not in out[1].scrubbed_text
    assert out[1].scrubbed_text == "mail <EMAIL> or <EMAIL> today"
    assert out[2].n_ipv4 == 1 and out[2].n_phone == 1
    assert out[2].scrubbed_text == "server <IP> then call <PHONE>"
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    assert out[3].scrubbed_text == "nothing sensitive here"
    assert out[4].n_ipv4 == 1 and out[4].n_phone == 0


def test_tfidf_ranks_rare_terms_above_common(spark):
    rows = [
        Row(doc_id=1, text="apple apple banana shared shared shared"),
        Row(doc_id=2, text="cherry shared shared"),
        Row(doc_id=3, text="shared durian durian durian"),
    ]
    out = tfidf_top_terms(spark.createDataFrame(rows), k=2).collect()
    top = {r.doc_id: r.term for r in out if r.rank == 1}
    # 'shared' appears in every doc (df=3) so any doc-unique term
    # (df=1) outranks it even at lower tf
    assert top == {1: "apple", 2: "cherry", 3: "durian"}
    d1 = {r.term: r for r in out if r.doc_id == 1}
    assert d1["apple"].tf == 2 and d1["apple"].df == 1
    assert d1["apple"].tfidf == pytest.approx(2 * 3 / 1)
    # banana (tf=1,df=1 -> 3.0) ties shared (tf=3,df=3 -> 3.0); the
    # term-ascending tie-break picks banana for rank 2
    assert "banana" in d1 and d1["banana"].rank == 2


def test_unigram_rarity_counts(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.text import unigram_rarity

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common"),
            Row(doc_id=2, text="common rareword"),
        ]
    )
    out = {r.doc_id: r for r in unigram_rarity(df).collect()}
    # corpus TF: common=4, rareword=1
    assert out[1].n_tokens == 3 and out[1].sum_token_tf == 12
    assert out[1].n_hapax == 0 and out[1].min_token_count == 4
    assert out[2].sum_token_tf == 5 and out[2].n_hapax == 1
    assert out[2].min_token_count == 1
    # fluent (all-common) doc scores higher than the hapax-bearing one
    assert out[1].mean_token_tf > out[2].mean_token_tf


def test_bpe_merge_candidates_counts(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.text import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text="abab abab x"), Row(doc_id=2, text="abba")]
    )
    out = {r.pair: r.freq for r in bpe_merge_candidates(df, k=10).collect()}
    # "abab" x2: ab,ba,ab each; "abba": ab,bb,ba; "x" contributes none
    assert out["ab"] == 5
    assert out["ba"] == 3
    assert out["bb"] == 1
    assert "x" not in out and len(out) == 3


def test_importance_weights_target_ratio(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.text import (
        importance_weights,
    )

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha alpha beta"),
            Row(doc_id=2, text="beta gamma"),
        ]
    )
    target = corpus.where(F.col("doc_id") == 1)
    out = {r.doc_id: r for r in importance_weights(corpus, target).collect()}
    # corpus TF: alpha=2, beta=2, gamma=1; target TF: alpha=2, beta=1
    assert out[1].corpus_tf_sum == 6 and out[1].target_tf_sum == 5
    assert out[2].corpus_tf_sum == 3 and out[2].target_tf_sum == 1
    # the target doc scores strictly higher
    assert out[1].importance_weight > out[2].importance_weight


def test_bigram_rarity_counts(spark):
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.text import bigram_rarity

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b"),   # bigrams: "a b", "b a", "a b"
            Row(doc_id=2, text="a b c"),     # bigrams: "a b", "b c"
            Row(doc_id=3, text="solo"),      # < 2 tokens -> no output row
        ]
    )
    out = {r.doc_id: r for r in bigram_rarity(df).collect()}
    assert set(out) == {1, 2}
    # corpus bigram counts: "a b"=3, "b a"=1, "b c"=1
    # context counts: a*=3, b*=2
    d1 = out[1]
    assert d1.n_bigrams == 3
    assert d1.sum_bigram_tf == 3 + 1 + 3
    assert d1.sum_context_tf == 3 + 2 + 3
    assert d1.min_bigram_count == 1 and d1.n_hapax_bigrams == 1
    d2 = out[2]
    assert d2.n_bigrams == 2
    assert d2.sum_bigram_tf == 3 + 1
    assert d2.sum_context_tf == 3 + 2
    assert d2.n_hapax_bigrams == 1
    # predictable-order doc 1 ranks above the hapax-heavier doc 2
    assert d1.mean_cond_freq > d2.mean_cond_freq


def test_bigram_vs_unigram_separates_shuffled_text(spark):
    """The motivating case: identical unigram profile, different
    word order -> unigram ties, bigram separates."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.text import (
        bigram_rarity,
        unigram_rarity,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat the cat sat the cat sat"),
            Row(doc_id=2, text="sat the the cat cat the sat sat cat"),
        ]
    )
    uni = {r.doc_id: r.mean_token_tf for r in unigram_rarity(df).collect()}
    assert uni[1] == uni[2]  # unigram filter cannot tell them apart
    bi = {r.doc_id: r.mean_cond_freq for r in bigram_rarity(df).collect()}
    assert bi[1] > bi[2]  # repeated word order is more predictable


def test_bm25_postings_matches_bruteforce(spark):
    """BM25 scores equal an independent float computation with
    k1=1.2, b=0.75, linear idf; saturation and length normalization
    behave as BM25 requires."""
    from streaming_recommendation_spark.operators.text import bm25_postings

    docs = [
        (1, "x x x x y"),          # tf(x)=4, dl=5
        (2, "x y"),                # tf(x)=1, dl=2
        (3, "x z z z z z z z z"),  # tf(x)=1, dl=9 (long)
        (4, "y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_postings(df, n_terms=2, k=10).collect()
    got = {(r.term, r.doc_id): r for r in out}
    # corpus stats: D=4, T=18; df: x=3, y=3, z=2 -> top-2 terms x, y
    assert {t for t, _ in got} == {"x", "y"}

    def ref(tf, dl, dfreq, d=4, t=18, k1=1.2, b=0.75):
        avgdl = t / d
        idf = d / dfreq
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    import math

    for (term, doc_id), r in got.items():
        assert math.isclose(
            r.bm25, round(ref(r.tf, r.dl, r.df), 6), abs_tol=1e-6
        ), (term, doc_id)
    # saturation + length norm: doc1 (tf 4) beats doc2 (tf 1) but by
    # far less than 4x; doc3's single x in a long doc scores lowest
    xs = {d: got[("x", d)].bm25 for d in (1, 2, 3)}
    assert xs[1] > xs[2] > xs[3]
    assert xs[1] / xs[2] < 2.5
    ranks = [got[("x", d)].rank for d in (1, 2, 3)]
    assert ranks == [1, 2, 3]


def test_pmi_collocations_hand_computed(spark):
    """Corpus 'a b a b' + 'a c': T=6 tokens (a:3 b:2 c:1), bigrams
    (a,b)x2 (b,a)x1 (a,c)x1 -> B=4. With min_count=2 only (a,b)
    survives: pmi_ratio = (2*6*6)/(4*3*2) = 3.0 exactly."""
    from streaming_recommendation_spark.operators.text import (
        pmi_collocations,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = pmi_collocations(df, min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.w1, r.w2, r.pair_count, r.w1_count, r.w2_count) == (
        "a", "b", 2, 3, 2,
    )
    assert r.pmi_ratio == 3.0
    # min_count=1 admits the rest; (b,a) ratio = (1*36)/(4*2*3) = 1.5
    all_pairs = {
        (r.w1, r.w2): r.pmi_ratio
        for r in pmi_collocations(df, min_count=1).collect()
    }
    assert all_pairs[("b", "a")] == 1.5
    assert all_pairs[("a", "c")] == (1 * 36) / (4 * 3 * 1)
