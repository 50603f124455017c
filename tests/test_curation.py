"""Edge semantics of the corpus-curation operators (operators/
curation.py) that the sf-scale oracles can't pin: chunk coverage and
overlap, packing-bin invariants, contamination flags on constructed
collisions, repetition thresholds."""

from __future__ import annotations

import pytest

from streaming_recommendation_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: 10 distinct words — high TTR, keeps
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "a"),
        # 1: one word repeated 20x — fails top-word and dup-bigram
        (1, " ".join(["spam"] * 20), "a"),
        # 2: shares a 5-word run with doc 100 (the benchmark doc)
        (2, "one two three four five six seven unique tail words", "b"),
        # 100: benchmark doc containing the shared run
        (100, "prefix one two three four five six suffix", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, source: string")


def test_decontaminate_flags_constructed_collision(spark, docs):
    corpus = docs.where("doc_id < 100")
    bench = docs.where("doc_id = 100")
    out = {
        r.doc_id: r
        for r in curation.decontaminate(corpus, bench, n=5).collect()
    }
    assert len(out) == 3
    # doc 2 shares the 5-grams inside "one two three four five six"
    assert out[2].contaminated and out[2].n_hits == 2
    assert not out[0].contaminated and out[0].n_hits == 0
    assert not out[1].contaminated
    # n_ngrams counts DISTINCT 5-grams: doc 1 ("spam"*20) has exactly 1
    assert out[1].n_ngrams == 1
    assert out[0].n_ngrams == 6  # 10 words -> 6 overlapping 5-grams


def test_repetition_stats_thresholds(spark, docs):
    out = {
        r.doc_id: r for r in curation.repetition_stats(docs).collect()
    }
    assert out[0].keep  # all-distinct doc passes
    assert not out[1].keep  # 20x repeat fails
    assert out[1].top_word_ratio == 1.0
    assert out[1].dup_bigram_ratio == pytest.approx(1 - 1 / 19, abs=1e-6)
    assert out[0].type_token_ratio == 1.0


def test_domain_quota_cap_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"w{i}", "s" + str(i % 3)) for i in range(300)],
        "doc_id: long, text: string, source: string",
    )
    a = curation.domain_quota_sample(df, quota=7)
    rows = a.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == 7 for v in per.values())
    # deterministic: a second run picks the identical docs
    again = {
        (r.source, r.doc_id) for r in curation.domain_quota_sample(df, 7).collect()
    }
    assert again == {(r.source, r.doc_id) for r in rows}


def test_chunking_covers_all_tokens_with_overlap(spark):
    n, window, stride = 150, 64, 48
    words = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, words)], "doc_id: long, text: string")
    chunks = sorted(
        curation.chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at 0, 48, 96 — 3 chunks; last is ragged (150-96=54 tokens)
    assert [c.chunk_idx for c in chunks] == [0, 1, 2]
    assert [c.n_chunk_tokens for c in chunks] == [64, 64, 54]
    # full coverage: last chunk start + its len == n
    assert 2 * stride + chunks[-1].n_chunk_tokens == n


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    out = curation.chunk_documents(df, window=64, stride=48).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3


def test_packing_bins_conserve_tokens(spark):
    df = spark.createDataFrame(
        [(i, "s" + str(i % 2), 700) for i in range(20)],
        "doc_id: long, source: string, n_tokens: long",
    )
    bins = curation.pack_sequences(df, context_len=2048).collect()
    # token conservation across bins
    assert sum(b.bin_tokens for b in bins) == 20 * 700
    assert sum(b.n_docs for b in bins) == 20
    # 700-token docs: cumsum crosses 2048 every 3 docs -> 3-per-bin
    # until the tail; no bin exceeds ceil semantics
    for b in bins:
        assert b.n_docs <= 3
    # bin ids are contiguous from 0 within each source
    per = {}
    for b in bins:
        per.setdefault(b.source, []).append(b.bin_id)
    for ids in per.values():
        assert sorted(ids) == list(range(len(ids)))


def test_bloom_decontaminate_matches_exact(spark):
    """Bloom prefilter + exact verify must reproduce decontaminate's
    verdicts and hit counts exactly (no false negatives, FPs verified
    away)."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    exact = {r.doc_id: (r.n_hits, r.contaminated)
             for r in decontaminate(corpus, bench, n=5).collect()}
    bloom = {r.doc_id: (r.n_hits, r.contaminated)
             for r in bloom_decontaminate(corpus, bench, n=5).collect()}
    assert exact == bloom


def test_bloom_false_positives_counted_not_leaked(spark):
    """A deliberately tiny filter (64 bits) saturates and produces
    false positives — they must show up in n_false_positives and
    NEVER flip contamination verdicts."""
    from pyspark.sql import Row

    from streaming_recommendation_spark.operators.curation import (
        bloom_decontaminate,
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique{i} alpha beta gamma delta") for i in range(1, 40)]
    )
    # ~60 bench words -> ~56 5-grams x 3 hashes saturate 64 bits
    bench_text = " ".join(f"bench{i}" for i in range(60))
    bench = spark.createDataFrame([Row(doc_id=0, text=bench_text)])
    out = bloom_decontaminate(corpus, bench, n=5, m_bits=64).collect()
    # nothing actually collides on 5-grams -> zero hits everywhere
    assert all(r.n_hits == 0 and not r.contaminated for r in out)
    # but the saturated 64-bit filter must fire false positives
    assert sum(r.n_false_positives for r in out) > 0


def test_packing_extra_sum_cols(spark):
    # q183's composition rides raw word counts next to the packing
    # token count: per-bin sums must conserve both columns
    df = spark.createDataFrame(
        [(i, "s", 700, 200 + i) for i in range(6)],
        "doc_id: long, source: string, n_bpe_tokens: long, n_words: long",
    )
    bins = curation.pack_sequences(
        df, context_len=2048, token_col="n_bpe_tokens",
        extra_sum_cols=("n_words",),
    ).collect()
    assert sum(b.bin_tokens for b in bins) == 6 * 700
    assert sum(b.bin_n_words for b in bins) == sum(200 + i for i in range(6))
    assert {c for b in bins for c in b.asDict()} == {
        "source", "bin_id", "n_docs", "bin_tokens", "bin_n_words"
    }


def test_tokenize_pack_pipeline_consistent_with_stages(spark):
    """q183 end-to-end: the packed manifest's totals must equal the
    piecewise q105->q106 stages' own numbers on the same corpus (the
    composition adds binning, never changes the token arithmetic)."""
    from streaming_recommendation_spark.operators.bpe import (
        bpe_token_stats,
        learn_bpe,
    )
    from streaming_recommendation_spark.queries import registry
    from .conftest import SF_DIR

    out = registry()["q183_tokenize_pack_pipeline"].fn(spark, SF_DIR).collect()
    from streaming_recommendation_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", SF_DIR)
    merges = learn_bpe(docs, num_merges=8, count_mode="delta")
    stats = bpe_token_stats(docs, merges).collect()
    assert sum(b.bin_tokens for b in out) == sum(s.n_bpe_tokens for s in stats)
    assert sum(b.bin_n_words for b in out) == sum(s.n_words for s in stats)
    assert sum(b.n_docs for b in out) == len(stats)
    # non-degenerate: some source actually spills past one bin
    assert any(b.bin_id > 0 for b in out)


def test_model_quality_filter_separates_planted_cohort(spark):
    """The learned-filter gate must separate a planted low-quality
    cohort (punct-heavy short word salad, no stopwords) from normal
    English prose — the VERDICT r8 #4 acceptance check."""
    from streaming_recommendation_spark.operators.curation import (
        model_quality_filter,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then the "
        "fox runs into the woods where it sleeps for a while"
    )
    bad = "@@@ ### !!! $$$ %%% ^^^ &&&"
    rows = [(i, good) for i in range(10)] + [(100 + i, bad) for i in range(10)]
    out = {
        r.doc_id: r
        for r in model_quality_filter(
            spark.createDataFrame(rows, "doc_id: long, text: string")
        ).collect()
    }
    good_scores = [out[i].score for i in range(10)]
    bad_scores = [out[100 + i].score for i in range(10)]
    assert all(out[i].kept == 1 for i in range(10))
    assert all(out[100 + i].kept == 0 for i in range(10))
    assert min(good_scores) > max(bad_scores)


def test_model_quality_filter_exact_hand_value(spark):
    """One hand-computed score: text 'the cat.' has 2 whitespace
    tokens ('the', 'cat.'), 1 punct char, 8 chars, 1 stopword ('the';
    'cat.' keeps its dot under normalize_text so it is not 'cat'),
    len_capped = 2. z = -0.5 - 4*(1/8) + 2*(1/2) + 0.05*2 = 0.1 ->
    dropped at tau=0.5; custom tau=0.05 keeps it."""
    from streaming_recommendation_spark.operators.curation import (
        model_quality_filter,
    )

    df = spark.createDataFrame([(1, "the cat.")], "doc_id: long, text: string")
    r = model_quality_filter(df).collect()[0]
    assert abs(r.score - 0.1) < 1e-9
    assert r.kept == 0
    r2 = model_quality_filter(df, threshold_milli=100).collect()[0]
    assert r2.kept == 1


def test_model_quality_filter_empty_text_guard(spark):
    # zero-length text: C=T=1 guards, no division error; score is the
    # bias alone (no punct, no stopwords, len_capped 0... via t0=0)
    from streaming_recommendation_spark.operators.curation import (
        model_quality_filter,
    )

    r = model_quality_filter(
        spark.createDataFrame([(1, "")], "doc_id: long, text: string")
    ).collect()[0]
    assert r.kept == 0
    assert abs(r.score - (-0.5)) < 1e-9


def test_curation_pipeline_consistent_with_stage_operators(spark):
    """q186's composed manifest must agree flag-by-flag with the four
    stage operators run independently, and `selected` must be exactly
    the conjunction + quota rank."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators import dedup
    from streaming_recommendation_spark.operators.curation import (
        decontaminate,
        model_quality_filter,
    )
    from streaming_recommendation_spark.queries import registry
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    out = {
        r.doc_id: r
        for r in registry()["q186_curation_pipeline"].fn(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    ded = {r.doc_id: r for r in dedup.near_dedup_pipeline(corpus).collect()}
    qual = {r.doc_id: r.kept for r in model_quality_filter(corpus).collect()}
    dec = {
        r.doc_id: r.contaminated
        for r in decontaminate(corpus, bench, n=5).collect()
    }
    assert set(out) == set(ded)
    per_source = {}
    for doc_id, r in out.items():
        assert r.cluster == ded[doc_id].cluster
        assert r.is_canonical == (1 if ded[doc_id].kept else 0)
        assert r.quality_kept == qual[doc_id]
        assert r.contaminated == (1 if dec.get(doc_id, False) else 0)
        passes = r.is_canonical and r.quality_kept and not r.contaminated
        assert (r.quota_rank >= 1) == bool(passes)
        assert r.selected == (1 if passes and r.quota_rank <= 15 else 0)
        if r.selected:
            per_source[r.source] = per_source.get(r.source, 0) + 1
    assert per_source, "nothing selected — degenerate"
    assert all(v <= 15 for v in per_source.values())


def test_passage_dedup_first_occurrence_and_conservation(spark):
    """Planted-duplicate manifest check: the corpus-wide FIRST
    occurrence by (doc_id, chunk_idx) survives, every later copy —
    cross-doc AND intra-doc — is a dup; token totals conserve
    (kept + dropped == total) and the global dup count equals
    passages minus distinct hashes."""
    from streaming_recommendation_spark.operators.curation import (
        passage_dedup,
    )

    p1 = "w1 w2 w3 w4"
    p2 = "v1 v2 v3 v4"
    p3 = "u1 u2 u3 u4"
    rows = [
        (0, f"{p1} {p2}"),          # both first occurrences
        (1, f"{p2} {p3}"),          # p2 dup, p3 first
        (2, f"{p1} {p1}"),          # intra-doc: BOTH are dups (p1 first in doc 0)
        (3, f"{p3} w9"),            # p3 dup + ragged 1-token unique tail
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r.doc_id: r
        for r in passage_dedup(df, window=4, stride=4).collect()
    }
    assert out[0].n_passages == 2 and out[0].n_dup_passages == 0
    assert out[0].n_tokens_kept == 8 and out[0].n_tokens_total == 8
    assert out[1].n_passages == 2 and out[1].n_dup_passages == 1
    assert out[1].n_tokens_kept == 4
    assert out[2].n_passages == 2 and out[2].n_dup_passages == 2
    assert out[2].n_tokens_kept == 0 and out[2].n_tokens_total == 8
    assert out[3].n_passages == 2 and out[3].n_dup_passages == 1
    assert out[3].n_tokens_kept == 1  # the ragged unique tail
    assert all(
        0 <= r.n_tokens_kept <= r.n_tokens_total for r in out.values()
    )


def test_passage_dedup_nondegenerate_on_testdata(spark):
    """The generated corpus genuinely contains aligned duplicate
    passages (planted near/exact dups), so the drop path is exercised
    on real inputs, and dedup is conservative: total kept tokens plus
    dup-passage tokens equals the chunked total."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.curation import (
        passage_dedup,
    )
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    out = passage_dedup(docs, window=16, stride=16)
    agg = out.agg(
        F.sum("n_dup_passages").alias("dups"),
        F.sum("n_tokens_total").alias("tot"),
        F.sum("n_tokens_kept").alias("kept"),
    ).collect()[0]
    assert agg.dups > 0  # 85 at sf0.001
    assert agg.kept < agg.tot
    assert out.count() == docs.count()


def test_chunk_word_sets_distinct_and_boundary_parity(spark):
    """chunk_word_sets emits each chunk's DISTINCT words under the
    exact chunk_documents boundaries (repeated words collapse; ragged
    tail chunk included)."""
    from streaming_recommendation_spark.operators.curation import (
        chunk_documents,
        chunk_word_sets,
    )

    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "x")], "doc_id: long, text: string"
    )
    ws = chunk_word_sets(df, window=4, stride=4).collect()
    got = {}
    for r in ws:
        got.setdefault((r.doc_id, r.chunk_idx), set()).add(r.word)
    assert got == {
        (0, 0): {"a", "b"},  # "a b a b" -> distinct {a, b}
        (0, 1): {"c"},
        (1, 0): {"x"},
    }
    ch = chunk_documents(df, window=4, stride=4).collect()
    assert set(got) == {(r.doc_id, r.chunk_idx) for r in ch}


def test_dedup_pack_pipeline_matches_stages(spark):
    """q195 composition check: the packed-bin manifest conserves the
    passage-dedup stage's per-doc totals — sum(bin_tokens) == total
    kept tokens over surviving docs, sum(bin_n_tokens_total) == their
    pre-dedup totals, and fully-duplicated docs (kept == 0) are
    excluded from packing."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.curation import (
        passage_dedup,
    )
    from streaming_recommendation_spark.queries import registry
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    out = registry()["q195_dedup_pack_pipeline"].fn(spark, SF_DIR)
    got = out.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("bin_tokens").alias("kept"),
        F.sum("bin_n_tokens_total").alias("tot"),
    ).collect()[0]
    docs = load_table(spark, "documents", SF_DIR)
    stage = (
        passage_dedup(docs, window=16, stride=16)
        .where(F.col("n_tokens_kept") > 0)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens_kept").alias("kept"),
            F.sum("n_tokens_total").alias("tot"),
        )
        .collect()[0]
    )
    assert (got.docs, got.kept, got.tot) == (stage.docs, stage.kept, stage.tot)
    assert got.kept < got.tot  # dedup savings are visible per bin


def test_cdc_passage_dedup_catches_shifted_duplicates(spark):
    """The CDC point: a passage duplicated at a DIFFERENT word offset
    is invisible to aligned fixed windows (every window shifts) but
    collides under content-defined boundaries (the boundary rule is a
    pure local predicate). Doc 1 repeats doc 0's tail passage after a
    one-word prefix; passage_dedup(window=4) sees no dup, while
    cdc_passage_dedup drops the shifted copy's tokens. Conservation
    and intra-doc totals hold as in q192."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.curation import (
        cdc_passage_dedup,
        passage_dedup,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared),
        (1, f"prefixword {shared}"),  # SHIFTED copy of doc 0's content
        (2, "totally different words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    aligned = {
        r.doc_id: r.n_dup_passages
        for r in passage_dedup(df, window=4, stride=4).collect()
    }
    assert aligned[1] == 0  # the one-word shift defeats aligned windows
    cdc = {r.doc_id: r for r in cdc_passage_dedup(df, divisor=8).collect()}
    assert cdc[1].n_dup_passages > 0  # CDC catches the shifted copy
    assert cdc[2].n_dup_passages == 0  # no false positives
    for r in cdc.values():
        assert 0 <= r.n_tokens_kept <= r.n_tokens_total
        assert r.n_passages >= r.n_dup_passages
    # doc 0 is the first occurrence everywhere: nothing dropped
    assert cdc[0].n_tokens_kept == cdc[0].n_tokens_total


def test_cdc_passage_dedup_segments_conserve_tokens(spark):
    """Every word lands in exactly one CDC segment: per-doc
    n_tokens_total equals the doc's word count, on real data."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.curation import (
        cdc_passage_dedup,
    )
    from streaming_recommendation_spark.operators.dedup import normalize_text
    from streaming_recommendation_spark.sources.testdata import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    out = cdc_passage_dedup(docs, divisor=8)
    wc = docs.select(
        "doc_id",
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("__n"),
    )
    joined = out.join(wc, "doc_id")
    assert joined.where(F.col("n_tokens_total") != F.col("__n")).count() == 0
    assert out.agg(F.sum("n_dup_passages")).collect()[0][0] > 0


def test_curation_funnel_buckets_partition_each_source(spark):
    """q205: attrition is attributed to the FIRST failing gate, so
    the five buckets partition each source's docs exactly and the
    corpus totals match q186's manifest."""
    from streaming_recommendation_spark.queries import _REGISTRY

    from .conftest import SF_DIR_ORACLE

    rows = (
        _REGISTRY["q205_curation_funnel_report"]
        .fn(spark, SF_DIR_ORACLE)
        .collect()
    )
    assert rows
    for r in rows:
        assert (
            r.n_non_canonical + r.n_quality_dropped + r.n_contaminated
            + r.n_over_quota + r.n_selected
            == r.n_docs
        ), r.source
    base = _REGISTRY["q186_curation_pipeline"].fn(spark, SF_DIR_ORACLE).collect()
    assert sum(r.n_docs for r in rows) == len(base)
    assert sum(r.n_selected for r in rows) == sum(b.selected for b in base)
