"""Text-analysis operators over the documents table.

Corpus-curation primitives a training-data pipeline needs, all
whole-stage-codegen built-ins (no Python in the hot path):

  * token_stats    — whitespace + BPE-ish regex token counts
  * quality_score  — length / punctuation / stopword-ratio heuristic
  * language_id    — stopword-hit n-gram heuristic (en/de/fr/es)
  * fingerprint    — polynomial rolling hash of normalized words
  * pii_scrub      — email/IPv4/phone redaction with per-kind counts
  * tfidf_top_terms — per-doc top-k terms by (linear-idf) tf-idf

The documents testdata table: (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, spread

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "una", "por", "con", "para"],
}


def tokens(col: Column | str) -> Column:
    """Non-whitespace token array (the reference has no tokenizer; this
    is the whitespace baseline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def bpe_ish_tokens(col: Column | str) -> Column:
    """GPT-2-style pre-tokenizer approximation: word pieces, numbers,
    punctuation runs — a stable proxy for BPE token counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = tokens(F.col(text_col))
    b = bpe_ish_tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(b).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        (F.length(F.col(text_col)) / F.greatest(F.size(t), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


def quality_parts(text: Column) -> tuple[Column, Column, Column]:
    """(quality, n_tokens, punct_ratio, stop_ratio) building blocks as
    raw Columns, so compositions (q84 curation) can inline them into a
    single map-side projection instead of joining operator outputs."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    punct_ratio = n_punct / F.greatest(F.length(text), F.lit(1))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(
        F.filter(F.split(normalize_text(text), " "), lambda w: w.isin(*all_stop))
    )
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    length_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.when(punct_ratio > 0.2, F.lit(0.0)).otherwise(1 - punct_ratio * 5)
    stop_score = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    q = (length_score + punct_score + stop_score) / 3
    return q, n_tok, punct_ratio, stop_ratio


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in [0,1]: penalize too-short docs, extreme
    punctuation density, and missing stopwords (word-salad signal)."""
    q, n_tok, punct_ratio, stop_ratio = quality_parts(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.round(q, 6).alias("quality"),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
    )


def language_vote(text: Column) -> Column:
    """Winning ``struct(hits, lang)`` of the stopword vote (highest
    hit count; struct-max ties-break toward the highest language
    code). ``hits == 0`` means undetermined."""
    words = F.split(normalize_text(text), " ")
    scores = []
    for lang in sorted(STOPWORDS):
        total = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS[lang])))
        scores.append(F.struct(total.alias("hits"), F.lit(lang).alias("lang")))
    return F.array_max(F.array(*scores))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID. Picks the language with the most
    stopword hits; 'und' (undetermined) when no hits. Deterministic
    tie-break: highest language code wins (struct-max semantics)."""
    best = language_vote(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("stopword_hits"),
    )


# (kind, pattern, replacement) — scrub order matters: emails may embed
# digit runs, IPs may embed phone-shaped digit groups; scrubbing in this
# order means each counter sees text already cleaned of earlier kinds,
# so nothing is double-counted. Patterns stay in the ASCII subset where
# Java regex (Spark) and RE2 (DuckDB oracle) agree.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone numbers; emit the
    scrubbed text plus a per-kind redaction count. Pure regexp
    built-ins chained in one projection — map-side only, zero
    shuffles, whole-stage codegen (a corpus-scale scrub is exactly as
    expensive as one scan). Training-data curation analogue of the
    reference's field-cleaning passes (model_training/din/
    utils.py:119-131 cleans prices; this cleans text)."""
    cur = F.col(text_col)
    cols = [F.col(id_col)]
    for kind, pat, repl in PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(repl))
    cols.append(cur.alias("scrubbed_text"))
    return df.select(*cols)


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Per-document top-k terms by tf-idf with a LINEAR idf
    (score = tf * n_docs / df). The linear variant is chosen
    deliberately: tf * n_docs is exact integer arithmetic and IEEE
    division is correctly rounded, so Spark and any oracle engine rank
    bit-identically — log-idf would hang result order on libm ln()
    ULPs. Ties break on term ascending.

    Shape: explode -> (doc,term) tf agg -> term df agg -> tf x df join
    on term -> per-doc top-k window. All shuffles key on term or doc —
    no single-partition stage, WindowGroupLimit prunes the heap."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.col("n_docs") / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling hash of the normalized word sequence —
    order-sensitive (unlike the md5-of-whole-text digest) and
    computable incrementally at ingest. H is the cross-engine
    md5-derived word hash.

    Two independent 31-bit Mersenne-modulus hashes (multipliers 31 /
    37) combined into one 62-bit value. The modulus must stay at
    2^31-1: with acc < 2^31 and h < 2^32, acc*mult + h < 2^63 — a
    larger modulus overflows int64, which ANSI mode (Spark 4 default)
    turns into a runtime error."""
    P = 2147483647  # 2^31 - 1
    words = F.split(normalize_text(F.col(text_col)), " ")
    # materialize the md5-derived word hashes once; both polynomials
    # then reference the bound column (no duplicate md5 evaluation)
    hashed = df.select(
        F.col(id_col),
        F.transform(
            words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
        ).alias("__wh"),
    )

    def poly(mult: int):
        return F.aggregate(
            F.col("__wh"),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * F.lit(mult) + h % F.lit(P)) % F.lit(P),
        )

    fp = poly(31) * F.lit(P + 1) + poly(37)
    return hashed.select(F.col(id_col), fp.alias("fingerprint"))


def unigram_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """Corpus-unigram LM quality score (the CCNet/Wikipedia-LM
    perplexity filter, in an integer-exact variant): score each doc
    by how common its tokens are IN THIS CORPUS.

    A perplexity filter computes geometric-mean token probability,
    which needs log() — and libm log differs across engines in final
    ULPs, breaking bit-exact oracle replay (same reason tfidf here
    uses linear idf). Every statistic kept is an integer aggregate of
    corpus term frequencies, plus ONE final IEEE division, so the
    ranking is cross-engine reproducible while ordering docs the same
    way a unigram perplexity would: low mean_token_count = rare/noisy
    text, high = common fluent text. n_hapax (corpus-unique tokens)
    is the OOV-rate analog.

    Scale shape: one explode + one groupBy(word) builds the term
    table (vocab-sized, Zipf-bounded — far smaller than the corpus);
    the score join shuffles keyed by word, then one groupBy(id)
    aggregates. At 100 TB the vocab table is broadcastable after a
    min-count floor; the plan keeps the shuffle join so skewed head
    words still spread across partitions (AQE handles the 'the'
    partition).
    """
    toks = spread(df, repartition).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__word"),
    )
    counts = toks.groupBy("__word").agg(F.count(F.lit(1)).alias("__cnt"))
    return (
        toks.join(counts, "__word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__cnt").alias("sum_token_tf"),
            F.min("__cnt").alias("min_token_count"),
            F.sum((F.col("__cnt") == 1).cast("int")).alias("n_hapax"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_token_tf",
            "min_token_count",
            "n_hapax",
            F.round(F.col("sum_token_tf") / F.col("n_tokens"), 6).alias(
                "mean_token_tf"
            ),
        )
    )


def bpe_merge_candidates(
    df, text_col: str = "text", k: int = 50, repartition: int | bool | None = None
) -> DataFrame:
    """First BPE merge-round candidates (tokenizer induction over the
    corpus): count every adjacent character pair inside every word,
    return the top-k pairs — the pair a byte-pair-encoding trainer
    would merge first, then second, and so on within round one.

    Scale shape: one projection explodes words to overlapping 2-char
    substrings (map-side), one pair-keyed groupBy counts (partial
    aggregation makes the shuffle vocab-of-pairs-sized, not
    corpus-sized — |pairs| is bounded by |alphabet|^2 per length-2
    window), and the global top-k compiles to TakeOrderedAndProject
    (bounded heap per partition + driver merge of k rows, never a
    global sort). This is exactly the count step HuggingFace's BPE
    trainer runs per merge round; iterating merges re-runs it on the
    re-tokenized stream.
    """
    word = F.explode(
        F.split(normalize_text(F.col(text_col)), " ")
    ).alias("__word")
    pairs = (
        spread(df, repartition)
        .select(word)
        .select(
            F.explode(
                F.when(
                    F.length("__word") < 2, F.array().cast("array<string>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length("__word") - 1),
                        lambda i: F.substring("__word", i, 2),
                    )
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair").asc())
        .limit(k)
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """DSIR-flavored importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"),
    unigram variant: score every corpus doc by how target-like its
    token distribution is — the ratio of its tokens' total term
    frequency in the TARGET domain vs in the full corpus. Sampling
    proportional to the weight (det_unit(id) < rate * weight) then
    selects a target-like training mix.

    DSIR proper uses log-ratios of hashed-ngram features; the linear
    integer-TF ratio keeps the score exactly replayable across
    engines (the repo-wide no-libm-in-oracles rule) while ordering
    docs the same way.

    Scale shape: two vocab-sized groupBys (Zipf-bounded), one
    word-keyed join of the corpus token stream against the vocab
    table, one groupBy(id). The target side is typically a small
    curated domain — its TF table broadcasts; the corpus TF join
    stays shuffled so head-word skew spreads (AQE splits the 'the'
    partition).
    """
    toks = spread(corpus, repartition).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__word"),
    )
    ctf = toks.groupBy("__word").agg(F.count(F.lit(1)).alias("__ctf"))
    ttf = (
        target.select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("__word")
        )
        .groupBy("__word")
        .agg(F.count(F.lit(1)).alias("__ttf"))
    )
    vocab = ctf.join(F.broadcast(ttf), "__word", "left").select(
        "__word", "__ctf", F.coalesce("__ttf", F.lit(0)).alias("__ttf")
    )
    return (
        toks.join(vocab, "__word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__ttf").alias("target_tf_sum"),
            F.sum("__ctf").alias("corpus_tf_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "target_tf_sum",
            "corpus_tf_sum",
            F.round(
                F.col("target_tf_sum") / F.col("corpus_tf_sum"), 6
            ).alias("importance_weight"),
        )
    )


def bigram_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """Corpus-bigram LM quality score — the conditional-probability
    (context-aware) companion of :func:`unigram_rarity`: rank docs by
    how predictable each word is GIVEN its predecessor in this
    corpus. A doc full of common words in unusual orders (shuffled /
    template / spam text) scores high on the unigram filter but low
    here — exactly the gap a real bigram-perplexity filter closes
    (CCNet trains a 5-gram KenLM for the same reason).

    Integer-exact discipline (same as unigram_rarity): a perplexity
    needs log(), and libm log differs in final ULPs across engines,
    so every kept statistic is an integer aggregate of corpus counts
    — c(w1,w2) per bigram and the context total c(w1, *) — plus ONE
    final rounded IEEE division, the mean conditional frequency
    sum c(w1,w2) / sum c(w1,*). Docs with < 2 tokens have no bigrams
    and drop out (same contract as the oracle's unnest).

    Scale shape: one pass builds the bigram stream (doc-local
    transform, no shuffle), one groupBy(bigram) builds the bigram LM
    table and one groupBy(context word) the context-total table —
    both Zipf-bounded far below corpus size; the score join shuffles
    keyed by bigram, then one groupBy(doc). At 100 TB, floor the LM
    table with a min-count and broadcast it; the head-word skew on
    the shuffle-join path is AQE's skew-split case.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    bg = (
        spread(df, repartition)
        .select(F.col(id_col), words.alias("__w"))
        .where(F.size("__w") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 1),"
                    " i -> struct(element_at(__w, i) AS w1,"
                    "             concat(element_at(__w, i), ' ',"
                    "                    element_at(__w, i + 1)) AS bg))"
                )
            ).alias("__p"),
        )
        .select(F.col(id_col), F.col("__p.w1").alias("__w1"), F.col("__p.bg").alias("__bg"))
    )
    bg_counts = bg.groupBy("__bg").agg(F.count(F.lit(1)).alias("__bc"))
    ctx_counts = bg.groupBy("__w1").agg(F.count(F.lit(1)).alias("__cc"))
    return (
        bg.join(bg_counts, "__bg")
        .join(ctx_counts, "__w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__bc").alias("sum_bigram_tf"),
            F.sum("__cc").alias("sum_context_tf"),
            F.min("__bc").alias("min_bigram_count"),
            F.sum((F.col("__bc") == 1).cast("int")).alias("n_hapax_bigrams"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_bigram_tf",
            "sum_context_tf",
            "min_bigram_count",
            "n_hapax_bigrams",
            F.round(F.col("sum_bigram_tf") / F.col("sum_context_tf"), 6).alias(
                "mean_cond_freq"
            ),
        )
    )


def bm25_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """Impact-ordered BM25 posting lists: for each of the corpus's
    ``n_terms`` highest-df terms, the ``k`` best documents by BM25
    score (k1 = 1.2, b = 0.75) — the build-time artifact of a top-k
    retrieval index (impact-sorted postings are what WAND/MaxScore
    engines traverse), extending the tf-idf leg (tfidf_top_terms)
    with BM25's two missing ingredients: tf SATURATION (a term
    repeated 50x is not 50x more relevant) and document-LENGTH
    normalization (long docs don't win by volume).

    Exact cross-engine arithmetic — the whole score is ONE double
    division of two int64 products. With k1 = 6/5 and b = 3/4, the
    BM25 term score with linear idf (D/df, the same deliberate choice
    as tfidf_top_terms — log-idf would hang ranking on libm ULPs)
    algebraically reduces to

        score = (22*D*T*tf) / (df * (10*T*tf + 3*T + 9*dl*D))

    where dl = doc token count, T = total corpus tokens, D = total
    docs (avgdl = T/D is never materialized as a float — it rides
    inside the integer products). No float summation exists anywhere:
    per-(term, doc) scores never add, so there is no reassociation
    hazard; int64 -> double conversion and one IEEE division are
    correctly rounded identically on every engine. At 100 TB, where
    T*tf products approach 2^63, reduce T and D by a common factor
    (the score is scale-invariant in T/D) — exactness only needs the
    SAME constants on both sides.

    Scale shape: explode -> (doc, term) tf agg (one shuffle keyed by
    doc+term); dl/T/D are aggregates of that table (no second scan of
    the raw text); the n_terms query terms arrive as a broadcast
    (TakeOrderedAndProject global top-k, df desc / term asc
    tie-break); the per-term top-k is a WindowGroupLimit k-heap —
    the posting lists never fully sort.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = df.agg(F.countDistinct(id_col).alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").alias("t_tokens"))
    )
    top_terms = doc_freq.orderBy(F.desc("df"), F.asc("term")).limit(n_terms)
    scored = (
        tf.join(F.broadcast(top_terms), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__score",
            (22 * F.col("n_docs") * F.col("t_tokens") * F.col("tf"))
            / (
                F.col("df")
                * (
                    10 * F.col("t_tokens") * F.col("tf")
                    + 3 * F.col("t_tokens")
                    + 9 * F.col("dl") * F.col("n_docs")
                )
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("__score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "term",
            id_col,
            "tf",
            "dl",
            "df",
            F.round("__score", 6).alias("bm25"),
            "rank",
        )
    )


def bm25_search(
    df: DataFrame,
    is_query: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Multi-term BM25 top-k SEARCH — the query-time half of the
    retrieval index whose build-time half is ``bm25_postings``
    (reference analog: the recall stage of
    `eval_online/main/recall.py`, which fetches candidates by a
    lexical score before dense ranking). Documents selected by
    ``is_query`` act as queries (their distinct terms form the query
    bag); every OTHER document is scored by the sum of its per-term
    BM25 contributions over the shared terms, and the top ``k`` per
    query are returned.

    Exactness: summing per-term float scores would reintroduce the
    reassociation hazard bm25_postings dodges, so each term score is
    first quantized to an int64 in 1/``scale`` units with ONE
    truncating integer division of two int64 products —

        term_milli = (22*D*T*tf*scale)
                     div (df * (10*T*tf + 3*T + 9*dl*D))

    (k1 = 6/5, b = 3/4, linear idf — bm25_postings' algebra) — and
    the per-document score is an int64 SUM of those units:
    order-free, so any engine replays the ranking bit-for-bit
    (the q179/q180 quantize-then-sum recipe). The reported double
    ``score`` is one IEEE division by ``scale`` at the very end.
    Overflow bound: 22*D*T*tf*scale must stay under 2^63 — at corpus
    sizes where it would not, reduce D and T by a common factor (the
    score is invariant in T/D) and/or lower ``scale``; both sides
    just need the SAME constants.

    Scale shape: one explode -> (doc, term) tf shuffle (shared with
    the index build); dl/df/totals are aggregates of that table; the
    query-term table (|queries| x their distinct terms, with df
    attached) is broadcast into the corpus tf scan, so search cost is
    one filtered corpus pass + one doc-keyed join for dl + a
    WindowGroupLimit k-heap. No float summation, no all-pairs, no
    driver loop.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    qids = df.where(is_query).select(F.col(id_col).alias("query_doc"))
    return bm25_rank_from_postings(tf, qids, id_col=id_col, k=k, scale=scale)


def bm25_rank_from_postings(
    tf: DataFrame,
    qids: DataFrame | None,
    id_col: str = "doc_id",
    k: int = 10,
    scale: int = 1000,
    query_terms: DataFrame | None = None,
) -> DataFrame:
    """bm25_search's scoring core over a POSTINGS table ``(id, term,
    tf)`` — every corpus statistic (dl, df, T, and D = the number of
    INDEXED documents, i.e. docs with >= 1 token) derives from the
    postings alone, so a search never needs the raw text. This is
    what makes the index a first-class stored artifact: the streaming
    ingest (streaming/postings.py) appends per-batch postings and
    this core answers queries over the accumulated table as-of-now
    (the q185 stored-index contract for the lexical leg).
    ``qids`` is a 1-column (query_doc) frame naming the query docs;
    alternatively pass ``query_terms`` — an explicit (query_doc,
    term) bag (e.g. an expanded query from pseudo-relevance
    feedback) — and ``qids`` is ignored.
    """
    from pyspark.sql import Window

    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = tf.agg(F.countDistinct(id_col).alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").alias("t_tokens"))
    )
    # query-term table with df attached: tiny on the query side, so it
    # broadcasts INTO the corpus-wide df join and then into the tf scan
    if query_terms is None:
        query_terms = tf.join(
            F.broadcast(qids), tf[id_col] == qids["query_doc"]
        ).select("query_doc", "term")
    # the query side is tiny BY CONTRACT, so broadcast it explicitly
    # into the corpus-wide df relation instead of trusting Catalyst's
    # size estimate — a tf that arrives through a window fold (the
    # compacted-store reads, q220+) has no stats and would otherwise
    # compile this as a corpus-vocabulary sort-merge join
    qterms = doc_freq.join(F.broadcast(query_terms), "term")
    # ADVICE r9: both products run in DECIMAL(38,0) from the first
    # multiply so an out-of-bound input can NEVER wrap into a wrong
    # positive score (int64 products can wrap past 2^64 back to a
    # plausible value; the old negative-sign check missed that band,
    # and the denominator was unguarded entirely). In-bound values
    # are bit-identical: DECIMAL(38,0) is exact far past 2^63.
    dec = lambda x: F.lit(x).cast("decimal(38,0)")
    num = (
        dec(22)
        * F.col("n_docs")
        * F.col("t_tokens")
        * F.col("tf")
        * F.lit(scale)
    )
    den = F.col("df").cast("decimal(38,0)") * (
        dec(10) * F.col("t_tokens") * F.col("tf")
        + dec(3) * F.col("t_tokens")
        + dec(9) * F.col("dl") * F.col("n_docs")
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .where(F.col(id_col) != F.col("query_doc"))
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .select(
            "query_doc",
            F.col(id_col),
            num.alias("__num"),
            den.alias("__den"),
        )
        .select(
            "query_doc",
            id_col,
            # overflow guard: __num/__den are EXACT decimal products;
            # past the documented < 2^63 bound (where the DuckDB twin
            # errors on its BIGINT arithmetic) fail loudly in-plan with
            # the escape hatch instead of silently diverging. In-bound
            # rows take one BIGINT cast each and the same integer div
            # as before.
            F.when(
                (F.col("__num") > F.lit(2**63 - 1).cast("decimal(38,0)"))
                | (F.col("__den") > F.lit(2**63 - 1).cast("decimal(38,0)")),
                F.raise_error(
                    F.lit(
                        "bm25 milliscore overflow (num or den >= 2^63; "
                        "num = 22*D*T*tf*scale): reduce T and D by a "
                        "common factor and/or lower scale"
                    )
                ),
            )
            .otherwise(
                F.expr(
                    "CAST(__num AS BIGINT) div CAST(__den AS BIGINT)"
                )
            )
            .alias("term_milli"),
        )
    )
    agg = scored.groupBy("query_doc", id_col).agg(
        F.sum("term_milli").alias("score_milli"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.desc("score_milli"), F.asc(id_col)
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_doc",
            id_col,
            "n_terms_matched",
            "score_milli",
            (F.col("score_milli") / F.lit(float(scale))).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_prf_search(
    df: DataFrame,
    is_query: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_fb: int = 3,
    n_exp: int = 5,
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Pseudo-relevance-feedback BM25 search (the Rocchio/RM3 query-
    expansion move — Lavrenko & Croft 2001's relevance models are the
    probabilistic version; this is the classic tf-ranked variant):
    run the plain BM25 search, treat each query's top ``k_fb`` hits
    as pseudo-relevant, expand the query with the ``n_exp`` terms
    that occur most in those feedback documents but NOT in the
    original query (total feedback tf desc, term asc tie-break), and
    re-search with the expanded term bag. The production fix for
    vocabulary mismatch: a query about 'cars' retrieves docs that
    say 'automobile'.

    Exactness: both rounds are bm25_rank_from_postings (quantize-
    then-sum int64); expansion selection compares exact int64 tf
    sums. Scale: round 1 is q198's shape; the feedback join touches
    |queries| x k_fb docs' postings; round 2 re-broadcasts the
    (slightly larger) query-term bag into the same corpus tf scan —
    the corpus is scanned per round, never all-pairs.
    """
    from .dedup import normalize_text
    from .topk import top_k_per_group

    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    qids = df.where(is_query).select(F.col(id_col).alias("query_doc"))
    q_orig = tf.join(
        F.broadcast(qids), tf[id_col] == qids["query_doc"]
    ).select("query_doc", "term")
    # round 1 reuses q_orig as the explicit bag — passing qids instead
    # would rebuild the identical tf-join subtree inside the core
    fb = bm25_rank_from_postings(
        tf, None, id_col=id_col, k=k_fb, scale=scale, query_terms=q_orig
    ).select("query_doc", id_col)
    fb_tf = (
        tf.join(F.broadcast(fb), id_col)
        .groupBy("query_doc", "term")
        .agg(F.sum("tf").alias("fb_tf"))
    )
    exp = top_k_per_group(
        fb_tf.join(F.broadcast(q_orig), ["query_doc", "term"], "left_anti"),
        n_exp,
        ["query_doc"],
        F.col("fb_tf").desc(),
        F.col("term").asc(),
    ).select("query_doc", "term")
    q2 = q_orig.unionByName(exp)  # disjoint by the anti-join
    return bm25_rank_from_postings(
        tf, None, id_col=id_col, k=k, scale=scale, query_terms=q2
    )


def best_passage(
    df: DataFrame,
    is_query: Column,
    window: int = 16,
    k_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1000,
) -> DataFrame:
    """Best-passage (snippet) extraction — the presentation half of
    search (Lucene's highlighter / passage-retrieval move): for each
    of the BM25 top-``k_docs`` documents per query, the ``window``-
    token chunk (chunk_documents boundary recipe) containing the MOST
    distinct query terms; ties break to the earliest window. Every
    retrieved doc has a best window by construction (it matched >= 1
    query term, and that term sits in some chunk).

    Returns (query_doc, id, bm25_rank, chunk_idx, n_hits).
    Exactness: n_hits is an exact distinct-word intersection count
    (the q194 word equi-join protocol), selection integer-ordered.
    Scale: the candidate set (|queries| x k_docs) broadcasts into the
    corpus chunk-word scan — one filtered map-side pass + a
    per-(query, doc) WindowGroupLimit over that doc's chunks only.
    """
    from .curation import chunk_word_sets
    from .dedup import normalize_text
    from .topk import top_k_per_group

    top = bm25_search(
        df, is_query, text_col=text_col, id_col=id_col, k=k_docs, scale=scale
    ).select("query_doc", id_col, F.col("rank").alias("bm25_rank"))
    ws = chunk_word_sets(
        df, window=window, stride=window, text_col=text_col, id_col=id_col
    )
    qw = (
        df.where(is_query)
        .select(
            F.col(id_col).alias("query_doc"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )
    hits = (
        ws.join(F.broadcast(top), id_col)
        .join(F.broadcast(qw), ["query_doc", "word"])
        .groupBy("query_doc", id_col, "bm25_rank", "chunk_idx")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return top_k_per_group(
        hits,
        1,
        ["query_doc", id_col],
        F.col("n_hits").desc(),
        F.col("chunk_idx").asc(),
    ).select("query_doc", id_col, "bm25_rank", "chunk_idx", "n_hits")


def rerank_pair_features(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The exact integer pair features the re-rank slot scores —
    factored out of learned_rerank so the TRAINED variant
    (trained_rerank, q225) scores the literally same feature relation
    its training pass aggregated. Per (query_doc, candidate):
    n_overlap (DISTINCT shared normalized words via word equi-join —
    never a pairwise text comparison), rrf_ppm (the fusion prior,
    riding through), n_tokens (the candidate's token count). Scale:
    the candidate list is |queries| x k_in and broadcasts into one
    corpus word scan + one corpus token-count scan — the corpus never
    shuffles."""
    from .dedup import normalize_text

    words = (
        df.select(
            id_col,
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )
    cand = candidates.select("query_doc", id_col, "rrf_ppm")
    qw = words.join(
        F.broadcast(
            cand.select("query_doc").distinct()
        ),
        words[id_col] == F.col("query_doc"),
    ).select("query_doc", "word")
    ov = (
        words.join(F.broadcast(cand.select("query_doc", id_col)), id_col)
        .join(F.broadcast(qw), ["query_doc", "word"])
        .groupBy("query_doc", id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    toks = df.select(
        id_col,
        F.size(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda w: w != "",
            )
        )
        .cast("long")
        .alias("n_tokens"),
    )
    # the candidate side is |queries| x k_in rows: broadcast IT into
    # the corpus-wide token-count scan (the corpus never shuffles)
    enriched = cand.join(F.broadcast(ov), ["query_doc", id_col], "left")
    return toks.join(F.broadcast(enriched), id_col).select(
        "query_doc",
        id_col,
        F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        "rrf_ppm",
        "n_tokens",
    )


def trained_rerank(
    df: DataFrame,
    candidates: DataFrame,
    truth: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """learned_rerank with the weights TRAINED in-plan (VERDICT r10
    #4): one deterministic, order-free, division-free integer
    training pass replaces the hand-set milli-coefficients. The model
    is the class-centroid difference (the closed-form one-step
    Fisher/least-squares direction): over the candidate pairs
    themselves, labeled by membership in the exact-Jaccard ``truth``
    list (the q218 ground truth — (query_doc, id) rows),

        w_j = S1_j * n0  -  S0_j * n1

    where S1_j/S0_j are the exact int64 sums of feature j over
    positive/negative pairs and n1/n0 the class counts — i.e.
    (mean1_j - mean0_j) scaled by the common positive factor n1*n0,
    which leaves the induced ranking identical while keeping every
    quantity an exact integer (the q73 quantized-Lloyd discipline:
    no float, no division, so the oracle replays the training
    bit-for-bit). Degenerate label splits (n1 = 0 or n0 = 0) stay
    deterministic: the weights collapse to -+S_j * n, a pure
    magnitude direction, and the oracle agrees because it runs the
    same arithmetic. Score = sum_j w_j * x_j, exact int64 (bounds:
    |w| <= |pairs| * max_x <= ~3e7 at the protocol's query sets and
    |w * x| <= ~1e12 — five decades under 2^63, swept at 5x).

    Output carries the trained weights on every row (w_overlap,
    w_rrf, w_len) so the TRAINING step itself is oracle-checked, not
    just the ranking it induces. Scale: feature relation as
    rerank_pair_features; training is ONE tiny aggregate over
    |queries| x k_in rows; the 1-row weight frame broadcasts back
    into the scoring projection."""
    from pyspark.sql import Window

    from .topk import top_k_per_group

    feat = rerank_pair_features(df, candidates, text_col, id_col)
    # Round-12 optimization: the old shape referenced ``feat`` three
    # times (a left_semi labeling pass, the labeled frame for the
    # weight aggregate, and again for scoring), re-inlining the whole
    # feature/candidate subtree per reference (no common-subtree
    # sharing in a Catalyst tree — guide §2.4). Labels now come from
    # ONE direct left join against the (unique-per-pair) truth list,
    # and the 8 training sums ride a single whole-frame window over
    # the |queries| x k_in feature rows — the documented tiny-window
    # exception (the frame is candidate-bounded, never corpus-sized)
    # — so ``feat`` is evaluated exactly once. Same integer sums,
    # same weights, same ranking (oracle-re-proven q225/q226/q229+).
    feat_l = feat.join(
        F.broadcast(
            # distinct: keeps the old semi-join's duplicate-proofness
            # should a caller hand a non-unique truth list
            truth.select("query_doc", id_col)
            .distinct()
            .withColumn("__y", F.lit(1))
        ),
        ["query_doc", id_col],
        "left",
    ).withColumn("__y", F.coalesce("__y", F.lit(0)))
    pos = F.col("__y") == 1
    wall = Window.partitionBy()
    s1_ov = F.sum(F.when(pos, F.col("n_overlap")).otherwise(F.lit(0))).over(wall)
    s0_ov = F.sum(F.when(~pos, F.col("n_overlap")).otherwise(F.lit(0))).over(wall)
    s1_rrf = F.sum(F.when(pos, F.col("rrf_ppm")).otherwise(F.lit(0))).over(wall)
    s0_rrf = F.sum(F.when(~pos, F.col("rrf_ppm")).otherwise(F.lit(0))).over(wall)
    s1_len = F.sum(F.when(pos, F.col("n_tokens")).otherwise(F.lit(0))).over(wall)
    s0_len = F.sum(F.when(~pos, F.col("n_tokens")).otherwise(F.lit(0))).over(wall)
    n1 = F.sum(F.col("__y").cast("long")).over(wall)
    n0 = F.sum((F.lit(1) - F.col("__y")).cast("long")).over(wall)
    scored = (
        feat_l.withColumn(
            "w_overlap", (s1_ov * n0 - s0_ov * n1).cast("long")
        )
        .withColumn("w_rrf", (s1_rrf * n0 - s0_rrf * n1).cast("long"))
        .withColumn("w_len", (s1_len * n0 - s0_len * n1).cast("long"))
        .withColumn(
            "rerank_score",
            (
                F.col("w_overlap") * F.col("n_overlap")
                + F.col("w_rrf") * F.col("rrf_ppm")
                + F.col("w_len") * F.col("n_tokens")
            ).cast("long"),
        )
    )
    return top_k_per_group(
        scored,
        k,
        ["query_doc"],
        F.col("rerank_score").desc(),
        F.col(id_col).asc(),
        rank_col="rerank",
    ).select(
        "query_doc",
        id_col,
        "n_overlap",
        "rrf_ppm",
        "n_tokens",
        "w_overlap",
        "w_rrf",
        "w_len",
        "rerank_score",
        F.col("rerank").cast("int").alias("rerank"),
    )


def learned_rerank(
    df: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    w_overlap: int = 2000,
    w_rrf: int = 1,
    w_len: int = -3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learned re-rank slot over (query, candidate) pairs — the
    CROSS-ENCODER stage of a production retrieval stack (bi-encoder /
    BM25 retrieve -> cross-encoder re-rank, Nogueira & Cho 2019),
    realized the q184 way: pair features are exact integers computed
    in-plan, the scorer is a LINEAR model with integer milli-unit
    coefficients, so the ranking replays bit-for-bit on any engine
    and the gate stays Catalyst-only (zero Python). The torch
    cross-encoder swap point is exactly this slot: a user with a
    traced pair-scorer replaces the weighted sum with an Arrow
    pandas-UDF scorer (cascade/scorers.py pattern) and everything
    around it — candidate generation, feature join, top-k — is
    unchanged.

    ``candidates`` is a (query_doc, id, rrf_ppm) list (the q199/q209
    fusion output or any rank list with an integer prior score).
    Features per pair: n_overlap — exact count of DISTINCT shared
    normalized words (word equi-join, never a pairwise text
    comparison); rrf_ppm — the fusion prior, riding through;
    n_tokens — the candidate's token count (length prior). Score =
    w_overlap*n_overlap + w_rrf*rrf_ppm + w_len*n_tokens, exact
    int64; top-``k`` per query by (score desc, id asc). Scale: the
    candidate list is |queries| x k_in and broadcasts into one
    corpus word scan; one small per-query WindowGroupLimit."""
    from .topk import top_k_per_group

    feat = rerank_pair_features(df, candidates, text_col, id_col)
    score = (
        F.lit(w_overlap).cast("long") * F.col("n_overlap")
        + F.lit(w_rrf).cast("long") * F.col("rrf_ppm")
        + F.lit(w_len).cast("long") * F.col("n_tokens")
    )
    return top_k_per_group(
        feat.withColumn("rerank_score", score.cast("long")),
        k,
        ["query_doc"],
        F.col("rerank_score").desc(),
        F.col(id_col).asc(),
        rank_col="rerank",
    ).select(
        "query_doc",
        id_col,
        "n_overlap",
        "rrf_ppm",
        "n_tokens",
        "rerank_score",
        F.col("rerank").cast("int").alias("rerank"),
    )


def best_passage_from_positions(
    pos_postings: DataFrame,
    qids: DataFrame,
    window: int = 16,
    k_docs: int = 5,
    id_col: str = "doc_id",
    scale: int = 1000,
) -> DataFrame:
    """best_passage answered entirely from a POSITIONAL postings
    relation (id, term, pos) — the Lucene positional-index move: one
    index supports ranking AND snippet selection with the raw text
    never rescanned at query time. tf postings derive from the
    positions (tf = count of a term's positions), BM25 ranks the
    top-``k_docs`` (bm25_rank_from_postings), chunk word sets derive
    as distinct (id, pos div window, term) — identical to
    chunk_word_sets' aligned windows because pos is the 0-based index
    into the same normalized word sequence the chunker slices — and
    the best window per retrieved doc maximizes distinct query-term
    hits, earliest on ties (q203's exact semantics; oracle equality
    is the claim). Scale: the derivations are one groupBy and one
    distinct over the store; the candidate set broadcasts into the
    chunk-word relation; per-(query, doc) WindowGroupLimit."""
    from .topk import top_k_per_group

    tf = pos_postings.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    top = bm25_rank_from_postings(
        tf, qids, id_col=id_col, k=k_docs, scale=scale
    ).select("query_doc", id_col, F.col("rank").alias("bm25_rank"))
    ws = pos_postings.select(
        id_col,
        F.expr(f"CAST(pos div {window} AS INT)").alias("chunk_idx"),
        F.col("term").alias("word"),
    ).distinct()
    qw = (
        pos_postings.join(
            F.broadcast(qids), pos_postings[id_col] == qids["query_doc"]
        )
        .select("query_doc", F.col("term").alias("word"))
        .distinct()
    )
    hits = (
        ws.join(F.broadcast(top), id_col)
        .join(F.broadcast(qw), ["query_doc", "word"])
        .groupBy("query_doc", id_col, "bm25_rank", "chunk_idx")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return top_k_per_group(
        hits,
        1,
        ["query_doc", id_col],
        F.col("n_hits").desc(),
        F.col("chunk_idx").asc(),
    ).select("query_doc", id_col, "bm25_rank", "chunk_idx", "n_hits")


def rrf_fuse(
    bm: DataFrame,
    emb: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    k_rrf: int = 60,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a dense rank list in
    exact integer ppm units (Cormack et al. 2009; the q199 fusion,
    single-sourced so the raw-text query and the store-backed read
    share one arithmetic). ``bm`` is (query_doc, id, bm25_rank);
    ``emb`` is (query_doc, id, emb_rank). Score per doc =
    sum over legs of ppm div (k_rrf + rank) — int64, order-free;
    a doc absent from a leg contributes 0 (NULL rank rides along as
    provenance). Scale: Spark cannot broadcast a full-outer join and
    a sort-merge is silly for two (query, doc)-unique top-k lists —
    union + ONE (query, doc)-keyed max-agg is the same relation in a
    single small shuffle (|queries| x 2k rows)."""
    from .topk import top_k_per_group

    lit0 = F.lit(0).cast("long")
    fused = (
        bm.select(
            "query_doc",
            id_col,
            "bm25_rank",
            F.lit(None).cast("int").alias("emb_rank"),
        )
        .unionByName(
            emb.select(
                "query_doc",
                id_col,
                F.lit(None).cast("int").alias("bm25_rank"),
                "emb_rank",
            )
        )
        .groupBy("query_doc", id_col)
        .agg(
            F.max("bm25_rank").alias("bm25_rank"),
            F.max("emb_rank").alias("emb_rank"),
        )
        .select(
            "query_doc",
            id_col,
            "bm25_rank",
            "emb_rank",
            (
                F.coalesce(
                    F.expr(f"{ppm} div ({k_rrf} + bm25_rank)"), lit0
                )
                + F.coalesce(F.expr(f"{ppm} div ({k_rrf} + emb_rank)"), lit0)
            )
            .cast("long")
            .alias("rrf_ppm"),
        )
    )
    return top_k_per_group(
        fused,
        k,
        ["query_doc"],
        F.col("rrf_ppm").desc(),
        F.col(id_col).asc(),
        rank_col="rank",
    ).select(
        "query_doc",
        id_col,
        "bm25_rank",
        "emb_rank",
        "rrf_ppm",
        F.col("rank").cast("int").alias("rank"),
    )


def doc_jaccard_topk(
    df: DataFrame,
    is_query: Column,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_candidates: bool = True,
    include_rank: bool = False,
) -> DataFrame:
    """Doc-level exact word-set-Jaccard top-k per query — the shared
    ground-truth protocol of the hard-negative miner (q200) and the
    retrieval ablation (q204), single-sourced so the two truths can
    never drift (the q194 protocol at document granularity). Returns
    (query_doc, id). Exactness: intersections/sizes are exact int64
    counts from a word equi-join; jac is ONE IEEE division; k-list by
    (jac desc, id asc). Scale: the query side broadcasts into one
    corpus word scan, and the candidate table broadcasts INTO the
    corpus-wide sizes join (the q194 plan fix) — never a pairwise
    text comparison. ADVICE r9 caveat: the candidate table is one
    row per (query, doc sharing ANY word), so with common words its
    worst case is |queries| x |corpus| — the broadcast hint is right
    for small query sets (this protocol's use), but a large query
    batch over a common-word corpus should set
    ``broadcast_candidates=False`` to fall back to a shuffled join
    instead of overrunning the driver/broadcast limit."""
    from .dedup import normalize_text
    from .topk import top_k_per_group

    ws = (
        df.select(
            id_col,
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )
    sizes = ws.groupBy(id_col).agg(F.count(F.lit(1)).alias("nw"))
    qids = df.where(is_query).select(F.col(id_col).alias("query_doc"))
    qws = ws.join(
        F.broadcast(qids), ws[id_col] == qids["query_doc"]
    ).select("query_doc", "word")
    inter = (
        ws.join(F.broadcast(qws), "word")
        .where(F.col(id_col) != F.col("query_doc"))
        .groupBy("query_doc", id_col)
        .agg(F.count(F.lit(1)).alias("it"))
    )
    qsizes = sizes.join(
        F.broadcast(qids), sizes[id_col] == qids["query_doc"]
    ).select("query_doc", F.col("nw").alias("__qn"))
    cand = inter.join(F.broadcast(qsizes), "query_doc")
    if broadcast_candidates:
        cand = cand.hint("broadcast")
    jac = (
        cand.join(sizes, id_col)
        .select(
            "query_doc",
            id_col,
            (
                F.col("it").cast("double")
                / (F.col("__qn") + F.col("nw") - F.col("it"))
            ).alias("jac"),
        )
    )
    if include_rank:
        return top_k_per_group(
            jac,
            k,
            ["query_doc"],
            F.col("jac").desc(),
            F.col(id_col).asc(),
            rank_col="truth_rank",
        ).select(
            "query_doc", id_col, F.col("truth_rank").cast("int").alias("truth_rank")
        )
    return top_k_per_group(
        jac, k, ["query_doc"], F.col("jac").desc(), F.col(id_col).asc()
    ).select("query_doc", id_col)


def bm25_hard_negatives(
    df: DataFrame,
    is_query: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_cand: int = 20,
    k_pos: int = 5,
    k_neg: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """BM25 hard-negative mining for retriever training (DPR/ANCE
    prep, Karpukhin et al. 2020): per query document, the BM25
    top-``k_cand`` candidates (bm25_search) MINUS the ground-truth
    relevant set (top-``k_pos`` by exact doc-level word-set Jaccard)
    — the lexically-plausible non-relevant documents that actually
    teach a dense retriever, re-ranked 1..``k_neg``.

    Returns (query_doc, id, bm25_rank, score_milli, neg_rank).
    Exactness: BM25 is bm25_search's quantize-then-sum int64;
    Jaccard is ONE IEEE division of exact int64 counts; subtraction
    is a left anti-join. Scale: both legs are query-bounded
    broadcasts into single corpus scans; the anti-join sees
    |queries| x k_cand rows.
    """
    from .topk import top_k_per_group

    bm = bm25_search(
        df, is_query, text_col=text_col, id_col=id_col, k=k_cand, scale=scale
    ).select("query_doc", id_col, F.col("rank").alias("bm25_rank"), "score_milli")
    pos = doc_jaccard_topk(
        df, is_query, k=k_pos, text_col=text_col, id_col=id_col
    )
    negs = bm.join(F.broadcast(pos), ["query_doc", id_col], "left_anti")
    return top_k_per_group(
        negs,
        k_neg,
        ["query_doc"],
        F.col("score_milli").desc(),
        F.col(id_col).asc(),
        rank_col="neg_rank",
    ).select(
        "query_doc",
        id_col,
        "bm25_rank",
        "score_milli",
        F.col("neg_rank").cast("int").alias("neg_rank"),
    )


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """PMI collocation scores for adjacent word pairs — the
    word2phrase-style phrase-detection statistic a training-data
    pipeline runs BEFORE tokenizer/embedding training (Mikolov et
    al. 2013 merge high-PMI bigrams into single tokens; the same
    score drives collocation extraction). Returns (w1, w2,
    pair_count, w1_count, w2_count, pmi_ratio) for every adjacent
    pair seen at least ``min_count`` times.

    Exactness — the log never happens: PMI = log(P(w1 w2) /
    (P(w1) P(w2))) is monotone in the RATIONAL

        pmi_ratio = (c12 * T * T) / (B * c1 * c2)

    (T total tokens, B total bigrams), so the rational itself is
    emitted: operands cast decimal(38,0) (ADVICE r8 — explicit, not
    via Spark's 58->38 allowPrecisionLoss promotion) — at corpus
    scale c12 * T^2 reaches ~1e36, far past int64, while DuckDB
    promotes to HUGEINT — then ONE IEEE division. Past the ~1e38
    decimal ceiling the product is NULL with ANSI off, dropping that
    pair's pmi_ratio rather than erroring (the HUGEINT oracle's own
    ceiling is ~1.7e38). Ranking/thresholding on pmi_ratio orders
    identically to true PMI.

    Scale shape: one doc-local transform builds the bigram stream
    (no shuffle); one groupBy(w1, w2) and one groupBy(token) build
    the Zipf-bounded count tables; the two unigram joins key on the
    word; T and B ride as broadcast singletons. Head-word skew on
    the count joins is AQE's skew case; at 100 TB floor the unigram
    table with its own min-count and broadcast it."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = spread(df, repartition).select(F.col(id_col), words.alias("__w"))
    uni = base.select(F.explode("__w").alias("__t"))
    u1 = uni.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    tot = uni.agg(F.count(F.lit(1)).alias("__T"))
    bg = (
        base.where(F.size("__w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 1),"
                    " i -> struct(element_at(__w, i) AS w1,"
                    "             element_at(__w, i + 1) AS w2))"
                )
            ).alias("__p")
        )
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    b1 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= int(min_count))
    )
    btot = bg.agg(F.count(F.lit(1)).alias("__B"))
    ca = u1.select(F.col("__t").alias("w1"), F.col("__c").alias("w1_count"))
    cb = u1.select(F.col("__t").alias("w2"), F.col("__c").alias("w2_count"))
    # operands cast decimal(38,0) DIRECTLY (ADVICE r8): products then
    # stay capped at 38 by explicit intent, not by Spark's 58->38
    # allowPrecisionLoss promotion; past ~1e38 the product is NULL
    # with ANSI off (dropping that pair's pmi_ratio) rather than an
    # error — documented bound, same as the DuckDB HUGEINT ceiling
    dec = "decimal(38,0)"
    num = (
        F.col("pair_count").cast(dec)
        * F.col("__T").cast(dec)
        * F.col("__T").cast(dec)
    )
    den = (
        F.col("__B").cast(dec)
        * F.col("w1_count").cast(dec)
        * F.col("w2_count").cast(dec)
    )
    return (
        b1.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            "w2_count",
            (num.cast("double") / den.cast("double")).alias("pmi_ratio"),
        )
    )


def candidate_pair_sims(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairwise exact word-set Jaccard (integer ppm, truncating div)
    among SAME-QUERY candidate documents: (query_doc, __i, __j,
    sim_ppm) for every ordered pair sharing >= 1 word (absent pair =
    similarity 0 — consumers coalesce). Shared by the MMR greedy
    redundancy term (mmr_diversify) and the intra-list diversity
    readout (q231). Scale: ONE corpus word scan semi-joined to the
    candidate ids; the pair table is |queries| x k_in^2 rows."""
    from .dedup import normalize_text

    cand = candidates.select("query_doc", id_col)
    cids = cand.select(id_col).distinct()
    cw = (
        df.join(F.broadcast(cids), id_col, "left_semi")
        .select(
            id_col,
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )
    sizes = cw.groupBy(id_col).agg(F.count(F.lit(1)).alias("nw"))
    ci = cand.select("query_doc", F.col(id_col).alias("__i"))
    cj = cand.select("query_doc", F.col(id_col).alias("__j"))
    wi = cw.select(F.col(id_col).alias("__i"), "word")
    wj = cw.select(F.col(id_col).alias("__j"), "word")
    inter = (
        ci.join(cj, "query_doc")
        .where(F.col("__i") != F.col("__j"))
        .join(F.broadcast(wi), "__i")
        .join(F.broadcast(wj), ["__j", "word"])
        .groupBy("query_doc", "__i", "__j")
        .agg(F.count(F.lit(1)).alias("it"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(F.col(id_col).alias("__i"), F.col("nw").alias("__ni"))
            ),
            "__i",
        )
        .join(
            F.broadcast(
                sizes.select(F.col(id_col).alias("__j"), F.col("nw").alias("__nj"))
            ),
            "__j",
        )
        .select(
            "query_doc",
            "__i",
            "__j",
            F.expr("CAST(1000000 * it div (__ni + __nj - it) AS BIGINT)").alias(
                "sim_ppm"
            ),
        )
    )


def mmr_diversify(
    df: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    w_rel: int = 700,
    w_red: int = 300,
    text_col: str = "text",
    id_col: str = "doc_id",
    sims: DataFrame | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998) over a retrieved candidate list — the standard
    post-fusion stage a production RAG stack runs so the k passages
    handed to the generator aren't five copies of the same paragraph:
    greedily select k candidates maximizing

        mmr = w_rel * rrf_ppm  -  w_red * max_{j in selected} sim_ppm(i, j)

    where sim_ppm is the exact integer word-set Jaccard (ppm,
    truncating div) between CANDIDATE documents — pairwise only
    within the |queries| x k_in candidate list, never over the
    corpus. All arithmetic is exact int64 (rel <= ~33k ppm, sim <=
    1e6 ppm, products <= ~3e8), ties break on id ascending, and the
    first pick has redundancy 0 by definition — so the greedy
    trajectory replays bit-for-bit on any engine and the oracle
    unrolls the k rounds as chained CTEs.

    Scale: candidate word sets come from ONE corpus word scan
    semi-joined to the candidate ids (broadcast); the pairwise
    similarity table is |queries| x k_in^2 rows (k_in ~ 10-100 — the
    algorithm's own quadratic-in-k cost, not a corpus blowup); the k
    greedy rounds run over those tiny frames, localCheckpointed once
    so the round loop doesn't re-evaluate the upstream fusion per
    round."""
    # candidate-bounded frames. The INITIAL checkpoints are plain
    # (AQE-on): the adaptive plan already coalesces them to ~1
    # partition, while an explicit coalesce(1) here would collapse
    # the UPSTREAM fusion's final stage to one task (measured: q199's
    # materialization 2.8 -> 4.2 s warm). The greedy-round unions
    # below keep coalesce(1) — they read already-checkpointed 1-task
    # frames, so the collapse is free and keeps rounds 1-task
    # (round-12: the rounds were scheduling-overhead-bound).
    cand = candidates.select(
        "query_doc", id_col, "rrf_ppm"
    ).localCheckpoint(eager=True)
    # ``sims`` (OPTIMIZATION_r13, VERDICT r12 #6): a caller that also
    # reads the pairwise-similarity relation (q231's diversity
    # readout) passes its own materialized copy so the corpus word
    # scan underneath candidate_pair_sims runs once, not once per
    # consumer. Must hold candidate_pair_sims(df, candidates) —
    # same contract, same rows.
    if sims is None:
        sims = candidate_pair_sims(df, cand, text_col, id_col).localCheckpoint(
            eager=True
        )
    wrel = F.lit(w_rel).cast("long")
    wred = F.lit(w_red).cast("long")
    from pyspark.sql import Window

    w1 = Window.partitionBy("query_doc").orderBy(
        F.desc("rrf_ppm"), F.asc(id_col)
    )
    sel = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") == 1)
        .select(
            "query_doc",
            id_col,
            F.lit(1).cast("int").alias("mmr_rank"),
            (wrel * F.col("rrf_ppm")).cast("long").alias("mmr_score"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    for r in range(2, k + 1):
        rem = cand.join(
            sel.select("query_doc", id_col), ["query_doc", id_col], "left_anti"
        )
        red = (
            sims.join(
                sel.select(
                    "query_doc", F.col(id_col).alias("__j")
                ),
                ["query_doc", "__j"],
            )
            .groupBy("query_doc", F.col("__i").alias(id_col))
            .agg(F.max("sim_ppm").alias("__red"))
        )
        scored = rem.join(red, ["query_doc", id_col], "left").select(
            "query_doc",
            id_col,
            (
                wrel * F.col("rrf_ppm")
                - wred * F.coalesce("__red", F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("mmr_score"),
        )
        wr = Window.partitionBy("query_doc").orderBy(
            F.desc("mmr_score"), F.asc(id_col)
        )
        pick = (
            scored.withColumn("__rn", F.row_number().over(wr))
            .where(F.col("__rn") == 1)
            .select(
                "query_doc",
                id_col,
                F.lit(r).cast("int").alias("mmr_rank"),
                "mmr_score",
            )
        )
        sel = sel.unionByName(pick).coalesce(1).localCheckpoint(eager=True)
    return sel


# 1e6 / log2(rank + 1), truncated to exact integer ppm — the ONE
# float-derived table in the graded eval, frozen as literals so Spark
# and the DuckDB oracle share identical discounts (the q68/q147
# no-libm-in-the-comparison move applied to nDCG). Extended to 10
# ranks for the cascade-leg readout (q235, top-10 lists); q229's
# retrieval readout keeps using the first 5.
NDCG_DISC_PPM = (
    1_000_000, 630_929, 500_000, 430_676, 386_852,
    356_207, 333_333, 315_464, 301_029, 289_064,
)


def graded_ndcg_at_k(
    lists: DataFrame,
    truth: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    retrievers: "list[str] | tuple[str, ...] | None" = None,
) -> DataFrame:
    """Graded-relevance nDCG@k over ranked retrieval lists — the
    relevance-dashboard number (Jarvelin & Kekalainen 2002) the
    binary hits@k/MRR readouts (q204/q218) cannot see: a retriever
    that finds the MOST relevant doc at rank 1 beats one that finds
    the 5th-most-relevant there. ``lists`` is (retriever, query_doc,
    id, rank); ``truth`` is (query_doc, id, truth_rank) — the graded
    gold list (doc_jaccard_topk(include_rank=True)). gain = k+1 -
    truth_rank (top truth doc k, last 1, non-truth 0); discount =
    the frozen integer-ppm table NDCG_DISC_PPM; DCG/IDCG are exact
    int64 sums and ndcg_ppm = 1e6 * DCG div IDCG is ONE truncating
    integer division — the whole readout replays bit-for-bit on any
    engine. IDCG derives per query from its actual truth size, so
    short gold lists stay correct. Scale: one broadcast join of the
    |queries| x k lists against the k-row-per-query truth; grid =
    retrievers x queries so zero-hit rows read 0, not absent."""
    if k > len(NDCG_DISC_PPM):
        raise ValueError(
            f"graded_ndcg_at_k: k={k} exceeds the frozen discount "
            f"table ({len(NDCG_DISC_PPM)} ranks) — extend NDCG_DISC_PPM "
            "and its oracle twin together"
        )
    disc_arr = F.array(*[F.lit(d).cast("long") for d in NDCG_DISC_PPM[:k]])
    gain = (F.lit(k + 1).cast("long") - F.col("truth_rank").cast("long"))
    dcg = (
        lists.where(F.col("rank") <= k)
        # ADVICE r11: filter the TRUTH side by truth_rank <= k too
        # (mirroring the IDCG leg) — a truth frame built with a larger
        # k than the readout's would otherwise contribute NEGATIVE
        # gains (k+1 - truth_rank < 0) that subtract from DCG instead
        # of reading 0.
        .join(
            F.broadcast(truth.where(F.col("truth_rank") <= k)),
            ["query_doc", id_col],
        )
        .select(
            "retriever",
            "query_doc",
            (gain * F.element_at(disc_arr, F.col("rank").cast("int"))).alias(
                "__term"
            ),
        )
        .groupBy("retriever", "query_doc")
        .agg(F.sum("__term").alias("dcg_ppm"))
    )
    idcg = (
        truth.where(F.col("truth_rank") <= k)
        .select(
            "query_doc",
            (
                gain
                * F.element_at(disc_arr, F.col("truth_rank").cast("int"))
            ).alias("__term"),
        )
        .groupBy("query_doc")
        .agg(F.sum("__term").alias("idcg_ppm"))
    )
    # The zero-fill grid needs only the DISTINCT retriever tags, but
    # deriving them from ``lists`` re-inlines the whole lists subtree
    # (for the ablation queries: every retriever leg again) just to
    # read back the literal tags the caller attached. Callers that
    # tag legs with literals pass them via ``retrievers`` and the
    # grid side becomes a local relation — round-12 optimization,
    # guide §2.4 (remove recompute); the result is identical provided
    # the list equals the actual distinct tag set (each caller's legs
    # are non-empty top-k lists by construction, re-proven against
    # the oracles).
    if retrievers is not None:
        rdf = lists.sparkSession.createDataFrame(
            [(r,) for r in retrievers], "retriever string"
        )
    else:
        rdf = lists.select("retriever").distinct()
    grid = rdf.crossJoin(F.broadcast(truth.select("query_doc").distinct()))
    return (
        grid.join(F.broadcast(idcg), "query_doc")
        .join(F.broadcast(dcg), ["retriever", "query_doc"], "left")
        .select(
            "retriever",
            "query_doc",
            F.coalesce("dcg_ppm", F.lit(0).cast("long")).alias("dcg_ppm"),
            "idcg_ppm",
        )
        .withColumn(
            "ndcg_ppm",
            F.expr("CAST(1000000 * dcg_ppm div idcg_ppm AS BIGINT)"),
        )
    )


def intralist_diversity(
    lists: DataFrame,
    sims: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean pairwise dissimilarity of each ranked list — the
    diversity half of the relevance/diversity tradeoff readout:
    diversity_ppm = 1e6 - (sum of pairwise sim_ppm over the list's
    ordered pairs) div n_pairs, exact integers throughout. ``lists``
    is (retriever, query_doc, id, rank); ``sims`` is
    candidate_pair_sims' output covering the lists' docs."""
    a = lists.select("retriever", "query_doc", F.col(id_col).alias("__i"))
    b = lists.select("retriever", "query_doc", F.col(id_col).alias("__j"))
    pairs = a.join(b, ["retriever", "query_doc"]).where(
        F.col("__i") != F.col("__j")
    )
    joined = pairs.join(
        F.broadcast(sims), ["query_doc", "__i", "__j"], "left"
    )
    return (
        joined.groupBy("retriever", "query_doc")
        .agg(
            F.sum(F.coalesce("sim_ppm", F.lit(0).cast("long"))).alias(
                "__sum"
            ),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "retriever",
            "query_doc",
            F.expr("CAST(1000000 - (__sum div __n) AS BIGINT)").alias(
                "diversity_ppm"
            ),
        )
    )


def _term_grams(term: Column, n: int = 3) -> Column:
    """Boundary-padded character n-grams of one term ('#term#' -> all
    length-n windows) — the subword unit the late-interaction term
    embedding hashes. Padding guarantees >= 1 gram for any non-empty
    term; boundary grams make prefixes/suffixes count."""
    p = F.concat(F.lit("#"), term, F.lit("#"))
    return F.transform(
        F.sequence(F.lit(1), F.length(p) - (n - 1)),
        lambda i: F.substring(p, i, F.lit(n)),
    )


def term_hash_embed(
    terms: DataFrame, term_col: str = "term", n_features: int = 32, n: int = 3
) -> Column | DataFrame:
    """One signed-count hash vector per TERM from its boundary-padded
    char n-grams (features._signed_count_vec over _term_grams) — the
    model-free late-interaction embedding: terms sharing surface
    n-grams ('recommendation'/'recommendations') get correlated
    vectors, unrelated terms decorrelate. Map-side, exact int64,
    engine-replayable (the q32/q199 md5 slot/sign recipe applied one
    level down, at the subword grain)."""
    from .features import _signed_count_vec

    return terms.withColumn(
        "__tvec", _signed_count_vec(_term_grams(F.col(term_col), n), n_features)
    )


def maxsim_rerank(
    docs: DataFrame,
    shortlist: DataFrame,
    k: int = 5,
    n_features: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim rerank over a bounded
    first-stage shortlist (Khattab & Zaharia 2020, the scoring rule
    only — token embeddings here are model-free char-n-gram hash
    vectors, so the WHOLE readout is exact int64 and oracle-checkable):

        score(q, d) = sum over distinct q terms of
                      max over distinct d terms of  dot(E(t), E(u))

    Every query term finds its best-matching document term — partial
    surface matches ('recommender' ~ 'recommendation') contribute
    where the BM25 exact-term channel reads 0, which is the classic
    late-interaction win re-expressed at the subword-hash grain.
    Unnormalized dot by design: int64-exact end to end (a cosine
    would put one sqrt per term pair inside the max).

    Scale contract: the candidate set is the SHORTLIST (|queries| x
    k_first rows, broadcast), never the corpus — the term-pair
    blowup is |shortlist| x |q terms| x |d terms|, the bounded
    rerank-stage cost every late-interaction deployment pays, while
    the corpus-wide stage stays BM25/dense top-k. Term vectors are
    built map-side per (doc, term) — no vocabulary table, no joins
    to fetch embeddings. Returns (query_doc, id, maxsim_score,
    rank<=k)."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda w: w != "",
            )
        ).alias("term"),
    ).distinct()
    return maxsim_from_words(
        words, shortlist, k=k, n_features=n_features, n=n, id_col=id_col
    )


def maxsim_from_words(
    words: DataFrame,
    shortlist: DataFrame,
    k: int = 5,
    n_features: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """maxsim_rerank's scoring core over a MATERIALIZED (id, term)
    relation — which is exactly what the streaming postings store
    already holds (``term`` column of streaming/postings.py), so the
    late-interaction rerank serves from the persisted index with the
    raw text never rescanned at query time: the q185 stored-index
    contract extended to the subword-matching leg (q241 twins this
    against q240's from-text answer). The char-n-gram term vectors
    are a pure per-row function of the term string, so deriving them
    at read time from stored terms equals deriving them at ingest —
    no new state to maintain."""
    from .topk import top_k_per_group
    qt = term_hash_embed(
        words.join(
            F.broadcast(shortlist.select("query_doc").distinct()),
            words[id_col] == F.col("query_doc"),
        ).select("query_doc", "term"),
        n_features=n_features,
        n=n,
    ).select("query_doc", F.col("term").alias("__qt"), F.col("__tvec").alias("__qv"))
    dt = term_hash_embed(
        words.join(
            F.broadcast(shortlist.select(id_col).distinct()), id_col
        ).select(id_col, "term"),
        n_features=n_features,
        n=n,
    ).select(id_col, F.col("term").alias("__dt"), F.col("__tvec").alias("__dv"))
    lit0 = F.lit(0).cast("long")
    dot_i = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__dv"), lambda x, y: x * y),
        lit0,
        lambda acc, v: acc + v,
    )
    pairs = (
        dt.join(F.broadcast(shortlist.select("query_doc", id_col)), id_col)
        .join(F.broadcast(qt), "query_doc")
        .select("query_doc", id_col, "__qt", dot_i.alias("__dot"))
    )
    best = pairs.groupBy("query_doc", id_col, "__qt").agg(
        F.max("__dot").alias("__best")
    )
    scored = best.groupBy("query_doc", id_col).agg(
        F.sum("__best").cast("long").alias("maxsim_score")
    )
    return top_k_per_group(
        scored,
        k,
        ["query_doc"],
        F.col("maxsim_score").desc(),
        F.col(id_col).asc(),
        rank_col="rank",
    ).select("query_doc", id_col, "maxsim_score", F.col("rank").cast("int").alias("rank"))


def team_draft_interleave(
    list_a: DataFrame,
    list_b: DataFrame,
    k: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Team-draft interleaving (Radlinski, Kurup & Joachims 2008) —
    the ONLINE-eval merge that lets two rankers share one result list
    and be compared by which team's contributions get engaged with.
    Deterministic variant: strict A-first alternation replaces the
    per-round coin flip (divergence documented — the attribution
    arithmetic is unchanged, and determinism is what makes the
    readout oracle-checkable); each team in its turn contributes its
    highest-ranked doc not already selected. ``list_a``/``list_b``
    are (query_doc, id, rank); both must rank at least ``k`` docs per
    query (the pick loop assumes availability — interleave two top-10
    lists to depth 6, not two top-3 lists to depth 10). Returns
    (query_doc, id, pos 1..k, team 'A'|'B').

    Scale: the greedy pick loop is the q227 MMR shape — k bounded
    rounds over candidate-bounded rows, each an eager
    localCheckpoint (construction-charged: bench ITERATIVE tier);
    at serving time k and |queries| are small by contract."""
    from pyspark.sql import Window

    a = list_a.select(
        "query_doc", id_col, F.col("rank").cast("long").alias("__ra")
    )
    b = list_b.select(
        "query_doc", id_col, F.col("rank").cast("long").alias("__rb")
    )
    # plain (AQE-on) checkpoint: AQE already coalesces this
    # candidate-bounded frame to ~1 partition, while an explicit
    # coalesce(1) would collapse the upstream retriever legs' final
    # stage to one task (the q199/q231 lesson, OPTIMIZATION_r13)
    cand = a.join(b, ["query_doc", id_col], "full_outer").localCheckpoint(
        eager=True
    )
    sel = None
    for p in range(1, k + 1):
        team = "A" if p % 2 == 1 else "B"
        rcol = "__ra" if team == "A" else "__rb"
        avail = cand.where(F.col(rcol).isNotNull())
        if sel is not None:
            avail = avail.join(
                sel.select("query_doc", id_col),
                ["query_doc", id_col],
                "left_anti",
            )
        w = Window.partitionBy("query_doc").orderBy(
            F.asc(rcol), F.asc(id_col)
        )
        pick = (
            avail.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "query_doc",
                id_col,
                F.lit(p).cast("int").alias("pos"),
                F.lit(team).alias("team"),
            )
        )
        sel = (
            pick
            if sel is None
            else sel.unionByName(pick).coalesce(1).localCheckpoint(eager=True)
        )
    return sel


def interleaved_credit(
    interleaved: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The interleaving readout: simulated clicks = truth membership
    (the user engages with every relevant doc present in the
    interleaved list), credited to the team that CONTRIBUTED the doc;
    per query: clicks_a, clicks_b, winner 'A'|'B'|'tie' (zero-click
    queries read tie, not absent). Exact integer counts — one
    broadcast truth join + one per-query aggregate."""
    j = interleaved.join(
        F.broadcast(truth.select("query_doc", id_col)),
        ["query_doc", id_col],
    )
    clicks = j.groupBy("query_doc").agg(
        F.sum(F.when(F.col("team") == "A", 1).otherwise(0))
        .cast("long")
        .alias("clicks_a"),
        F.sum(F.when(F.col("team") == "B", 1).otherwise(0))
        .cast("long")
        .alias("clicks_b"),
    )
    grid = interleaved.select("query_doc").distinct()
    ca = F.coalesce("clicks_a", F.lit(0).cast("long"))
    cb = F.coalesce("clicks_b", F.lit(0).cast("long"))
    return grid.join(clicks, "query_doc", "left").select(
        "query_doc",
        ca.alias("clicks_a"),
        cb.alias("clicks_b"),
        F.when(ca > cb, F.lit("A"))
        .when(cb > ca, F.lit("B"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )
