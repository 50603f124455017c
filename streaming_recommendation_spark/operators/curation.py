"""Corpus-curation operators a 100 TB training-data pipeline needs
beyond dedup/quality: eval-set decontamination, repetition filters,
domain-quota balancing, context-window chunking, sequence packing.

The reference has no corpus leg (its data layer is events/ratings —
reference: data_processing/generate_training_data.py), so these are
engine-native additions in the same style as operators/text.py and
operators/dedup.py: declarative DataFrame plans, cross-engine
deterministic hashing (functions/hashing.py), no Python in the hot
path.

Scale notes per operator are in the docstrings; the common theme is
that every shuffle keys on (doc, gram) or source — never a global
ordering, never an all-pairs join — and the benchmark side of
decontamination broadcasts (eval sets are MBs; the corpus is the
100 TB side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import det_hash_str, det_unit
from .dedup import normalize_text, shingle_table, word_shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Flag training documents that share word n-grams with a held-out
    benchmark/eval set (the standard GPT-3/PaLM-style contamination
    check: any n-gram collision taints the doc).

    Returns (id, n_ngrams, n_hits, hit_ratio, contaminated) where
    n_ngrams counts the doc's DISTINCT n-grams and n_hits how many of
    them occur anywhere in the benchmark.

    Scale shape: the benchmark n-gram set is tiny next to the corpus
    (eval suites are MBs against 100 TB), so it is deduped and
    BROADCAST — the corpus side never shuffles for the probe; its only
    shuffle is the per-doc distinct on (doc, gram). A left join + agg
    keeps unontaminated docs in the output (an inner join would drop
    exactly the rows a filter needs to keep).
    """
    grams = shingle_table(corpus, text_col, id_col, n)
    bench = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        grams.join(F.broadcast(bench), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_ngrams"), 6).alias("hit_ratio"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_word_ratio: float = 0.2,
    max_dup_bigram_ratio: float = 0.7,
) -> DataFrame:
    """Gopher-style repetition filters: per-document top-word fraction,
    type-token ratio, and duplicate-bigram fraction, plus a keep flag
    under the given thresholds.

    Shape: two wordcount-style pipelines (words and bigrams), each
    explode -> (doc, gram) count -> per-doc agg, joined on doc. Every
    shuffle keys on (doc, gram) or doc — partial aggregation collapses
    the explode before the exchange, and no array_distinct O(len^2)
    per-row scans (measured in BASELINE.md: the explode+distinct shape
    beats array_distinct 3x on long docs).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).where(F.col("w") != "")
    wstats = (
        words.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_words"),
            F.count(F.lit(1)).alias("n_types"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    bigrams = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), 2)).alias("g"),
    )
    bstats = (
        bigrams.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_uniq_bigrams"),
        )
    )
    top_ratio = F.round(F.col("top_cnt") / F.col("n_words"), 6)
    ttr = F.round(F.col("n_types") / F.col("n_words"), 6)
    dup_ratio = F.round(1 - F.col("n_uniq_bigrams") / F.col("n_bigrams"), 6)
    return (
        wstats.join(bstats, id_col)
        .select(
            id_col,
            F.col("n_words"),
            top_ratio.alias("top_word_ratio"),
            ttr.alias("type_token_ratio"),
            dup_ratio.alias("dup_bigram_ratio"),
        )
        .withColumn(
            "keep",
            (F.col("top_word_ratio") <= max_top_word_ratio)
            & (F.col("dup_bigram_ratio") <= max_dup_bigram_ratio),
        )
    )


def domain_quota_sample(
    df: DataFrame,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap every domain at ``quota`` documents, picked by deterministic
    hash rank (domain balancing for training mixes — stops one crawl
    domain from dominating the batch composition).

    One hash-partitioned window per domain; rank <= quota compiles to
    WindowGroupLimit, so each partition keeps a bounded heap instead
    of fully sorting (the same plan shape q03 pins). Deterministic:
    the hash order is a pure function of the key, so reruns and the
    oracle pick identical docs.
    """
    w = Window.partitionBy(domain_col).orderBy(
        det_unit(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= quota)
        .select(id_col, domain_col, "rk")
    )


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    (context-window chunking for LLM pretraining: window tokens per
    sample, stride < window gives window-stride tokens of overlap).

    Chunk starts are 1, 1+stride, 1+2*stride, … while they still
    introduce new tokens; the final chunk may be short. Emits
    (id, chunk_idx, n_chunk_tokens, chunk_hash) — the md5 chunk hash
    is the cross-engine checksum of the exact token slice, so the
    oracle verifies content without hauling full text through the
    comparator.

    Map-side only: sequence + transform + posexplode inside one
    projection — a 100 TB chunking pass costs exactly one scan, no
    shuffle, and parallelism is row-level.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    # smallest c >= 1 with 1 + (c-1)*stride + window > n  (ceil div)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(window) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        + F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * stride + 1, window)),
    )
    return df.select(F.col(id_col), F.posexplode(chunks)).select(
        F.col(id_col),
        F.col("pos").alias("chunk_idx"),
        F.size(F.split(F.col("col"), " ")).alias("n_chunk_tokens"),
        F.md5(F.col("col")).alias("chunk_hash"),
    )


def pack_sequences(
    df: DataFrame,
    context_len: int = 2048,
    token_col: str = "n_tokens",
    domain_col: str = "source",
    id_col: str = "doc_id",
    extra_sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign documents to fixed-budget training bins by cumulative
    token count (the streaming approximation of first-fit sequence
    packing): within each domain, order docs by deterministic hash,
    run a cumulative token sum, and cut a new bin every time the
    running total crosses a multiple of context_len.

    bin_id = floor((cumsum - n_tokens) / context_len) — i.e. the bin a
    doc STARTS in; a doc straddling a boundary still lands in one bin
    (real packers split or pad; the binning decision is the
    distributed part, the intra-bin concat is embarrassingly local).

    Scale shape: the window partitions by domain — no global sort, no
    single-partition stage; each domain's packing is an independent
    linear pass, which is how a 1000-executor run shards. Returns the
    per-bin manifest (domain, bin_id, n_docs, bin_tokens);
    ``extra_sum_cols`` adds per-bin long sums of the named columns
    (e.g. raw word counts riding next to the packing token count —
    the q183 composition) as ``bin_<col>``.
    """
    w = (
        Window.partitionBy(domain_col)
        .orderBy(det_unit(id_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col).cast("long")
    binned = df.withColumn("_cum", F.sum(toks).over(w)).withColumn(
        "bin_id", F.floor((F.col("_cum") - toks) / F.lit(context_len))
    )
    return binned.groupBy(domain_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("bin_tokens"),
        *[
            F.sum(F.col(c).cast("long")).alias(f"bin_{c}")
            for c in extra_sum_cols
        ],
    )


BLOOM_BITS = 1 << 16  # default filter size (bits)
BLOOM_HASHES = 3
BLOOM_WORD = 62  # usable bits per int64 word — the sign and top bit
#                  never carry filter state, so 1 << (pos % 62) stays
#                  positive on every engine (no signed-shift wrap)


def _bloom_positions(shingle, k: int = BLOOM_HASHES, m_bits: int = BLOOM_BITS):
    """k deterministic bit positions for a shingle: salted md5 hashes
    mod m_bits — replayable in any SQL engine."""
    return [
        det_hash_str(F.concat(shingle, F.lit(f"#{i}"))) % F.lit(m_bits)
        for i in range(k)
    ]


def bloom_bitmap(
    grams: DataFrame,
    gram_col: str = "shingle",
    k: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Bloom filter of a gram set as (word, bits) int64 rows:
    word = pos div 62, bits = bit_or of 1 << (pos mod 62).
    ``m_bits`` bits cost m_bits/62 rows ~ kilobytes per million
    grams — always broadcastable."""
    pos = F.explode(F.array(*_bloom_positions(F.col(gram_col), k, m_bits)))
    return (
        grams.select(pos.alias("__pos"))
        .select(
            F.expr(f"__pos div {BLOOM_WORD}").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {BLOOM_WORD} AS INT))").alias(
                "__mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """:func:`decontaminate` behind a BLOOM PREFILTER — the shape for
    when the reference set's n-grams are too large to broadcast raw
    (cross-corpus fuzzy dedup, web-scale blocklists): broadcast the
    m_bits/62-word bitmap instead, probe every corpus gram map-side
    (k integer hashes + a bitmap AND — no shuffle, no join against
    the raw set), and send ONLY bloom-positive candidates into the
    exact verification join. Bloom false positives cannot leak into
    the verdict — verification is exact; they only cost verify-join
    traffic, and the false-positive count is reported per doc so the
    m/k sizing can be audited (q119).

    Returns (id, n_ngrams, n_candidates, n_hits, n_false_positives,
    contaminated) — n_hits/contaminated match :func:`decontaminate`
    exactly on the same inputs (asserted in tests).

    Every probe is integer arithmetic on md5-derived positions, so
    the oracle replays bitmap construction AND probe bit-for-bit.
    """
    grams = shingle_table(corpus, text_col, id_col, n)
    bench = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    bitmap = bloom_bitmap(bench, "shingle", k, m_bits)
    probe = grams
    for i, pos in enumerate(_bloom_positions(F.col("shingle"), k, m_bits)):
        w = F.expr(f"__p{i} div {BLOOM_WORD}")
        m = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % {BLOOM_WORD} AS INT))")
        probe = (
            probe.withColumn(f"__p{i}", pos)
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
                    )
                ),
                w == F.col(f"__w{i}"),
                "left",
            )
            .withColumn(
                f"__pass{i}",
                (F.coalesce(F.col(f"__b{i}"), F.lit(0)).bitwiseAND(m) != 0),
            )
            .drop(f"__p{i}", f"__w{i}", f"__b{i}")
        )
    all_pass = F.lit(True)
    for i in range(k):
        all_pass = all_pass & F.col(f"__pass{i}")
    probed = probe.withColumn("__cand", all_pass).drop(
        *[f"__pass{i}" for i in range(k)]
    )
    stats = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.col("__cand").cast("int")).alias("n_candidates"),
    )
    # exact verification sees ONLY bloom-positive candidates — the
    # whole point of the prefilter; no false negatives exist, so the
    # inner join loses nothing
    hits = (
        probed.where(F.col("__cand"))
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__nh"))
    )
    return (
        stats.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("__nh"), F.lit(0)).cast("long"))
        .select(
            id_col,
            "n_ngrams",
            "n_candidates",
            "n_hits",
            (F.col("n_candidates") - F.col("n_hits")).alias("n_false_positives"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


# "Learned" quality-model coefficients in exact milli units (w = W/1000):
# a logistic-regression-style linear scorer over the q34 quality
# features, standing in for the fastText quality classifier production
# pipelines gate on (torch is absent in this environment; the swap
# point is these literals — a trained model exports its coefficients
# here and the plan is unchanged). Signs encode the curation prior:
# punctuation-dense docs score down, stopword-bearing (real-language)
# docs score up, length credits cap at 20 tokens.
QUALITY_MODEL_MILLI = {
    "bias": -500,  # -0.5
    "punct_ratio": -4000,  # -4.0 per unit punct/char
    "stop_ratio": 2000,  # +2.0 per unit stopwords/token
    "len_capped": 50,  # +0.05 per token up to 20
}


def model_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights_milli: dict[str, int] | None = None,
    threshold_milli: int = 500,
) -> DataFrame:
    """Model-scored quality gate (VERDICT r8 #4): score every document
    with a linear model over the q34 quality features and keep docs
    whose score clears the threshold — the learned-filter complement
    to the heuristic (q32-q34) and Gopher (q89/q90) rule filters.

    The score is sigmoid-monotone, so the filter decision never
    computes the sigmoid: with integer milli-weights W and features
    punct_ratio = P/C, stop_ratio = SW/T, len_capped = least(T0, 20),

        z * 1000 * C * T = W_b*C*T + W_p*P*T + W_s*SW*C + W_l*L*C*T

    every term an exact decimal(38,0) product (C = greatest(chars,1),
    T = greatest(tokens,1) — both positive), so `kept` is ONE exact
    integer comparison  S >= threshold_milli * C * T  (threshold =
    threshold_milli/1000 on the z scale) and the reported score is
    ONE IEEE division S / (1000*C*T) — any engine replays both
    bit-for-bit (the q147 BM25 rational-scoring recipe). Past ~1e38
    a product would be NULL with ANSI off (documents >> 1e15 chars —
    unreachable); bound noted for parity with encode_from_counts.

    Returns (id, score, kept) for EVERY document — the score column
    is the distribution read (histogram it with q117's machinery),
    kept the filter verdict. Scale: one map-side projection over the
    scan, no shuffle, no UDF."""
    from .text import STOPWORDS, tokens

    w = {**QUALITY_MODEL_MILLI, **(weights_milli or {})}
    text = F.col(text_col)
    dec = "decimal(38,0)"
    t0 = F.size(tokens(text))
    c_raw = F.length(text)
    p = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    all_stop = [s for ws in STOPWORDS.values() for s in ws]
    sw = F.size(
        F.filter(F.split(normalize_text(text), " "), lambda x: x.isin(*all_stop))
    )
    C = F.greatest(c_raw, F.lit(1)).cast(dec)
    T = F.greatest(t0, F.lit(1)).cast(dec)
    L = F.least(t0, F.lit(20)).cast(dec)
    s_num = (
        F.lit(int(w["bias"])).cast(dec) * C * T
        + F.lit(int(w["punct_ratio"])).cast(dec) * p.cast(dec) * T
        + F.lit(int(w["stop_ratio"])).cast(dec) * sw.cast(dec) * C
        + F.lit(int(w["len_capped"])).cast(dec) * L * C * T
    )
    s_den = F.lit(1000).cast(dec) * C * T
    return df.select(
        F.col(id_col),
        F.round(s_num.cast("double") / s_den.cast("double"), 6).alias("score"),
        F.when(
            s_num >= F.lit(int(threshold_milli)).cast(dec) * C * T, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("kept"),
    )


def passage_dedup(
    df: DataFrame,
    window: int = 16,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus PASSAGE-level exact dedup with per-document
    reconstruction manifest — the CCNet/RefinedWeb line-dedup move at
    a granularity BELOW the document: boilerplate passages repeated
    across (or within) documents are dropped everywhere except their
    first occurrence, while the unique remainder of each document
    survives. Document-level dedup (q31/q175) keeps or kills whole
    docs; this recovers the partial value of documents that share
    only SOME content.

    Passages are the non-overlapping ``window``-token chunks of
    :func:`chunk_documents` (this corpus has no newline structure, so
    fixed token windows stand in for paragraphs; on real text pass
    the paragraph split upstream and window=stride=1 paragraph). The
    corpus-wide FIRST occurrence of a passage hash — ordered by
    (doc_id, chunk_idx), a total order — is kept; every later copy is
    dropped, including later copies inside the same document
    (intra-doc repetition is removed too, the Gopher dup-line
    semantic).

    Returns the per-document reconstruction manifest
    (id, n_passages, n_dup_passages, n_tokens_total, n_tokens_kept):
    the packer/quota stages downstream consume kept token counts, and
    reconstruction itself (concat of kept chunks in chunk_idx order)
    is embarrassingly local. Scale shape: one chunk_hash-keyed window
    (groups = duplicate families, bounded by real duplication) + one
    per-doc groupBy — no all-pairs, no global sort; the chunking is
    map-side (q92).
    """
    ch = chunk_documents(
        df, window=window, stride=stride, text_col=text_col, id_col=id_col
    )
    w = Window.partitionBy("chunk_hash").orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    flagged = ch.withColumn("__rn", F.row_number().over(w))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum((F.col("__rn") > 1).cast("long")).alias("n_dup_passages"),
        F.sum(F.col("n_chunk_tokens").cast("long")).alias("n_tokens_total"),
        F.sum(
            F.when(F.col("__rn") == 1, F.col("n_chunk_tokens").cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("n_tokens_kept"),
    )


def chunk_word_sets(
    df: DataFrame,
    window: int = 32,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, word): the DISTINCT words of every chunk under
    the :func:`chunk_documents` boundary recipe — the exact
    set-overlap side of retrieval evaluation (q194): ground-truth
    chunk similarity is set Jaccard over these rows, computed with a
    word equi-join, never a pairwise text comparison. One map-side
    chunk/explode projection + one distinct."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(window) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        + F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(words, i * stride + 1, window),
    )
    ex = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__cw"))
    return (
        ex.select(F.col(id_col), F.col("chunk_idx"), F.explode("__cw").alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )


def cdc_passage_dedup(
    df: DataFrame,
    divisor: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined-chunking passage dedup — the alignment-proof
    sibling of :func:`passage_dedup`: fixed windows miss a duplicated
    passage whose copy sits at a different word OFFSET (insert one
    word before it and every aligned window shifts), which is exactly
    how boilerplate appears in crawled text. CDC (the storage-dedup
    move: Rabin/gear chunking, here on the word stream) cuts a
    segment boundary wherever ``word_hash % divisor == 0`` — the
    boundary decision depends only on LOCAL content, so a shared
    passage produces the SAME segments at any offset, and copies
    collide by content hash wherever they sit. Mean segment length
    ~``divisor`` words (geometric; no min/max clamp — the textbook
    refinement — so the boundary rule stays a pure per-word
    predicate).

    Same manifest contract as passage_dedup (corpus-wide first
    occurrence by the (doc, segment) total order survives; intra-doc
    repeats drop). Scale shape: one doc-keyed window for the running
    boundary count (each doc's segmentation is an independent linear
    pass — how 1000 executors shard it), one (doc, seg) groupBy, one
    segment-hash window, one per-doc groupBy. No all-pairs, no global
    sort; the per-word hash is the cross-engine md5-prefix recipe.
    """
    from .features import _word_hash

    words = F.split(normalize_text(F.col(text_col)), " ")
    ex = df.select(F.col(id_col), F.posexplode(words).alias("__pos", "__w"))
    boundary = (F.pmod(_word_hash(F.col("__w")), F.lit(divisor)) == 0).cast(
        "long"
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("__pos").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = ex.withColumn("__seg", F.sum(boundary).over(w))
    passages = seg.groupBy(id_col, "__seg").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
                    ),
                    lambda s: s["__w"],
                ),
            )
        ).alias("chunk_hash"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    fw = Window.partitionBy("chunk_hash").orderBy(
        F.col(id_col).asc(), F.col("__seg").asc()
    )
    flagged = passages.withColumn("__rn", F.row_number().over(fw))
    tok = F.col("n_tok").cast("long")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum((F.col("__rn") > 1).cast("long")).alias("n_dup_passages"),
        F.sum(tok).alias("n_tokens_total"),
        F.sum(F.when(F.col("__rn") == 1, tok).otherwise(F.lit(0).cast("long")))
        .alias("n_tokens_kept"),
    )
