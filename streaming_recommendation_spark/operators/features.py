"""Feature engineering for training matrices: the hashing trick and
smoothed target encoding — the two standard moves that turn raw
text/categorical columns into model inputs WITHOUT a fitted, stateful
vocabulary (the property that matters at 100 TB: both are pure
per-row/per-group computations, no dictionary to build, broadcast, or
version; Vowpal-Wabbit / scikit-learn HashingVectorizer and the
CatBoost-style category statistic respectively).

Determinism policy: the hash slot and sign derive from the same
md5-prefix word hash the fingerprint operator uses (cross-engine
proven); signed counts are exact int64 sums (signs are ±1 — integer
addition, order-free); the target-encode smoothing is ONE IEEE
division of exact int64 products (the textbook (pos + m*prior)/(cnt
+ m) rewritten over a common denominator so no float intermediate
exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_hash(col):
    # md5-prefix word hash — the same cross-engine-stable form
    # operators/text.py::fingerprint uses (DuckDB mirror:
    # ('0x' || substr(md5(w), 1, 8))::BIGINT)
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def feature_hash(
    df: DataFrame,
    n_features: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick bag-of-words: (id, slot, value) sparse rows where
    ``slot = word_hash mod n_features`` and ``value`` is the SIGNED
    token count (sign = ±1 from the hash bit above the slot bits —
    the Weinberger et al. trick that makes hash collisions cancel in
    expectation instead of biasing counts upward). Tokens are the
    fingerprint normalization: lowercased, whitespace-collapsed,
    space-split. Rows whose signed counts cancel to exactly 0 are
    dropped — in sparse form a zero is indistinguishable from absent,
    and emitting it would make the output depend on collision
    layout twice.

    Scale shape: explode + one groupBy(id, slot) with map-side
    partial aggregation — tokens reduce to <= n_features rows per
    document before the shuffle; no vocabulary is built, broadcast,
    or versioned (THE reason this beats dictionary encoding for
    open-vocabulary text at 100 TB)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    tok = F.explode(F.split(norm, " ")).alias("__w")
    h = _word_hash(F.col("__w"))
    return (
        df.select(F.col(id_col), tok)
        .where(F.col("__w") != "")
        .select(
            id_col,
            F.pmod(h, F.lit(n_features)).cast("int").alias("slot"),
            # sign bit: the lowest bit ABOVE the slot's modulus range
            F.when(
                F.pmod(F.floor(h / n_features), F.lit(2)) == 0, F.lit(1)
            )
            .otherwise(F.lit(-1))
            .alias("__sign"),
        )
        .groupBy(id_col, "slot")
        .agg(F.sum("__sign").alias("value"))
        .where(F.col("value") != 0)
    )


def category_counts(
    df: DataFrame,
    category_col: str,
    target_col,
) -> DataFrame:
    """(category, cnt, pos): per-category row and positive-target
    counts — target encoding's ENTIRE sufficient statistic, and an
    ADDITIVE one: two partial count tables merge by summing, so the
    encoding is maintainable incrementally (streaming/encode.py) and
    the q164 twin can fold arbitrary batch splits. ``target_col`` is
    a boolean Column. One groupBy(category) with map-side partials."""
    return df.groupBy(category_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(target_col.cast("long")).alias("pos"),
    )


def merge_category_counts(
    a: DataFrame, b: DataFrame, category_col: str
) -> DataFrame:
    """Fold two ``category_counts`` relations by per-category SUM —
    associative and commutative (but NOT idempotent: delivering the
    same EVENTS twice double-counts, the standard additive-state
    contract; same-batch retries are made safe by the versioned state
    layer, exactly as the CMS sketch does)."""
    return (
        a.unionByName(b)
        .groupBy(category_col)
        .agg(F.sum("cnt").alias("cnt"), F.sum("pos").alias("pos"))
    )


def encode_from_counts(
    counts: DataFrame,
    category_col: str,
    smoothing: int = 100,
) -> DataFrame:
    """The smoothed-encoding READ over a ``category_counts`` relation:
    (category, cnt, pos, enc) with

        enc = (pos + m * global_rate) / (cnt + m)
            = (pos * g_cnt + m * g_pos) / (g_cnt * (cnt + m))

    the second form is what runs: every product exact, ONE IEEE
    division total, so any engine replays the value bit-for-bit (no
    float prior is ever materialized). The operands are cast
    decimal(38,0) DIRECTLY (ADVICE r8 — explicit intent, not Spark's
    58->38 allowPrecisionLoss promotion) — NOT int64 — because at
    the corpus scale this module targets (g_cnt ~1e12, hot-category
    pos ~1e7) pos * g_cnt exceeds 2^63 and would silently wrap with
    ANSI off, while the DuckDB oracle's sum() is already HUGEINT
    (ADVICE r7); decimal 38 matches the oracle's int128 headroom
    (bound: |pos*g_cnt| < 1e38 — PAST that bound the product is NULL
    with ANSI off, dropping the row's enc rather than erroring), and
    both engines convert the exact integer to the nearest double
    before the single division. The global totals are a broadcast
    singleton (the only cross join); the output is the
    |categories|-row lookup table itself — built to be the broadcast
    side of the feature join that follows."""
    m = int(smoothing)
    totals = counts.agg(
        F.sum("cnt").alias("__g_cnt"), F.sum("pos").alias("__g_pos")
    )
    dec = "decimal(38,0)"
    num = (
        F.col("pos").cast(dec) * F.col("__g_cnt").cast(dec)
        + F.lit(m).cast(dec) * F.col("__g_pos").cast(dec)
    )
    den = F.col("__g_cnt").cast(dec) * (F.col("cnt") + F.lit(m)).cast(dec)
    return counts.crossJoin(F.broadcast(totals)).select(
        category_col,
        "cnt",
        "pos",
        (num.cast("double") / den.cast("double")).alias("enc"),
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col,
    smoothing: int = 100,
) -> DataFrame:
    """Smoothed target encoding: per category, the target rate shrunk
    toward the global rate by ``smoothing`` pseudo-observations — the
    one-shot composition of ``category_counts`` + ``encode_from_counts``
    (see those for exactness and scale shape; factored so the
    streaming twin replays the IDENTICAL operators per batch)."""
    return encode_from_counts(
        category_counts(df, category_col, target_col), category_col, smoothing
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 4096,
) -> DataFrame:
    """Exact covariance matrix of a vector column, the PCA/whitening
    prep pass: (i, j, cov) for every dimension pair, over embeddings
    QUANTIZED to integer units q = round(x * scale) (the q88
    half-away-from-zero round, cross-engine proven). The sums S_ij =
    sum(q_i * q_j), S_i = sum(q_i) are exact int64; cov is then the
    fixed expression S_ij/n - (S_i/n)(S_j/n) evaluated in double —
    identical IEEE operation trees replay identically, and keeping
    the division form (instead of the (n*S_ij - S_i*S_j) integer
    numerator) avoids int64 overflow at large n. Covariance is of
    the QUANTIZED values — a documented 1/scale-granularity
    approximation of the float covariance, the price of exact
    distributed summation (float sums reassociate).

    Scale shape: each row expands to its d^2 outer-product terms
    JVM-side (nested transform + flatten — never a self-join of the
    exploded form), and map-side partial aggregation reduces every
    partition to d^2 rows before the ONE shuffle; the d-row marginal
    sums broadcast onto the d^2 aggregate. Message volume is
    partitions x d^2, independent of row count. (An upper-triangle
    variant — d(d+1)/2 terms via per-row ``slice`` + a mirror union
    after the aggregate — was MEASURED SLOWER at sf0.1: 9.2 s vs
    7.3 s solo min-of-3; slice allocates a fresh array per outer dim
    and that churn costs more than the duplicate struct stream it
    saves. Keep the flat form unless a profiler says otherwise.)"""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(int(scale))).cast("long"),
    )

    # Round-12 optimization (guide §4.2): the d^2-struct-per-row
    # explode + hash aggregate spent the whole query interpreting
    # nested transforms (8M structs at sf0.1). The pair sums are
    # EXACT int64 and integer addition is order-free, so one
    # mapInArrow computing Q^T Q per batch (numpy int64 matmul —
    # exact, wrap-on-overflow identical to Spark long) yields
    # identical sums; each task emits d^2 partial rows, the one
    # shuffle aggregates partitions x d^2 rows exactly as before.
    # The QUANTIZATION stays in Catalyst (the q88 half-away-from-zero
    # round) so no float-rounding semantics cross the boundary.
    def _outer_sums(batches):
        import numpy as np
        import pyarrow as pa

        S = None
        for batch in batches:
            lst = batch.column(0)
            n = len(lst)
            if n == 0:
                continue
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            if len(flat) % n:
                raise ValueError("embedding_covariance: ragged vectors")
            Q = flat.reshape(n, len(flat) // n)
            S = Q.T @ Q if S is None else S + Q.T @ Q
        if S is not None:
            d = S.shape[0]
            idx = np.indices((d, d))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(idx[0].ravel(), type=pa.int32()),
                    pa.array(idx[1].ravel(), type=pa.int32()),
                    pa.array(S.ravel(), type=pa.int64()),
                ],
                names=["i", "j", "xy"],
            )

    pair_sums = (
        df.select(q.alias("__q"))
        .mapInArrow(_outer_sums, "i int, j int, xy long")
        .groupBy("i", "j")
        .agg(F.sum("xy").alias("__sxy"))
    )
    marg = (
        df.select(F.posexplode(q).alias("i", "__q"))
        .groupBy("i")
        .agg(F.sum("__q").alias("__s"))
    )
    # n rides as a broadcast singleton — no driver-side count action
    nf = df.agg(F.count(F.lit(1)).alias("__n"))
    n = F.col("__n").cast("double")
    return (
        pair_sums.crossJoin(F.broadcast(nf))
        .join(
            F.broadcast(marg.select(F.col("i"), F.col("__s").alias("__si"))), "i"
        )
        .join(
            F.broadcast(
                marg.select(F.col("i").alias("j"), F.col("__s").alias("__sj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("__sxy").cast("double") / n
                - (F.col("__si").cast("double") / n)
                * (F.col("__sj").cast("double") / n)
            ).alias("cov"),
        )
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 4096,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    DETERMINISTIC +-1 projection matrix: (id, j, y) where
    y_j = sum_i q_i * s_ij, q = round(x * scale) integer units (the
    q88 round) and s_ij = +-1 from the Knuth hash of the flat index
    i*out_dim + j — the Achlioptas sign matrix, which needs no
    stored/broadcast random state: any engine, retry, or oracle
    regenerates the identical matrix from the formula. Distances are
    preserved within the usual JL distortion; unlike SRP-LSH
    (similarity.py) the MAGNITUDES survive, so the output is a real
    lower-dimensional feature, not just a sign bucket. All sums are
    exact int64 (|y| <= d * scale * max|x| — integer addition
    reassociates freely across engines and partitions).

    Scale shape: the corpus explodes to (id, i, q_i) once and fans
    out by the broadcast ``out_dim``-row j frame (the only
    nested-loop join — out_dim rows at ANY corpus size); signs
    compute INLINE from the flat index i*out_dim + j, so no sign
    matrix is ever materialized, stored, or looked up (and no
    driver-side action is needed to learn d); one groupBy(id, j) sum
    with map-side partials re-assembles the projections. Never a
    vector-vector join."""
    from ..functions.hashing import KNUTH, MOD32

    spark = df.sparkSession
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(int(scale))).cast("long"),
    )
    exploded = df.select(F.col(id_col), F.posexplode(q).alias("i", "__q"))
    jf = spark.range(out_dim).select(F.col("id").cast("int").alias("j"))
    flat_id = F.col("i").cast("long") * out_dim + F.col("j")
    sign = (
        F.when(
            F.pmod(F.pmod(flat_id * F.lit(KNUTH), F.lit(MOD32)), F.lit(2)) == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
    )
    return (
        exploded.crossJoin(F.broadcast(jf))
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("__q") * sign).alias("y"))
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_buckets: int = 10,
    n_bins: int = 256,
) -> DataFrame:
    """Equi-depth feature discretization (quantile binning) — the
    GBDT/embedding-bucket prep pass: every row gets a ``bucket`` in
    1..n_buckets such that buckets carry ~equal row mass per group,
    computed from the MERGEABLE histogram sketch (metrics.py
    histogram_layout/bins — the q117 machinery) instead of a global
    sort: an exact ntile would single-partition each group's values,
    the classic scale-killer; here bucket boundaries are accurate to
    one sketch-bin width (n_bins >> n_buckets).

    Exactness: a row's sketch bin is the same per-scalar IEEE floor
    both engines compute (q117's pinned expression); the bin's bucket
    label is ceil(cum * n_buckets / n) in EXACT integer arithmetic —
    rows in one bin share a label, labels are monotone in the bin,
    and the whole assignment replays bit-for-bit in SQL. NULL values
    drop (histogram_bins' contract).

    Scale shape: layout + per-(group, bin) counts are two map-side
    combinable aggregates; the label table is <= n_bins rows per
    group (broadcast-size); row assignment is the layout join + one
    in-row expression + the label equi-join — the scan dominates."""
    from pyspark.sql import Window

    from .metrics import histogram_bins, histogram_layout

    k = int(n_buckets)
    layout = histogram_layout(df, value_col, group_cols)
    bins = histogram_bins(df, layout, value_col, group_cols, n_bins=n_bins)
    wspec = Window.partitionBy(*group_cols).orderBy("__bin")
    tot = bins.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum("__c").alias("__n")
    )
    labels = (
        bins.withColumn("__cum", F.sum("__c").over(wspec))
        .join(tot, group_cols)
        .select(
            *group_cols,
            "__bin",
            F.expr(f"CAST((__cum * {k} + __n - 1) DIV __n AS INT)").alias(
                "bucket"
            ),
        )
    )
    w = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    assigned = (
        df.where(F.col(value_col).isNotNull())
        .join(layout, group_cols)
        .withColumn(
            "__bin",
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.floor((F.col(value_col) - F.col("__mn")) / w),
                        F.lit(n_bins - 1),
                    ),
                )
            )
            .cast("int"),
        )
        .drop("__mn", "__mx")
    )
    return assigned.join(labels, [*group_cols, "__bin"]).drop("__bin")


def chunk_hash_embed(
    df: DataFrame,
    window: int = 32,
    stride: int = 32,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk each document into fixed-size token windows and embed
    every chunk as a DENSE ``n_features``-dim signed-count vector via
    the hashing trick — the ingest half of a retrieval (RAG) pipeline
    fused into ONE map-side projection: chunking (curation.
    chunk_documents' recipe), tokenization, hashing (feature_hash's
    slot/sign recipe), and dense assembly all happen inside a single
    SELECT over the scan.

    Returns (id, chunk_idx, vec array<long>). The dense form exists
    because the consumer is a vector index / similarity join, which
    wants fixed-width arrays, not (id, slot, value) sparse rows —
    and building it map-side (an aggregate over the token list that
    increments one slot per token) means a 100 TB ingest costs ONE
    scan with ZERO shuffles: no explode-regroup round trip, no
    vocabulary, nothing to broadcast. Exactness: slots/signs from the
    cross-engine md5-prefix word hash; counts are int64 additions —
    order-free, so any engine replays the vectors bit-for-bit.
    """
    from .dedup import normalize_text

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(window) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        + F.lit(1),
    )
    chunk_words = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(words, i * stride + 1, window),
    )
    ex = df.select(
        F.col(id_col), F.posexplode(chunk_words).alias("chunk_idx", "__cw")
    )
    toks = F.filter(F.col("__cw"), lambda w: w != "")
    return ex.select(
        id_col, "chunk_idx", _signed_count_vec(toks, n_features).alias("vec")
    )


def _signed_count_vec(toks, n_features: int):
    """The slot/sign dense-assembly core both hash-embedding shapes
    share (chunk_hash_embed, doc_hash_embed): one slot increment of
    ±1 per token, signs from the hash bit above the slot bits, int64
    additions — order-free, single-sourced so the exactness contract
    (and its DuckDB oracle fragment) cannot drift between the chunk-
    and doc-level legs."""
    entries = F.transform(
        toks,
        lambda w: F.struct(
            F.pmod(_word_hash(w), F.lit(n_features)).cast("int").alias("slot"),
            F.when(
                F.pmod(F.floor(_word_hash(w) / n_features), F.lit(2)) == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("sgn"),
        ),
    )
    return F.aggregate(
        entries,
        F.array_repeat(F.lit(0).cast("long"), n_features),
        lambda acc, e: F.transform(
            acc,
            lambda v, i: v
            + F.when(i == e["slot"], e["sgn"]).otherwise(F.lit(0).cast("long")),
        ),
    )


def doc_hash_embed(
    df: DataFrame,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Whole-document dense hash-embedding: chunk_hash_embed's fused
    map-side projection without the chunking — one ``n_features``-dim
    signed-count vector per document (id, vec array<long>), built in
    a single SELECT over the scan (zero shuffles, no vocabulary).
    The doc-level unit the hybrid-retrieval and rerank legs consume
    when the corpus item IS the document (chunk-level retrieval keeps
    using chunk_hash_embed). Same slot/sign recipe, same int64
    order-free exactness.
    """
    from .dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    return df.select(
        id_col, _signed_count_vec(toks, n_features).alias("vec")
    )
