"""Exact substring dedup via distributed prefix-doubling (the
suffix-array route of Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", re-expressed as DataFrame rounds).

``duplicate_ngram_spans`` (operators/dedup.py) flags positions whose
md5-hashed n-gram repeats — one shuffle, but (a) hash collisions can
in principle merge distinct grams and (b) the shuffle ships an
md5 per corpus position. This module is the collision-FREE variant
built on the classic suffix-array construction idea:

  * round 0: dense-rank every token (dict_encode — the scale-safe
    global rank with no single-partition funnel);
  * round k: the rank of the 2^k-token block at position p is the
    dense rank of the PAIR (rank_{k-1}[p], rank_{k-1}[p + 2^(k-1)]) —
    Karp-Miller-Rosenberg / prefix doubling. Two equal block ranks
    mean the underlying token blocks are IDENTICAL, by induction, with
    no hashing anywhere.
  * a substring of arbitrary length L >= 2^k is compared with the
    standard overlapping trick: (rank_k[p], rank_k[p + L - 2^k]) with
    2^k the largest power of two <= L.

Scale shape: ceil(log2(L)) rounds, each = one distinct + range-
partitioned rank assignment over the (shrinking-alphabet) key table
plus one positional self-equi-join on (doc, pos) — every shuffle is
keyed by (doc, pos) or by a fixed-width rank pair; nothing ever
ships L-token strings. Driver traffic per round is n_partitions
integers (dict_encode's offsets), the same bounded collect MLlib
fit() steps make. For L=16 that is 5 rounds; the hashed n-gram pass
is 1 round — this is the exactness-for-rounds tradeoff, and why both
operators exist.

Reference: Lee et al. 2022 §4.1 (ExactSubstr); Karp-Miller-Rosenberg
1972 for the doubling construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.audit import checkpoint_partitioned
from .dedup import normalize_text, span_coverage, spread
from .encode import dict_encode

# sentinel rank for "past the end of the document": dict_encode ranks
# are >= 0, so -1 never collides with a real block rank, and two
# truncated blocks compare equal only when their real prefixes do
PAST_END = -1


def token_rank_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """(id, pos, r): dense rank of each token occurrence, position
    0-based within its (normalized) document."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    toks = checkpoint_partitioned(
        spread(df, repartition).select(
            F.col(id_col), F.posexplode(words).alias("pos", "__tok")
        )
    )
    vocab = dict_encode(toks, "__tok", index_col="r")
    return toks.join(vocab, "__tok").select(id_col, "pos", "r")


def _rank_at_offset(ranks: DataFrame, id_col: str, offset: int):
    """ranks joined to itself at ``pos + offset`` (left; PAST_END when
    the offset runs past the document end)."""
    shifted = ranks.select(
        F.col(id_col),
        (F.col("pos") - offset).alias("pos"),
        F.col("r").alias("__r2"),
    )
    return ranks.join(shifted, [id_col, "pos"], "left").select(
        F.col(id_col),
        "pos",
        "r",
        F.coalesce("__r2", F.lit(PAST_END)).alias("__r2"),
    )


def prefix_doubling_ranks(
    ranks: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
    prune_unique: bool = False,
    materialize_input: bool = True,
    return_rounds: bool = False,
) -> DataFrame | list[DataFrame]:
    """Iterate rank doubling: after ``rounds`` rounds, ``r`` is the
    dense rank of the 2^rounds-token block starting at each position
    (blocks running past the document end rank by their truncated
    prefix). Input is round 0 (token ranks).

    ITERATIVE operator policy (same as pagerank/connected_components):
    each round's output materializes via checkpoint — dict_encode runs
    several jobs (distinct, range-sampling, offset collect, join) over
    the round's pair table, and without the checkpoint every job would
    replay all prior rounds, turning O(log L) rounds into quadratic
    (and, with AQE re-coalescing per execution, NONdeterministic)
    recompute. The checkpoint keys the layout by (id, pos), which the
    positional self-join of the next round reuses.

    ``prune_unique=True`` is the scale mode used by
    ``exact_substring_duplicates``: a position whose 2^k-block rank is
    globally unique can never be part of a duplicated longer block, so
    it is dropped from later rounds (and positions whose block would
    run past the document end are dropped rather than ranked by
    truncated prefix). On real corpora the survivor set collapses
    within a few rounds — round tables SHRINK while block length
    doubles, which is what keeps the pass linear-ish at 100 TB.
    In pruned mode the post-round-k table holds EXACTLY the positions
    whose full 2^k-token block occurs >= 2 times corpus-wide (all
    occurrences of a duplicated block have duplicated components, so
    none are lost to earlier pruning) — ``return_rounds=True`` exposes
    the per-round tables for length-distribution diagnostics.

    Storage note: each round's checkpoint stays materialized for the
    session (the standard ITERATIVE pattern here — pagerank and
    connected_components behave the same). A long-lived session
    running many passes should use a reliable checkpoint dir with
    periodic cleanup instead of localCheckpoint."""
    if materialize_input:
        ranks = checkpoint_partitioned(ranks.repartition(id_col, "pos"))
    round_tables: list[DataFrame] = []
    for k in range(rounds):
        joined = _rank_at_offset(ranks, id_col, 1 << k)
        if prune_unique:
            joined = joined.where(F.col("__r2") != PAST_END)
        paired = joined.withColumn("__key", F.struct("r", "__r2"))
        # min_count=2 folds survivor pruning into the rank-vocabulary
        # groupBy (one pass); the inner join back then drops unique
        # positions automatically
        vocab = dict_encode(
            paired, "__key", index_col="__nr",
            min_count=2 if prune_unique else 1,
        )
        ranks = checkpoint_partitioned(
            paired.join(vocab, "__key").select(
                id_col, "pos", F.col("__nr").alias("r")
            ).repartition(id_col, "pos")
        )
        if return_rounds:
            round_tables.append(ranks)
    return round_tables if return_rounds else ranks


def exact_substring_duplicates(
    df: DataFrame,
    min_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """Per-doc duplicated-substring diagnostics, EXACT at token
    granularity: a position is flagged iff its ``min_len``-token
    substring occurs at least twice in the corpus (any document,
    including its own — Lee et al.'s occurrence counting). Output
    schema matches ``duplicate_ngram_spans``:
    (id, n_tokens, n_grams, n_dup_grams, n_dup_spans, dup_tokens,
    dup_token_ratio), with n_grams = the number of length-min_len
    windows.
    """
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    base_rounds = (min_len - 1).bit_length()  # largest 2^k <= min_len
    if (1 << base_rounds) > min_len:
        base_rounds -= 1
    block = 1 << base_rounds

    # one corpus scan: the round-0 rank table is checkpointed keyed by
    # (id, pos); every doc's token count falls out of it (positions are
    # dense, split() yields >= 1 token for any text), so no second
    # scan/explode is needed for the per-doc base stats
    r0 = checkpoint_partitioned(
        token_rank_table(df, text_col, id_col, repartition=repartition)
        .repartition(id_col, "pos")
    )
    base = r0.groupBy(id_col).agg((F.max("pos") + 1).alias("n_tokens"))

    ranks = prefix_doubling_ranks(
        r0, base_rounds, id_col, prune_unique=True, materialize_input=False
    )
    # substring-of-length-min_len key: block ranks at pos and at
    # pos + min_len - block (overlapping windows cover exactly
    # [pos, pos + min_len)). No doc-length filter is needed in either
    # branch: pruned-mode rank tables hold only FULL blocks, so a
    # surviving window's trailing block ending at pos + min_len is
    # inside the document by construction (and with min_len == 1 there
    # are no rounds, but every 1-token window is trivially full).
    if min_len == block:
        keyed = ranks.select(
            id_col, "pos", F.struct("r", F.col("r").alias("__r2")).alias("__key")
        )
    else:
        keyed = _rank_at_offset(ranks, id_col, min_len - block).select(
            id_col, "pos", F.struct("r", "__r2").alias("__key")
        )
        # a null-coalesced PAST_END means the trailing block was pruned
        # (unique) or truncated — the window cannot repeat
        keyed = keyed.where(F.col("__r2") != PAST_END)

    dup_keys = (
        keyed.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .where(F.col("__occ") >= 2)
        .select("__key")
    )
    dup_pos = keyed.join(dup_keys, "__key").select(id_col, "pos")
    cov = span_coverage(dup_pos, id_col=id_col, n=min_len)
    return base.join(cov, id_col, "left").select(
        id_col,
        "n_tokens",
        F.greatest(F.col("n_tokens") - (min_len - 1), F.lit(0)).alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_token_ratio"),
    )


def dup_length_profile(
    df: DataFrame,
    max_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """Per-doc duplicated-substring LENGTH distribution (the Lee et
    al. 2022 diagnostic behind choosing a dedup threshold): for each
    power-of-two block length 2..max_len, how many of the document's
    positions start an exactly-duplicated full block of that length.
    Output: (id, n_tokens, dup_at_2, dup_at_4, ..., dup_at_max_len);
    columns are cumulative-in-length (a duplicated 16-block implies
    duplicated 8-blocks), so the falloff across columns IS the length
    histogram. Collision-free: counts come from the pruned
    prefix-doubling round tables, not hashes."""
    if max_len < 2 or max_len & (max_len - 1):
        raise ValueError("max_len must be a power of two >= 2")
    rounds = max_len.bit_length() - 1
    r0 = checkpoint_partitioned(
        token_rank_table(df, text_col, id_col, repartition=repartition)
        .repartition(id_col, "pos")
    )
    out = r0.groupBy(id_col).agg((F.max("pos") + 1).alias("n_tokens"))
    tables = prefix_doubling_ranks(
        r0, rounds, id_col,
        prune_unique=True, materialize_input=False, return_rounds=True,
    )
    for k, t in enumerate(tables, start=1):
        col = f"dup_at_{1 << k}"
        cnt = t.groupBy(id_col).agg(F.count(F.lit(1)).alias(col))
        out = out.join(cnt, id_col, "left").withColumn(
            col, F.coalesce(col, F.lit(0).cast("long"))
        )
    return out
