"""Distributed byte-pair-encoding: exact training AND application as
DataFrame plans (the tokenizer leg of an LLM data pipeline —
``text.bpe_merge_candidates`` counts round-1 candidates; this module
runs the full trainer and applies the learned tokenizer).

Representation: a word's segmentation is a string of
individually-wrapped symbols ``\x01a\x02\x01b\x02...`` (control-char
sentinels around EVERY symbol). Applying merge (a, b) is then a plain
``replace(seg, '\x01a\x02\x01b\x02', '\x01ab\x02')`` — because each
pattern is fully self-delimited, sequential non-overlapping replace
is EXACTLY the tokenizer's greedy left-to-right merge, including
self-pair runs ('aaaa' -> [aa, aa]; a space-separated encoding gets
this wrong because adjacent merge sites share the separator). The
same builtin exists in DuckDB, which is what lets an oracle replay
both training rounds and application with no UDF on either side.

Scale shape: everything runs on the distinct-WORD frequency table
(vocab-sized, Zipf-bounded — the same working set HuggingFace's
trainer holds in memory, but distributed):
  * one corpus pass builds (word, freq);
  * each training round = one pair-explode + weighted count over the
    vocab + a TakeOrdered(1) argmax (one driver row per round), then
    one map-side replace; lineage is checkpointed per round
    (ITERATIVE operator policy);
  * application folds the merge list as a chain of map-side replaces
    over the vocab, then broadcast-joins word -> tokens back to the
    corpus. Per-word work happens once regardless of corpus size.

Reference: Sennrich et al. 2016 ("Neural Machine Translation of Rare
Words with Subword Units") — algorithm 1, with frequency-weighted
pair counts and (count desc, pair asc) tie-break for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.audit import checkpoint_partitioned
from .dedup import normalize_text, spread


L = "\x01"  # symbol open sentinel
R = "\x02"  # symbol close sentinel
# tokens containing the sentinel bytes (binary-contaminated crawl
# text) would corrupt segment boundaries — strip them on BOTH sides
# (word_frequency_table / bpe_token_stats here; the q105/q106 oracles
# apply the same regexp) before wrapping
_STRIP_SENTINELS = f"[{L}{R}]"


def _init_seg(word_col) -> F.Column:
    """'\x01a\x02\x01b\x02...' — one wrapped symbol per character."""
    return F.regexp_replace(word_col, "(.)", f"{L}$1{R}")


def _split_seg(seg_col) -> F.Column:
    """wrapped segmentation -> array<string> of symbols."""
    inner = F.regexp_replace(seg_col, f"^{L}|{R}$", "")
    return F.split(inner, f"{R}{L}")


def _pair_counts(wordfreq: DataFrame) -> DataFrame:
    """(pair 'a b', cnt) — adjacent-symbol pairs weighted by word
    frequency (overlapping occurrences counted, the standard BPE
    statistic)."""
    syms = _split_seg(F.col("__seg"))
    pairs = wordfreq.select(
        F.col("__freq"),
        F.explode(
            F.when(F.size(syms) < 2, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(syms, i), F.element_at(syms, i + 1)
                    ),
                )
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("__freq").alias("cnt"))


def _apply_merge(seg_col, a: str, b: str) -> F.Column:
    return F.replace(
        seg_col, F.lit(f"{L}{a}{R}{L}{b}{R}"), F.lit(f"{L}{a}{b}{R}")
    )


def word_frequency_table(
    df: DataFrame,
    text_col: str = "text",
    repartition: int | bool | None = None,
) -> DataFrame:
    """(__word, __freq) over the normalized corpus — the trainer's
    working set."""
    return (
        spread(df, repartition)
        .select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__raw")
        )
        .select(F.regexp_replace("__raw", _STRIP_SENTINELS, "").alias("__word"))
        .groupBy("__word")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )


def learn_bpe(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    min_freq: int = 2,
    repartition: int | bool | None = None,
    return_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Exact BPE training: returns the ranked merge list
    [(a, b), ...] (or [(a, b, weighted_count), ...] with
    ``return_counts``). Stops early when the best pair's weighted
    count drops below ``min_freq``. Each round costs one vocab-table
    pass + one driver row (the argmax) — the driver never holds the
    vocab.
    """
    wf = checkpoint_partitioned(
        word_frequency_table(df, text_col, repartition).withColumn(
            "__seg", _init_seg(F.col("__word"))
        )
    )
    merges: list = []
    for _ in range(num_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["pair"].split(" ")
        merges.append((a, b, int(top[0]["cnt"])) if return_counts else (a, b))
        wf = checkpoint_partitioned(
            wf.withColumn("__seg", _apply_merge(F.col("__seg"), a, b))
        )
    return merges


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "__word",
) -> DataFrame:
    """(word_col, __tokens array<string>): fold the ranked merge list
    over each distinct word — one map-side projection, no shuffle."""
    seg = _init_seg(F.col(word_col))
    for a, b in merges:
        seg = _apply_merge(seg, a, b)
    return words.withColumn("__tokens", _split_seg(seg))


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition: int | bool | None = None,
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) under the given tokenizer — the
    real-token-count statistic packing/quota/cost passes need.
    Segmentation runs once per DISTINCT word; the corpus join ships
    only (word, token_count)."""
    toks = spread(df, repartition).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__raw"),
    ).select(
        F.col(id_col),
        F.regexp_replace("__raw", _STRIP_SENTINELS, "").alias("__word"),
    )
    seg = segment_words(toks.select("__word").distinct(), merges).select(
        "__word", F.size("__tokens").alias("__n_sub")
    )
    return (
        toks.join(F.broadcast(seg), "__word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__n_sub").alias("n_bpe_tokens"),
        )
    )
