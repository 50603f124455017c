from .asof import asof_join, range_join
from .bpe import bpe_token_stats, learn_bpe, segment_words
from .dedup import banded_hamming_pairs, duplicate_ngram_spans, prefix_jaccard_pairs
from .encode import dict_encode
from .graph import pagerank_quantized, triangle_counts
from .grouped_pandas import ewma_by_key, ewma_by_key_sorted
from .history import collect_history, last_n_events, sliding_window_samples, tail_slice
from .metrics import binary_metrics, calibration_bins, histogram_quantiles, ranking_metrics
from .rerank import mmr_rerank
from .sampling import bernoulli_by_activity, hash_split, negative_sample
from .sketch import cms_counts, cms_estimate, hll_distinct, kmv_set_stats
from .similarity import semantic_dedup
from .skew import salted_join
from .suffix import (
    dup_length_profile,
    exact_substring_duplicates,
    prefix_doubling_ranks,
)
from .text import bigram_rarity, bpe_merge_candidates, importance_weights, unigram_rarity
from .topk import frequency_top_n, top_k_global, top_k_per_group

__all__ = [
    "asof_join",
    "range_join",
    "bpe_token_stats",
    "learn_bpe",
    "segment_words",
    "banded_hamming_pairs",
    "duplicate_ngram_spans",
    "prefix_jaccard_pairs",
    "dict_encode",
    "pagerank_quantized",
    "triangle_counts",
    "ewma_by_key",
    "ewma_by_key_sorted",
    "collect_history",
    "last_n_events",
    "sliding_window_samples",
    "tail_slice",
    "binary_metrics",
    "calibration_bins",
    "histogram_quantiles",
    "ranking_metrics",
    "mmr_rerank",
    "bernoulli_by_activity",
    "hash_split",
    "negative_sample",
    "hll_distinct",
    "cms_counts",
    "cms_estimate",
    "kmv_set_stats",
    "semantic_dedup",
    "salted_join",
    "dup_length_profile",
    "exact_substring_duplicates",
    "prefix_doubling_ranks",
    "bpe_merge_candidates",
    "importance_weights",
    "bigram_rarity",
    "unigram_rarity",
    "frequency_top_n",
    "top_k_global",
    "top_k_per_group",
]
