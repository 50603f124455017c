from .asof import asof_join, range_join
from .encode import dict_encode
from .history import collect_history, last_n_events, sliding_window_samples, tail_slice
from .metrics import binary_metrics, ranking_metrics
from .sampling import bernoulli_by_activity, hash_split, negative_sample
from .skew import salted_join
from .topk import frequency_top_n, top_k_global, top_k_per_group

__all__ = [
    "asof_join",
    "range_join",
    "dict_encode",
    "collect_history",
    "last_n_events",
    "sliding_window_samples",
    "tail_slice",
    "binary_metrics",
    "ranking_metrics",
    "bernoulli_by_activity",
    "hash_split",
    "negative_sample",
    "salted_join",
    "frequency_top_n",
    "top_k_global",
    "top_k_per_group",
]
