from .asof import asof_join, range_join
from .history import collect_history, last_n_events, sliding_window_samples
from .sampling import bernoulli_by_activity, hash_split, negative_sample
from .topk import top_k_global, top_k_per_group

__all__ = [
    "asof_join",
    "range_join",
    "collect_history",
    "last_n_events",
    "sliding_window_samples",
    "bernoulli_by_activity",
    "hash_split",
    "negative_sample",
    "top_k_global",
    "top_k_per_group",
]
