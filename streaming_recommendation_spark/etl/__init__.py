from .training_data import (
    build_excluded_behavior,
    build_item_embeddings,
    build_lightgcn_data,
    build_train_data,
    split_users,
)

__all__ = [
    "build_excluded_behavior",
    "build_item_embeddings",
    "build_lightgcn_data",
    "build_train_data",
    "split_users",
]
