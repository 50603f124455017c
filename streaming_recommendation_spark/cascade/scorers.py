"""Model-scoring UDF surface (SURVEY §2.9 M1-M4, §2.10).

The reference scores candidates with PyTorch modules called
row-at-a-time from Python loops (reference: eval_online/main/
inference.py:78-106; model_service/models.py:198-210). In this
engine a scorer is a COLUMN: built-in vector math stays JVM-side
(cascade.recommend's default stubs), and learned models plug in as
Arrow-batched pandas UDFs — the vectorized path (~10-100x over
row-at-a-time Python).

``pandas_scorer`` wraps any ``f(pandas.Series, ...) -> pandas.Series``
into such a Column factory. ``torch_module_scorer`` is the real-model
slot with the reference's DIN/RankNet signatures; it is import-gated
because this container ships no torch — the wrapper builds and fails
only at evaluation time with clear guidance, mirroring how the model
would be loaded per-executor (broadcast state dict, lazy init) in a
real deployment (reference model loading: eval_online/main/
models.py:45-80).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def pandas_scorer(fn: Callable[..., pd.Series]) -> Callable[..., Column]:
    """Wrap a pandas batch function into a Column factory:
    ``score = pandas_scorer(my_fn)(col_a, col_b)``. Arrow transfers
    the batches; Spark sizes them via
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    udf = F.pandas_udf(fn, DoubleType())
    return udf


def dot_product_scorer() -> Callable[..., Column]:
    """Vectorized dot(user_vec, item_vec) as a pandas UDF — the
    numeric twin of the JVM-side stub; exists to exercise and
    benchmark the Arrow path against whole-stage codegen."""

    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [float(np.dot(x, y)) for x, y in zip(a, b)], dtype="float64"
        )

    return pandas_scorer(_dot)


def seeded_mlp_weights(
    in_dim: int, hidden_dims: tuple[int, ...] = (16, 8), seed: int = 7
) -> list:
    """Deterministic random-but-seeded MLP weights [(W, b), ...] for
    ``numpy_mlp_scorer`` — a stand-in for a trained state dict that
    any test environment can reproduce."""
    import numpy as np

    rng = np.random.default_rng(seed)
    dims = [in_dim, *hidden_dims, 1]
    return [
        (
            rng.normal(0.0, (2.0 / (a + b)) ** 0.5, size=(a, b)),
            rng.normal(0.0, 0.01, size=b),
        )
        for a, b in zip(dims, dims[1:])
    ]


def numpy_mlp_scorer(weights: list) -> Callable[..., Column]:
    """Real-model scoring path WITHOUT torch: a numpy MLP executed
    inside an Arrow-batched pandas UDF.

    Signature parity with the reference's learned rankers — the MLP
    consumes the concatenation of its two vector inputs exactly like
    RankNet's forward (reference eval_online/main/ranknet.py:34-58:
    concat(user_emb, item_emb) -> MLP -> score) and, fed
    (candidate_vec, pooled_history_vec), like the post-attention half
    of DIN's forward (eval_online/main/din.py:91-129: concat features
    -> MLP -> sigmoid logit). ReLU hidden layers, sigmoid output.

    ``weights`` ([(W, b), ...], e.g. from ``seeded_mlp_weights``) ride
    to executors in the UDF closure — the same mechanism a broadcast
    state dict uses. Each Arrow batch is scored as ONE stacked matmul
    chain, never row-at-a-time; W0's row count must equal
    len(vec_a) + len(vec_b).
    """

    def _score(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        x = np.concatenate(
            [np.stack(a.to_numpy()), np.stack(b.to_numpy())], axis=1
        ).astype("float64")
        for i, (w, bias) in enumerate(weights):
            x = x @ w + bias
            if i < len(weights) - 1:
                x = np.maximum(x, 0.0)
        return pd.Series(1.0 / (1.0 + np.exp(-x[:, 0])))

    return pandas_scorer(_score)


def torch_module_scorer(
    weights_path: str,
    kind: str = "ranknet",
) -> Callable[..., Column]:
    """Real-model slot: returns a Column factory that loads the traced
    module once per executor process and scores Arrow batches.

    kind='din':     f(candidate_feats, history_feats, history_len)
                    (reference eval_online/main/din.py:91-129)
    kind='ranknet': f(user_feat, item_feat)
                    (reference eval_online/main/ranknet.py:85-105)
    """

    def _score(*cols: pd.Series) -> pd.Series:
        try:
            import torch  # type: ignore[import-not-found]
        except ImportError as e:
            raise NotImplementedError(
                "torch_module_scorer needs PyTorch on the executors; this "
                "container ships without it. Use the built-in Column stubs "
                "(cascade.recommend defaults) or dot_product_scorer()."
            ) from e
        import numpy as np

        model = _load_model_cached(torch, weights_path)
        with torch.no_grad():
            tensors = [torch.tensor(np.stack(c.to_numpy())) for c in cols]
            out = model(*tensors)
        return pd.Series(out.squeeze(-1).cpu().numpy().astype("float64"))

    return pandas_scorer(_score)


_MODEL_CACHE: dict[str, object] = {}


def _load_model_cached(torch, path: str):  # pragma: no cover - needs torch
    if path not in _MODEL_CACHE:
        _MODEL_CACHE[path] = torch.jit.load(path, map_location="cpu").eval()
    return _MODEL_CACHE[path]
