"""Grouped Arrow-batched operators via ``applyInPandas`` — the
sanctioned mechanism for per-group logic Spark's built-ins cannot
express (recursive/stateful sequence computations). Each group
arrives as ONE pandas DataFrame over Arrow, so per-group state is a
local variable, and groups process in parallel across executors.

The batch-grouped sibling of streaming/stateful.py's
``applyInPandasWithState``; multimodal/columns.py covers the
ungrouped ``mapInPandas`` leg.

Scale note: a group must fit in one executor's memory — keys here
are user-sized (thousands of events), never corpus-sized. The
shuffle is the one groupBy(key) exchange any per-user operator pays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col``
    in ``order_cols`` order: y_1 = x_1; y_i = (1-a)*y_{i-1} + a*x_i
    (the adjust=False recurrence) — engagement smoothing / recency
    features a recommendation ETL derives per user.

    A linear recurrence has no closed form Spark's window functions
    can evaluate without numerically-unstable power terms, so this is
    the textbook ``applyInPandas`` case: each user's events arrive as
    one Arrow batch, a vectorized scan computes the recurrence, the
    output schema stays narrow (key, id, ewma).

    With alpha = 0.5 both products in the recurrence are exact
    (multiplying a double by 0.5 only decrements the exponent), so
    every engine computing the same fold produces bit-identical
    doubles — which is what lets a SQL oracle replay this exactly.
    """
    out_schema = (
        f"{key_col} long, {id_col} long, {out_col} double"
    )
    a = float(alpha)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.empty_like(x)
        acc = 0.0
        for i, v in enumerate(x):
            acc = v if i == 0 else (1.0 - a) * acc + a * v
            y[i] = acc
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                out_col: y,
            }
        )

    cols = {key_col, id_col, value_col, *order_cols}
    return df.select(*sorted(cols)).groupBy(key_col).applyInPandas(
        compute, schema=out_schema
    )
