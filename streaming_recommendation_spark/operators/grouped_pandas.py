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
        # pandas' C ewm(adjust=False) evaluates the identical
        # (1-a)*acc + a*x recurrence — verified bit-equal to the
        # explicit loop (and, at a=0.5, to the oracle's SQL fold)
        y = (
            pdf[value_col]
            .astype(np.float64)
            .ewm(alpha=a, adjust=False)
            .mean()
            .to_numpy()
        )
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


def ewma_by_key_sorted(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Same recurrence as ``ewma_by_key``, restructured for the
    many-small-groups regime: ``applyInPandas`` pays one Python call
    PER GROUP, which at millions of users dominates the runtime. Here
    the data is hash-partitioned by key and sorted within partitions,
    and ONE pandas call per Arrow batch evaluates every group in the
    batch through pandas' Cython groupby-ewm (verified bit-equal to
    the per-group fold). A group split across consecutive Arrow
    batches is stitched by carrying (key, state) in the iterator
    closure and seeding the next batch's recurrence with a synthetic
    prepended row — exact, because y_seed = state reproduces the
    recurrence's boundary condition.

    Cost: one key shuffle + an in-partition sort (same exchange
    profile as the applyInPandas form); Python calls drop from
    O(groups) to O(arrow batches).
    """
    from pyspark.sql import functions as F

    a = float(alpha)
    cols = sorted({key_col, id_col, value_col, *order_cols})
    part = (
        df.select(*cols)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *order_cols)
    )
    schema = f"{key_col} long, {id_col} long, {out_col} double"

    def run(batches):
        carry_key = None
        carry_val = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key_col]
            x = pdf[value_col].astype(np.float64)
            prepend = carry_key is not None and keys.iloc[0] == carry_key
            if prepend:
                keys = pd.concat(
                    [pd.Series([carry_key]), keys], ignore_index=True
                )
                x = pd.concat([pd.Series([carry_val]), x], ignore_index=True)
            tmp = pd.DataFrame({"__k": keys.to_numpy(), "__x": x.to_numpy()})
            y = (
                tmp.groupby("__k", sort=False)["__x"]
                .ewm(alpha=a, adjust=False)
                .mean()
                .to_numpy()
            )
            if prepend:
                y = y[1:]
            carry_key = pdf[key_col].iloc[-1]
            carry_val = float(y[-1])
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    out_col: y,
                }
            )

    return part.mapInPandas(run, schema=schema)
