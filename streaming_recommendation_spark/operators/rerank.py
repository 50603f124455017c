"""Diversified re-ranking: Maximal Marginal Relevance (MMR,
Carbonell & Goldstein 1998) over per-user candidate sets.

The standard post-recall diversity stage in recommender / RAG stacks:
after the cascade (or ANN recall) produces a relevance-ranked
candidate list, MMR greedily picks items trading relevance against
redundancy with what is already picked:

    next = argmax over remaining  lam * rel(i) - (1 - lam) * max sim(i, j)
                                                            j in S

Determinism policy (the same trick as the quantized PageRank/Lloyd
rounds): relevance and similarity are INTEGER dot products of int8-
quantized vectors (operators/similarity.py quantize_embeddings), and
lam is a rational lambda_num/lambda_den, so every greedy comparison
is exact int64 arithmetic — argmax ties cannot flip across engines,
and a DuckDB oracle replays the k rounds bit-for-bit (q115).

Scale shape: the candidate GENERATION stage is the heavy one and
stays in declarative Spark (brute broadcast at small query counts,
SRP-LSH / IVF at corpus scale — q103/q66). Re-ranking then touches
only (users x k') rows with k' bounded and small (10-100), grouped
per user — exactly the applyInPandas contract: each group is tiny by
construction, Arrow-batched, and the k x k' integer similarity
matrix fits in cache. No cross-user state, no shuffle beyond the one
groupBy(user).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lambda_num: int = 7,
    lambda_den: int = 10,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rel_col: str = "rel",
    vec_col: str = "qvec",
) -> DataFrame:
    """Greedy MMR over per-user candidates.

    ``candidates``: one row per (user, candidate item) with integer
    relevance ``rel_col`` and the item's quantized integer vector
    ``vec_col``. Returns (user, item, position 1..k, mmr_score) —
    position 1 is the pure-relevance argmax (ties on item id), later
    positions maximize ``lambda_num * rel - (lambda_den - lambda_num)
    * max_sim_to_selected`` (int64 exact).
    """
    if not 0 < lambda_num <= lambda_den:
        raise ValueError("need 0 < lambda_num <= lambda_den")
    # derive id column types from the input instead of hardcoding
    # long: string / int32 id columns would otherwise hit a runtime
    # schema mismatch or silent coercion (ADVICE r3)
    in_fields = {f.name: f.dataType.simpleString() for f in candidates.schema}
    out_schema = (
        f"{user_col} {in_fields[user_col]}, {item_col} {in_fields[item_col]}, "
        "position int, mmr_score long"
    )
    comp = lambda_den - lambda_num

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: rel desc, item asc
        pdf = pdf.sort_values(
            [rel_col, item_col], ascending=[False, True]
        ).reset_index(drop=True)
        rel = pdf[rel_col].to_numpy(dtype=np.int64)
        # keep the item ids in their native dtype (string ids etc.);
        # ranking bookkeeping below is positional. item_rank is the
        # item-ascending order as an int array so np.lexsort never
        # sees a non-numeric dtype.
        items = pdf[item_col].to_numpy()
        item_rank = pdf[item_col].rank(method="dense").to_numpy(np.int64)
        vecs = np.array([np.asarray(v, dtype=np.int64) for v in pdf[vec_col]])
        n = len(pdf)
        kk = min(k, n)
        picked = np.zeros(n, dtype=bool)
        # sentinel far below any reachable score (|score| <= lambda_den
        # * 127^2 * dim) but far from int64 edges: negation/multiplying
        # by small constants stays exact, unlike iinfo.min which wraps
        NEG = -(10**15)
        max_sim = None  # set from the FIRST pick's raw sims — seeding
        #               with zeros would clamp negative dot products
        sel, scores = [], []
        for pos in range(kk):
            if pos == 0:
                cand_score = rel * lambda_den  # same units as later rounds
            else:
                cand_score = lambda_num * rel - comp * max_sim
            cand_score = np.where(picked, NEG, cand_score)
            # argmax with item-id tie-break: row order is rel desc /
            # item asc, and np.argmax takes the first maximum — for
            # position 0 that IS the tie-break; for later rounds equal
            # scores resolve to the larger-rel (then smaller-id) row,
            # so re-sort explicitly by (score desc, item asc):
            order = np.lexsort((item_rank, -cand_score))
            best = order[0]
            picked[best] = True
            sel.append(best)
            scores.append(int(cand_score[best]))
            sims = vecs @ vecs[best]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                user_col: pdf[user_col].iloc[0],
                item_col: items[sel],
                "position": np.arange(1, kk + 1, dtype=np.int32),
                "mmr_score": np.array(scores, dtype=np.int64),
            }
        )

    return candidates.groupBy(user_col).applyInPandas(rerank, out_schema)
