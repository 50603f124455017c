"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.10 — reserved for stateful extensions; §2.8 ST5).

``running_history_state`` maintains each user's last-N item history
ACROSS micro-batches — the true stateful version of the profile the
reference rebuilds from scratch per message (its Kafka payload
carries the whole history every time; the consumer just overwrites,
reference: spark_stream/consumer.py:64-67). With keyed state the
stream can accept INCREMENTAL events (one item per message) and still
emit complete, bounded profiles, which is what an at-scale ingest
topology sends.

State per user: (items: last-N list, last_ts). Processing-time
timeout evicts idle users so the state store stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id string, timestamp bigint, history_items array<string>"
STATE_SCHEMA = "items array<string>, last_ts bigint"


def _update_history(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_items: int = 50,
    evict: bool = True,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    items: list[str]
    last_ts: int
    if state.exists:
        items, last_ts = state.get
        items = list(items)
    else:
        items, last_ts = [], 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    # deterministic arrival order: sort by (timestamp, item)
    rows = rows.sort_values(["timestamp", "item"])
    for _, r in rows.iterrows():
        items.append(str(r["item"]))
        last_ts = max(last_ts, int(r["timestamp"]))
    items = items[-max_items:]

    state.update((items, last_ts))
    if evict:
        state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    yield pd.DataFrame(
        {"user_id": [key[0]], "timestamp": [last_ts], "history_items": [items]}
    )


def running_history_state(
    events: DataFrame,
    max_items: int = 50,
    evict_idle: bool = True,
) -> DataFrame:
    """events (user_id, item, timestamp) — one item per row — into a
    stream of complete last-N profiles per user per micro-batch.

    Works on a streaming DataFrame (keyed state, update mode). The
    grouping key is user_id, so state shuffles once and lives
    partitioned in the state store.

    ``evict_idle`` enables processing-time state eviction. Note the
    operational consequence: with a timeout configured, Spark keeps
    scheduling no-data micro-batches to evaluate timeouts, so an
    ``availableNow`` run NEVER self-terminates — use eviction for
    long-lived production streams, disable it for bounded
    drain-and-stop runs.
    """

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        return _update_history(key, pdfs, state, max_items, evict=evict_idle)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_idle
            else GroupStateTimeout.NoTimeout
        ),
    )


EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, ewma double"
EWMA_STATE_SCHEMA = "acc double, has_acc boolean"


def ewma_state(
    events: DataFrame,
    alpha: float = 0.5,
    evict_idle: bool = False,
) -> DataFrame:
    """Streaming twin of ``operators.grouped_pandas.ewma_by_key``:
    per-user EWMA of ``value`` carried ACROSS micro-batches in keyed
    state, emitting one (user_id, event_id, ewma) row per input
    event. When arrival order respects (ts, event_id) ACROSS batches
    — events sorted inside each batch, no event older than an already
    -processed one — the output is bit-identical to the batch
    operator: the state stores exactly the recurrence's boundary
    condition and alpha=0.5 keeps every product exact.

    Out-of-order arrivals across batch boundaries fold in ARRIVAL
    order (the standard streaming-recurrence semantics — with append
    output, emitted values are final and cannot be revised); if
    cross-batch reordering matters, bound it upstream with a
    watermark-delayed sorted replay. Within one micro-batch events
    are always sorted to (ts, event_id), so output never depends on
    shuffle interleaving.

    State is one double per user. ``evict_idle`` enables the same
    1h processing-time eviction as ``running_history_state`` (and
    inherits its caveat: with a timeout configured, availableNow runs
    never self-terminate); without it, state grows with the live key
    space — fine for bounded id spaces, unbounded otherwise.
    """
    a = float(alpha)

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        acc, has_acc = state.get if state.exists else (0.0, False)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        out = []
        for v in rows["value"].astype(float):
            acc = v if not has_acc else (1.0 - a) * acc + a * v
            has_acc = True
            out.append(acc)
        if len(rows):
            state.update((float(acc), True))
        if evict_idle:
            state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": rows["user_id"].to_numpy(),
                "event_id": rows["event_id"].to_numpy(),
                "ewma": out,
            }
        )

    # append, not update: every event's smoothed value is emitted
    # exactly once and never revised, so downstream append-only sinks
    # (files) are valid
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_idle
            else GroupStateTimeout.NoTimeout
        ),
    )
