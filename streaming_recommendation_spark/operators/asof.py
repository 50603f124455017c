"""Point-in-time (as-of) and interval (range) joins.

The reference answers "state of user U as of time T" with a binary
search over a per-user sorted in-memory list
(reference: deploy_datapipeline/data_pipeline/api_service/
behavior_lookup.py:34-41, bisect_right at :39 => inclusive ts <= T),
and "events within +/- W of T" with a linear scan (:44-54).

Spark has no single as-of primitive, so we compose one:

  strategy "union"  (default) — union probes and events tagged by kind,
      ONE window pass ordered by (ts, kind, tiebreak) per partition key
      carries the last event's values forward onto each probe row via
      last(..., ignorenulls) over rowsBetween(unboundedPreceding,
      current). ONE shuffle on the `by` key, no join at all. This is
      the plan that survives 100x scale: shuffle size ~ |events| +
      |probes|, versus a range-join's per-key |events| x |probes|
      blowup.

  strategy "join" — inequality join + row_number; kept for
      cross-checking the union plan in tests.

Tie-breaks: an event with ts == probe ts IS visible (bisect_right
parity); among events with equal ts the one with the greatest
`tiebreak` column wins (deterministic; the reference inherits
arrival order — documented divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    strategy: str = "union",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest event (per `by`) with
    event.on <= probe.on [and probe.on - event.on <= tolerance].

    Probe columns are preserved; event value columns arrive as-is
    (null when no event qualifies). `tiebreak` (an events column)
    orders events with equal timestamps; greatest wins.
    """
    value_cols = value_cols or [c for c in events.columns if c not in (on, by)]
    payload_cols = [c for c in probes.columns if c not in (by, on)]
    clash = set(payload_cols) & set(value_cols)
    if clash:
        raise ValueError(f"probe/event column clash: {sorted(clash)}")

    if strategy == "union":
        ev = events.select(
            F.col(by),
            F.col(on).alias("__ts"),
            F.lit(0).alias("__kind"),
            *[F.col(c) for c in value_cols],
            *[
                F.lit(None).cast(probes.schema[c].dataType).alias(c)
                for c in payload_cols
            ],
        )
        pr = probes.select(
            F.col(by),
            F.col(on).alias("__ts"),
            F.lit(1).alias("__kind"),
            *[
                F.lit(None).cast(events.schema[c].dataType).alias(c)
                for c in value_cols
            ],
            *[F.col(c) for c in payload_cols],
        )
        order = [F.col("__ts").asc(), F.col("__kind").asc()]
        if tiebreak:
            order.append(F.col(tiebreak).asc_nulls_first())
        w = (
            Window.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        is_event = F.col("__kind") == 0
        carried = ev.unionByName(pr).select(
            "*",
            F.last(F.when(is_event, F.col("__ts")), ignorenulls=True)
            .over(w)
            .alias("__event_ts"),
            *[
                F.last(F.when(is_event, F.col(c)), ignorenulls=True)
                .over(w)
                .alias(f"__v_{c}")
                for c in value_cols
            ],
        ).where(F.col("__kind") == 1)

        if tolerance is not None:
            in_tol = F.col("__ts") - F.col("__event_ts") <= F.lit(tolerance)
            value_exprs = [
                F.when(in_tol, F.col(f"__v_{c}")).alias(c) for c in value_cols
            ]
        else:
            value_exprs = [F.col(f"__v_{c}").alias(c) for c in value_cols]

        return carried.select(
            F.col(by),
            F.col("__ts").alias(on),
            *value_exprs,
            *[F.col(c) for c in payload_cols],
        )

    # strategy == "join": inequality join, then keep latest per probe.
    p = probes.select("*", F.monotonically_increasing_id().alias("__pid"))
    ev = events.select(
        F.col(by).alias("__eby"),
        F.col(on).alias("__ets"),
        *[F.col(c) for c in value_cols],
    )
    cond = (p[by] == F.col("__eby")) & (F.col("__ets") <= p[on])
    if tolerance is not None:
        cond = cond & (F.col("__ets") >= p[on] - F.lit(tolerance))
    joined = p.join(ev, cond, "left")
    order = [F.col("__ets").desc_nulls_last()]
    if tiebreak:
        order.append(F.col(tiebreak).desc_nulls_last())
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__eby", "__ets", "__pid")
    )


def range_join(
    probes: DataFrame,
    events: DataFrame,
    on: str = "ts",
    by: str | None = "user_id",
    window: int = 3600,
    bucketize: bool = True,
) -> DataFrame:
    """All events with |event.on - probe.on| <= window (inclusive),
    per `by` key. `on` must be a numeric (e.g. unix-seconds) column.

    Reference semantics: behavior_lookup.py:44-54 (inclusive bounds).

    Scale note: a raw non-equi join degenerates to
    broadcast-nested-loop when no equi key exists. ``bucketize=True``
    adds a derived equi key floor(ts / window) and joins each probe to
    its bucket and the two adjacent buckets — turning the plan into a
    shuffled equi-join + residual filter, which scales linearly.
    """
    pr = probes.select(
        *([F.col(by).alias("__pby")] if by else []),
        F.col(on).alias("__pts"),
        *[F.col(c) for c in probes.columns if c != on and c != by],
    )
    ev_cols = [c for c in events.columns if c != by]
    ev = events.select(*([F.col(by)] if by else []), *[F.col(c) for c in ev_cols])

    if bucketize:
        w = F.lit(window)
        bucket_of = lambda c: F.floor(c.cast("long") / w)
        pr = pr.withColumn(
            "__bucket",
            F.explode(
                F.array(
                    bucket_of(F.col("__pts")) - 1,
                    bucket_of(F.col("__pts")),
                    bucket_of(F.col("__pts")) + 1,
                )
            ),
        )
        ev = ev.withColumn("__bucket", bucket_of(F.col(on)))
        cond = [pr["__bucket"] == ev["__bucket"]]
        if by:
            cond.append(pr["__pby"] == ev[by])
        joined = pr.join(ev, cond, "inner").drop("__bucket")
    else:
        cond = (ev[on] >= pr["__pts"] - F.lit(window)) & (
            ev[on] <= pr["__pts"] + F.lit(window)
        )
        if by:
            cond = (pr["__pby"] == ev[by]) & cond
        joined = pr.join(ev, cond, "inner")

    out = joined.where(
        (F.col(on) >= F.col("__pts") - F.lit(window))
        & (F.col(on) <= F.col("__pts") + F.lit(window))
    )
    if by:
        out = out.drop("__pby")
    return out.withColumnRenamed("__pts", f"probe_{on}")
