"""Pipeline observability (SURVEY §2.4 A9).

The reference counts sent/consumed/written records with hand-rolled
Prometheus counters incremented inside its Python loops (reference:
deploy_datapipeline/data_pipeline/metrics.py:1-22; eval_online/main/
metrics.py:6-28). The Spark-native equivalents:

  * ``observe_counts`` — attach named aggregates to a (batch or
    streaming) DataFrame with ``df.observe``; they are computed BY THE
    EXECUTORS alongside the query (no second pass, no driver loop).
  * ``CountsListener`` — a StreamingQueryListener that collects the
    observed metrics + built-in progress (numInputRows, duration) per
    micro-batch; the export hook is where a Prometheus/StatsD bridge
    plugs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observe_counts(
    df: DataFrame,
    name: str = "pipeline",
    null_guard_col: str | None = None,
) -> DataFrame:
    """Attach row/validity counters computed in-flight. Works on both
    batch (read via ``df.observedMetrics`` after an action... streaming
    surfaces them in each progress event)."""
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if null_guard_col:
        metrics.append(
            F.sum(
                F.when(F.col(null_guard_col).isNull(), 1).otherwise(0)
            ).alias("n_null_guarded")
        )
    return df.observe(name, *metrics)


class CountsListener(StreamingQueryListener):
    """Collects per-batch observed metrics and input rates. Keeps an
    in-memory log (tests read it); subclass and override ``export``
    to ship to a metrics backend."""

    def __init__(self):
        self.batches: list[dict] = []

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "observed": {
                k: v.asDict() for k, v in (p.observedMetrics or {}).items()
            },
        }
        self.batches.append(rec)
        self.export(rec)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def export(self, record: dict) -> None:
        """Hook for Prometheus/StatsD bridges; default: no-op."""
