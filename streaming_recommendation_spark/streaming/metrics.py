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


class PrometheusExposition:
    """Counters/gauges/histograms rendered in the Prometheus text
    exposition format (the stable scrape contract — no client library
    required).

    Parity surface for the reference's metric set: the data-pipeline
    counters kafka_sent_count / spark_consumed_count /
    redis_write_count (reference deploy_datapipeline/data_pipeline/
    metrics.py:1-22) and eval_online's Gauge/Counter/Histogram shapes
    (eval_online/main/metrics.py:6-28).

    Serving: ``render()`` is the /metrics response body (hang it off
    any HTTP layer); ``write_textfile()`` emits the node_exporter
    textfile-collector pattern for scrape-without-a-server setups —
    the right shape for Spark executors/driver where running an HTTP
    listener per JVM is not wanted.
    """

    def __init__(self):
        self._metrics: dict[str, dict] = {}

    def _entry(self, name: str, typ: str, help_: str):
        m = self._metrics.setdefault(
            name, {"type": typ, "help": help_, "samples": {}}
        )
        if m["type"] != typ:
            raise ValueError(f"{name} already registered as {m['type']}")
        return m

    @staticmethod
    def _labelkey(labels: dict | None) -> tuple:
        return tuple(sorted((labels or {}).items()))

    def inc(self, name: str, value: float = 1.0, help: str = "", labels: dict | None = None):
        m = self._entry(name, "counter", help)
        k = self._labelkey(labels)
        m["samples"][k] = m["samples"].get(k, 0.0) + value

    def set(self, name: str, value: float, help: str = "", labels: dict | None = None):
        m = self._entry(name, "gauge", help)
        m["samples"][self._labelkey(labels)] = value

    def observe(
        self,
        name: str,
        value: float,
        buckets: tuple = (0.005, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0),
        help: str = "",
        labels: dict | None = None,
    ):
        m = self._entry(name, "histogram", help)
        k = self._labelkey(labels)
        h = m["samples"].setdefault(
            k, {"buckets": {b: 0 for b in buckets}, "sum": 0.0, "count": 0}
        )
        for b in h["buckets"]:
            if value <= b:
                h["buckets"][b] += 1
        h["sum"] += value
        h["count"] += 1

    @staticmethod
    def _fmt_labels(k: tuple, extra: str = "") -> str:
        parts = [f'{lk}="{lv}"' for lk, lv in k]
        if extra:
            parts.append(extra)
        return "{" + ",".join(parts) + "}" if parts else ""

    def render(self) -> str:
        """The text exposition body (version 0.0.4)."""
        out = []
        for name, m in sorted(self._metrics.items()):
            if m["help"]:
                out.append(f"# HELP {name} {m['help']}")
            out.append(f"# TYPE {name} {m['type']}")
            for k, v in sorted(m["samples"].items()):
                if m["type"] == "histogram":
                    # bucket values are stored cumulatively (observe
                    # increments every bucket with value <= le)
                    for b in sorted(v["buckets"]):
                        le = 'le="%s"' % b
                        out.append(
                            f"{name}_bucket{self._fmt_labels(k, le)} "
                            f"{v['buckets'][b]}"
                        )
                    le_inf = 'le="+Inf"'
                    out.append(
                        f"{name}_bucket{self._fmt_labels(k, le_inf)} "
                        f"{v['count']}"
                    )
                    out.append(f"{name}_sum{self._fmt_labels(k)} {v['sum']}")
                    out.append(f"{name}_count{self._fmt_labels(k)} {v['count']}")
                else:
                    out.append(f"{name}{self._fmt_labels(k)} {v}")
        return "\n".join(out) + "\n"

    def write_textfile(self, path: str) -> None:
        """node_exporter textfile-collector handoff: write-then-rename
        so the scraper never reads a torn file."""
        import os

        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            f.write(self.render())
        os.replace(tmp, path)


class PrometheusCountsListener(CountsListener):
    """CountsListener whose export() maintains the reference's counter
    set in a PrometheusExposition: spark_consumed_count grows by each
    micro-batch's input rows, and every observed metric surfaces as
    ``observed_<query>_<metric>``."""

    def __init__(self, exposition: PrometheusExposition | None = None):
        super().__init__()
        self.exposition = exposition or PrometheusExposition()

    def export(self, record: dict) -> None:
        self.exposition.inc(
            "spark_consumed_count",
            record["num_input_rows"],
            help="Number of records consumed by Spark",
        )
        for qname, metrics in record["observed"].items():
            for mname, v in metrics.items():
                if isinstance(v, (int, float)):
                    self.exposition.inc(
                        f"observed_{qname}_{mname}",
                        v,
                        help=f"Observed metric {mname} of {qname}",
                    )
