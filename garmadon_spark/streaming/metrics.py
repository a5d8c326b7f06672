"""K6: consumer metrics (SURVEY §2.10) — the Prometheus stand-in.

The reference exposes counters/gauges for events read/written/failed
and latest offsets/timestamps
(readers/common/.../metrics/PrometheusHttpConsumerMetrics.java,
readers/hdfs/.../monitoring/PrometheusMetrics.java).  Spark's native
equivalents:

- per-query `df.observe(...)` named aggregates — the corrupt-frame
  counter emitted by sources.frames.decode_frames rides this channel;
- `StreamingQueryListener` progress events — rows/sec, batch duration,
  state-store size, per-source offsets.

``MetricsCollector`` folds both into one flat metrics dict per query —
scrape-ready (a Prometheus exporter would iterate ``snapshot()``)."""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class MetricsCollector(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(collector)``.

    Collects, per query name: input/processed rows-per-second, batch
    duration, cumulative input rows, latest event-time watermark, every
    ``observe()`` metric the query emitted (e.g.
    ``garmadon.frames.corrupt``), and per-source end offsets."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics: dict[str, dict[str, Any]] = {}

    # --- listener protocol -------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._metrics.setdefault(event.name or event.id, {})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        flat: dict[str, Any] = {
            "batchId": p.batchId,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs.triggerExecution":
                (p.durationMs or {}).get("triggerExecution"),
            "numInputRows": p.numInputRows,
        }
        wm = (p.eventTime or {}).get("watermark")
        if wm:
            flat["eventTime.watermark"] = wm
        for k, v in (p.observedMetrics or {}).items():
            row = v.asDict() if hasattr(v, "asDict") else v
            for mk, mv in dict(row).items():
                flat[f"observed.{k}.{mk}"] = mv
        for i, src in enumerate(p.sources or []):
            flat[f"source.{i}.endOffset"] = src.endOffset
        with self._lock:
            agg = self._metrics.setdefault(name, {})
            total = agg.get("totalInputRows", 0) + (p.numInputRows or 0)
            agg.update(flat)
            agg["totalInputRows"] = total

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            agg = self._metrics.setdefault(str(event.id), {})
            agg["terminated"] = True
            if event.exception:
                agg["exception"] = str(event.exception)

    def onQueryIdle(self, event) -> None:  # Spark 3.4+
        pass

    # --- scrape surface ----------------------------------------------
    def snapshot(self) -> dict[str, dict[str, Any]]:
        """Point-in-time copy of all per-query metrics (what a
        Prometheus exporter would serve)."""
        with self._lock:
            return {q: dict(m) for q, m in self._metrics.items()}
