"""Latency tracking analog.

Reference: ``flink-streaming-java/.../streamrecord/LatencyMarker.java``
+ ``ExecutionConfig#setLatencyTrackingInterval`` — sources periodically
emit latency markers; operators forward them and the metric system
builds per-operator latency histograms.

Spark's execution unit is the micro-batch, so per-RECORD latency does
not exist (documented narrowing, SURVEY §4); the engine's native
equivalent of the latency metric system is the
``StreamingQueryListener`` / ``QueryProgressEvent`` stream:
per-trigger processing durations (addBatch, getBatch, walCommit…),
input/processed rates, and event-time watermark lag.  ``LatencyTracker``
captures those into the same shape the reference's histograms serve —
min/max/mean batch latency per query — and exposes the raw progress
records for dashboards.

At scale this is the production-correct surface: the listener runs on
the driver, receives one JSON-able progress object per trigger
(constant size regardless of data volume), and nothing touches the
data path.
"""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class LatencyTracker(StreamingQueryListener):
    """Collects per-trigger latency metrics for every streaming query
    on the session (LatencyMarker histogram analog)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.progress: list[dict] = []

    # StreamingQueryListener interface
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        with self._lock:
            self.progress.append({
                "id": str(p.id),
                "batchId": p.batchId,
                "durationMs": dict(p.durationMs or {}),
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
            })

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def attach(self, spark) -> "LatencyTracker":
        spark.streams.addListener(self)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self)

    def histogram(self) -> dict:
        """min/max/mean trigger latency over captured progress (the
        per-operator latency histogram's query-level analog)."""
        lat = [p["durationMs"].get("triggerExecution")
               for p in self.progress
               if p["durationMs"].get("triggerExecution") is not None]
        if not lat:
            return {"count": 0}
        return {"count": len(lat), "min_ms": min(lat), "max_ms": max(lat),
                "mean_ms": sum(lat) / len(lat)}
