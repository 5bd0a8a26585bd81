"""Metrics surface with the reference's metric names.

The reference registers codahale meters/gauges and ships them to JMX
(``metric/Metrics.java``: ``records.consumed.<entity>`` meters,
``denormalized.records.created.<topic>`` meters, ``topic.lag`` /
``time.since.last.backup`` ``StaticGauge``s, ``states.committed``
timers). The Spark-native equivalents:

* :class:`Metrics` — a dict-backed registry with ``mark`` (meter) and
  ``gauge`` semantics; being a plain dict keeps it trivially
  serializable and assertable in tests, and any real deployment can
  forward its snapshot to whatever sink JMX used to be.
* :class:`SouthpawStreamingListener` — a ``StreamingQueryListener``
  bridging Structured Streaming progress events (input rows, batch
  duration, per-source lag when the source reports offsets) into the
  same registry. This is the Spark analog of the reference's JmxReporter
  wiring: the engine itself never polls — the streaming runtime pushes.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


class Metrics(dict):
    """Meter/gauge registry using the reference's metric names."""

    def mark(self, name: str, n: int = 1) -> None:
        """Meter semantics: monotonically accumulate."""
        self[name] = self.get(name, 0) + n

    def gauge(self, name: str, value) -> None:
        """Gauge semantics: last value wins (reference StaticGauge)."""
        self[name] = value

    def timer(self, name: str, seconds: float) -> None:
        """Timer semantics: accumulate total seconds + a count, like the
        reference's codahale Timer (rate/percentiles left to the sink)."""
        self.mark(f"{name}.count", 1)
        self[f"{name}.total_s"] = self.get(f"{name}.total_s", 0.0) + seconds

    def mark_backup(self) -> None:
        self.gauge("time.since.last.backup", 0)
        self["_last_backup_at"] = time.time()

    def snapshot(self) -> dict:
        out = dict(self)
        if "_last_backup_at" in out:
            out["time.since.last.backup"] = int(
                time.time() - out.pop("_last_backup_at")
            )
        return out


def _offset_total(raw) -> int | None:
    """Sum a SourceProgress offset into one number. File-ish sources
    report a plain integer string; Kafka reports a JSON object like
    ``{"topic": {"0": 123, "1": 456}}`` (per-partition offsets) — sum the
    leaves so Kafka lag actually registers instead of int() raising."""
    if raw is None:
        return None
    try:
        return int(raw)
    except (TypeError, ValueError):
        pass
    import json

    try:
        parsed = json.loads(raw)
    except (TypeError, ValueError):
        return None

    def total(node) -> int | None:
        if isinstance(node, dict):
            s = 0
            for v in node.values():
                t = total(v)
                if t is None:
                    return None
                s += t
            return s
        try:
            return int(node)
        except (TypeError, ValueError):
            return None

    return total(parsed)


class SouthpawStreamingListener(StreamingQueryListener):
    """Push streaming progress into a :class:`Metrics` registry.

    Registered via ``spark.streams.addListener(listener)``. Per progress
    event it records:

    * ``records.consumed.total`` meter — input rows across sources;
    * ``batch.duration.ms`` gauge — trigger execution time;
    * ``topic.lag`` gauge — summed ``latestOffset − endOffset`` where the
      source reports numeric offsets (Kafka does; file sources don't);
    * ``batches.processed`` meter.
    """

    def __init__(self, metrics: Metrics | None = None) -> None:
        self.metrics = metrics if metrics is not None else Metrics()

    # -- StreamingQueryListener interface ------------------------------

    def onQueryStarted(self, event) -> None:
        self.metrics.mark("queries.started")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        m = self.metrics
        m.mark("batches.processed")
        m.mark("records.consumed.total", int(p.numInputRows or 0))
        duration = (p.durationMs or {}).get("triggerExecution")
        if duration is not None:
            m.gauge("batch.duration.ms", int(duration))
        lag = 0
        has_lag = False
        for s in p.sources or []:
            latest = _offset_total(s.latestOffset)
            end = _offset_total(s.endOffset)
            if latest is None or end is None:
                continue
            lag += max(0, latest - end)
            has_lag = True
        if has_lag:
            m.gauge("topic.lag", lag)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.metrics.mark("queries.terminated")
