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


# ---------------------------------------------------------------------------
# metric EXPORT (reference ``metric/Metrics.java:50,137`` JmxReporter)
# ---------------------------------------------------------------------------

def prometheus_lines(metrics: Metrics, prefix: str = "southpaw") -> str:
    """Render a :class:`Metrics` snapshot in the Prometheus text
    exposition format (version 0.0.4 — the public standard scrape
    format). JMX itself is JVM-only, so the reference's ``JmxReporter``
    (``metric/Metrics.java:50``) maps to the scrape endpoint every
    Python-side deployment actually wires: each registry entry becomes
    one sample of the single family ``<prefix>_metric`` with the
    reference metric name carried LOSSLESSLY in the ``name`` label
    (dotted names like ``records.consumed.user`` are not legal
    Prometheus metric names, and mangling dots into underscores would
    collide ``a.b_c`` with ``a_b.c``). Non-numeric values are skipped —
    Prometheus samples are floats."""
    out = [
        f"# HELP {prefix}_metric southpaw_spark metric "
        "(reference name in the 'name' label)",
        f"# TYPE {prefix}_metric untyped",
    ]
    for name, value in sorted(metrics.snapshot().items()):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            continue
        esc = str(name).replace("\\", r"\\").replace('"', r"\"")
        out.append(f'{prefix}_metric{{name="{esc}"}} {float(value):g}')
    return "\n".join(out) + "\n"


class MetricsHttpExporter:
    """Serve a :class:`Metrics` registry at ``GET /metrics`` — the
    ops-facing half of the reference's JMX wiring as a Prometheus
    scrape target. Pure stdlib (``http.server`` on a daemon thread);
    ``port=0`` binds an ephemeral port (exposed as ``.port``). The
    snapshot is taken per scrape, so ``time.since.last.backup`` ticks
    like the reference's StaticGauge. Use as a context manager or call
    :meth:`close`."""

    def __init__(
        self,
        metrics: Metrics,
        host: str = "127.0.0.1",
        port: int = 0,
        prefix: str = "southpaw",
    ) -> None:
        import http.server
        import threading

        exporter = self

        class _Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
                if self.path.split("?")[0] != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = prometheus_lines(
                    exporter.metrics, exporter.prefix
                ).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # silence per-scrape noise
                pass

        self.metrics = metrics
        self.prefix = prefix
        self._server = http.server.ThreadingHTTPServer(
            (host, port), _Handler
        )
        self.host, self.port = self._server.server_address[:2]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=10)

    def __enter__(self) -> "MetricsHttpExporter":
        return self

    def __exit__(self, *a) -> None:
        self.close()
