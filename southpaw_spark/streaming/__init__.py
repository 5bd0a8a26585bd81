"""Streaming layer: entity state tables + the foreachBatch incremental
view-maintenance orchestrator (the Spark equivalent of the reference's
main loop, SURVEY §3.4)."""

from southpaw_spark.streaming.avro_cdc import (
    AvroCdcDecoder,
    attach_avro_cdc_multi_stream,
    attach_avro_cdc_stream,
)
from southpaw_spark.streaming.dedup_stream import (
    IncrementalDeduper,
    IncrementalKeyDeduper,
    IncrementalSpanDeduper,
    IncrementalVectorDeduper,
    attach_dedup_stream,
)
from southpaw_spark.streaming.ivm import IncrementalDenormalizer
from southpaw_spark.streaming.metrics import (
    Metrics,
    MetricsHttpExporter,
    SouthpawStreamingListener,
    prometheus_lines,
)
from southpaw_spark.streaming.state import ParquetStateStore, suggest_n_buckets
from southpaw_spark.streaming.temporal import (
    asof_join_auto,
    asof_join_stream,
    asof_join_stream_stream,
    asof_state,
)
from southpaw_spark.streaming.windows import (
    gapfill_stream,
    ohlc_stream,
    sessionize_stream,
    windowed_event_counts,
)

__all__ = [
    "AvroCdcDecoder",
    "IncrementalDeduper",
    "IncrementalKeyDeduper",
    "IncrementalSpanDeduper",
    "IncrementalVectorDeduper",
    "IncrementalDenormalizer",
    "Metrics",
    "MetricsHttpExporter",
    "prometheus_lines",
    "ParquetStateStore",
    "suggest_n_buckets",
    "attach_dedup_stream",
    "SouthpawStreamingListener",
    "asof_join_auto",
    "asof_join_stream",
    "asof_join_stream_stream",
    "asof_state",
    "attach_avro_cdc_multi_stream",
    "attach_avro_cdc_stream",
    "gapfill_stream",
    "ohlc_stream",
    "sessionize_stream",
    "windowed_event_counts",
]
