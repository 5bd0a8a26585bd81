"""Streaming layer: entity state tables + the foreachBatch incremental
view-maintenance orchestrator (the Spark equivalent of the reference's
main loop, SURVEY §3.4)."""

from southpaw_spark.streaming.ivm import IncrementalDenormalizer
from southpaw_spark.streaming.metrics import Metrics, SouthpawStreamingListener
from southpaw_spark.streaming.state import ParquetStateStore

__all__ = [
    "IncrementalDenormalizer",
    "Metrics",
    "ParquetStateStore",
    "SouthpawStreamingListener",
]
