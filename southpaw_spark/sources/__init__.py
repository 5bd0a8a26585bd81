"""Source connectors: Kafka CDC streams and file-based changelogs."""

from southpaw_spark.sources.files import read_changelog_json, read_snapshot
from southpaw_spark.sources.kafka import (
    kafka_cdc_stream,
    kafka_source_options,
    parse_cdc_json,
    parse_cdc_mixed,
    to_kafka_sink_frame,
)
from southpaw_spark.sources.schema_registry import (
    FileSchemaRegistry,
    HttpSchemaRegistry,
    StaticSchemaRegistry,
    decode_confluent_avro,
    parse_cdc_avro_with_registry,
)

__all__ = [
    "FileSchemaRegistry",
    "HttpSchemaRegistry",
    "StaticSchemaRegistry",
    "decode_confluent_avro",
    "kafka_cdc_stream",
    "kafka_source_options",
    "parse_cdc_avro_with_registry",
    "parse_cdc_json",
    "parse_cdc_mixed",
    "read_changelog_json",
    "read_snapshot",
    "to_kafka_sink_frame",
]
