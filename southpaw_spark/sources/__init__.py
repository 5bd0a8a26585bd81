"""Source connectors: Kafka CDC streams, file-based changelogs, and
WARC/WET web-crawl archives."""

from southpaw_spark.sources.files import read_changelog_json, read_snapshot
from southpaw_spark.sources.warc import (
    WARC_SCHEMA,
    html_to_text,
    iter_warc_records,
    read_warc,
    read_warc_html,
    read_wet,
    wet_doc_id,
)
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
    "WARC_SCHEMA",
    "html_to_text",
    "iter_warc_records",
    "read_warc",
    "read_warc_html",
    "read_wet",
    "wet_doc_id",
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
