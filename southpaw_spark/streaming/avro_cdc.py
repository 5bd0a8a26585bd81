"""Registry-resolved Avro CDC decode wired into the streaming IVM loop.

This closes the loop between the decode surface
(``sources/schema_registry.parse_cdc_avro_with_registry`` — the
reference's ``serde/AvroSerde.java:32-80`` deserialization path) and the
incremental maintenance loop (``streaming/ivm.IncrementalDenormalizer``):
a raw Confluent-framed CDC stream (``key``/``value`` binary +
``partition``/``offset``) is decoded per micro-batch and fed to
``process_batch``.

Cross-batch caching, the scale-relevant part: the schema-id discovery
scan (one pass over the raw bytes) runs on the FIRST batch only; the
resulting ``known_ids`` and the pinned reader schemas are reused for
every later batch, so steady-state batches decode with zero discovery
scans and zero driver-side registry round-trips. Writer ids published
mid-stream (schema evolution) take the executor-side on-demand fetch
path inside ``decode_confluent_avro`` — the batch survives, and each
executor process fetches a new id at most once. The reader schema is
pinned at first sight (highest id, i.e. latest version), so the output
*type* is identical across all batches — a requirement for any
downstream state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from southpaw_spark.sources.schema_registry import (
    distinct_schema_ids_multi,
    parse_cdc_avro_with_registry,
)


class AvroCdcDecoder:
    """Stateful (driver-side) per-micro-batch decoder: discovery once,
    reader pinned once, ``known_ids`` carried across batches."""

    def __init__(
        self,
        registry,
        key_reader_schema: str | None = None,
        value_reader_schema: str | None = None,
    ) -> None:
        self.registry = registry
        self._key_reader = key_reader_schema
        self._value_reader = value_reader_schema
        self._known_ids: dict[str, list[int]] | None = None

    def decode_batch(self, raw: DataFrame) -> DataFrame:
        """Decode one micro-batch of raw CDC frames to changelog shape
        (key fields + payload fields + seq + is_tombstone)."""
        if self._known_ids is None:
            # first batch: ONE combined discovery scan, then never again
            self._known_ids = distinct_schema_ids_multi(raw, ["key", "value"])
        if self._key_reader is None and self._known_ids["key"]:
            self._key_reader = self.registry.get_schema(
                max(self._known_ids["key"])
            )
        if self._value_reader is None and self._known_ids["value"]:
            self._value_reader = self.registry.get_schema(
                max(self._known_ids["value"])
            )
        return parse_cdc_avro_with_registry(
            raw,
            self.registry,
            key_reader_schema=self._key_reader,
            value_reader_schema=self._value_reader,
            known_ids=self._known_ids,
        )


def attach_avro_cdc_stream(
    ivm,
    source: DataFrame,
    registry,
    entity: str,
    checkpoint_dir: str,
    sink,
    key_reader_schema: str | None = None,
    value_reader_schema: str | None = None,
    trigger: dict | None = None,
):
    """Wire a raw Confluent-framed CDC stream for one entity into an
    ``IncrementalDenormalizer`` via foreachBatch: decode (registry-
    resolved, ids cached across batches) → ``process_batch`` → ``sink``.
    The streaming analog of the reference's consume→deserialize→index
    loop (``Southpaw.java:236-285`` with ``serde/AvroSerde.java``).

    ``source`` must carry ``key``/``value`` binary and ``partition``/
    ``offset`` columns — the Kafka source frame, or any file-based
    replay of one. ``sink(denorm_name, df)`` receives each tree's doc
    upserts/tombstones, flushed before the state-version commit."""
    decoder = AvroCdcDecoder(
        registry,
        key_reader_schema=key_reader_schema,
        value_reader_schema=value_reader_schema,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            if not batch_df.head(1):
                return
            parsed = decoder.decode_batch(batch_df)
            ivm.process_batch({entity: parsed}, sink=sink)
        finally:
            batch_df.unpersist()

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def attach_avro_cdc_multi_stream(
    ivm,
    source: DataFrame,
    registry,
    topic_to_entity,
    checkpoint_dir: str,
    sink,
    reader_schemas=None,
    trigger: dict | None = None,
):
    """Multi-topic variant — the reference's actual consumption shape
    (one CDC topic per entity, ``Southpaw.java:236-285``): a single raw
    stream carrying a ``topic`` column fans out per entity, each entity
    decoding through its OWN cross-batch decoder (ids and pinned reader
    cached per entity), and ALL entities' deltas land in ONE
    ``process_batch`` call per trigger — so a micro-batch touching
    several entities rebuilds each dirty root once, not once per entity.

    ``topic_to_entity``: topic name → entity. ``reader_schemas``
    (optional): entity → ``(key_reader_json, value_reader_json)`` to pin
    output types up front; otherwise each entity pins to the latest id
    seen in its first batch. One topic-presence probe job per batch, not
    one per entity."""
    reader_schemas = reader_schemas or {}
    decoders = {
        entity: AvroCdcDecoder(
            registry,
            key_reader_schema=(reader_schemas.get(entity) or (None, None))[0],
            value_reader_schema=(reader_schemas.get(entity) or (None, None))[1],
        )
        for entity in topic_to_entity.values()
    }

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_df = batch_df.cache()
        try:
            present = {
                r[0] for r in batch_df.select("topic").distinct().collect()
            }
            deltas = {}
            for topic, entity in topic_to_entity.items():
                if topic not in present:
                    continue
                sl = batch_df.where(F.col("topic") == topic).drop("topic")
                deltas[entity] = decoders[entity].decode_batch(sl)
            if deltas:
                ivm.process_batch(deltas, sink=sink)
        finally:
            batch_df.unpersist()

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
