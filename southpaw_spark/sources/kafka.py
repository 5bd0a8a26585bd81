"""Kafka CDC source/sink wiring (reference O1/O16, SURVEY §2.1).

The reference consumes `(key bytes, value bytes)` CDC topics where the
record key is the primary key and a null value is a tombstone
(``README.md:13``); it produces the same shape on the output topic. In
Spark that is exactly the built-in Kafka source/sink:

* source: ``spark.readStream.format("kafka")`` — offsets, rebalancing
  and restart come from the checkpoint, replacing the reference's
  self-managed offset keyspaces (``topic/KafkaTopic.java:287-344``);
* sink: a DataFrame with ``key``/``value`` binary columns written with
  ``format("kafka")`` — null value = tombstone, matching the reference's
  output contract (``topic/KafkaTopic.java:425-434``).

No Kafka broker or ``spark-sql-kafka`` jar exists in the test
environment, so the JVM-source builder is exercised for plan
construction only; the parse/sink-frame helpers are pure DataFrame
transforms and are unit-tested against literal frames. O1 *execution*
is covered by the jar-free ``kafka_py`` Python data source
(``sources/kafka_pyds.py``, ``python_source=True`` here) — same option
names and output shape — run end-to-end in pytest against the
wire-protocol loopback broker (``sources/kafka_broker.py``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_source_options(
    bootstrap_servers: str,
    topics: Sequence[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 250_000,
    options: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """The EXACT option map handed to ``readStream.format("kafka")`` —
    a pure function so the source spec is assertable without a broker
    or the `spark-sql-kafka` jar on the classpath (the sandbox has
    neither; see README "O1 environment gate"). Caller-supplied
    ``options`` override the defaults, matching DataStreamReader's
    last-write-wins option semantics."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(options or {})
    return opts


def kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: Sequence[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 250_000,
    options: Mapping[str, str] | None = None,
    python_source: bool = False,
    planner_state_dir: str | None = None,
    max_offsets_ceiling: int | None = None,
    adaptive_drain_triggers: int = 1,
) -> DataFrame:
    """Raw CDC stream over one or more topics. ``maxOffsetsPerTrigger``
    bounds micro-batch size — the backpressure role of the reference's
    ``topic.lag.trigger``/``create.records.trigger`` knobs (SURVEY §4.2).

    ``python_source=True`` swaps the JVM connector for the jar-free
    ``kafka_py`` data source (same options, same output columns); use it
    where the spark-sql-kafka jar can't be shipped. The JVM source
    remains the default on real clusters (JVM-side Arrow-free ingest).

    ``planner_state_dir`` (kafka_py only; colocate it with the query
    checkpoint) persists each trigger's planned end offsets so a
    RESTART against a deep backlog still caps its first micro-batch at
    ``maxOffsetsPerTrigger`` — without it the Python DS API's
    latest-before-initial call order leaves the first batch uncapped
    (documented in ``sources/kafka_pyds.py``).

    ``max_offsets_ceiling`` (kafka_py only) turns on adaptive catch-up:
    when backlog exceeds the steady-state cap, the per-trigger cap
    scales to min(ceiling, max(cap, lag / adaptive_drain_triggers)) —
    deep backlogs drain in fewer, bigger batches (the per-trigger fixed
    cost dominates small IVM deltas, BASELINE §35) while lag ≤ cap
    keeps the low-latency static behavior. Size the ceiling to the
    largest micro-batch the executors can hold; the reference's
    ``topic.lag.trigger`` drain trade (``Southpaw.java:258-282``)."""
    if python_source:
        from southpaw_spark.sources.kafka_pyds import register_kafka_py

        register_kafka_py(spark)
    extra = dict(options or {})
    if planner_state_dir is not None:
        if not python_source:
            raise ValueError(
                "planner_state_dir applies to the kafka_py source only "
                "(the JVM connector caps restarts natively)"
            )
        extra["plannerStateDir"] = planner_state_dir
    if max_offsets_ceiling is not None:
        if not python_source:
            raise ValueError(
                "max_offsets_ceiling applies to the kafka_py source only "
                "(the JVM connector has no adaptive cap)"
            )
        extra["maxOffsetsPerTriggerCeiling"] = str(int(max_offsets_ceiling))
        if adaptive_drain_triggers != 1:
            extra["adaptiveDrainTriggers"] = str(int(adaptive_drain_triggers))
    reader = spark.readStream.format("kafka_py" if python_source else "kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topics, starting_offsets,
        max_offsets_per_trigger, extra,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_cdc_json(
    raw: DataFrame,
    key_schema: T.StructType,
    value_schema: T.StructType,
    topic_to_entity: Mapping[str, str] | None = None,
) -> DataFrame:
    """Decode a Kafka CDC frame (key/value JSON) into changelog shape:
    key fields + payload fields + ``seq`` (a total order per key derived
    from partition/offset) + ``is_tombstone`` (null value bytes).

    The reference's serde surface (O2/O3) maps to ``from_json`` here;
    Avro topics swap in ``from_avro`` with an identical frame shape.
    """
    out = raw.select(
        F.col("topic"),
        F.from_json(F.col("key").cast("string"), key_schema).alias("k"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("value").isNull().alias("is_tombstone"),
        # offsets are per-partition monotonic; (partition, offset) packed
        # into one long gives latest-wins per key because a key lives in
        # one partition (Kafka keyed-partitioning invariant)
        (F.col("partition").cast("long") * F.lit(1 << 40) + F.col("offset")).alias(
            "seq"
        ),
    )
    if topic_to_entity:
        mapping = F.create_map(
            *[F.lit(x) for kv in topic_to_entity.items() for x in kv]
        )
        out = out.withColumn("entity", mapping[F.col("topic")])
    return out.select(
        *([F.col("entity")] if topic_to_entity else []),
        F.col("k.*"),
        F.col("v.*"),
        "seq",
        "is_tombstone",
    )


def to_kafka_sink_frame(
    docs: DataFrame, key_cols: Sequence[str], value_col: str = "value"
) -> DataFrame:
    """Shape a (root pks…, json|null) output into the Kafka sink frame:
    key = canonical JSON of the PK struct, value = document JSON or null
    (tombstone)."""
    key = F.to_json(F.struct(*[F.col(c) for c in key_cols])).cast("binary")
    return docs.select(
        key.alias("key"), F.col(value_col).cast("binary").alias("value")
    )


def _decode_side(df: DataFrame, col: str, out: str, spec: Mapping) -> DataFrame:
    fmt = spec["format"]
    if fmt == "json":
        return df.withColumn(
            out, F.from_json(F.col(col).cast("string"), spec["schema"])
        )
    if fmt == "avro":
        from southpaw_spark.sources.avro_py import decode_avro_column

        return decode_avro_column(
            df, col, spec["schema"], out,
            confluent_framing=spec.get("confluent_framing", True),
        )
    if fmt == "avro_registry":
        from southpaw_spark.sources.schema_registry import (
            decode_confluent_avro,
        )

        return decode_confluent_avro(
            df, col, spec["registry"], out_col=out,
            reader_schema=spec.get("reader_schema"),
            known_ids=spec.get("known_ids"),
        )
    raise ValueError(f"unknown side format {fmt!r}")


def parse_cdc_mixed(
    raw: DataFrame, key: Mapping, value: Mapping
) -> DataFrame:
    """CDC parse with INDEPENDENT key/value serdes — the reference
    configures ``key.serde.class`` and ``value.serde.class`` separately
    per topic (``topic/Topics.java:43-55``; e.g. a JSON key with an
    Avro value is a legal deployment), which the matched-pair parsers
    (``parse_cdc_json`` / ``parse_cdc_avro``) can't express.

    ``key`` / ``value`` are side specs::

        {"format": "json", "schema": StructType-or-DDL}
        {"format": "avro", "schema": avro-json [, "confluent_framing"]}
        {"format": "avro_registry", "registry": obj
         [, "reader_schema", "known_ids"]}

    Output shape matches the other parsers: key fields + payload fields
    + ``seq`` + ``is_tombstone`` (null value bytes ⇒ tombstone).
    """
    parsed = _decode_side(raw, "key", "k", key)
    parsed = _decode_side(parsed, "value", "v", value)
    return parsed.select(
        F.col("k.*"),
        F.col("v.*"),
        (
            F.col("partition").cast("long") * F.lit(1 << 40) + F.col("offset")
        ).alias("seq"),
        F.col("value").isNull().alias("is_tombstone"),
    )


def kafka_doc_sink(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_for: Mapping[str, str] | str,
    key_cols_for: Mapping[str, Sequence[str]],
    value_col: str = "value",
    options: Mapping[str, str] | None = None,
):
    """The reference's OUTPUT side as an ``attach_stream`` sink: each
    denormalized tree's batch is shaped by :func:`to_kafka_sink_frame`
    (key = canonical PK JSON, null value = tombstone — the contract of
    ``topic/KafkaTopic.java:425-434``) and produced through the
    jar-free ``kafka_py`` writer (leader-routed, murmur2-partitioned).

    ``topic_for``: denormalized-name → topic (or one topic for all);
    ``key_cols_for``: denormalized-name → root PK columns; ``options``:
    extra writer options (e.g. the ``kafka.security.protocol`` /
    ``kafka.sasl.*`` / ``kafka.ssl.*`` auth surface — the producer
    authenticates like the source). Returns the ``sink(denorm_name,
    df)`` callable ``IncrementalDenormalizer.attach_stream`` expects,
    completing the reference topology end to end: Kafka CDC in →
    incremental denormalize → Kafka docs out."""
    from southpaw_spark.sources.kafka_pyds import register_kafka_py

    register_kafka_py(spark)

    def sink(denorm_name: str, df: DataFrame) -> None:
        topic = (
            topic_for if isinstance(topic_for, str)
            else topic_for[denorm_name]
        )
        frame = to_kafka_sink_frame(
            df, key_cols_for[denorm_name], value_col
        )
        writer = (
            frame.write.format("kafka_py")
            .mode("append")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.save()

    return sink
