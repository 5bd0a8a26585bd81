"""Avro CDC serde (reference O2: ``serde/AvroSerde.java`` — Confluent
schema-registry Avro on Kafka keys/values).

Spark's native ``from_avro``/``to_avro`` cover the wire format; the
Confluent framing (magic byte 0x0 + 4-byte schema id before the Avro
body, ``AvroSerde.java``) is stripped/added here. The Avro data source
jar is not bundled in this test environment (pip pyspark ships without
``spark-avro``), so construction degrades with a clear error; on a real
cluster launch with ``--packages org.apache.spark:spark-avro_2.13:<ver>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def avro_available(spark=None) -> bool:
    """True iff Avro functions can actually execute. The Python import
    alone is not evidence — pip pyspark ships the Python wrapper without
    the JVM data source, so we probe with a real (tiny) execution."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError:  # pragma: no cover
        return False
    if spark is None:
        return True  # import-level check only; pass a session for certainty
    try:
        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False


def strip_confluent_header(value: Column) -> Column:
    """Drop the Confluent wire framing: 1 magic byte + 4-byte schema id.
    (``serde/AvroSerde.java`` reads the id to fetch the writer schema;
    with a pinned reader schema the id is not needed.)"""
    return F.substring(value, 6, 2147483647)


def parse_cdc_avro(
    raw: DataFrame,
    key_avro_schema: str,
    value_avro_schema: str,
    confluent_framing: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Decode a Kafka CDC frame whose key/value are Avro. Mirrors
    ``sources.kafka.parse_cdc_json`` (same output shape: key fields +
    payload fields + seq + is_tombstone).

    ``engine``: ``"jvm"`` (spark-avro ``from_avro`` — codegen, the fast
    path), ``"python"`` (the spec-complete pure-Python codec in
    ``avro_py``, Arrow-batched ``mapInPandas`` — no jar needed), or
    ``"auto"`` (probe the JVM path, fall back to Python)."""
    if engine == "auto":
        engine = "jvm" if avro_available(raw.sparkSession) else "python"
    if engine == "python":
        from southpaw_spark.sources.avro_py import decode_avro_column

        parsed = decode_avro_column(
            raw, "key", key_avro_schema, "k", confluent_framing=confluent_framing
        )
        parsed = decode_avro_column(
            parsed,
            "value",
            value_avro_schema,
            "v",
            confluent_framing=confluent_framing,
        )
        return parsed.select(
            F.col("k.*"),
            F.col("v.*"),
            (
                F.col("partition").cast("long") * F.lit(1 << 40) + F.col("offset")
            ).alias("seq"),
            F.col("value").isNull().alias("is_tombstone"),
        )
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r}")
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "spark-avro is not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "or engine='python'"
        ) from e
    key_b = F.col("key")
    val_b = F.col("value")
    if confluent_framing:
        key_b = strip_confluent_header(key_b)
        val_b = strip_confluent_header(val_b)
    return raw.select(
        from_avro(key_b, key_avro_schema).alias("k"),
        from_avro(val_b, value_avro_schema).alias("v"),
        F.col("value").isNull().alias("is_tombstone"),
        (F.col("partition").cast("long") * F.lit(1 << 40) + F.col("offset")).alias(
            "seq"
        ),
    ).select(F.col("k.*"), F.col("v.*"), "seq", "is_tombstone")
