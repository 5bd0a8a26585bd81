import json

import pytest
from pyspark.sql import functions as F, types as T

from southpaw_spark.sources.files import read_changelog_json
from southpaw_spark.sources.kafka import (
    kafka_cdc_stream,
    parse_cdc_json,
    to_kafka_sink_frame,
)


def test_parse_cdc_json_roundtrip(spark):
    raw = spark.createDataFrame(
        [
            ("user", b'{"user_id": 10}', b'{"user_name": "alice"}', 0, 5),
            ("user", b'{"user_id": 10}', None, 0, 6),  # tombstone
            ("user", b'{"user_id": 20}', b'{"user_name": "bob"}', 1, 2),
        ],
        "topic string, key binary, value binary, partition int, offset long",
    )
    out = parse_cdc_json(
        raw,
        T.StructType([T.StructField("user_id", T.IntegerType())]),
        T.StructType([T.StructField("user_name", T.StringType())]),
        topic_to_entity={"user": "user"},
    )
    rows = sorted(out.collect(), key=lambda r: r["seq"])
    assert [r["user_id"] for r in rows] == [10, 10, 20]
    assert [r["is_tombstone"] for r in rows] == [False, True, False]
    # (partition, offset) ordering: partition 1 offset 2 sorts after
    # partition 0 entries — but seq need only order within a key
    assert rows[0]["seq"] < rows[1]["seq"]


def test_to_kafka_sink_frame_tombstones(spark):
    docs = spark.createDataFrame(
        [(1, '{"Record":{}}'), (2, None)], "id int, value string"
    )
    frame = to_kafka_sink_frame(docs, ["id"])
    rows = {bytes(r["key"]): r["value"] for r in frame.collect()}
    assert json.loads(rows[b'{"id":1}'].decode()) == {"Record": {}}
    assert rows[b'{"id":2}'] is None


def test_read_changelog_json_infers_tombstones(spark, tmp_path):
    p = tmp_path / "user.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"seq": 1, "user_id": 10, "user_name": "alice"}),
                json.dumps({"seq": 2, "user_id": 10, "user_name": None}),
            ]
        )
    )
    df = read_changelog_json(
        spark, str(p), "seq long, user_id int, user_name string", key_cols=["user_id"]
    )
    rows = sorted(df.collect(), key=lambda r: r["seq"])
    # key column non-null but all payload columns null → tombstone
    assert rows[0]["is_tombstone"] is False
    assert rows[1]["is_tombstone"] is True


# -- O2: Avro (pure-Python spec codec — executable without spark-avro) ----


def test_avro_py_roundtrip_primitives():
    from southpaw_spark.sources.avro_py import decode, encode

    sch = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "n", "type": ["null", "string"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "int"}},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B"]}},
        ],
    }
    rec = {
        "b": True, "i": -123, "l": 2**40, "f": 1.5, "d": -2.25,
        "s": "héllo", "by": b"\x00\x01", "n": None,
        "arr": [1, -2, 3], "m": {"x": 1, "y": -5}, "e": "B",
    }
    assert decode(sch, encode(sch, rec)) == rec


def test_avro_py_zigzag_edges():
    from southpaw_spark.sources.avro_py import decode, encode

    sch = {"type": "record", "name": "R",
           "fields": [{"name": "v", "type": "long"}]}
    for v in (0, -1, 1, 63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert decode(sch, encode(sch, {"v": v})) == {"v": v}, v


def test_avro_py_against_known_spec_bytes():
    """Spec examples (Avro 1.11 'Binary Encoding'): long zigzag values
    and string framing have published byte representations."""
    from southpaw_spark.sources.avro_py import decode, encode

    # spec table: 0→00, -1→01, 1→02, -2→03, 2→04
    lsch = {"type": "record", "name": "R",
            "fields": [{"name": "v", "type": "long"}]}
    for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                 (-2, b"\x03"), (2, b"\x04")]:
        assert encode(lsch, {"v": v}) == b
    # spec example: "foo" → 06 66 6f 6f
    ssch = {"type": "record", "name": "R",
            "fields": [{"name": "s", "type": "string"}]}
    assert encode(ssch, {"s": "foo"}) == b"\x06foo"
    assert decode(ssch, b"\x06foo") == {"s": "foo"}


def test_parse_cdc_avro_python_engine_end_to_end(spark):
    """O2 executes end-to-end without the spark-avro jar: Confluent-framed
    Avro key/value kafka frames → typed CDC rows → current_state."""
    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.sources.avro import parse_cdc_avro
    from southpaw_spark.sources.avro_py import confluent_frame, encode

    key_sch = '{"type":"record","name":"K","fields":[{"name":"id","type":"long"}]}'
    val_sch = (
        '{"type":"record","name":"V","fields":['
        '{"name":"name","type":"string"},{"name":"score","type":"double"}]}'
    )
    frames = []
    for off, (kid, name, score) in enumerate(
        [(1, "a", 1.0), (2, "b", 2.0), (1, "a2", 1.5)]
    ):
        frames.append(
            (
                confluent_frame(7, encode(key_sch, {"id": kid})),
                confluent_frame(7, encode(val_sch, {"name": name, "score": score})),
                0,
                off,
            )
        )
    # tombstone for key 2 (null kafka value)
    frames.append((confluent_frame(7, encode(key_sch, {"id": 2})), None, 0, 99))
    raw = spark.createDataFrame(
        frames, "key binary, value binary, partition int, offset long"
    )
    parsed = parse_cdc_avro(raw, key_sch, val_sch, engine="python")
    state = current_state(parsed, ["id"])
    got = {r["id"]: (r["name"], r["score"]) for r in state.collect()}
    assert got == {1: ("a2", 1.5)}  # latest wins; key 2 tombstoned


def test_parse_cdc_avro_auto_falls_back(spark):
    """engine='auto' must pick a WORKING engine in this jar-less env."""
    from southpaw_spark.sources.avro import parse_cdc_avro
    from southpaw_spark.sources.avro_py import confluent_frame, encode

    key_sch = '{"type":"record","name":"K","fields":[{"name":"id","type":"long"}]}'
    val_sch = '{"type":"record","name":"V","fields":[{"name":"x","type":"int"}]}'
    raw = spark.createDataFrame(
        [(confluent_frame(1, encode(key_sch, {"id": 5})),
          confluent_frame(1, encode(val_sch, {"x": 9})), 0, 0)],
        "key binary, value binary, partition int, offset long",
    )
    rows = parse_cdc_avro(raw, key_sch, val_sch).collect()
    assert rows[0]["id"] == 5 and rows[0]["x"] == 9


# -- Confluent schema-registry resolution (reference serde/AvroSerde.java:
# 32-80: writer schema fetched per frame id; record/BaseRecord.java:37-41:
# schemas may drift between records of the same type) -----------------------

V1 = (
    '{"type":"record","name":"V","fields":['
    '{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
)
V2 = (
    '{"type":"record","name":"V","fields":['
    '{"name":"id","type":"long"},{"name":"name","type":"string"},'
    '{"name":"score","type":"double","default":0.5}]}'
)
V3_RENAMED = (
    '{"type":"record","name":"V","fields":['
    '{"name":"id","type":"long"},'
    '{"name":"full_name","type":"string","aliases":["name"]},'
    '{"name":"score","type":"double","default":0.5}]}'
)


def _framed_corpus(spark):
    from southpaw_spark.sources.avro_py import confluent_frame, encode

    rows = [
        (confluent_frame(1, encode(V1, {"id": 1, "name": "a"})),),
        (confluent_frame(2, encode(V2, {"id": 2, "name": "b", "score": 9.0})),),
        (confluent_frame(1, encode(V1, {"id": 3, "name": "c"})),),
        (None,),
    ]
    return spark.createDataFrame(rows, "value binary")


def test_registry_decode_heterogeneous_ids_latest_reader(spark):
    """One corpus, two writer-schema ids: every record resolves to the
    latest (highest-id) schema; old records take the reader default."""
    from southpaw_spark.sources.schema_registry import (
        StaticSchemaRegistry,
        decode_confluent_avro,
        distinct_schema_ids,
    )

    df = _framed_corpus(spark)
    assert distinct_schema_ids(df, "value") == [1, 2]
    reg = StaticSchemaRegistry({1: V1, 2: V2})
    out = decode_confluent_avro(df, "value", reg, out_col="v")
    got = {
        r["v"]["id"]: (r["v"]["name"], r["v"]["score"])
        for r in out.collect()
        if r["v"] is not None
    }
    assert got == {1: ("a", 0.5), 2: ("b", 9.0), 3: ("c", 0.5)}
    nulls = [r for r in out.collect() if r["v"] is None]
    assert len(nulls) == 1  # tombstone passthrough


def test_registry_decode_alias_rename_and_explicit_reader(spark):
    """Explicit reader schema with an aliased rename: writer 'name' fills
    reader 'full_name' for every older record."""
    from southpaw_spark.sources.schema_registry import (
        StaticSchemaRegistry,
        decode_confluent_avro,
    )

    df = _framed_corpus(spark)
    reg = StaticSchemaRegistry({1: V1, 2: V2})
    out = decode_confluent_avro(
        df, "value", reg, out_col="v", reader_schema=V3_RENAMED
    )
    got = {r["v"]["id"]: r["v"]["full_name"] for r in out.collect() if r["v"]}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_registry_missing_id_fails_loudly(spark):
    """An id the REGISTRY has never heard of (corrupt frame / deleted
    subject) still fails the batch — on-demand fetch only rescues ids
    the registry can actually resolve."""
    from southpaw_spark.sources.schema_registry import (
        StaticSchemaRegistry,
        decode_confluent_avro,
    )

    df = _framed_corpus(spark)  # carries ids 1 and 2
    reg = StaticSchemaRegistry({1: V1})  # registry lacks id 2 entirely
    with pytest.raises(Exception, match="not in registry"):
        decode_confluent_avro(
            df, "value", reg, out_col="v", known_ids=[1]
        ).collect()
    with pytest.raises(LookupError, match="not in registry"):
        StaticSchemaRegistry({1: V1}).get_schema(2)


def test_registry_on_demand_fetch_survives_mid_stream_evolution(spark):
    """Mid-stream schema evolution (reference serde/AvroSerde.java:32-80
    fetches by frame id when first seen): the driver snapshot knows only
    id 1, the batch carries id 2 — the executor fetches id 2 on demand
    instead of killing the batch, and the new-writer records resolve to
    the pinned reader (V1: no score field)."""
    from southpaw_spark.sources.schema_registry import (
        StaticSchemaRegistry,
        decode_confluent_avro,
    )

    df = _framed_corpus(spark)
    reg = StaticSchemaRegistry({1: V1, 2: V2})
    out = decode_confluent_avro(df, "value", reg, out_col="v", known_ids=[1])
    got = {r["v"]["id"]: r["v"]["name"] for r in out.collect() if r["v"]}
    assert got == {1: "a", 2: "b", 3: "c"}
    assert "score" not in out.schema["v"].dataType.fieldNames()


def test_distinct_schema_ids_multi_single_scan(spark):
    """Per-column id discovery over key+value in one combined scan, with
    nulls (tombstones) ignored per column."""
    from southpaw_spark.sources.avro_py import confluent_frame, encode
    from southpaw_spark.sources.schema_registry import distinct_schema_ids_multi

    key_sch = '{"type":"record","name":"K","fields":[{"name":"k","type":"long"}]}'
    rows = [
        (
            confluent_frame(5, encode(key_sch, {"k": 1})),
            confluent_frame(1, encode(V1, {"id": 1, "name": "a"})),
        ),
        (
            confluent_frame(6, encode(key_sch, {"k": 2})),
            confluent_frame(2, encode(V2, {"id": 2, "name": "b", "score": 1.0})),
        ),
        (confluent_frame(5, encode(key_sch, {"k": 3})), None),
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    assert distinct_schema_ids_multi(raw, ["key", "value"]) == {
        "key": [5, 6],
        "value": [1, 2],
    }


def test_file_schema_registry_end_to_end_cdc(spark, tmp_path):
    """File-backed registry (a registry export on disk) drives the full
    CDC parse: heterogeneous value ids in one topic, same output shape as
    parse_cdc_avro."""
    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.sources.avro_py import confluent_frame, encode
    from southpaw_spark.sources.schema_registry import (
        FileSchemaRegistry,
        parse_cdc_avro_with_registry,
    )

    key_sch = '{"type":"record","name":"K","fields":[{"name":"k","type":"long"}]}'
    (tmp_path / "5.avsc").write_text(key_sch)
    (tmp_path / "1.avsc").write_text(V1)
    (tmp_path / "2.avsc").write_text(V2)
    frames = [
        (
            confluent_frame(5, encode(key_sch, {"k": 1})),
            confluent_frame(1, encode(V1, {"id": 1, "name": "a"})),
            0,
            0,
        ),
        (
            confluent_frame(5, encode(key_sch, {"k": 1})),
            confluent_frame(2, encode(V2, {"id": 1, "name": "a2", "score": 7.0})),
            0,
            1,
        ),
        (confluent_frame(5, encode(key_sch, {"k": 2})), None, 0, 2),
    ]
    raw = spark.createDataFrame(
        frames, "key binary, value binary, partition int, offset long"
    )
    reg = FileSchemaRegistry(str(tmp_path))
    parsed = parse_cdc_avro_with_registry(raw, reg)
    state = current_state(parsed, ["k"])
    got = {r["k"]: (r["name"], r["score"]) for r in state.collect()}
    assert got == {1: ("a2", 7.0)}  # latest wins; key 2 tombstoned


def test_http_schema_registry_parses_confluent_response(monkeypatch):
    import io as _io
    import json as _json
    import urllib.request

    from southpaw_spark.sources.schema_registry import HttpSchemaRegistry

    seen = {}

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["auth"] = req.get_header("Authorization")
        return _io.BytesIO(_json.dumps({"schema": V1}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    reg = HttpSchemaRegistry("http://sr.example:8081/", authorization="Basic xyz")
    assert reg.get_schema(42) == V1
    assert seen["url"] == "http://sr.example:8081/schemas/ids/42"
    assert seen["auth"] == "Basic xyz"


def test_http_schema_registry_basic_auth_against_live_stub():
    """Real HTTP round-trip against an authed local stub: correct
    basic_auth (Confluent basic.auth.user.info format and tuple form)
    fetches the schema; missing/wrong credentials get the 401 back."""
    import base64 as _b64
    import json as _json
    import threading
    import urllib.error
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pytest

    from southpaw_spark.sources.schema_registry import HttpSchemaRegistry

    expected = "Basic " + _b64.b64encode(b"sr-user:sr-pass").decode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.headers.get("Authorization") != expected:
                self.send_response(401)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(_json.dumps({"schema": V1}).encode())

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert HttpSchemaRegistry(url, basic_auth="sr-user:sr-pass").get_schema(7) == V1
        assert (
            HttpSchemaRegistry(url, basic_auth=("sr-user", "sr-pass")).get_schema(7)
            == V1
        )
        with pytest.raises(urllib.error.HTTPError):
            HttpSchemaRegistry(url).get_schema(7)
        with pytest.raises(urllib.error.HTTPError):
            HttpSchemaRegistry(url, basic_auth="sr-user:wrong").get_schema(7)
        with pytest.raises(ValueError, match="not both"):
            HttpSchemaRegistry(url, authorization="Bearer x", basic_auth="a:b")
    finally:
        srv.shutdown()


def test_parse_cdc_mixed_json_key_avro_value(spark):
    """Reference parity: key.serde.class and value.serde.class are
    independent — a JSON key with a registry-resolved Avro value must
    parse to the standard changelog shape."""
    import json as _json

    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.sources.avro_py import confluent_frame, encode
    from southpaw_spark.sources.kafka import parse_cdc_mixed
    from southpaw_spark.sources.schema_registry import StaticSchemaRegistry

    val_sch = {"type": "record", "name": "V",
               "fields": [{"name": "name", "type": "string"}]}
    reg = StaticSchemaRegistry({7: _json.dumps(val_sch)})
    frames = [
        (b'{"id": 1}', confluent_frame(7, encode(val_sch, {"name": "a"})), 0, 0),
        (b'{"id": 1}', confluent_frame(7, encode(val_sch, {"name": "a2"})), 0, 1),
        (b'{"id": 2}', None, 0, 2),  # tombstone
    ]
    raw = spark.createDataFrame(
        frames, "key binary, value binary, partition int, offset long"
    )
    parsed = parse_cdc_mixed(
        raw,
        key={"format": "json", "schema": "id long"},
        value={"format": "avro_registry", "registry": reg},
    )
    assert set(parsed.columns) == {"id", "name", "seq", "is_tombstone"}
    state = current_state(parsed, ["id"])
    got = {r["id"]: r["name"] for r in state.collect()}
    assert got == {1: "a2"}


def test_kafka_source_options_exact():
    """The pure source spec IS the O1 plan surface the sandbox can
    assert: these options, applied to readStream.format("kafka"),
    are the documented Structured Streaming Kafka source contract."""
    from southpaw_spark.sources.kafka import kafka_source_options

    opts = kafka_source_options(
        "b1:9092,b2:9092", ["db.users", "db.orders"],
        options={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "db.users,db.orders",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "250000",
        "kafka.security.protocol": "SASL_SSL",
    }
    # backpressure knob off → option absent (unbounded batches)
    assert "maxOffsetsPerTrigger" not in kafka_source_options(
        "b:9092", ["t"], max_offsets_per_trigger=None
    )
    # caller overrides win (DataStreamReader last-write-wins semantics)
    assert kafka_source_options(
        "b:9092", ["t"], options={"startingOffsets": "latest"}
    )["startingOffsets"] == "latest"


def test_kafka_builder_reaches_data_source_resolution(spark):
    """Drive kafka_cdc_stream all the way into Spark's data-source
    resolution. With the spark-sql-kafka jar on the classpath this
    returns the streaming frame (and we pin its schema); without it —
    this sandbox: no network, no jar, broker tarball unobtainable (see
    README "O1 environment gate") — Spark must fail precisely at
    DATA_SOURCE_NOT_FOUND for "kafka", proving the builder wiring is
    correct up to the missing artifact, not silently misconfigured."""
    try:
        raw = kafka_cdc_stream(spark, "localhost:9092", ["t"])
    except Exception as e:  # noqa: BLE001 — asserting the exact failure
        msg = str(e)
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
        assert "kafka" in msg.lower()
        return
    assert raw.isStreaming
    assert {f.name for f in raw.schema.fields} >= {
        "key", "value", "topic", "partition", "offset", "timestamp",
    }


def test_encode_avro_column_roundtrip(spark):
    """The serialize half of the Avro serde (AvroSerde.java is
    bidirectional): struct → Confluent-framed binary → decode ≡
    identity; null struct = tombstone bytes; missing fields fail."""
    import json as _json

    import pytest as _pytest

    from southpaw_spark.sources.avro_py import (
        decode_avro_column,
        encode_avro_column,
    )

    schema = _json.dumps(
        {
            "type": "record",
            "name": "User",
            "fields": [
                {"name": "user_id", "type": "int"},
                {"name": "user_name", "type": ["null", "string"]},
            ],
        }
    )
    df = spark.createDataFrame(
        [(1, (10, "alice")), (2, (20, None)), (3, None)],
        "id long, payload struct<user_id:int, user_name:string>",
    )
    enc = encode_avro_column(df, "payload", schema, "value", schema_id=7)
    rows = {r.id: r.value for r in enc.collect()}
    assert rows[3] is None
    assert bytes(rows[1])[:1] == b"\x00"
    assert int.from_bytes(bytes(rows[1])[1:5], "big") == 7
    back = decode_avro_column(enc, "value", schema, "d", confluent_framing=True)
    got = {
        r.id: (r.d.user_id, r.d.user_name) if r.d is not None else None
        for r in back.collect()
    }
    assert got == {1: (10, "alice"), 2: (20, None), 3: None}

    bad = _json.dumps(
        {
            "type": "record",
            "name": "U",
            "fields": [{"name": "nope", "type": "int"}],
        }
    )
    with _pytest.raises(ValueError, match="lacks Avro fields"):
        encode_avro_column(df, "payload", bad)


def test_avro_cdc_over_kafka_py(spark, tmp_path):
    """Avro-valued CDC records over the wire: encode → kafka_py sink →
    kafka_py source → parse_cdc_mixed(avro value) reproduces the
    payloads — the reference's Avro-topic deployment end to end."""
    import json as _json

    from pyspark.sql import functions as F

    from southpaw_spark.sources.avro_py import encode_avro_column
    from southpaw_spark.sources.kafka import parse_cdc_mixed
    from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker
    from southpaw_spark.sources.kafka_pyds import register_kafka_py

    schema = _json.dumps(
        {
            "type": "record",
            "name": "User",
            "fields": [
                {"name": "user_id", "type": "int"},
                {"name": "user_name", "type": ["null", "string"]},
            ],
        }
    )
    docs = spark.createDataFrame(
        [(10, "alice"), (20, "bob"), (30, None)],
        "user_id int, user_name string",
    )
    frame = encode_avro_column(
        docs.select(
            F.to_json(F.struct("user_id")).cast("binary").alias("key"),
            F.struct("user_id", "user_name").alias("payload"),
        ),
        "payload",
        schema,
        out_col="value",
        schema_id=3,
    )
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc.avro", partitions=1)
        register_kafka_py(spark)
        (
            frame.write.format("kafka_py")
            .mode("append")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("topic", "cdc.avro")
            .save()
        )
        raw = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc.avro")
            .load()
        )
        parsed = parse_cdc_mixed(
            raw,
            key={"format": "json", "schema": "user_id int"},
            value={
                "format": "avro",
                "schema": schema,
                "confluent_framing": True,
            },
        )
        got = {
            r.user_name
            for r in parsed.select(F.col("user_name")).collect()
        }
        assert got == {"alice", "bob", None}
        assert parsed.count() == 3
