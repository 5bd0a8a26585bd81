"""Registry-resolved Avro CDC decode end-to-end in the streaming loop:
a Confluent-framed changelog with TWO writer-schema versions replayed as
micro-batches through ``attach_avro_cdc_stream`` must leave the IVM in
exactly the state a one-shot batch recompute produces (IVM ≡ batch),
with id discovery run once and later batches decoding from the cache."""

import json
import time

from southpaw_spark.operators.cdc import current_state, tombstoned_keys
from southpaw_spark.operators.denormalize import denormalize_to_json
from southpaw_spark.relations import load_relations
from southpaw_spark.sources.avro_py import confluent_frame, encode
from southpaw_spark.sources.schema_registry import (
    StaticSchemaRegistry,
    parse_cdc_avro_with_registry,
)
from southpaw_spark.streaming.avro_cdc import AvroCdcDecoder, attach_avro_cdc_stream
from southpaw_spark.streaming.ivm import IncrementalDenormalizer
from southpaw_spark.streaming.state import ParquetStateStore

KEY = {"type": "record", "name": "K",
       "fields": [{"name": "id", "type": "long"}]}
V1 = {"type": "record", "name": "U",
      "fields": [{"name": "name", "type": "string"}]}
V2 = {"type": "record", "name": "U",
      "fields": [{"name": "name", "type": "string"},
                 {"name": "email", "type": "string", "default": "-"}]}

REGISTRY = {100: json.dumps(KEY), 1: json.dumps(V1), 2: json.dumps(V2)}

TREE = [{"DenormalizedName": "AvroUser", "Entity": "user"}]
KEYS = {"user": ["id"]}


def _frames_batch1():
    # writer v1 era
    return [
        (confluent_frame(100, encode(KEY, {"id": 1})),
         confluent_frame(1, encode(V1, {"name": "alice"})), 0, 0),
        (confluent_frame(100, encode(KEY, {"id": 2})),
         confluent_frame(1, encode(V1, {"name": "bob"})), 0, 1),
    ]


def _frames_batch2():
    # writer v2 era: update 1, insert 3, tombstone 2
    return [
        (confluent_frame(100, encode(KEY, {"id": 1})),
         confluent_frame(2, encode(V2, {"name": "alice2",
                                        "email": "a@x"})), 0, 2),
        (confluent_frame(100, encode(KEY, {"id": 3})),
         confluent_frame(2, encode(V2, {"name": "carol",
                                        "email": "c@x"})), 0, 3),
        (confluent_frame(100, encode(KEY, {"id": 2})), None, 0, 4),
    ]


RAW_SCHEMA = "key binary, value binary, partition int, offset long"


def _batch_docs(spark):
    """One-shot batch recompute over the FULL changelog — the oracle."""
    raw = spark.createDataFrame(_frames_batch1() + _frames_batch2(), RAW_SCHEMA)
    parsed = parse_cdc_avro_with_registry(
        raw, StaticSchemaRegistry(REGISTRY),
        key_reader_schema=json.dumps(KEY),
        value_reader_schema=json.dumps(V2),
    )
    rel = load_relations(TREE)[0]
    states = {"user": current_state(parsed, ["id"])}
    dead = tombstoned_keys(parsed, ["id"])
    out = denormalize_to_json(states, rel, KEYS, tombstoned_roots=dead)
    return {r["id"]: r["value"] for r in out.collect()}


def test_decoder_discovery_runs_once(spark):
    reg = StaticSchemaRegistry(REGISTRY)
    dec = AvroCdcDecoder(reg, key_reader_schema=json.dumps(KEY))
    b1 = spark.createDataFrame(_frames_batch1(), RAW_SCHEMA)
    out1 = dec.decode_batch(b1)
    assert dec._known_ids == {"key": [100], "value": [1]}
    # v1 rows resolve to the v1 reader (pinned at first sight)
    assert {r["name"] for r in out1.collect()} == {"alice", "bob"}
    # batch 2 carries id 2, unseen at discovery: known_ids stays cached
    # (no re-scan) and the executor-side on-demand path resolves it
    b2 = spark.createDataFrame(_frames_batch2(), RAW_SCHEMA)
    out2 = dec.decode_batch(b2)
    rows = {r["id"]: r for r in out2.collect()}
    assert dec._known_ids == {"key": [100], "value": [1]}  # unchanged
    assert rows[1]["name"] == "alice2"
    assert rows[2]["is_tombstone"] is True


def test_ivm_stream_equals_batch_recompute(spark, tmp_path):
    """Replay the two writer-version eras as two file micro-batches; the
    streamed IVM output and final docs must equal the batch recompute."""
    rels = load_relations(TREE)
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=KEYS, store=store
    )
    # bootstrap with the reader-typed empty schema (v2 is the pinned
    # reader: key id + name + email + seq/is_tombstone dropped by
    # current_state → state columns are id, name, email)
    empty = parse_cdc_avro_with_registry(
        spark.createDataFrame([], RAW_SCHEMA),
        StaticSchemaRegistry(REGISTRY),
        key_reader_schema=json.dumps(KEY),
        value_reader_schema=json.dumps(V2),
        known_ids={"key": [100], "value": [2]},
    ).drop("seq", "is_tombstone")
    ivm.bootstrap({"user": empty})

    src = tmp_path / "frames"
    src.mkdir()
    results: dict = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    def write_batch(name, frames):
        spark.createDataFrame(frames, RAW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / name))

    write_batch("b1", _frames_batch1())
    stream = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = attach_avro_cdc_stream(
        ivm, stream, StaticSchemaRegistry(REGISTRY), "user",
        checkpoint_dir=str(tmp_path / "ckpt"), sink=sink,
        key_reader_schema=json.dumps(KEY),
        value_reader_schema=json.dumps(V2),
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if ("AvroUser", 2) in results:
                break
            time.sleep(0.5)
        write_batch("b2", _frames_batch2())
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if ("AvroUser", 3) in results:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    streamed = {k[1]: v for k, v in results.items()}
    expected = _batch_docs(spark)
    # sinked upserts/tombstones converge to the batch oracle
    assert streamed[2] is None  # tombstoned mid-stream
    for rid, doc in expected.items():
        assert streamed.get(rid) == doc, rid
    # v1-era row decoded with the v2 reader → default email
    assert json.loads(expected[3])["Record"]["email"] == "c@x"
    d1 = json.loads(expected[1])
    assert d1["Record"] == {"id": 1, "name": "alice2", "email": "a@x"}


ADDR_KEY = {"type": "record", "name": "AK",
            "fields": [{"name": "aid", "type": "long"}]}
ADDR_V = {"type": "record", "name": "A",
          "fields": [{"name": "uid", "type": "long"},
                     {"name": "city", "type": "string"}]}

MULTI_REGISTRY = dict(REGISTRY)
MULTI_REGISTRY.update({200: json.dumps(ADDR_KEY), 3: json.dumps(ADDR_V)})

MULTI_TREE = [{
    "DenormalizedName": "AvroUserDoc", "Entity": "user",
    "Children": [{"Entity": "addr", "JoinKey": "uid", "ParentKey": "id"}],
}]
MULTI_KEYS = {"user": ["id"], "addr": ["aid"]}
MULTI_RAW = "topic string, key binary, value binary, partition int, offset long"


def _multi_batch1():
    return [
        ("t.user", confluent_frame(100, encode(KEY, {"id": 1})),
         confluent_frame(1, encode(V1, {"name": "alice"})), 0, 0),
        ("t.addr", confluent_frame(200, encode(ADDR_KEY, {"aid": 10})),
         confluent_frame(3, encode(ADDR_V, {"uid": 1, "city": "rome"})), 0, 1),
    ]


def _multi_batch2():
    return [
        # writer v2 era for user + a second address; addr 10 repoints to 2
        ("t.user", confluent_frame(100, encode(KEY, {"id": 2})),
         confluent_frame(2, encode(V2, {"name": "bob", "email": "b@x"})), 0, 2),
        ("t.addr", confluent_frame(200, encode(ADDR_KEY, {"aid": 10})),
         confluent_frame(3, encode(ADDR_V, {"uid": 2, "city": "oslo"})), 0, 3),
        ("t.addr", confluent_frame(200, encode(ADDR_KEY, {"aid": 11})),
         confluent_frame(3, encode(ADDR_V, {"uid": 1, "city": "lima"})), 0, 4),
    ]


def test_multi_entity_avro_stream_equals_batch(spark, tmp_path):
    """Two entity topics in ONE stream: per-entity decoders, one
    process_batch per trigger, FK repointing across entities — final
    docs equal the batch recompute."""
    from southpaw_spark.streaming.avro_cdc import attach_avro_cdc_multi_stream

    reg = StaticSchemaRegistry(MULTI_REGISTRY)
    rels = load_relations(MULTI_TREE)
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=MULTI_KEYS, store=store
    )

    def empty(key_sch, val_sch, ids):
        return parse_cdc_avro_with_registry(
            spark.createDataFrame([], RAW_SCHEMA), reg,
            key_reader_schema=json.dumps(key_sch),
            value_reader_schema=json.dumps(val_sch),
            known_ids=ids,
        ).drop("seq", "is_tombstone")

    ivm.bootstrap({
        "user": empty(KEY, V2, {"key": [100], "value": [2]}),
        "addr": empty(ADDR_KEY, ADDR_V, {"key": [200], "value": [3]}),
    })

    src = tmp_path / "frames"
    src.mkdir()
    results: dict = {}

    def sink(name, df):
        for r in df.collect():
            results[(name, r["id"])] = r["value"]

    def write_batch(name, frames):
        spark.createDataFrame(frames, MULTI_RAW).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / name))

    write_batch("b1", _multi_batch1())
    stream = (
        spark.readStream.schema(MULTI_RAW)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = attach_avro_cdc_multi_stream(
        ivm, stream, reg, {"t.user": "user", "t.addr": "addr"},
        checkpoint_dir=str(tmp_path / "ckpt"), sink=sink,
        reader_schemas={
            "user": (json.dumps(KEY), json.dumps(V2)),
            "addr": (json.dumps(ADDR_KEY), json.dumps(ADDR_V)),
        },
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if ("AvroUserDoc", 1) in results:
                break
            time.sleep(0.5)
        write_batch("b2", _multi_batch2())
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if ("AvroUserDoc", 2) in results:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    # batch oracle over the full changelog
    from southpaw_spark.operators.cdc import current_state as cs

    both = _multi_batch1() + _multi_batch2()
    raw = spark.createDataFrame(both, MULTI_RAW)
    users = parse_cdc_avro_with_registry(
        raw.where("topic = 't.user'").drop("topic"), reg,
        key_reader_schema=json.dumps(KEY),
        value_reader_schema=json.dumps(V2),
    )
    addrs = parse_cdc_avro_with_registry(
        raw.where("topic = 't.addr'").drop("topic"), reg,
        key_reader_schema=json.dumps(ADDR_KEY),
        value_reader_schema=json.dumps(ADDR_V),
    )
    rel = load_relations(MULTI_TREE)[0]
    expected = {
        r["id"]: r["value"]
        for r in denormalize_to_json(
            {"user": cs(users, ["id"]), "addr": cs(addrs, ["aid"])},
            rel, MULTI_KEYS,
        ).collect()
    }
    streamed = {k[1]: v for k, v in results.items()}
    for uid, doc in expected.items():
        assert streamed.get(uid) == doc, uid
    # FK repoint: addr 10 moved user1 → user2; user1 keeps only addr 11
    d1 = json.loads(streamed[1])
    assert [a["Record"]["aid"] for a in d1["Children"]["addr"]] == [11]
    d2 = json.loads(streamed[2])
    assert [a["Record"]["city"] for a in d2["Children"]["addr"]] == ["oslo"]


def test_avro_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop the Avro CDC stream after batch 1, restart with a FRESH
    decoder against the same checkpoint: the second run must process
    only batch 2 (offsets from the checkpoint), re-pin its reader, and
    converge to the batch recompute."""
    rels = load_relations(TREE)
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=KEYS, store=store
    )
    empty = parse_cdc_avro_with_registry(
        spark.createDataFrame([], RAW_SCHEMA),
        StaticSchemaRegistry(REGISTRY),
        key_reader_schema=json.dumps(KEY),
        value_reader_schema=json.dumps(V2),
        known_ids={"key": [100], "value": [2]},
    ).drop("seq", "is_tombstone")
    ivm.bootstrap({"user": empty})

    src = tmp_path / "frames"
    src.mkdir()
    sink_calls: list = []

    def sink(name, df):
        sink_calls.append({r["id"]: r["value"] for r in df.collect()})

    def write_batch(name, frames):
        spark.createDataFrame(frames, RAW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / name))

    def start():
        stream = (
            spark.readStream.schema(RAW_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return attach_avro_cdc_stream(
            ivm, stream, StaticSchemaRegistry(REGISTRY), "user",
            checkpoint_dir=str(tmp_path / "ckpt"), sink=sink,
            key_reader_schema=json.dumps(KEY),
            value_reader_schema=json.dumps(V2),
        )

    write_batch("b1", _frames_batch1())
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_after_b1 = len(sink_calls)
    assert n_after_b1 >= 1

    write_batch("b2", _frames_batch2())
    q = start()  # fresh decoder, same checkpoint
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            merged = {}
            for call in sink_calls:
                merged.update(call)
            if 3 in merged:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    merged = {}
    for call in sink_calls:
        merged.update(call)
    expected = _batch_docs(spark)
    for rid, doc in expected.items():
        assert merged.get(rid) == doc, rid
    # batch 1's keys were NOT re-emitted by the restart (no reprocessing):
    # id 1 appears once pre-restart and once from b2's update — while id 2
    # (b1 insert, b2 tombstone) appears at most twice total
    emits_of_2 = sum(1 for call in sink_calls if 2 in call)
    assert emits_of_2 <= 2
