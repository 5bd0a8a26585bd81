"""O1 EXECUTION: the jar-free ``kafka_py`` source against the embedded
wire-protocol broker — codec vectors, client/broker roundtrip, Spark
batch + streaming reads, backpressure, checkpoint restart, and the full
reference loop (Kafka CDC topic → parse → IVM → denormalized docs;
ref ``topic/KafkaTopic.java:304-344,400-403`` / ``Southpaw.java:563-594``)."""

import json
import time

import pytest

from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker
from southpaw_spark.sources.kafka_pyds import register_kafka_py
from southpaw_spark.sources.kafka_wire import (
    KafkaWireClient,
    Reader,
    Writer,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    parse_bootstrap,
)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_crc32c_known_vectors():
    # public Castagnoli test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_zigzag_roundtrip():
    for v in [0, 1, -1, 63, -64, 64, 300, -300, 2**31, -(2**31), 2**62]:
        r = Reader(Writer().varint(v).build())
        assert r.varint() == v, v


def test_record_batch_roundtrip_with_nulls():
    recs = [
        (b"k0", b"v0", 1_700_000_000_000),
        (None, b"v1", 1_700_000_000_005),
        (b"k2", None, 1_700_000_000_010),  # tombstone
    ]
    data = encode_record_batch(42, recs)
    out = decode_record_batches(data)
    assert [(r.offset, r.key, r.value, r.timestamp) for r in out] == [
        (42, b"k0", b"v0", 1_700_000_000_000),
        (43, None, b"v1", 1_700_000_000_005),
        (44, b"k2", None, 1_700_000_000_010),
    ]


def test_record_batch_truncated_tail_dropped():
    a = encode_record_batch(0, [(b"a", b"1", 100)])
    b = encode_record_batch(1, [(b"b", b"2", 101)])
    # protocol: a partial trailing batch is silently dropped by consumers
    out = decode_record_batches(a + b[: len(b) - 5])
    assert [(r.offset, r.key) for r in out] == [(0, b"a")]


def test_record_batch_crc_enforced():
    data = bytearray(encode_record_batch(0, [(b"a", b"1", 100)]))
    data[-1] ^= 0xFF  # corrupt the last value byte
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(data))


def test_parse_bootstrap():
    assert parse_bootstrap("h1:9092, h2:9093") == [("h1", 9092), ("h2", 9093)]
    with pytest.raises(ValueError):
        parse_bootstrap("  ")


# ---------------------------------------------------------------------------
# client ⇄ broker over real sockets
# ---------------------------------------------------------------------------

def test_wire_client_broker_roundtrip():
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("t", partitions=2)
        with KafkaWireClient(broker.host, broker.port) as c:
            vers = c.api_versions()
            assert vers[1] == (4, 4) and vers[3] == (0, 0)
            _, parts = c.metadata(["t"])
            assert sorted(p.partition for p in parts) == [0, 1]
            assert c.list_offsets("t", [0, 1], -2) == {0: 0, 1: 0}
            base = c.produce(
                "t", 1, [(b"k1", b"v1", 100), (b"k1", None, 200)]
            )
            assert base == 0
            assert c.list_offsets("t", [0, 1], -1) == {0: 0, 1: 2}
            recs, hwm = c.fetch("t", 1, 0)
            assert hwm == 2
            assert [(r.offset, r.key, r.value) for r in recs] == [
                (0, b"k1", b"v1"),
                (1, b"k1", None),
            ]
            # fetch at the high watermark: empty, not an error
            recs, hwm = c.fetch("t", 1, 2)
            assert recs == [] and hwm == 2


def test_fetch_honors_max_bytes_and_resumes():
    with EmbeddedKafkaBroker() as broker:
        for i in range(50):
            broker.append("big", 0, f"k{i}".encode(), b"x" * 100, 1000 + i)
        with KafkaWireClient(broker.host, broker.port) as c:
            got = []
            offset = 0
            rounds = 0
            while offset < 50:
                recs, hwm = c.fetch("big", 0, offset, max_bytes=800)
                assert recs, "no progress"
                got.extend(recs)
                offset = recs[-1].offset + 1
                rounds += 1
            assert [r.offset for r in got] == list(range(50))
            assert rounds > 5  # the size bound actually paginated


# ---------------------------------------------------------------------------
# Spark batch read
# ---------------------------------------------------------------------------

def test_kafka_py_batch_read(spark):
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("orders", partitions=2)
        for i in range(10):
            broker.append(
                "orders", i % 2, f"k{i}".encode(), f"v{i}".encode(),
                1_700_000_000_000 + i,
            )
        broker.append("orders", 0, b"k0", None, 1_700_000_000_100)
        register_kafka_py(spark)
        df = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "orders")
            .load()
        )
        assert [f.name for f in df.schema.fields] == [
            "key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType",
        ]
        rows = df.orderBy("partition", "offset").collect()
        assert len(rows) == 11
        assert rows[0].key == bytearray(b"k0") and rows[0].value == bytearray(b"v0")
        assert rows[5].value is None  # tombstone survives the wire
        assert {r.partition for r in rows} == {0, 1}
        # offsets are dense per partition
        p0 = [r.offset for r in rows if r.partition == 0]
        assert p0 == list(range(6))


def test_kafka_py_batch_offset_bounds(spark):
    with EmbeddedKafkaBroker() as broker:
        for i in range(8):
            broker.append("t", 0, f"{i}".encode(), f"{i}".encode(), 1000 + i)
        register_kafka_py(spark)
        df = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "t")
            .option("startingOffsets", json.dumps({"t": {"0": 2}}))
            .option("endingOffsets", json.dumps({"t": {"0": 6}}))
            .load()
        )
        assert [r.offset for r in df.orderBy("offset").collect()] == [2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Spark streaming: backpressure + exactly-once restart
# ---------------------------------------------------------------------------

def test_kafka_py_stream_cap_and_restart(spark, tmp_path):
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=2)
        for i in range(5):
            broker.append("cdc", i % 2, b"k", b"v", 1_700_000_000_000 + i)
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .option("maxOffsetsPerTrigger", "10")
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        seen: list[int] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            _wait(lambda: sum(seen) >= 5)
            # a 40-record backlog arrives; every later batch is capped
            for i in range(40):
                broker.append("cdc", i % 2, b"k", b"v", 1_700_000_001_000 + i)
            _wait(lambda: sum(seen) >= 45)
        finally:
            q.stop()
            q.awaitTermination(60)
        # first batch of a fresh query is uncapped (documented: the
        # Python DS API calls latestOffset before revealing the start);
        # steady-state batches respect maxOffsetsPerTrigger
        assert sum(seen) == 45
        assert all(c <= 10 for c in seen[1:] if c > 0), seen
        # restart from the checkpoint: only new records are consumed
        for i in range(3):
            broker.append("cdc", 0, b"r", f"{i}".encode(), 1_700_000_002_000 + i)
        seen2: list[int] = []
        q2 = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen2.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert sum(seen2) == 3, seen2


def _wait(cond, timeout=90.0, step=0.25):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return
        time.sleep(step)
    raise AssertionError("condition not reached before timeout")


# ---------------------------------------------------------------------------
# sink (O16 execution)
# ---------------------------------------------------------------------------

def test_murmur2_kafka_vectors():
    """Public vectors from Apache Kafka's UtilsTest.testMurmur2 — the
    sink's partitioner must place keys exactly where a Java producer
    would."""
    from southpaw_spark.sources.kafka_pyds import murmur2_kafka

    def signed(v):
        return v - (1 << 32) if v >= (1 << 31) else v

    assert signed(murmur2_kafka(b"21")) == -973932308
    assert signed(murmur2_kafka(b"foobar")) == -790332482
    assert signed(murmur2_kafka(b"a-little-bit-long-string")) == -985981536
    assert signed(murmur2_kafka(b"abc")) == 479470107


def test_kafka_py_batch_sink_partitioning_and_tombstones(spark):
    from southpaw_spark.sources.kafka_pyds import murmur2_kafka

    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("out", partitions=3)
        register_kafka_py(spark)
        df = spark.createDataFrame(
            [
                (f"k{i}".encode(), f"v{i}".encode() if i % 4 else None)
                for i in range(20)
            ],
            "key binary, value binary",
        )
        (
            df.write.format("kafka_py")
            .mode("append")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("topic", "out")
            .save()
        )
        rows = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "out")
            .load()
            .collect()
        )
        assert len(rows) == 20
        # default-partitioner parity: key → murmur2 → partition
        for r in rows:
            assert r.partition == (murmur2_kafka(bytes(r.key)) & 0x7FFFFFFF) % 3
        assert sum(1 for r in rows if r.value is None) == 5  # tombstones


def test_kafka_py_stream_relay(spark, tmp_path):
    """readStream(kafka_py) → writeStream(kafka_py): the reference's
    topology (consume CDC, produce denormalized docs) as a live relay,
    tombstones preserved."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("in", partitions=1)
        for i in range(12):
            broker.append(
                "in", 0, f"s{i}".encode(),
                f"sv{i}".encode() if i % 5 else None,
                1_700_000_000_000 + i,
            )
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "in")
            .load()
        )
        q = (
            stream.selectExpr("key", "value")
            .writeStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("topic", "out2")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "out2")
            .load()
            .collect()
        )
        assert len(out) == 12
        assert sum(1 for r in out if r.value is None) == 3  # i = 0, 5, 10


# ---------------------------------------------------------------------------
# the full reference loop: Kafka topic → parse_cdc_json → IVM → docs
# ---------------------------------------------------------------------------

def test_kafka_ivm_end_to_end(spark, tmp_path):
    """O1 executed: keyed JSON CDC records (null value = tombstone)
    produced to a real socket broker, consumed by ``kafka_cdc_stream
    (python_source=True)``, parsed and driven through the incremental
    denormalizer — the end-to-end path the reference runs
    (``Southpaw.java:563-594``), previously only rehearsed via file
    streams."""
    from pyspark.sql import types as T

    from southpaw_spark.relations import load_relations
    from southpaw_spark.sources.kafka import kafka_cdc_stream, parse_cdc_json
    from southpaw_spark.streaming import (
        IncrementalDenormalizer,
        ParquetStateStore,
    )
    from southpaw_spark.testing import (
        CHANGELOG_EVENTS,
        RELATION_TREES,
        changelog_frames,
        entity_keys,
    )

    rels = load_relations([RELATION_TREES[1]])  # DenormalizedPlayer
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rels, keys=entity_keys(), store=store
    )
    logs = changelog_frames(spark)
    ivm.bootstrap(
        {
            "player": logs["player"].where("seq <= 18").drop(
                "seq", "is_tombstone"
            ),
            "user": logs["user"].where("seq < 0").drop("seq", "is_tombstone"),
        }
    )

    results: dict = {}

    with EmbeddedKafkaBroker() as broker:
        # single partition: broker offset order IS the changelog order,
        # exactly the reference's per-topic total order
        broker.create_topic("cdc.user", partitions=1)
        broker.create_topic("docs.player", partitions=1)

        # output side: docs go BACK to Kafka (null value = tombstone) —
        # the complete reference topology — while a dict mirror drives
        # the progress checks below
        from southpaw_spark.sources.kafka import kafka_doc_sink

        to_kafka = kafka_doc_sink(
            spark,
            broker.bootstrap,
            topic_for="docs.player",
            key_cols_for={"DenormalizedPlayer": ["id"]},
        )

        def sink(name, df):
            df = df.localCheckpoint()  # consumed twice (kafka + dict)
            to_kafka(name, df)
            for r in df.collect():
                results[(name, r["id"])] = r["value"]

        raw = kafka_cdc_stream(
            spark,
            broker.bootstrap,
            ["cdc.user"],
            python_source=True,
            max_offsets_per_trigger=4,
        )
        parsed = parse_cdc_json(
            raw,
            key_schema=T.StructType(
                [T.StructField("user_id", T.IntegerType())]
            ),
            value_schema=T.StructType(
                [
                    T.StructField("user_name", T.StringType()),
                    T.StructField("email", T.StringType()),
                    T.StructField("usage_type", T.StringType()),
                ]
            ),
            topic_to_entity={"cdc.user": "user"},
        )
        query = ivm.attach_stream(
            parsed,
            entity_col="entity",
            checkpoint_dir=str(tmp_path / "ckpt"),
            sink=sink,
            entity_columns={
                "user": [
                    "seq", "user_id", "user_name", "email", "usage_type",
                    "is_tombstone",
                ]
            },
        )
        try:
            for seq, uid, name, email, usage, tomb in CHANGELOG_EVENTS["user"]:
                key = json.dumps({"user_id": uid}).encode()
                value = (
                    None
                    if tomb
                    else json.dumps(
                        {"user_name": name, "email": email, "usage_type": usage}
                    ).encode()
                )
                broker.append("cdc.user", 0, key, value, 1_700_000_000_000 + seq)
            deadline = time.monotonic() + 180
            while time.monotonic() < deadline:
                query.processAllAvailable()
                if ("DenormalizedPlayer", 800) in results:
                    break
                time.sleep(1)
            # drain the remaining micro-batches so the latest user
            # versions (e.g. seq-30 alice→alice2) are applied
            query.processAllAvailable()
        finally:
            query.stop()

        # read the OUTPUT topic back: the docs the pipeline published
        out_rows = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "docs.player")
            .load()
            .collect()
        )
        assert out_rows, "no docs reached the output topic"
        # latest record per key on the topic == the dict mirror
        latest: dict = {}
        for r in sorted(out_rows, key=lambda r: r.offset):
            latest[bytes(r.key)] = bytes(r.value) if r.value is not None else None
        for k, v in latest.items():
            pid = json.loads(k)["id"]
            assert results[("DenormalizedPlayer", pid)] == (
                v.decode() if v is not None else None
            )

    assert ("DenormalizedPlayer", 800) in results, sorted(results)
    # the denormalized doc embeds the LATEST user payload that arrived
    # via Kafka (seq 30 renamed alice → alice2)
    blob = " ".join(v for v in results.values() if v)
    assert "alice2" in blob, blob
    out_blob = b" ".join(v for v in latest.values() if v)
    assert b"alice2" in out_blob  # and so does the published topic


def test_kafka_corpus_stream_pipeline(spark, tmp_path):
    """Training-data pipeline fed from a message bus: documents
    produced to a Kafka topic stream through corpus_stream's gates
    (min_tokens + Gopher) and the persistent exact-dedup state; the
    kept set equals build_corpus on the same docs — the stream≡batch
    contract holds over a kafka_py transport exactly as over files."""
    from pyspark.sql import functions as F

    from southpaw_spark.pipelines import build_corpus, corpus_stream
    from southpaw_spark.streaming import ParquetStateStore
    from southpaw_spark.streaming.dedup_stream import IncrementalDeduper

    good = ("the quick brown fox jumps to the lair of dogs " * 6).strip()
    good2 = ("all of the wise owls fly back to that old barn " * 6).strip()
    docs = [
        (1, good),
        (2, "too short"),   # gopher word-count rule
        (3, good2),
        (4, good),          # exact dup of 1 (cross-batch: later wave)
    ]
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("docs", partitions=1)
        register_kafka_py(spark)
        raw = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "docs")
            .option("maxOffsetsPerTrigger", "2")  # force multi-batch
            .load()
        )
        stream = raw.select(
            F.get_json_object(F.col("value").cast("string"), "$.doc_id")
            .cast("long").alias("doc_id"),
            F.get_json_object(F.col("value").cast("string"), "$.text")
            .alias("text"),
        )
        deduper = IncrementalDeduper(
            spark,
            ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4),
            sim_threshold=1.01,  # exact-only
        )
        got: set = set()
        q = corpus_stream(
            deduper, stream, str(tmp_path / "ckpt"),
            gopher=True,
            sink=lambda kept, _b: got.update(
                r["doc_id"] for r in kept.collect()
            ),
        )
        try:
            for did, text in docs:
                broker.append(
                    "docs", 0, str(did).encode(),
                    json.dumps({"doc_id": did, "text": text}).encode(),
                    1_700_000_000_000 + did,
                )
                if did == 2:  # two produce waves → ≥2 micro-batches
                    q.processAllAvailable()
            q.processAllAvailable()
        finally:
            q.stop()
        deduper.close()

    batch = spark.createDataFrame(docs, "doc_id long, text string")
    kept, _ = build_corpus(batch, gopher=True, exact_dedup=True)
    want = {r["doc_id"] for r in kept.collect()}
    kept.unpersist()
    assert got == want == {1, 3}


# ---------------------------------------------------------------------------
# multi-broker: leader routing
# ---------------------------------------------------------------------------

def test_kafka_py_leader_routing_multi_broker(spark, tmp_path):
    """A 2-node cluster where each broker serves ONLY its led
    partitions (non-leaders answer error 6, like a real cluster):
    reads and writes must route per-partition to the leader — and a
    wrong-node request really does fail."""
    from southpaw_spark.sources.kafka_broker import form_cluster

    with EmbeddedKafkaBroker(node_id=0) as b0, EmbeddedKafkaBroker(
        node_id=1
    ) as b1:
        bootstrap = form_cluster([b0, b1], "orders", partitions=4)
        # leaders round-robin: b0 leads partitions 0,2; b1 leads 1,3.
        # Seed 3 records into each partition ON ITS LEADER.
        for p in range(4):
            leader = (b0, b1)[p % 2]
            for j in range(3):
                leader.append(
                    "orders", p, f"k{p}-{j}".encode(), b"v",
                    1_700_000_000_000 + j,
                )

        # a non-leader really rejects: fetch p1 from b0 → error 6
        with KafkaWireClient(b0.host, b0.port) as c:
            with pytest.raises(IOError, match="error 6"):
                c.fetch("orders", 1, 0)

        register_kafka_py(spark)
        df = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", "orders")
            .load()
        )
        rows = df.collect()
        assert len(rows) == 12
        assert {(r.partition) for r in rows} == {0, 1, 2, 3}

        # leader-routed sink: keyed records land on the right brokers
        out = spark.createDataFrame(
            [(f"wk{i}".encode(), f"wv{i}".encode()) for i in range(20)],
            "key binary, value binary",
        )
        (
            out.write.format("kafka_py")
            .mode("append")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", "orders")
            .save()
        )
        back = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", "orders")
            .load()
            .collect()
        )
        assert len(back) == 32  # 12 seeded + 20 produced
        # every produced record lives on its partition's LEADER only
        for p in range(4):
            led = (b0, b1)[p % 2].end_offset("orders", p)
            other = (b0, b1)[(p + 1) % 2].end_offset("orders", p)
            assert led >= 3 and other == 0

        # streaming read over the cluster (leader map refreshed per
        # trigger) drains everything
        seen: list[int] = []
        q = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", "orders")
            .load()
            .writeStream.foreachBatch(lambda d, e: seen.append(d.count()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sum(seen) == 32


def test_compacted_topic_state_invariance(spark):
    """The reference consumes COMPACTED CDC topics (latest record per
    key; README.md:13). Compaction keeps original offsets with gaps —
    after compacting, the kafka_py consumer must skip the gaps, and the
    latest-by-key state rebuilt from the compacted topic must equal the
    state from the full log."""
    from pyspark.sql import functions as F

    from southpaw_spark.operators.cdc import current_state
    from southpaw_spark.sources.kafka import parse_cdc_json
    from pyspark.sql import types as T

    key_schema = T.StructType([T.StructField("k", T.StringType())])
    val_schema = T.StructType([T.StructField("v", T.IntegerType())])

    def state_from(broker):
        raw = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .load()
        )
        parsed = parse_cdc_json(raw, key_schema, val_schema)
        cur = current_state(
            parsed.select("k", "v", "seq", "is_tombstone"), ["k"]
        )
        return {r.k: r.v for r in cur.collect()}

    events = [
        ("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", None),  # tombstone b
        ("a", 5), ("d", 6), ("c", 7),
    ]
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=1)
        for i, (k, v) in enumerate(events):
            broker.append(
                "cdc", 0,
                json.dumps({"k": k}).encode(),
                None if v is None else json.dumps({"v": v}).encode(),
                1_700_000_000_000 + i,
            )
        register_kafka_py(spark)
        full = state_from(broker)
        assert full == {"a": 5, "c": 7, "d": 6}  # b tombstoned

        removed = broker.compact("cdc")
        assert removed == 4  # a@0, b@1, a@2, c@3 superseded
        # surviving records keep their ORIGINAL offsets (gaps remain)
        offsets = [
            r.offset
            for r in (
                spark.read.format("kafka_py")
                .option("kafka.bootstrap.servers", broker.bootstrap)
                .option("subscribe", "cdc")
                .load()
                .orderBy("offset")
                .collect()
            )
        ]
        assert offsets == [4, 5, 6, 7]  # b's tombstone @4 + latest a/d/c
        compacted = state_from(broker)
        assert compacted == full

        # tombstone retention elapses: b's deletion marker goes too
        broker.compact("cdc", drop_tombstones=True)
        assert state_from(broker) == full


def test_subscribe_pattern_assign_and_headers(spark):
    """JVM-source option parity: subscribePattern (regex over topics),
    assign (explicit topic-partitions), includeHeaders (the extra
    array<struct<key,value>> column)."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc.users", partitions=2)
        broker.create_topic("cdc.orders", partitions=1)
        broker.create_topic("other", partitions=1)
        for t, p, n in (("cdc.users", 0, 2), ("cdc.users", 1, 3),
                        ("cdc.orders", 0, 4), ("other", 0, 5)):
            for i in range(n):
                broker.append(
                    t, p, f"{t}-{p}-{i}".encode(), b"v",
                    1_700_000_000_000 + i,
                    headers=(("src", t.encode()),),
                )
        register_kafka_py(spark)

        def read(**opts):
            r = (
                spark.read.format("kafka_py")
                .option("kafka.bootstrap.servers", broker.bootstrap)
            )
            for k, v in opts.items():
                r = r.option(k, v)
            return r.load()

        # pattern: both cdc.* topics, not "other"
        pat = read(subscribePattern=r"cdc\..*")
        assert pat.count() == 9
        assert {r.topic for r in pat.collect()} == {"cdc.users", "cdc.orders"}

        # assign: one partition of one topic
        asg = read(assign=json.dumps({"cdc.users": [1]}))
        rows = asg.collect()
        assert len(rows) == 3
        assert {(r.topic, r.partition) for r in rows} == {("cdc.users", 1)}

        # exactly-one-mode validation
        with pytest.raises(Exception, match="exactly ONE"):
            read(subscribe="cdc.users", assign="{}").count()

        # includeHeaders: extra column, values intact
        h = read(subscribe="other", includeHeaders="true")
        assert h.columns[-1] == "headers"
        row = h.limit(1).collect()[0]
        assert row.headers[0].key == "src"
        assert bytes(row.headers[0].value) == b"other"
        # headers column absent by default
        assert "headers" not in read(subscribe="other").columns


def test_json_starting_offsets_earliest_on_compacted(spark):
    """startingOffsets JSON -2 must resolve to the TRUE log start (the
    first retained offset after compaction), not 0."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("c", partitions=1)
        for i in range(6):
            broker.append("c", 0, b"samekey", f"{i}".encode(), 1000 + i)
        broker.compact("c")  # only offset 5 survives
        register_kafka_py(spark)
        df = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "c")
            .option("startingOffsets", json.dumps({"c": {"0": -2}}))
            .load()
        )
        rows = df.collect()
        assert [r.offset for r in rows] == [5]
        assert bytes(rows[0].value) == b"5"


def test_compact_never_drops_partition_tail(spark):
    """Compaction must never remove a partition's FINAL record (real
    Kafka never cleans the active-segment tail) — otherwise a trailing
    gap opens below the high watermark and a reader planning a range up
    to the old hwm would spin on empty fetches instead of completing."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("tail", partitions=1)
        broker.append("tail", 0, b"a", b"1", 1000)
        broker.append("tail", 0, b"a", None, 1001)  # tail = aged tombstone
        removed = broker.compact("tail", drop_tombstones=True)
        assert removed == 1  # a@0 superseded; the tail tombstone SURVIVES
        register_kafka_py(spark)
        rows = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "tail")
            .load()
            .collect()
        )
        assert [(r.offset, r.value) for r in rows] == [(1, None)]

        # mixed tail: tombstones age out EXCEPT the final record even
        # when several keys are involved
        broker.create_topic("mix", partitions=1)
        broker.append("mix", 0, b"x", b"v", 2000)
        broker.append("mix", 0, b"y", None, 2001)
        broker.append("mix", 0, b"z", None, 2002)
        broker.compact("mix", drop_tombstones=True)
        rows = (
            spark.read.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "mix")
            .load()
            .orderBy("offset")
            .collect()
        )
        # y's tombstone aged out; z's survives as the partition tail
        assert [(r.offset, bytes(r.key)) for r in rows] == [
            (0, b"x"), (2, b"z"),
        ]


def test_read_slice_no_progress_is_bounded(monkeypatch):
    """A real compacted broker can answer a fetch at offset X with a
    batch whose decoded records are ALL below X (cleaning preserves the
    batch lastOffsetDelta while removing records). The slice reader
    must neither re-emit those rows nor spin forever: stale fetches
    share the empty-round budget and the task fails loudly."""
    from collections import namedtuple

    from southpaw_spark.sources import kafka_pyds

    Rec = namedtuple("Rec", "offset timestamp key value headers")

    class StaleClient:
        calls = 0

        def __init__(self, host, port, security=None):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def fetch(self, topic, partition, offset, max_bytes=2**20):
            StaleClient.calls += 1
            # always the same record at offset 0, hwm far ahead
            return [Rec(0, 1_700_000_000_000, b"k", b"v", ())], 10

    monkeypatch.setattr(kafka_pyds, "KafkaWireClient", StaleClient)
    sl = kafka_pyds.KafkaSlice("h", 1, "t", 0, 1, 10, False)
    batches = []
    with pytest.raises(IOError, match="no progress"):
        for b in kafka_pyds._read_slice(sl):
            batches.append(b)
    assert batches == []  # the below-range record is never re-emitted
    assert StaleClient.calls <= 102  # bounded, not an unbounded spin


def test_compaction_between_stop_and_restart(spark, tmp_path):
    """Exactly-once resume when the broker compacts BETWEEN a
    checkpointed stop and the restart: offsets below the checkpoint are
    now gap-sparse (and some retained records still sit below it), yet
    the restarted query consumes exactly the new records — no replays,
    no stalls."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=1)
        for i in range(8):
            broker.append(
                "cdc", 0, f"k{i % 3}".encode(), f"v{i}".encode(), 1000 + i
            )
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        seen: list[list] = []

        def run():
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, e: seen.append(
                        [(r.offset, bytes(r.value)) for r in df.collect()]
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()  # checkpoint now at offset 8
        got1 = sorted(o for b in seen for o, _ in b)
        assert got1 == list(range(8))

        # compact while stopped: keys k0..k2 keep only offsets 5,6,7 —
        # everything below the checkpoint becomes gap-sparse
        assert broker.compact("cdc") == 5
        for i in range(8, 11):
            broker.append(
                "cdc", 0, f"k{i % 3}".encode(), f"v{i}".encode(), 1000 + i
            )
        seen.clear()
        run()
        flat = sorted(o for b in seen for o, _ in b)
        assert flat == [8, 9, 10], flat  # new records only, exactly once


def test_planner_state_dir_caps_restart_first_batch(spark, tmp_path):
    """With plannerStateDir set, a restart against a deep backlog plans
    its FIRST micro-batch within maxOffsetsPerTrigger (the documented
    Python-DS-API first-batch gap, closed by persisting each trigger's
    planned end driver-side)."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=2)
        for i in range(4):
            broker.append("cdc", i % 2, b"k", b"v", 1000 + i)
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .option("maxOffsetsPerTrigger", "10")
            .option("plannerStateDir", str(tmp_path / "planner"))
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        seen: list[int] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sum(seen) == 4
        # deep backlog lands while the query is STOPPED
        for i in range(35):
            broker.append("cdc", i % 2, b"k", b"v", 2000 + i)
        seen2: list[int] = []
        # processingTime trigger: the capped catch-up path (availableNow
        # under the Python DS API snapshots the FIRST latestOffset as
        # the drain target, so with the cap it consumes ≤cap per
        # invocation — documented in kafka_pyds.py)
        q2 = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen2.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            _wait(lambda: sum(seen2) >= 35)
        finally:
            q2.stop()
            q2.awaitTermination(60)
        assert sum(seen2) == 35
        # EVERY restarted batch is capped — including the FIRST
        assert all(c <= 10 for c in seen2), seen2
        assert len([c for c in seen2 if c]) >= 4  # really split up


def test_planner_state_dir_ignored_for_other_subscription(spark, tmp_path):
    """A planner state file left by a DIFFERENT subscription must not
    seed the cap base (the persisted offsets are meaningless for other
    topics), and a fresh query in the same dir still reads everything."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("a", partitions=1)
        broker.create_topic("b", partitions=1)
        for i in range(6):
            broker.append("a", 0, b"k", b"v", 1000 + i)
            broker.append("b", 0, b"k", b"v", 1000 + i)
        register_kafka_py(spark)
        pdir = str(tmp_path / "planner")

        def drain(topic, ckpt):
            got: list[int] = []
            q = (
                spark.readStream.format("kafka_py")
                .option("kafka.bootstrap.servers", broker.bootstrap)
                .option("subscribe", topic)
                .option("plannerStateDir", pdir)
                .load()
                .writeStream.foreachBatch(lambda df, e: got.append(df.count()))
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return sum(got)

        assert drain("a", "ckpt_a") == 6
        # same dir, different topic: stale base ignored, full read
        assert drain("b", "ckpt_b") == 6


def test_adaptive_cap_drains_backlog_with_lag_proportional_batches(
    spark, tmp_path
):
    """Round-14 adaptive catch-up (the reference's lag-triggered drain
    trade, Southpaw.java:258-282): with maxOffsetsPerTriggerCeiling
    set, a deep backlog drains in lag-proportional batches —
    min(ceiling, max(cap, lag/K)) — tapering geometrically back to the
    steady-state cap instead of crawling at cap-sized batches.
    plannerStateDir makes the restart deterministic: base offsets are
    persisted, so the taper is exactly [30, 15, 10, 5] for a 60-record
    backlog at cap=10, ceiling=40, K=2."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=2)
        for i in range(4):
            broker.append("cdc", i % 2, b"k", b"v", 1000 + i)
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .option("maxOffsetsPerTrigger", "10")
            .option("maxOffsetsPerTriggerCeiling", "40")
            .option("adaptiveDrainTriggers", "2")
            .option("plannerStateDir", str(tmp_path / "planner"))
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        seen: list[int] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sum(seen) == 4
        # deep backlog lands while the query is STOPPED
        for i in range(60):
            broker.append("cdc", i % 2, b"k", b"v", 2000 + i)
        seen2: list[int] = []
        q2 = (
            stream.writeStream.foreachBatch(
                lambda df, e: seen2.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            _wait(lambda: sum(seen2) >= 60)
        finally:
            q2.stop()
            q2.awaitTermination(60)
        # lag 60 → 30 (lag/2); lag 30 → effective 15, floor-apportioned
        # 7+7=14 across the two even partitions; lag 16 → effective 10
        # (the steady-state cap wins over lag/2=8), apportioned 5+5;
        # lag 6 ≤ cap → uncapped branch takes the remaining 6
        batches = [c for c in seen2 if c]
        assert batches == [30, 14, 10, 6], seen2
        assert batches[0] > 10  # the adaptive cap really engaged
        assert all(c <= 40 for c in batches)  # ceiling respected


def test_adaptive_cap_option_validation():
    """Ceiling without a cap, or below the cap, fails loudly at reader
    construction — a silent fallback would mask a misconfigured drain."""
    import pytest

    from southpaw_spark.sources.kafka_pyds import KafkaPyStreamReader

    base = {
        "kafka.bootstrap.servers": "localhost:9999",
        "subscribe": "t",
    }
    with pytest.raises(ValueError, match="requires"):
        KafkaPyStreamReader({**base, "maxOffsetsPerTriggerCeiling": "100"})
    with pytest.raises(ValueError, match="must be >="):
        KafkaPyStreamReader(
            {**base, "maxOffsetsPerTrigger": "100",
             "maxOffsetsPerTriggerCeiling": "50"}
        )


def test_compaction_mid_stream_between_triggers(spark, tmp_path):
    """VERDICT r13 #7: compaction strikes WHILE the stream runs —
    between two triggers of one LIVE query, with plannerStateDir set
    and the cap in force (primed by an initial availableNow drain, so
    every live batch is capped). Offsets already consumed become
    gap-sparse under the checkpoint, retained-but-unconsumed records
    keep their original offsets, and the capped catch-up must consume
    each surviving record exactly once — no stall, no replay."""
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("cdc", partitions=1)
        for i in range(6):
            broker.append(
                "cdc", 0, f"k{i % 3}".encode(), f"v{i}".encode(), 1000 + i
            )
        register_kafka_py(spark)
        stream = (
            spark.readStream.format("kafka_py")
            .option("kafka.bootstrap.servers", broker.bootstrap)
            .option("subscribe", "cdc")
            .option("maxOffsetsPerTrigger", "4")
            .option("plannerStateDir", str(tmp_path / "planner"))
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        # prime: drain the 6 seed records, persisting checkpoint AND
        # planner base so the live query below is capped from batch 1
        primed: list[int] = []
        q0 = (
            stream.writeStream.foreachBatch(
                lambda df, e: primed.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q0.awaitTermination(120)
        assert sum(primed) == 6

        batches: list[list] = []
        compacted = []

        def sink(df, epoch):
            rows = [(r.offset, bytes(r.value)) for r in df.collect()]
            if rows:
                batches.append(rows)
            consumed = sum(len(b) for b in batches)
            if consumed >= 3 and not compacted:
                # the query is LIVE between triggers: keys k0..k2
                # collapse to their last occurrences (offsets below the
                # checkpoint go gap-sparse) and three fresh records
                # land on the compacted log
                compacted.append(broker.compact("cdc"))
                for i in range(9, 12):
                    broker.append(
                        "cdc", 0, f"k{i % 3}".encode(),
                        f"v{i}".encode(), 1000 + i,
                    )

        # three new records arrive while the query starts
        for i in range(6, 9):
            broker.append(
                "cdc", 0, f"k{i % 3}".encode(), f"v{i}".encode(), 1000 + i
            )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            _wait(lambda: sum(len(b) for b in batches) >= 6 and compacted)
        finally:
            q.stop()
            q.awaitTermination(60)
        assert compacted and compacted[0] > 0  # compaction really ran
        offsets = sorted(o for b in batches for o, _ in b)
        # offsets 6..11 each exactly once — no replays, no gaps, no
        # records lost to the mid-stream compaction
        assert offsets == list(range(6, 12)), offsets
        values = sorted(v for b in batches for _, v in b)
        assert values == sorted(f"v{i}".encode() for i in range(6, 12))
        # capped throughout — the primed planner base caps batch 1 too
        assert all(len(b) <= 4 for b in batches), [len(b) for b in batches]
