"""Hypothesis property tests for the pure-Python codec layers — the
spec-pinned byte formats where a single wrong varint corrupts silently:
the Kafka wire record-batch codec (``sources/kafka_wire.py``), the Avro
binary codec (``sources/avro_py.py``), and the embedded broker's
compaction invariants (``sources/kafka_broker.py``, incl. the round-13
never-drop-the-partition-tail rule the slice reader relies on). All
pure Python — no SparkSession, so hundreds of examples run in seconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from southpaw_spark.sources.avro_py import decode, encode
from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker
from southpaw_spark.sources.kafka_wire import (
    Reader,
    Writer,
    decode_record_batches,
    encode_record_batch,
)

# ---------------------------------------------------------------------------
# kafka wire codec
# ---------------------------------------------------------------------------

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=300, deadline=None)
@given(int64s)
def test_varint_zigzag_roundtrip_full_range(v):
    assert Reader(Writer().varint(v).build()).varint() == v


_record = st.tuples(
    st.one_of(st.none(), st.binary(max_size=64)),            # key
    st.one_of(st.none(), st.binary(max_size=256)),           # value
    st.integers(min_value=0, max_value=2**50),               # timestamp ms
)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**40),  # base offset
    st.lists(_record, min_size=1, max_size=20),
)
def test_record_batch_roundtrip_random(base, recs):
    out = decode_record_batches(encode_record_batch(base, recs))
    assert [(r.offset, r.key, r.value, r.timestamp) for r in out] == [
        (base + i, k, v, ts) for i, (k, v, ts) in enumerate(recs)
    ]
    # offsets are dense from base — the consumer's progress invariant
    assert [r.offset for r in out] == list(range(base, base + len(recs)))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_record, min_size=1, max_size=8),
    st.lists(_record, min_size=1, max_size=8),
)
def test_concatenated_batches_decode_in_order(recs_a, recs_b):
    data = encode_record_batch(0, recs_a) + encode_record_batch(
        len(recs_a), recs_b
    )
    out = decode_record_batches(data)
    assert [(r.key, r.value) for r in out] == [
        (k, v) for k, v, _ in recs_a + recs_b
    ]


# ---------------------------------------------------------------------------
# avro binary codec
# ---------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "Kind",
                     "symbols": ["A", "B", "C"]},
        },
        {
            "name": "child",
            "type": ["null", {
                "type": "record", "name": "Child",
                "fields": [{"name": "x", "type": "int"}],
            }],
        },
    ],
}

_text = st.text(max_size=24)
_value = st.fixed_dictionaries(
    {
        "id": int64s,
        "name": st.one_of(st.none(), _text),
        "score": st.floats(allow_nan=False, allow_infinity=True,
                           width=64),
        "flag": st.booleans(),
        "blob": st.binary(max_size=64),
        "tags": st.lists(_text, max_size=6),
        "attrs": st.dictionaries(_text, int64s, max_size=6),
        "kind": st.sampled_from(["A", "B", "C"]),
        "child": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {"x": st.integers(min_value=-(2**31),
                                  max_value=2**31 - 1)}
            ),
        ),
    }
)


@settings(max_examples=150, deadline=None)
@given(_value)
def test_avro_roundtrip_random_records(value):
    assert decode(AVRO_SCHEMA, encode(AVRO_SCHEMA, value)) == value


@settings(max_examples=150, deadline=None)
@given(st.floats(width=64, allow_nan=True, allow_infinity=True))
def test_avro_double_bit_exact(x):
    import math

    got = decode(
        {"type": "record", "name": "R",
         "fields": [{"name": "v", "type": "double"}]},
        encode(
            {"type": "record", "name": "R",
             "fields": [{"name": "v", "type": "double"}]},
            {"v": x},
        ),
    )["v"]
    assert (math.isnan(x) and math.isnan(got)) or got == x


# ---------------------------------------------------------------------------
# broker compaction invariants (no sockets: append/compact direct)
# ---------------------------------------------------------------------------

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),                 # key id
        st.one_of(st.none(), st.binary(min_size=1, max_size=8)),  # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(_events, st.booleans())
def test_compact_invariants_random_logs(events, drop_tombstones):
    broker = EmbeddedKafkaBroker.__new__(EmbeddedKafkaBroker)
    # no sockets: install just the log state the append/compact path uses
    import threading

    broker._lock = threading.RLock()
    broker._logs = {}
    broker._topics = {}
    broker.node_id = 0
    broker.peers = {0: ("127.0.0.1", 0)}
    broker.create_topic = lambda *a, **k: None  # append() pre-creates below

    from southpaw_spark.sources.kafka_broker import _PartitionLog

    broker._topics["t"] = 1
    broker._logs[("t", 0)] = _PartitionLog()
    for i, (kid, value) in enumerate(events):
        broker.append("t", 0, f"k{kid}".encode(), value, 1000 + i)
    log = broker._logs[("t", 0)]
    hwm = log.next_offset
    before = list(log.records)
    latest = {}
    for off, _ts, key, val, _h in before:
        latest[key] = (off, val)

    broker.compact("t", drop_tombstones=drop_tombstones)
    after = list(log.records)

    # hwm unchanged; offsets strictly increasing subset of the original
    assert log.next_offset == hwm
    offs = [r[0] for r in after]
    assert offs == sorted(offs) and set(offs) <= {r[0] for r in before}
    # the partition TAIL survives every compaction (round-13 rule: the
    # slice reader's "no trailing gap below hwm" invariant)
    assert after and after[-1][0] == before[-1][0]
    # exactly the latest record per key survives, minus aged-out
    # tombstones (never the tail)
    want_keys = set()
    for key, (off, val) in latest.items():
        if drop_tombstones and val is None and off != before[-1][0]:
            continue
        want_keys.add((off, key))
    assert {(r[0], r[2]) for r in after} == want_keys
    # surviving records carry their ORIGINAL payloads
    for off, _ts, key, val, _h in after:
        assert latest[key] == (off, val)


# ---------------------------------------------------------------------------
# composite-key bytes (O15): injectivity under random typed tuples
# ---------------------------------------------------------------------------

_key_tuple = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),  # long component
    st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",)),
        max_size=12,
    ),
    st.booleans(),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_key_tuple, min_size=2, max_size=40, unique=True))
def test_composite_key_injective_random_tuples(spark, tuples):
    """The reference's composite-PK byte encoding (O15,
    ``util/ByteArray.java``) must be INJECTIVE: distinct (long, string,
    boolean) tuples → distinct key bytes (a collision would silently
    merge two entities' state rows). Length-prefixing is what makes
    concatenated variable-width components safe — this fuzzes exactly
    that property, adversarial prefixes included."""
    from southpaw_spark.functions import composite_key

    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(tuples)],
        "row_id long, ka long, kb string, kc boolean",
    )
    keys = [
        bytes(r["k"])
        for r in df.select(
            composite_key(
                df, {"ka": "long", "kb": "string", "kc": "boolean"}
            ).alias("k")
        ).collect()
    ]
    assert len(set(keys)) == len(tuples)
