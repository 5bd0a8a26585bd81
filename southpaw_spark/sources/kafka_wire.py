"""Pure-Python Kafka wire protocol: codec + minimal client (O1).

The reference consumes CDC topics with a real Kafka consumer
(``topic/KafkaTopic.java:304-344`` builds a ``KafkaConsumer`` and
``:400-403`` polls it). The sandbox has no broker and no
``spark-sql-kafka`` jar (README "O1 environment gate" logs the per-round
fetch attempts), so the JVM source can never execute here. This module
removes the jar half of that gate: it implements the *public* Kafka
protocol (kafka.apache.org/protocol) directly —

* primitive codec: big-endian fixed ints, zig-zag varints, strings,
  byte arrays (the protocol's INT8..INT64 / VARINT / VARLONG / STRING /
  NULLABLE_BYTES types);
* RecordBatch **magic v2** encode/decode (the only on-disk/on-wire
  record format since Kafka 0.11), including its CRC32C integrity field;
* request/response framing (4-byte length prefix, request header v1);
* five APIs, pinned at old non-flexible versions so no tagged-field
  machinery is needed: ApiVersions v0, Metadata v0, ListOffsets v1,
  Produce v3, Fetch v4 — exactly the subset a consumer-without-groups
  needs (Spark manages offsets in its own checkpoint, replacing the
  reference's offset keyspaces, so no FindCoordinator/OffsetCommit);
* :class:`KafkaWireClient`, a blocking single-connection client used by
  the ``kafka_py`` Spark data source (sources/kafka_pyds.py) on
  executors and by tests.

Paired with :class:`southpaw_spark.sources.kafka_broker.EmbeddedKafkaBroker`
(the loopback server speaking the same wire format) this lets the full
O1 path — readStream → micro-batch → IVM — execute in pytest with real
bytes on a real TCP socket. Against a production cluster the client
talks to genuine brokers: every message here is standard protocol, no
private extensions.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass
from typing import Iterable, Sequence

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) — required by RecordBatch v2. Not in the Python
# stdlib (zlib.crc32 is the IEEE polynomial), so table-driven here.
# Public algorithm, reflected polynomial 0x82F63B78.
# ---------------------------------------------------------------------------

def _build_crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _build_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC32C checksum (test vector: crc32c(b'123456789') == 0xE3069283)."""
    crc ^= 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Primitive codec
# ---------------------------------------------------------------------------

class Writer:
    """Append-only protocol writer for the fixed-width + varint types."""

    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def bytes_raw(self, b: bytes) -> "Writer":
        self._parts.append(b)
        return self

    def int8(self, v: int) -> "Writer":
        return self.bytes_raw(struct.pack(">b", v))

    def int16(self, v: int) -> "Writer":
        return self.bytes_raw(struct.pack(">h", v))

    def int32(self, v: int) -> "Writer":
        return self.bytes_raw(struct.pack(">i", v))

    def int64(self, v: int) -> "Writer":
        return self.bytes_raw(struct.pack(">q", v))

    def uint32(self, v: int) -> "Writer":
        return self.bytes_raw(struct.pack(">I", v))

    def string(self, s: str | None) -> "Writer":
        """Protocol STRING / NULLABLE_STRING: int16 length, -1 = null."""
        if s is None:
            return self.int16(-1)
        b = s.encode("utf-8")
        return self.int16(len(b)).bytes_raw(b)

    def nullable_bytes(self, b: bytes | None) -> "Writer":
        """Protocol BYTES / NULLABLE_BYTES: int32 length, -1 = null."""
        if b is None:
            return self.int32(-1)
        return self.int32(len(b)).bytes_raw(b)

    def array(self, items: Sequence, encode) -> "Writer":
        """Protocol ARRAY: int32 count then each element via ``encode``."""
        self.int32(len(items))
        for it in items:
            encode(self, it)
        return self

    def varint(self, v: int) -> "Writer":
        """Zig-zag VARINT/VARLONG (same encoding; width is semantic)."""
        z = (v << 1) ^ (v >> 63)
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        return self.bytes_raw(bytes(out))

    def build(self) -> bytes:
        return b"".join(self._parts)


class Reader:
    """Cursor-based protocol reader mirroring :class:`Writer`."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise EOFError(
                f"wire underrun: need {n} bytes at {self.pos}, have "
                f"{len(self.data)}"
            )
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def int8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def int16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def int64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def uint32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def string(self) -> str | None:
        n = self.int16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def nullable_bytes(self) -> bytes | None:
        n = self.int32()
        return None if n < 0 else self._take(n)

    def array(self, decode) -> list:
        n = self.int32()
        if n < 0:
            return []
        return [decode(self) for _ in range(n)]

    def varint(self) -> int:
        shift = 0
        z = 0
        while True:
            b = self._take(1)[0]
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (z >> 1) ^ -(z & 1)

    def remaining(self) -> int:
        return len(self.data) - self.pos


# ---------------------------------------------------------------------------
# RecordBatch v2 (magic=2)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WireRecord:
    """One decoded record: absolute offset, epoch-ms timestamp, key/value
    (None = null; a null value is the CDC tombstone), headers."""

    offset: int
    timestamp: int
    key: bytes | None
    value: bytes | None
    headers: tuple[tuple[str, bytes | None], ...] = ()


def encode_record_batch(
    base_offset: int,
    records: Sequence[tuple[bytes | None, bytes | None, int]],
) -> bytes:
    """Encode ``(key, value, timestamp_ms)`` triples as one RecordBatch
    v2 (uncompressed, non-transactional). Layout per the public spec:
    base_offset/int64, batch_length/int32, leader_epoch/int32, magic=2,
    crc32c (over attributes..end), attributes/int16, last_offset_delta,
    base/max timestamps, producer id/epoch/sequence (-1 = idempotence
    off), record count, then varint-framed records."""
    if not records:
        raise ValueError("empty record batch")
    base_ts = records[0][2]
    max_ts = max(r[2] for r in records)
    body = Writer()
    body.int16(0)  # attributes: no compression, CREATE_TIME, not txn
    body.int32(len(records) - 1)  # lastOffsetDelta
    body.int64(base_ts)
    body.int64(max_ts)
    body.int64(-1)  # producerId
    body.int16(-1)  # producerEpoch
    body.int32(-1)  # baseSequence
    body.int32(len(records))
    for i, (key, value, ts) in enumerate(records):
        rec = Writer()
        rec.int8(0)  # record attributes (unused)
        rec.varint(ts - base_ts)  # timestampDelta
        rec.varint(i)  # offsetDelta
        if key is None:
            rec.varint(-1)
        else:
            rec.varint(len(key)).bytes_raw(key)
        if value is None:
            rec.varint(-1)
        else:
            rec.varint(len(value)).bytes_raw(value)
        rec.varint(0)  # header count
        rec_bytes = rec.build()
        body.varint(len(rec_bytes)).bytes_raw(rec_bytes)
    body_bytes = body.build()
    head = Writer()
    head.int32(-1)  # partitionLeaderEpoch
    head.int8(2)  # magic
    head.uint32(crc32c(body_bytes))
    inner = head.build() + body_bytes
    return Writer().int64(base_offset).int32(len(inner)).build() + inner


def decode_record_batches(
    data: bytes, verify_crc: bool = True
) -> list[WireRecord]:
    """Decode a record set (zero or more concatenated v2 batches) into
    absolute-offset records. Tolerates a truncated trailing batch — the
    protocol allows brokers to return partial final batches, and
    consumers must drop the fragment (same contract the JVM source
    honors)."""
    out: list[WireRecord] = []
    r = Reader(data)
    while r.remaining() >= 12:
        base_offset = r.int64()
        batch_len = r.int32()
        if r.remaining() < batch_len:
            break  # truncated tail batch: drop per protocol
        batch = Reader(r._take(batch_len))
        batch.int32()  # partitionLeaderEpoch
        magic = batch.int8()
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc = batch.uint32()
        body = batch.data[batch.pos :]
        if verify_crc and crc32c(body) != crc:
            raise ValueError("record batch CRC32C mismatch")
        attributes = batch.int16()
        if attributes & 0x07:
            raise ValueError(
                "compressed batches not supported by this client "
                f"(attributes={attributes:#x})"
            )
        batch.int32()  # lastOffsetDelta
        base_ts = batch.int64()
        batch.int64()  # maxTimestamp
        batch.int64()  # producerId
        batch.int16()  # producerEpoch
        batch.int32()  # baseSequence
        n = batch.int32()
        for _ in range(n):
            rec_len = batch.varint()
            rec = Reader(batch._take(rec_len))
            rec.int8()  # attributes
            ts_delta = rec.varint()
            off_delta = rec.varint()
            klen = rec.varint()
            key = rec._take(klen) if klen >= 0 else None
            vlen = rec.varint()
            value = rec._take(vlen) if vlen >= 0 else None
            n_headers = rec.varint()
            headers = []
            for _ in range(n_headers):
                hk_len = rec.varint()
                hk = rec._take(hk_len).decode("utf-8")
                hv_len = rec.varint()
                hv = rec._take(hv_len) if hv_len >= 0 else None
                headers.append((hk, hv))
            out.append(
                WireRecord(
                    offset=base_offset + off_delta,
                    timestamp=base_ts + ts_delta,
                    key=key,
                    value=value,
                    headers=tuple(headers),
                )
            )
    return out


# ---------------------------------------------------------------------------
# API keys / error codes (public constants)
# ---------------------------------------------------------------------------

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3

EARLIEST_TIMESTAMP = -2
LATEST_TIMESTAMP = -1


def encode_request(
    api_key: int,
    api_version: int,
    correlation_id: int,
    client_id: str | None,
    body: bytes,
) -> bytes:
    """Size-prefixed request with header v1 (the header version for all
    non-flexible request versions used here)."""
    head = (
        Writer()
        .int16(api_key)
        .int16(api_version)
        .int32(correlation_id)
        .string(client_id)
        .build()
    )
    payload = head + body
    return struct.pack(">i", len(payload)) + payload


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PartitionMeta:
    topic: str
    partition: int
    leader: int


@dataclass(frozen=True)
class BrokerMeta:
    node_id: int
    host: str
    port: int


class KafkaWireClient:
    """Minimal blocking Kafka client over one TCP connection.

    Speaks ApiVersions v0 / Metadata v0 / ListOffsets v1 / Produce v3 /
    Fetch v4 — enough for a checkpoint-managed consumer (and a test
    producer). Single-threaded by design: each Spark executor task opens
    its own client for its own (topic, partition, offset-range) slice,
    so no connection pooling or rebalancing is needed — Spark's planner
    is the group coordinator."""

    def __init__(
        self,
        host: str,
        port: int,
        client_id: str = "southpaw-spark",
        timeout_s: float = 10.0,
    ) -> None:
        self.client_id = client_id
        self._corr = 0
        self._sock = socket.create_connection((host, port), timeout=timeout_s)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "KafkaWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- framing -----------------------------------------------------------
    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("broker closed connection")
            buf.extend(chunk)
        return bytes(buf)

    def _call(self, api_key: int, api_version: int, body: bytes) -> Reader:
        self._corr += 1
        corr = self._corr
        self._sock.sendall(
            encode_request(api_key, api_version, corr, self.client_id, body)
        )
        (size,) = struct.unpack(">i", self._recv_exact(4))
        resp = Reader(self._recv_exact(size))
        got = resp.int32()
        if got != corr:
            raise ValueError(f"correlation id mismatch: sent {corr}, got {got}")
        return resp

    # -- APIs ---------------------------------------------------------------
    def api_versions(self) -> dict[int, tuple[int, int]]:
        """ApiVersions v0 → {api_key: (min_version, max_version)}."""
        r = self._call(API_VERSIONS, 0, b"")
        err = r.int16()
        if err:
            raise IOError(f"ApiVersions error {err}")
        out = {}
        for key, lo, hi in r.array(
            lambda rr: (rr.int16(), rr.int16(), rr.int16())
        ):
            out[key] = (lo, hi)
        return out

    def metadata(
        self, topics: Sequence[str] | None = None
    ) -> tuple[list[BrokerMeta], list[PartitionMeta]]:
        """Metadata v0. Empty/None topic list = all topics."""
        body = Writer().array(
            list(topics or []), lambda w, t: w.string(t)
        ).build()
        r = self._call(API_METADATA, 0, body)
        brokers = [
            BrokerMeta(*b)
            for b in r.array(lambda rr: (rr.int32(), rr.string(), rr.int32()))
        ]
        parts: list[PartitionMeta] = []

        def _topic(rr: Reader):
            t_err = rr.int16()
            name = rr.string()
            for p_err, pid, leader in rr.array(
                lambda r2: (
                    r2.int16(),
                    r2.int32(),
                    (r2.int32(), r2.array(Reader.int32), r2.array(Reader.int32))[0],
                )
            ):
                if t_err == 0 and p_err == 0:
                    parts.append(PartitionMeta(name, pid, leader))
            return name

        r.array(_topic)
        return brokers, parts

    def list_offsets(
        self, topic: str, partitions: Sequence[int], timestamp: int
    ) -> dict[int, int]:
        """ListOffsets v1: timestamp −2 = earliest, −1 = latest (log end).
        Returns {partition: offset}."""
        body = (
            Writer()
            .int32(-1)  # replica_id: ordinary consumer
            .array(
                [topic],
                lambda w, t: w.string(t).array(
                    list(partitions),
                    lambda w2, p: w2.int32(p).int64(timestamp),
                ),
            )
            .build()
        )
        r = self._call(API_LIST_OFFSETS, 1, body)
        out: dict[int, int] = {}

        def _topic(rr: Reader):
            rr.string()
            for pid, err, _ts, off in rr.array(
                lambda r2: (r2.int32(), r2.int16(), r2.int64(), r2.int64())
            ):
                if err:
                    raise IOError(f"ListOffsets error {err} on partition {pid}")
                out[pid] = off

        r.array(_topic)
        return out

    def produce(
        self,
        topic: str,
        partition: int,
        records: Sequence[tuple[bytes | None, bytes | None, int]],
    ) -> int:
        """Produce v3 (acks=-1). Returns the base offset assigned."""
        batch = encode_record_batch(0, list(records))
        body = (
            Writer()
            .string(None)  # transactional_id
            .int16(-1)  # acks: full ISR
            .int32(10_000)  # timeout_ms
            .array(
                [topic],
                lambda w, t: w.string(t).array(
                    [partition],
                    lambda w2, p: w2.int32(p).nullable_bytes(batch),
                ),
            )
            .build()
        )
        r = self._call(API_PRODUCE, 3, body)
        base_offset = -1

        def _topic(rr: Reader):
            rr.string()
            nonlocal base_offset
            for pid, err, off, _ts in rr.array(
                lambda r2: (r2.int32(), r2.int16(), r2.int64(), r2.int64())
            ):
                if err:
                    raise IOError(f"Produce error {err} on partition {pid}")
                base_offset = off

        r.array(_topic)
        r.int32()  # throttle_time_ms
        return base_offset

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 1 << 20,
        max_wait_ms: int = 100,
    ) -> tuple[list[WireRecord], int]:
        """Fetch v4 from one partition. Returns (records, high_watermark).
        Records below ``offset`` may appear (batch alignment); callers
        filter — same contract as the JVM consumer."""
        body = (
            Writer()
            .int32(-1)  # replica_id
            .int32(max_wait_ms)
            .int32(1)  # min_bytes
            .int32(max_bytes)
            .int8(0)  # isolation_level: READ_UNCOMMITTED
            .array(
                [topic],
                lambda w, t: w.string(t).array(
                    [partition],
                    lambda w2, p: w2.int32(p).int64(offset).int32(max_bytes),
                ),
            )
            .build()
        )
        r = self._call(API_FETCH, 4, body)
        r.int32()  # throttle_time_ms
        records: list[WireRecord] = []
        hwm = -1

        def _topic(rr: Reader):
            rr.string()

            def _part(r2: Reader):
                nonlocal hwm
                pid = r2.int32()
                err = r2.int16()
                p_hwm = r2.int64()
                r2.int64()  # last_stable_offset
                r2.array(lambda r3: (r3.int64(), r3.int64()))  # aborted txns
                record_set = r2.nullable_bytes() or b""
                if err:
                    raise IOError(f"Fetch error {err} on partition {pid}")
                hwm = p_hwm
                records.extend(decode_record_batches(record_set))

            rr.array(_part)

        r.array(_topic)
        return records, hwm


def parse_bootstrap(servers: str) -> list[tuple[str, int]]:
    """'host1:9092,host2:9093' → [(host, port), ...]."""
    out = []
    for part in servers.split(","):
        part = part.strip()
        if not part:
            continue
        host, _, port = part.rpartition(":")
        out.append((host, int(port)))
    if not out:
        raise ValueError(f"no bootstrap servers in {servers!r}")
    return out
