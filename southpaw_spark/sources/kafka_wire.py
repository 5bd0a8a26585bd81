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


def _crc32c_scalar(data, crc: int = 0) -> int:
    """Byte-at-a-time reference implementation (and small-input path)."""
    crc ^= 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# -- vectorized CRC32C ------------------------------------------------------
# The byte-serial loop manages ~8 MB/s in CPython — it would dominate
# record-batch decode on executors. CRC is affine over GF(2):
# state_after(B, s0) = M_len(B)·s0 ⊕ state_after(B, 0), where M_L (the
# "shift by L zero bytes" operator) depends only on the length. So:
# split the buffer into C equal lanes, run the per-byte recurrence over
# ALL lanes simultaneously with numpy (L = n/C python iterations of
# C-wide table gathers), then fold the C lane states left-to-right with
# M_L applied via four 256-entry lookup tables (built once per distinct
# L by binary exponentiation of the zero-byte step over the bit basis).
# Public algorithm/identities (same math as zlib's crc32_combine).

def _zero_step_basis() -> list[int]:
    # basis images of one zero-byte step: state' = T[state & 0xFF] ^ (state >> 8)
    return [
        _CRC32C_TABLE[(1 << b) & 0xFF] ^ ((1 << b) >> 8) for b in range(32)
    ]


def _apply_basis(basis: list[int], v: int) -> int:
    out = 0
    b = 0
    while v:
        if v & 1:
            out ^= basis[b]
        v >>= 1
        b += 1
    return out


def _compose(p: list[int], q: list[int]) -> list[int]:
    # (p ∘ q)(x): apply q then p, as bit-basis images
    return [_apply_basis(p, q[b]) for b in range(32)]


def _shift_tables(n_bytes: int):
    """Four 256-entry tables applying M_{n_bytes} to a 32-bit state:
    apply(s) = U0[s&FF] ^ U1[(s>>8)&FF] ^ U2[(s>>16)&FF] ^ U3[s>>24]."""
    op = [1 << b for b in range(32)]  # identity
    sq = _zero_step_basis()
    n = n_bytes
    while n:
        if n & 1:
            op = _compose(sq, op)
        sq = _compose(sq, sq)
        n >>= 1
    tables = []
    for k in range(4):
        tk = [0] * 256
        for v in range(256):
            acc = 0
            vv = v
            b = 0
            while vv:
                if vv & 1:
                    acc ^= op[8 * k + b]
                vv >>= 1
                b += 1
            tk[v] = acc
        tables.append(tk)
    return tables


_SHIFT_CACHE: dict[int, list] = {}


def crc32c(data, crc: int = 0) -> int:
    """CRC32C (Castagnoli). Vectorized across numpy lanes for large
    inputs (≫100 MB/s vs ~8 MB/s byte-serial); falls back to the scalar
    loop for small buffers or when numpy is unavailable. Test vector:
    crc32c(b'123456789') == 0xE3069283."""
    n = len(data)
    if n < 16384:  # numpy per-iteration overhead loses below ~16 KiB
        return _crc32c_scalar(data, crc)
    try:
        import numpy as np
    except ImportError:  # pragma: no cover - numpy is baked in
        return _crc32c_scalar(data, crc)
    # geometry: python-loop iterations = lane_len, scalar fold = lanes;
    # ~256 bytes/lane balances numpy per-iteration overhead against the
    # fold (measured: 64 KiB ~36 MB/s, 1 MiB ~130 MB/s, 4 MiB ~150 MB/s
    # vs 8 MB/s byte-serial)
    lanes = min(16384, max(64, n >> 8))
    lane_len = n // lanes
    body = lanes * lane_len
    chunks = np.frombuffer(data, dtype=np.uint8, count=body).reshape(
        lanes, lane_len
    )
    tbl = np.array(_CRC32C_TABLE, dtype=np.uint32)
    state = np.zeros(lanes, dtype=np.uint32)
    for j in range(lane_len):
        state = tbl[(state ^ chunks[:, j]) & 0xFF] ^ (state >> np.uint32(8))
    if lane_len not in _SHIFT_CACHE:
        if len(_SHIFT_CACHE) > 64:  # bound the per-length table cache
            _SHIFT_CACHE.clear()
        _SHIFT_CACHE[lane_len] = _shift_tables(lane_len)
    u0, u1, u2, u3 = _SHIFT_CACHE[lane_len]
    s = (crc ^ 0xFFFFFFFF) & 0xFFFFFFFF
    for c in state.tolist():
        s = (
            u0[s & 0xFF]
            ^ u1[(s >> 8) & 0xFF]
            ^ u2[(s >> 16) & 0xFF]
            ^ u3[s >> 24]
        ) ^ c
    crc_out = s ^ 0xFFFFFFFF
    if body < n:  # tail shorter than a lane: finish byte-serial
        crc_out = _crc32c_scalar(data[body:], crc_out)
    return crc_out


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
    records: Sequence[tuple],
) -> bytes:
    """Encode ``(key, value, timestamp_ms[, headers])`` records as one
    RecordBatch v2 (uncompressed, non-transactional); ``headers`` is an
    optional sequence of (str, bytes|None). Layout per the public spec:
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
    for i, r in enumerate(records):
        key, value, ts = r[0], r[1], r[2]
        headers = r[3] if len(r) > 3 else ()
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
        rec.varint(len(headers))
        for hk, hv in headers:
            hk_b = hk.encode("utf-8")
            rec.varint(len(hk_b)).bytes_raw(hk_b)
            if hv is None:
                rec.varint(-1)
            else:
                rec.varint(len(hv)).bytes_raw(hv)
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
        # hot loop: inlined varint/byte-slicing on the raw buffer (no
        # per-record Reader objects) — the per-record decode cost is the
        # consumer's throughput ceiling, see SCALE.md "kafka_py"
        buf = batch.data
        p = batch.pos
        append = out.append
        for _ in range(n):
            # varint x6 inlined; zig-zag decode at use sites
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            # rec_len (unsigned use): skip — bounds come from fields
            p += 1  # record attributes (unused)
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            ts_delta = (z >> 1) ^ -(z & 1)
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            off_delta = (z >> 1) ^ -(z & 1)
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            klen = (z >> 1) ^ -(z & 1)
            if klen >= 0:
                key = buf[p : p + klen]
                p += klen
            else:
                key = None
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            vlen = (z >> 1) ^ -(z & 1)
            if vlen >= 0:
                value = buf[p : p + vlen]
                p += vlen
            else:
                value = None
            z = 0
            shift = 0
            while True:
                byte = buf[p]
                p += 1
                z |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            n_headers = (z >> 1) ^ -(z & 1)
            if n_headers:
                headers = []
                for _ in range(n_headers):
                    z = 0
                    shift = 0
                    while True:
                        byte = buf[p]
                        p += 1
                        z |= (byte & 0x7F) << shift
                        if not byte & 0x80:
                            break
                        shift += 7
                    hk_len = (z >> 1) ^ -(z & 1)
                    hk = buf[p : p + hk_len].decode("utf-8")
                    p += hk_len
                    z = 0
                    shift = 0
                    while True:
                        byte = buf[p]
                        p += 1
                        z |= (byte & 0x7F) << shift
                        if not byte & 0x80:
                            break
                        shift += 7
                    hv_len = (z >> 1) ^ -(z & 1)
                    if hv_len >= 0:
                        hv = buf[p : p + hv_len]
                        p += hv_len
                    else:
                        hv = None
                    headers.append((hk, hv))
                headers_t = tuple(headers)
            else:
                headers_t = ()
            append(
                WireRecord(
                    base_offset + off_delta,
                    base_ts + ts_delta,
                    key,
                    value,
                    headers_t,
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
API_SASL_HANDSHAKE = 17
API_VERSIONS = 18
API_SASL_AUTHENTICATE = 36

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_NOT_LEADER_FOR_PARTITION = 6
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_ILLEGAL_SASL_STATE = 34
ERR_SASL_AUTHENTICATION_FAILED = 58

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
# Security: TLS + SASL (PLAIN, SCRAM-SHA-256/-512) — RFC 4616 / RFC 5802
# the public Kafka SaslHandshake v1 / SaslAuthenticate v0 APIs. The
# reference inherits auth from arbitrary Kafka client configs
# (topic/KafkaTopic.java:47 passes the consumer config map through);
# most real clusters require SASL_SSL, so the jar-free client speaks it
# too. Pure stdlib: ssl for the transport, hashlib/hmac for SCRAM.
# ---------------------------------------------------------------------------

_SECURITY_PROTOCOLS = ("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")
_SASL_MECHANISMS = ("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")


@dataclass(frozen=True)
class SecurityConfig:
    """Transport security for :class:`KafkaWireClient` — the jar-free
    analog of the JVM client's ``security.protocol`` family. Picklable
    (it rides inside each executor's ``KafkaSlice``)."""

    protocol: str = "PLAINTEXT"
    sasl_mechanism: str | None = None
    username: str | None = None
    password: str | None = None
    #: PEM paths (librdkafka-style names in the option surface)
    ssl_cafile: str | None = None
    ssl_certfile: str | None = None
    ssl_keyfile: str | None = None
    #: "https" (default, hostname verified) or "" (disabled) — the
    #: Kafka ``ssl.endpoint.identification.algorithm`` convention
    ssl_endpoint_identification: str = "https"

    def __post_init__(self) -> None:
        if self.protocol not in _SECURITY_PROTOCOLS:
            raise ValueError(
                f"security protocol must be one of {_SECURITY_PROTOCOLS}; "
                f"got {self.protocol!r}"
            )
        if self.uses_sasl:
            if self.sasl_mechanism not in _SASL_MECHANISMS:
                raise ValueError(
                    f"sasl mechanism must be one of {_SASL_MECHANISMS}; "
                    f"got {self.sasl_mechanism!r}"
                )
            if self.username is None or self.password is None:
                raise ValueError(
                    f"{self.protocol} requires username and password"
                )

    @property
    def uses_tls(self) -> bool:
        return self.protocol in ("SSL", "SASL_SSL")

    @property
    def uses_sasl(self) -> bool:
        return self.protocol in ("SASL_PLAINTEXT", "SASL_SSL")

    def wrap_socket(self, sock, server_hostname: str):
        import ssl as _ssl

        ctx = _ssl.create_default_context(cafile=self.ssl_cafile)
        if self.ssl_certfile:
            ctx.load_cert_chain(self.ssl_certfile, self.ssl_keyfile)
        if self.ssl_endpoint_identification != "https":
            ctx.check_hostname = False
        if self.ssl_cafile is None and not ctx.check_hostname:
            # no CA pinned and hostname checks off: still TLS-encrypted,
            # unverified peer (test/loopback posture, like the JVM
            # client with an empty truststore + "" endpoint algorithm)
            ctx.verify_mode = _ssl.CERT_NONE
        return ctx.wrap_socket(sock, server_hostname=server_hostname)


# -- SCRAM primitives (RFC 5802; SHA-256 per RFC 7677, SHA-512 per the
# same construction with the hash swapped — the Kafka ScramMechanism
# pair), shared by client and the test broker's server side ----------------

def _scram_hash(mechanism: str) -> str:
    return "sha512" if mechanism.endswith("512") else "sha256"


def _hmac_sha256(key: bytes, msg: bytes, algo: str = "sha256") -> bytes:
    import hmac as _hmac

    return _hmac.new(key, msg, algo).digest()


def scram_salted_password(
    password: str, salt: bytes, iterations: int, algo: str = "sha256"
) -> bytes:
    import hashlib as _hashlib

    return _hashlib.pbkdf2_hmac(
        algo, password.encode("utf-8"), salt, iterations
    )


def scram_client_keys(
    salted: bytes, algo: str = "sha256"
) -> tuple[bytes, bytes, bytes]:
    """(client_key, stored_key, server_key) per RFC 5802 §3."""
    import hashlib as _hashlib

    client_key = _hmac_sha256(salted, b"Client Key", algo)
    stored_key = _hashlib.new(algo, client_key).digest()
    server_key = _hmac_sha256(salted, b"Server Key", algo)
    return client_key, stored_key, server_key


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


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
        security: SecurityConfig | None = None,
    ) -> None:
        self.client_id = client_id
        self._corr = 0
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        sec = security or SecurityConfig()
        if sec.uses_tls:
            try:
                self._sock = sec.wrap_socket(self._sock, server_hostname=host)
            except Exception:
                self._sock.close()
                raise
        if sec.uses_sasl:
            try:
                self._sasl_authenticate(sec)
            except Exception:
                self._sock.close()
                raise

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

    # -- SASL (SaslHandshake v1 + SaslAuthenticate v0) -----------------------
    def _sasl_send(self, token: bytes) -> bytes:
        """One SaslAuthenticate round trip; returns the server token."""
        r = self._call(
            API_SASL_AUTHENTICATE, 0, Writer().nullable_bytes(token).build()
        )
        err = r.int16()
        msg = r.string()
        server_token = r.nullable_bytes() or b""
        if err:
            raise PermissionError(
                f"SASL authentication failed (error {err}): {msg or ''}"
            )
        return server_token

    def _sasl_authenticate(self, sec: SecurityConfig) -> None:
        # handshake v1: the broker confirms the mechanism, then tokens
        # flow wrapped in SaslAuthenticate (NOT raw on the socket — that
        # is the legacy v0 flow)
        r = self._call(
            API_SASL_HANDSHAKE, 1, Writer().string(sec.sasl_mechanism).build()
        )
        err = r.int16()
        enabled = r.array(lambda rr: rr.string())
        if err:
            raise PermissionError(
                f"SASL mechanism {sec.sasl_mechanism!r} rejected "
                f"(error {err}); broker enables {enabled}"
            )
        user, pwd = sec.username or "", sec.password or ""
        if sec.sasl_mechanism == "PLAIN":
            # RFC 4616: [authzid] NUL authcid NUL passwd
            self._sasl_send(
                b"\0" + user.encode("utf-8") + b"\0" + pwd.encode("utf-8")
            )
            return
        # SCRAM-SHA-256/-512 (RFC 5802) — mutual: the client also
        # VERIFIES the server signature, so a server that doesn't know
        # the password fails loudly here
        import base64
        import secrets

        algo = _scram_hash(sec.sasl_mechanism or "")
        cnonce = secrets.token_urlsafe(18)
        # RFC 5802 §5.1: "=" and "," in usernames are escaped
        user_esc = user.replace("=", "=3D").replace(",", "=2C")
        client_first_bare = f"n={user_esc},r={cnonce}"
        server_first = self._sasl_send(
            ("n,," + client_first_bare).encode("utf-8")
        ).decode("utf-8")
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not nonce.startswith(cnonce):
            raise PermissionError("SCRAM server nonce does not extend ours")
        salted = scram_salted_password(
            pwd, base64.b64decode(salt_b64), iters, algo
        )
        client_key, stored_key, server_key = scram_client_keys(
            salted, algo
        )
        client_final_bare = f"c=biws,r={nonce}"  # biws = b64("n,,")
        auth_message = ",".join(
            (client_first_bare, server_first, client_final_bare)
        ).encode("utf-8")
        proof = _xor(
            client_key, _hmac_sha256(stored_key, auth_message, algo)
        )
        server_final = self._sasl_send(
            (
                client_final_bare
                + ",p="
                + base64.b64encode(proof).decode("ascii")
            ).encode("utf-8")
        ).decode("utf-8")
        want_v = base64.b64encode(
            _hmac_sha256(server_key, auth_message, algo)
        ).decode("ascii")
        if server_final != f"v={want_v}":
            raise PermissionError(
                "SCRAM server signature mismatch — the broker does not "
                "hold this credential (possible MITM); aborting"
            )

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
        """Metadata v0. Empty/None topic list = all topics. Each
        partition's ``leader`` is a broker node id — resolve it against
        the returned broker list to route fetches/produces (a real
        cluster rejects non-leader requests with error 6)."""
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
