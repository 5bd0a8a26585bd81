"""WARC / WET web-crawl ingestion (ISO 28500, the Common Crawl
container format) — real pretraining corpora start at crawl archives,
not parquet, so the pipeline ingests them natively (round-9 verdict
task 3; beyond-reference §7.5 surface, no counterpart in the reference,
which starts at Kafka topics).

Execution model (the shape that holds at 100 TB):

* **Parallelism unit = archive file.** Common Crawl ships ~1 GB gzip
  segments in the tens of thousands per crawl — the natural Spark task
  granularity. Paths are distributed one-per-task and each task
  STREAMS its file through a stdlib parser inside Arrow
  ``mapInPandas``; the decompressed archive is never materialized
  (records are yielded one at a time, batched by Arrow).
* **Multi-member gzip.** Common Crawl gzips each record as its own
  member for random access; ``gzip.open`` reads concatenated members
  transparently in stream mode, so the same code path handles
  per-record-gzipped, whole-file-gzipped, and plain archives.
* **Object-store seam.** ``opener`` is a callable ``path -> binary
  file object``; the default handles local paths (+ ``.gz``). At
  production, pass an fsspec/boto streaming opener — the parser only
  needs ``read(n)``/``readline()``.

Record grammar (WARC/1.0, public spec): a version line, ``Name:
value`` headers (with optional LWS continuation lines) up to a blank
line, ``Content-Length`` payload bytes, then CRLF CRLF. WET files are
WARC files whose ``conversion`` records carry extracted plain text —
``read_wet`` maps them straight onto the ``documents`` table schema
``(doc_id, text, lang, source, n_chars)``.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
import os
import re
from html.parser import HTMLParser
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: full record frame emitted by :func:`read_warc`
WARC_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("payload", T.BinaryType()),
        T.StructField("path", T.StringType()),
    ]
)


def default_opener(path: str):
    """Local-filesystem opener; ``.gz`` goes through streaming gzip
    (multi-member concatenation handled by the stdlib). Swap for an
    fsspec/boto opener at production — see module docstring."""
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _read_headers(stream) -> dict[str, str] | None:
    """Parse one record's header block: the ``WARC/x.y`` version line
    then ``Name: value`` lines (LWS continuations folded) up to a
    blank line. Returns None at clean EOF (no more records)."""
    # skip inter-record blank lines, find the version line
    while True:
        line = stream.readline()
        if not line:
            return None
        s = line.strip()
        if not s:
            continue
        if not s.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line, got {s[:40]!r}"
            )
        break
    headers: dict[str, str] = {}
    last_key: str | None = None
    while True:
        line = stream.readline()
        if not line:
            raise ValueError("EOF inside record headers")
        line = line.rstrip(b"\r\n")
        if not line:
            return headers
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # LWS continuation (spec: long values may fold)
            headers[last_key] += " " + line.strip().decode(
                "utf-8", "replace"
            )
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {line[:40]!r}")
        last_key = name.strip().decode("utf-8", "replace")
        headers[last_key] = value.strip().decode("utf-8", "replace")


def iter_warc_records(
    stream, strict: bool = True
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per record from a binary stream.
    ``strict=False`` stops at the first malformed record instead of
    raising — crawl archives in the wild end in truncated members."""
    while True:
        try:
            headers = _read_headers(stream)
            if headers is None:
                return
            length = int(headers.get("Content-Length", "0"))
            payload = stream.read(length)
            if len(payload) != length:
                raise ValueError(
                    f"truncated payload: wanted {length}, "
                    f"got {len(payload)}"
                )
        except (ValueError, EOFError, gzip.BadGzipFile):
            # gzip truncation surfaces as EOFError / gzip.BadGzipFile,
            # not just ValueError — lenient mode swallows exactly those
            # for wild-crawl tail members. Unrelated OSErrors (a real
            # transient I/O fault mid-archive) still propagate so a
            # flaky read is never mistaken for a truncated tail.
            if strict:
                raise
            return
        yield headers, payload


def _expand(paths: str | Iterable[str]) -> list[str]:
    """A glob pattern, a directory, a single file, or a list of any of
    those → sorted concrete file list (deterministic task order)."""
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz"))
            )
        elif _glob.has_magic(p):
            out.extend(_glob.glob(p))
        else:
            out.append(p)
    if not out:
        raise ValueError(f"no WARC/WET files under {paths!r}")
    return sorted(out)


def read_warc(
    spark: SparkSession,
    paths: str | Iterable[str],
    *,
    warc_types: tuple[str, ...] | None = None,
    strict: bool = True,
    opener: Callable[[str], io.IOBase] = default_opener,
    max_payload_bytes: int | None = None,
) -> DataFrame:
    """Read WARC archives into the :data:`WARC_SCHEMA` frame — one
    Spark task per archive file, streaming parse, Arrow-batched rows.

    ``warc_types`` filters records during the parse (e.g.
    ``("response",)``) so unwanted payloads never cross the Arrow
    boundary; ``max_payload_bytes`` SKIPS oversized records (a guard
    against pathological crawl blobs blowing task memory — skipped,
    not truncated, so downstream never sees half a document)."""
    import pandas as pd

    files = _expand(paths)
    pathdf = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")
    want = tuple(warc_types) if warc_types else None

    def parse(batches):
        for pdf in batches:
            for path in pdf["path"]:
                rows = []
                with opener(path) as fh:
                    for hdr, payload in iter_warc_records(fh, strict):
                        rtype = hdr.get("WARC-Type")
                        if want and rtype not in want:
                            continue
                        if (
                            max_payload_bytes is not None
                            and len(payload) > max_payload_bytes
                        ):
                            continue
                        rows.append(
                            (
                                hdr.get("WARC-Record-ID"),
                                rtype,
                                hdr.get("WARC-Target-URI"),
                                hdr.get("WARC-Date"),
                                hdr.get("Content-Type"),
                                len(payload),
                                hdr,
                                payload,
                                path,
                            )
                        )
                        if len(rows) >= 256:  # bound task memory
                            yield pd.DataFrame(
                                rows, columns=WARC_SCHEMA.names
                            )
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=WARC_SCHEMA.names)

    return pathdf.mapInPandas(parse, WARC_SCHEMA)


def read_wet(
    spark: SparkSession,
    paths: str | Iterable[str],
    *,
    strict: bool = True,
    opener: Callable[[str], io.IOBase] = default_opener,
    max_payload_bytes: int | None = None,
) -> DataFrame:
    """Read WET (extracted-text) archives straight onto the
    ``documents`` table schema ``(doc_id, text, lang, source,
    n_chars)`` — the ``build_corpus`` front door for crawl data
    (config: ``corpus.input_format: wet``).

    ``doc_id`` is the first 15 hex chars (60 bits) of
    md5(WARC-Record-ID) as a long — deterministic across retries and
    engines (same ``conv(substr(md5 ...))`` construction as the t04
    sampling hash), overflow-free under ANSI, collision-safe at crawl
    scale (2⁻⁶⁰·N² birthday term). ``lang`` is left NULL: the
    pipeline's language-ID stage (t03) fills ``lang_guess`` from the
    text itself. ``source`` is the WARC-Target-URI."""
    recs = read_warc(
        spark,
        paths,
        warc_types=("conversion",),
        strict=strict,
        opener=opener,
        max_payload_bytes=max_payload_bytes,
    )
    text = F.decode(F.col("payload"), "UTF-8")
    return recs.select(
        _md5_long(F.col("record_id")).alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("target_uri").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def _md5_long(col):
    """First 15 md5 hex chars (60 bits) as a long — the digest-to-id
    rule DuckDB can replay; < 2⁶⁰ so the cast never overflows ANSI."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def wet_doc_id(record_id: str) -> int:
    """Driver-side twin of the ``doc_id`` expression in
    :func:`read_wet` (for tests and oracles)."""
    return int(
        hashlib.md5(record_id.encode("utf-8")).hexdigest()[:15], 16
    )


class _TextExtractor(HTMLParser):
    """Minimal boilerplate-aware HTML→text: drops script/style/
    noscript/template subtrees, emits newline boundaries at block
    elements so downstream line-level cleaning (t19) sees real lines,
    and collapses intra-line whitespace. stdlib-only by design — the
    production seam for trafilatura/jusText-class extractors is the
    ``extractor`` argument of :func:`read_warc_html`."""

    _SKIP = {"script", "style", "noscript", "template"}
    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
        "h5", "h6", "tr", "table", "section", "article", "header",
        "footer", "blockquote", "pre",
    }

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag in self._BLOCK:
            self._parts.append("\n")

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag in self._BLOCK:
            self._parts.append("\n")

    def handle_data(self, data):
        if not self._skip_depth and data:
            self._parts.append(data)

    def text(self) -> str:
        lines = []
        for raw in "".join(self._parts).split("\n"):
            line = " ".join(raw.split())
            if line:
                lines.append(line)
        return "\n".join(lines)


def html_to_text(html: str) -> str:
    """Extract readable text from HTML (stdlib parser; see
    :class:`_TextExtractor`). Malformed markup never raises — the
    parser is lenient by design, matching crawl reality."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage whatever was parsed before the fault
    return p.text()


_CHARSET_RE = re.compile(rb"charset=([A-Za-z0-9_\-]+)", re.I)


def split_http_response(payload: bytes) -> tuple[dict[str, str], bytes]:
    """Split a WARC ``response`` record's HTTP payload into (headers,
    body). Tolerates LF-only header endings; returns ({}, payload)
    when no HTTP preamble is present (some writers store bare
    bodies)."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx != -1:
            head, body = payload[:idx], payload[idx + len(sep):]
            break
    else:
        return {}, payload
    headers: dict[str, str] = {}
    for line in head.split(b"\n")[1:]:  # skip the status line
        line = line.rstrip(b"\r")
        name, sep2, value = line.partition(b":")
        if sep2:
            headers[
                name.strip().decode("utf-8", "replace").lower()
            ] = value.strip().decode("utf-8", "replace")
    return headers, body


def _decode_body(body: bytes, content_type: str | None) -> str:
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type.encode())
        if m:
            enc = m.group(1).decode()
    try:
        return body.decode(enc, "replace")
    except LookupError:  # unknown charset label in the wild
        return body.decode("utf-8", "replace")


def read_warc_html(
    spark: SparkSession,
    paths: str | Iterable[str],
    *,
    strict: bool = True,
    opener: Callable[[str], io.IOBase] = default_opener,
    max_payload_bytes: int | None = None,
    extractor: Callable[[str], str] = html_to_text,
) -> DataFrame:
    """Raw-crawl front door: WARC ``response`` records → the
    ``documents`` schema, extracting text from HTML bodies — the step
    WET files have already done, run here for corpora that ship only
    raw WARC. Per record: split the HTTP payload (status/headers/
    body), keep ``text/html`` responses (or untyped bare bodies),
    decode by the declared charset (utf-8 fallback), extract text via
    ``extractor`` (stdlib :func:`html_to_text` by default — swap in a
    trafilatura-class callable at production), drop records that
    extract to nothing. Same doc_id/provenance rules as
    :func:`read_wet`; one streaming task per archive, zero shuffles."""
    import pandas as pd

    recs = read_warc(
        spark,
        paths,
        warc_types=("response",),
        strict=strict,
        opener=opener,
        max_payload_bytes=max_payload_bytes,
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for rid, uri, payload in zip(
                pdf["record_id"], pdf["target_uri"], pdf["payload"]
            ):
                headers, body = split_http_response(bytes(payload))
                ctype = headers.get("content-type")
                # keep text/html (and untyped bare bodies) ONLY —
                # text/css, text/javascript etc. are code, not prose
                if ctype and "html" not in ctype:
                    continue
                text = extractor(_decode_body(body, ctype))
                if not text:
                    continue
                rows.append(
                    (wet_doc_id(rid), text, None, uri, len(text))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "text", "lang", "source", "n_chars"],
            )

    return recs.mapInPandas(extract, out_schema)
