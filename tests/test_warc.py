"""WARC/WET crawl-archive ingestion (sources/warc.py) — synthesized
fixtures (no network): plain, whole-file-gzip, and Common-Crawl-style
per-record-gzip-member archives; header folding; truncation handling;
the documents-schema mapping; and the build_corpus front door."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from southpaw_spark.sources.warc import (
    read_warc,
    read_wet,
    wet_doc_id,
)


def _record(
    rid: str,
    rtype: str,
    payload: bytes,
    uri: str | None = None,
    extra: dict | None = None,
) -> bytes:
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2026-08-15T00:00:00Z",
    ]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    for k, v in (extra or {}).items():
        h.append(k.encode() + b": " + v.encode())
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


TEXT_A = "Hello crawl world. Ünïcôde résumé naïve.\nSecond line."
TEXT_B = "short doc"
REC_A = "<urn:uuid:aaaaaaaa-1111-2222-3333-444444444444>"
REC_B = "<urn:uuid:bbbbbbbb-1111-2222-3333-444444444444>"


def _wet_bytes() -> bytes:
    return (
        _record("<urn:uuid:info>", "warcinfo", b"software: test\r\n")
        + _record(
            REC_A, "conversion", TEXT_A.encode("utf-8"),
            uri="https://example.com/a",
        )
        + _record(
            REC_B, "conversion", TEXT_B.encode("utf-8"),
            uri="https://example.org/b",
        )
    )


def test_read_warc_plain_gzip_and_multimember(spark, tmp_path):
    """The same three records parse identically from a plain .warc, a
    whole-file .warc.gz, and a per-record-gzip-member .warc.gz (the
    Common Crawl layout); headers land in the map column, payload
    bytes are exact, one task per file keeps path provenance."""
    raw = _wet_bytes()
    plain = tmp_path / "one.warc"
    plain.write_bytes(raw)
    whole = tmp_path / "two.warc.gz"
    whole.write_bytes(gzip.compress(raw))
    members = tmp_path / "three.warc.gz"
    members.write_bytes(
        gzip.compress(
            _record("<urn:uuid:info>", "warcinfo", b"software: test\r\n")
        )
        + gzip.compress(
            _record(
                REC_A, "conversion", TEXT_A.encode("utf-8"),
                uri="https://example.com/a",
            )
        )
        + gzip.compress(
            _record(
                REC_B, "conversion", TEXT_B.encode("utf-8"),
                uri="https://example.org/b",
            )
        )
    )
    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 9  # 3 files x 3 records
    by_file: dict = {}
    for r in out:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    for rows in by_file.values():
        rows = sorted(rows, key=lambda r: r["record_id"])
        conv = [r for r in rows if r["warc_type"] == "conversion"]
        assert len(conv) == 2
        a = next(r for r in conv if r["record_id"] == REC_A)
        assert bytes(a["payload"]).decode("utf-8") == TEXT_A
        assert a["target_uri"] == "https://example.com/a"
        assert a["content_length"] == len(TEXT_A.encode("utf-8"))
        assert a["headers"]["WARC-Date"] == "2026-08-15T00:00:00Z"
        assert a["warc_date"] == "2026-08-15T00:00:00Z"


def test_header_folding_and_lf_only_endings(spark, tmp_path):
    """LWS continuation lines fold into the previous header; archives
    written with bare-LF line endings still parse."""
    payload = b"x" * 5
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:fold>\n"
        b"WARC-Folded: part one\n"
        b"  part two\n"
        b"Content-Length: 5\n"
        b"\n" + payload + b"\n\n"
    )
    f = tmp_path / "lf.warc"
    f.write_bytes(rec)
    rows = read_warc(spark, str(f)).collect()
    assert len(rows) == 1
    assert rows[0]["headers"]["WARC-Folded"] == "part one part two"
    assert bytes(rows[0]["payload"]) == payload


def test_read_wet_maps_documents_schema(spark, tmp_path):
    """WET conversion records land on (doc_id, text, lang, source,
    n_chars); doc_id equals the driver-side wet_doc_id twin; warcinfo
    records are filtered during the parse; lang is NULL for the
    pipeline's language-ID stage to fill."""
    f = tmp_path / "crawl.wet.gz"
    f.write_bytes(gzip.compress(_wet_bytes()))
    docs = read_wet(spark, str(f))
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = {r["source"]: r for r in docs.collect()}
    assert set(rows) == {"https://example.com/a", "https://example.org/b"}
    a = rows["https://example.com/a"]
    assert a["text"] == TEXT_A
    assert a["n_chars"] == len(TEXT_A)  # chars, not bytes
    assert a["lang"] is None
    assert a["doc_id"] == wet_doc_id(REC_A)
    assert rows["https://example.org/b"]["doc_id"] == wet_doc_id(REC_B)


def test_truncated_archive_strict_and_lenient(spark, tmp_path):
    """strict=True surfaces the truncation as an error; strict=False
    yields the intact prefix records and stops (crawl archives in the
    wild end mid-member)."""
    good = _record(REC_A, "conversion", b"intact", uri="https://a")
    bad = good + b"WARC/1.0\r\nWARC-Type: conversion\r\n" \
        b"WARC-Record-ID: <urn:uuid:cut>\r\nContent-Length: 999\r\n" \
        b"\r\nonly-a-few-bytes"
    f = tmp_path / "trunc.warc"
    f.write_bytes(bad)
    lenient = read_warc(spark, str(f), strict=False).collect()
    assert [r["record_id"] for r in lenient] == [REC_A]
    with pytest.raises(Exception, match="truncated payload"):
        read_warc(spark, str(f), strict=True).collect()


def test_type_filter_and_payload_guard(spark, tmp_path):
    """warc_types filters during the parse; max_payload_bytes SKIPS
    oversized records rather than truncating them."""
    f = tmp_path / "mix.warc"
    f.write_bytes(
        _record("<urn:uuid:i>", "warcinfo", b"meta")
        + _record("<urn:uuid:r>", "response", b"H" * 100, uri="https://r")
        + _record("<urn:uuid:c>", "conversion", b"tiny", uri="https://c")
    )
    resp = read_warc(spark, str(f), warc_types=("response",)).collect()
    assert [r["record_id"] for r in resp] == ["<urn:uuid:r>"]
    small = read_warc(spark, str(f), max_payload_bytes=50).collect()
    assert sorted(r["record_id"] for r in small) == [
        "<urn:uuid:c>", "<urn:uuid:i>"
    ]
    with pytest.raises(ValueError, match="no WARC/WET files"):
        read_warc(spark, str(tmp_path / "nope" / "*.warc"))


def test_build_corpus_cli_front_door_from_wet(spark, tmp_path):
    """corpus.input_format: wet runs the full build_corpus pipeline off
    a crawl archive and writes the corpus — the operational entry
    point (cli.build_corpus_cmd)."""
    from southpaw_spark.cli import build_corpus_cmd

    f = tmp_path / "crawl.wet.gz"
    f.write_bytes(gzip.compress(_wet_bytes()))
    out = tmp_path / "corpus_out"
    cfg = {
        "corpus": {
            "input": str(f),
            "input_format": "wet",
            "output": str(out),
            "min_tokens": 2,
            "exact_dedup": True,
        }
    }
    build_corpus_cmd(spark, cfg)
    got = spark.read.parquet(str(out))
    assert got.count() == 2  # both docs have >= 2 tokens
    assert {r["source"] for r in got.select("source").collect()} == {
        "https://example.com/a", "https://example.org/b"
    }
    with pytest.raises(ValueError, match="input_format"):
        build_corpus_cmd(
            spark,
            {"corpus": {"input": "x", "input_format": "csv",
                        "output": "y"}},
        )


def test_read_warc_html_extracts_response_records(spark, tmp_path):
    """Raw-crawl path: WARC response records carrying full HTTP
    payloads parse into documents — script/style dropped, block
    boundaries become lines, charset honored, non-HTML and
    empty-extraction records skipped, bare bodies (no HTTP preamble)
    tolerated."""
    from southpaw_spark.sources.warc import (
        html_to_text,
        read_warc_html,
        split_http_response,
    )

    html = (
        "<html><head><title>T</title><script>var x=1;</script>"
        "<style>.a{}</style></head><body><h1>Head  line</h1>"
        "<p>First   para.</p><p>S&eacute;cond</p>"
        "<div>nested <b>bold</b> text</div></body></html>"
    )
    assert html_to_text(html) == (
        "T\nHead line\nFirst para.\nSécond\nnested bold text"
    )
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Server: x\r\n\r\n" + html.encode("utf-8")
    )
    hdrs, body = split_http_response(http)
    assert hdrs["content-type"].startswith("text/html")
    assert body == html.encode("utf-8")

    png = b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG"
    bare = b"<p>bare body no preamble</p>"
    latin = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=iso-8859-1\r\n\r\n"
        b"<p>caf\xe9</p>"
    )
    f = tmp_path / "raw.warc"
    f.write_bytes(
        _record("<urn:uuid:h1>", "response", http, uri="https://h1")
        + _record("<urn:uuid:img>", "response", png, uri="https://img")
        + _record("<urn:uuid:bare>", "response", bare, uri="https://bare")
        + _record("<urn:uuid:l1>", "response", latin, uri="https://l1")
        + _record("<urn:uuid:c>", "conversion", b"not a response")
    )
    docs = {r["source"]: r for r in read_warc_html(spark, str(f)).collect()}
    assert set(docs) == {"https://h1", "https://bare", "https://l1"}
    assert docs["https://h1"]["text"] == (
        "T\nHead line\nFirst para.\nSécond\nnested bold text"
    )
    assert docs["https://l1"]["text"] == "café"  # declared charset used
    assert docs["https://bare"]["text"] == "bare body no preamble"
    assert docs["https://h1"]["doc_id"] == wet_doc_id("<urn:uuid:h1>")
    assert docs["https://h1"]["n_chars"] == len(docs["https://h1"]["text"])


def test_truncated_gzip_member_lenient(spark, tmp_path):
    """r10-ADVICE regression: a .warc.gz whose LAST gzip member is cut
    mid-stream surfaces as EOFError/BadGzipFile (not ValueError);
    strict=False must still yield the intact prefix records, strict=True
    must raise."""
    good = gzip.compress(
        _record(REC_A, "conversion", TEXT_A.encode(), uri="https://a")
    )
    cut = gzip.compress(
        _record(REC_B, "conversion", b"x" * 4000, uri="https://b")
    )[:40]  # mid-member: header parses, stream dies inside the payload
    f = tmp_path / "tail.warc.gz"
    f.write_bytes(good + cut)
    lenient = read_warc(spark, str(f), strict=False).collect()
    assert [r["record_id"] for r in lenient] == [REC_A]
    with pytest.raises(Exception):
        read_warc(spark, str(f), strict=True).collect()


def test_lenient_mode_propagates_real_io_errors():
    """r11-ADVICE regression: lenient mode swallows ONLY the
    truncated-tail signatures (ValueError / EOFError / BadGzipFile).
    A genuine transient I/O fault mid-archive must propagate even with
    strict=False — otherwise a flaky read silently ends iteration and
    loses the rest of the WARC."""
    import io

    from southpaw_spark.sources.warc import iter_warc_records

    rec = _record(REC_A, "conversion", TEXT_A.encode(), uri="https://a")

    class FlakyStream(io.BytesIO):
        def __init__(self, data, fail_after):
            super().__init__(data)
            self._fail_after = fail_after

        def read(self, n=-1):
            if self.tell() >= self._fail_after:
                raise OSError(5, "Input/output error")
            return super().read(n)

        def readline(self, *a):
            if self.tell() >= self._fail_after:
                raise OSError(5, "Input/output error")
            return super().readline(*a)

    # the fault hits after the first record: that record still yields,
    # then the EIO surfaces instead of a silent stop
    it = iter_warc_records(FlakyStream(rec + rec, len(rec)), strict=False)
    headers, payload = next(it)
    assert headers["WARC-Record-ID"] == REC_A
    with pytest.raises(OSError, match="Input/output"):
        next(it)
    # truncated tail (EOF mid-payload) still ends quietly in lenient mode
    it2 = iter_warc_records(io.BytesIO((rec + rec)[: len(rec) + 60]),
                            strict=False)
    assert next(it2)[0]["WARC-Record-ID"] == REC_A
    assert list(it2) == []


def test_read_warc_html_skips_non_html_text_types(spark, tmp_path):
    """r10-ADVICE regression: text/css and text/javascript payloads are
    code, not prose — read_warc_html must skip them (only text/html and
    untyped bare bodies extract)."""
    from southpaw_spark.sources.warc import read_warc_html

    css = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/css\r\n\r\n"
        b".body { color: red; } .hero { margin: 0 auto; }"
    )
    js = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/javascript\r\n\r\n"
        b"function f(){ return 1; }"
    )
    plain = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"plain text body"
    )
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<p>real prose</p>"
    )
    f = tmp_path / "types.warc"
    f.write_bytes(
        _record("<urn:uuid:css>", "response", css, uri="https://css")
        + _record("<urn:uuid:js>", "response", js, uri="https://js")
        + _record("<urn:uuid:pl>", "response", plain, uri="https://pl")
        + _record("<urn:uuid:ht>", "response", html, uri="https://ht")
    )
    docs = {r["source"]: r["text"]
            for r in read_warc_html(spark, str(f)).collect()}
    assert docs == {"https://ht": "real prose"}
