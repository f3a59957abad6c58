"""WARC ingestion (`sources/warc.py`) and HTML text extraction
(`htmltext.py`) — the crawl front door. Fixtures include a
HAND-ASSEMBLED WARC byte stream built from the ISO 28500 grammar
(independent of the module's own writer) and adversarial HTML."""

import gzip
import io

import pytest

from vector_lake_spark.htmltext import html_title, html_to_text
from vector_lake_spark.sources.warc import (
    encode_warc,
    extract_warc_records,
    parse_warc,
)


def _hand_warc() -> bytes:
    """Spec-derived WARC with a response record (chunked headers
    exercising case-insensitivity) and a metadata record."""
    body = b"Hello \xc3\xa9crawl"  # UTF-8 e-acute
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=UTF-8\r\n"
        b"X-Served-By: t\r\n\r\n" + body
    )
    rec1 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.org/a\r\n"
        b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        b"CONTENT-LENGTH: " + str(len(http)).encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    meta = b"fetchTimeMs: 12"
    rec2 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"Content-Length: " + str(len(meta)).encode() + b"\r\n"
        b"\r\n" + meta + b"\r\n\r\n"
    )
    return rec1 + rec2


def test_hand_assembled_warc_parses():
    out = parse_warc(_hand_warc())
    assert len(out) == 2
    r = out[0]
    assert r["warc_type"] == "response"
    assert r["url"] == "http://example.org/a"
    assert r["http_status"] == 200
    assert r["http_headers"]["x-served-by"] == "t"
    assert r["body"] == "Hello écrawl"
    assert out[1]["warc_type"] == "metadata"
    assert out[1]["body"] == "fetchTimeMs: 12"


def test_member_gzip_layout_and_mid_stream_start():
    """Common Crawl's splittability property: each record is its own
    gzip member, so a reader starting at any member boundary sees a
    valid stream."""
    recs = [
        {"warc_type": "resource", "body": f"r{i}", "mime": "text/plain"}
        for i in range(3)
    ]
    blob = encode_warc(recs, member_gzip=True)
    # find the second member boundary and parse from there
    second = blob.index(b"\x1f\x8b", 1)
    tail = parse_warc(blob[second:])
    assert [r["body"] for r in tail] == ["r1", "r2"]


def test_corrupt_warc_raises_by_name():
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOT-WARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nxx")
    good = encode_warc(
        [{"warc_type": "resource", "body": "abc"}], member_gzip=True
    )
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(good[:-5])
    plain = encode_warc(
        [{"warc_type": "resource", "body": "abcdef"}], member_gzip=False
    )
    with pytest.raises(ValueError, match="truncated record block"):
        parse_warc(plain[:-8])


def test_charset_fallback_never_throws():
    body = b"caf\xe9"  # latin-1 bytes declared as utf-8
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + body
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    assert parse_warc(raw)[0]["body"] == "café"  # latin-1 fallback


def test_warc_operator_through_spark(spark):
    recs = [
        {
            "warc_type": "response",
            "url": "http://x/1",
            "http_status": 404,
            "http_headers": {"content-type": "text/html"},
            "body": "<p>gone</p>",
        },
        {"warc_type": "warcinfo", "body": "software: t"},
    ]
    df = spark.createDataFrame(
        [(5, bytearray(encode_warc(recs)))], "media_id long, payload binary"
    )
    got = extract_warc_records(df).orderBy("record_index").collect()
    assert [r["warc_type"] for r in got] == ["response", "warcinfo"]
    assert got[0]["http_status"] == 404 and got[0]["mime"] == "text/html"
    assert got[0]["body"] == "<p>gone</p>"


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------


def test_html_extraction_contract():
    h = (
        "<html><head><title> My   Page </title><style>p{color:red}</style>"
        "</head><body><script>if (x<2) alert('<p>fake</p>');</script>"
        "<h1>Head&amp;er</h1><p>hello   world</p>"
        "<span>inline</span><em>run</em><div>tail &lt;3</div>"
        "<noscript><p>enable js</p></noscript></body></html>"
    )
    assert html_to_text(h) == (
        "My Page\nHead&er\nhello world\ninlinerun\ntail <3"
    )
    assert html_title(h) == "My Page"


def test_html_nested_skip_and_void_tags():
    # a void tag inside <script> must not unbalance the skip depth
    # (html.parser treats script/style content as CDATA)
    h = "<script>a<br>b</script><p>kept</p>"
    assert html_to_text(h) == "kept"
    # nested skip subtrees
    h = "<noscript>x<script>y</script>z</noscript><p>ok</p>"
    assert html_to_text(h) == "ok"
    # self-closing block tag still breaks lines
    assert html_to_text("a<br/>b") == "a\nb"
    # r08 review fix: block tags INSIDE skipped subtrees contribute
    # nothing — not even their line breaks (the 'dropped entirely'
    # contract); noscript/template are not CDATA, so this is the
    # load-bearing case
    assert html_to_text("a<template><p>x</p></template>b") == "ab"
    assert html_to_text("a<noscript>x<br>y</noscript>b") == "ab"
    # a <title> inside a skipped subtree is not THE title
    assert html_title("<noscript><title>no</title></noscript>") is None


def test_html_extract_single_pass():
    from vector_lake_spark.htmltext import html_extract

    text, title = html_extract("<title>T</title><p>body</p>")
    assert (text, title) == ("T\nbody", "T")


def test_warc_review_fixes():
    """r08 review: negative Content-Length, bad deflate bytes, NUL in
    a declared charset, duplicate headers, non-UTF-8 round trips and
    statusless response re-encoding."""
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc(b"WARC/1.0\r\nContent-Length: -33\r\n\r\n")
    blob = bytearray(encode_warc([{"warc_type": "resource", "body": "x" * 50}]))
    blob[len(blob) // 2] ^= 0xFF  # corrupt deflate data mid-member
    with pytest.raises(ValueError, match="corrupt WARC"):
        parse_warc(bytes(blob))
    # NUL inside the declared charset falls back instead of throwing
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf\x00-8"
        b"\r\n\r\nabc"
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    assert parse_warc(raw)[0]["body"] == "abc"
    # duplicate headers join instead of clobbering
    http = (
        b"HTTP/1.1 200 OK\r\nSet-Cookie: a\r\nSet-Cookie: b\r\n\r\nz"
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    assert parse_warc(raw)[0]["http_headers"]["set-cookie"] == "a, b"
    # declared latin-1 round-trips exactly (writer encodes per charset)
    recs = [{
        "warc_type": "response", "http_status": 200,
        "http_headers": {"content-type": "text/plain; charset=latin-1"},
        "body": "café",
    }]
    assert parse_warc(encode_warc(recs))[0]["body"] == "café"
    # a response whose block was not HTTP (status None) re-encodes as a
    # raw block; parse -> encode -> parse is stable
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nxyz"
        b"\r\n\r\n"
    )
    first = parse_warc(raw)
    assert first[0]["http_status"] is None
    again = parse_warc(encode_warc(first))
    assert again[0]["http_status"] is None and again[0]["body"] == "xyz"


def test_html_malformed_and_empty():
    assert html_to_text("") == ""
    assert html_to_text(None) == ""
    assert html_to_text("plain text, no tags") == "plain text, no tags"
    # unclosed tags and stray closers must not crash
    assert html_to_text("<p>a<div>b</span>") == "a\nb"
    assert html_title("<p>no title</p>") is None


def test_html_entities_and_whitespace():
    assert html_to_text("<p>&quot;a&quot; &amp;\tb&#65;</p>") == '"a" & bA'
    assert html_to_text("<p>  \n\n  </p>") == ""
