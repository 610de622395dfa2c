"""HTML extraction + WARC parsing unit evidence.

The graded rows (su06 member t15, su07 member t16) carry hand-written
expected literals; here the same expectations are pinned at unit level
plus the cases the graded rows can't carry: one WARC record whose raw
bytes are HAND-ASSEMBLED without the package's fixture builder (so the
builder and parser share nothing for it), totality fuzz, truncation,
and decompression-bomb caps.
"""

from __future__ import annotations

import gzip
import random
import zlib

from travel_data_ingestion_spark.llm.html_text import extract_html
from travel_data_ingestion_spark.llm.warc import parse_warc
from travel_data_ingestion_spark.queries.llm_crawl import (
    _PLANTED_HTML,
    planted_warc_gz,
)


def test_planted_html_expectations_hold():
    for did, html, title, text, n_links in _PLANTED_HTML:
        got = extract_html(html)
        assert got == (title, text, n_links), (did, got)


def test_html_semantics():
    # entities decode; attributes ignored; comments dropped
    assert extract_html("<p>a &lt; b &amp;&amp; c &gt; d</p>") == \
        ("", "a < b && c > d", 0)
    # script CDATA with fake markup inside
    assert extract_html('x<script>if(a<b){d.write("<p>no</p>")}</script>y') == \
        ("", "x y", 0)
    # style dropped, title separate, blocks are boundaries
    t, x, n = extract_html(
        "<title>T</title><style>p{}</style><p>a</p><p>b</p>"
    )
    assert (t, x) == ("T", "a b")
    # only the FIRST title counts (svg <title> would pollute)
    t, x, _ = extract_html("<title>one</title><p>p</p><title>two</title>")
    assert t == "one" and "two" in x
    # href anchors counted, anchor-without-href not
    assert extract_html('<a href="/a">1</a><a>2</a><a href="#">3</a>')[2] == 2
    # totality on hostile input
    rng = random.Random(3)
    for n in (0, 10, 1000):
        blob = "".join(chr(rng.randrange(32, 127)) for _ in range(n))
        extract_html("<" + blob)
        extract_html(blob + "&#")


def test_warc_fixture_parses_to_expected_records():
    recs = parse_warc(planted_warc_gz())
    assert len(recs) == 9
    assert [r["rec_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
        "response", "resource", "revisit", "response",
    ]
    # declared-charset record: latin-1 bytes, NOT valid UTF-8
    assert recs[8]["http_content_type"] == "text/html; charset=ISO-8859-1"
    assert b"\xe1" in recs[8]["body"]  # latin-1 a-acute
    r2 = recs[2]
    assert r2["http_status"] == 200
    assert r2["http_content_type"] == "text/html; charset=utf-8"
    assert b"Hello crawl world one" in r2["body"]
    assert recs[3]["body"] == (
        b"<html><body><p>chunked body decoded</p></body></html>"
    )
    assert recs[4]["body"] == (
        b"<html><body><p>gzip content decoded</p></body></html>"
    )
    assert recs[5]["http_status"] == 404
    assert recs[6]["body"] == b"raw resource\n"


def test_hand_assembled_record_without_builder():
    """One record written out byte-for-byte by hand: the package's
    fixture builder is not involved, so a builder/parser shared
    misunderstanding of the framing cannot pass this."""
    body = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain\r\n"
        b"\r\n"
        b"hand body"
    )
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://hand.example/\r\n"
        b"WARC-Date: 2026-08-16T00:00:00Z\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: 54\r\n"  # 17 + 26 header bytes + 2 CRLF + 9 body
        b"\r\n"
        + body
        + b"\r\n\r\n"
    )
    assert len(body) == 54  # the hand count the header claims
    recs = parse_warc(raw)  # plain (uncompressed) .warc path
    assert len(recs) == 1
    r = recs[0]
    assert r["rec_type"] == "response"
    assert r["target_uri"] == "http://hand.example/"
    assert r["warc_date"] == "2026-08-16T00:00:00Z"
    assert r["http_status"] == 200
    assert r["body"] == b"hand body"
    # gzip-member form parses identically
    assert parse_warc(gzip.compress(raw))[0]["body"] == b"hand body"


def test_two_records_in_one_plain_warc():
    raw = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: u1\r\n"
        b"Content-Type: text/plain\r\nContent-Length: 2\r\n\r\nab\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: u2\r\n"
        b"Content-Type: text/plain\r\nContent-Length: 3\r\n\r\ncde\r\n\r\n"
    )
    recs = parse_warc(raw)
    assert [(r["target_uri"], r["body"]) for r in recs] == [
        ("u1", b"ab"), ("u2", b"cde"),
    ]


def test_truncation_and_hostility_total():
    full = planted_warc_gz()
    for cut in (0, 1, 10, len(full) // 3, len(full) - 2):
        parse_warc(full[:cut])  # no exception; clean prefix only
    rng = random.Random(5)
    for n in (0, 5, 50, 500):
        parse_warc(bytes(rng.randrange(256) for _ in range(n)))
        parse_warc(b"\x1f\x8b" + bytes(rng.randrange(256) for _ in range(n)))
        parse_warc(b"WARC/1.0\r\n" + bytes(rng.randrange(256) for _ in range(n)))
    # lying Content-Length (bigger than the data): record dropped
    lying = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
             b"Content-Type: text/plain\r\nContent-Length: 999\r\n\r\nshort")
    assert parse_warc(lying) == []


def test_decompression_bomb_capped():
    # 200 MB of zeros in one member: the 64 MiB cap drops it cleanly
    bomb = gzip.compress(bytes(200 << 20), mtime=0)
    assert parse_warc(bomb) == []
    # a gzip content-coded HTTP body over the cap is dropped too
    big = zlib.compress(bytes(100 << 20))
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: deflate\r\n\r\n" + big)
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(http) + http)
    recs = parse_warc(raw)
    assert len(recs) == 1 and recs[0]["http_status"] is None


def test_warc_records_operator_end_to_end(spark):
    from travel_data_ingestion_spark.llm.warc import warc_records

    df = spark.createDataFrame(
        [(7, bytearray(planted_warc_gz()))], "warc_id long, payload binary"
    )
    rows = {r.ordinal: r for r in warc_records(df).collect()}
    assert len(rows) == 9
    assert rows[8].text_head == "Olá café ¡señor!"  # charset-decoded
    assert rows[2].text_head == "Hello crawl world one"
    assert rows[3].text_head == "chunked body decoded"
    assert rows[5].text_head == "not found here"  # double space collapsed
    assert rows[5].http_status == 404
    assert rows[6].n_body_bytes == 13
    assert rows[0].http_status is None


def test_svg_title_does_not_shadow_document_title():
    # an inline <svg><title> BEFORE the document title must not
    # suppress it (and its text stays dropped with the svg subtree)
    t, x, _ = extract_html(
        "<svg><title>icon label</title><circle/></svg>"
        "<title>Real Title</title><p>body</p>"
    )
    assert t == "Real Title"
    assert x == "body"
    assert "icon" not in x
    # a stray </title> with no open title is a no-op
    t, x, _ = extract_html("</title><title>Still Here</title><p>b</p>")
    assert t == "Still Here" and x == "b"
    # svg title while a real title was already taken: still dropped
    t, x, _ = extract_html(
        "<title>First</title><svg><title>nope</title></svg><p>z</p>"
    )
    assert t == "First" and x == "z"


def test_oversized_gzip_member_does_not_drop_later_records():
    # one legitimate-but-over-cap member must be SKIPPED, not end the
    # archive: the record in the next member still parses
    rec = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
           b"WARC-Target-URI: http://ok.example/\r\n"
           b"Content-Type: text/plain\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
    bomb = gzip.compress(bytes(100 << 20), mtime=0)  # > 64 MiB cap
    good = gzip.compress(rec, mtime=0)
    recs = parse_warc(bomb + good)
    assert len(recs) == 1
    assert recs[0]["target_uri"] == "http://ok.example/"
    # order flipped: good member first, bomb last — record still yields
    recs = parse_warc(good + bomb)
    assert len(recs) == 1
    # a genuinely TRUNCATED member still stops the walk cleanly
    recs = parse_warc(good[: len(good) - 3] )
    assert recs == []


def test_outlink_extraction_corners():
    """extract_outlinks edge semantics beyond the graded fixture: a
    <base> AFTER links still applies (parse collects first, resolution
    follows the spec's one-base-per-document rule), only the FIRST
    base wins, malformed hrefs never raise, and the per-doc budget
    caps hostile link farms."""
    from travel_data_ingestion_spark.llm.html_text import (
        _MAX_OUTLINKS,
        extract_outlinks,
    )

    # first base wins; second ignored
    html = ('<base href="https://one.com/"><base href="https://two.com/">'
            '<a href="x">l</a>')
    assert extract_outlinks(html, "https://page.com/") == [
        ("https://one.com/x", False)
    ]
    # base appearing after the link still governs resolution
    html = '<a href="x">l</a><base href="https://late.com/">'
    assert extract_outlinks(html, "https://page.com/") == [
        ("https://late.com/x", False)
    ]
    # hostile link farm: budget, not OOM
    farm = "".join(f'<a href="/l{i}">x</a>' for i in range(_MAX_OUTLINKS + 50))
    assert len(extract_outlinks(farm, "https://h.com/")) == _MAX_OUTLINKS
    # garbage never raises
    assert extract_outlinks("<a href='http://[malformed'>x</a>",
                            "https://h.com/") == []
    assert extract_outlinks("", "https://h.com/") == []


def test_self_closed_drop_tag_does_not_swallow_document():
    """A self-closed drop-subtree tag (<svg/>, <iframe/>) opens AND
    closes: it must not leave drop_depth elevated and silently drop
    every later link / all later text (the XHTML-style form is common
    in real pages)."""
    from travel_data_ingestion_spark.llm.html_text import (
        extract_html,
        extract_outlinks,
    )

    assert extract_outlinks(
        '<svg/><a href="https://x.com/a">a</a>', "https://p.com/"
    ) == [("https://x.com/a", False)]
    assert extract_outlinks(
        '<iframe src="x"/><a href="https://x.com/b">b</a>',
        "https://p.com/",
    ) == [("https://x.com/b", False)]
    # a REAL nested drop subtree still drops its own links
    assert extract_outlinks(
        '<svg><a href="https://x.com/in">i</a></svg>'
        '<a href="https://x.com/out">o</a>',
        "https://p.com/",
    ) == [("https://x.com/out", False)]
    # text extraction shares the fix: content after <svg/> survives
    title, text, n_links = extract_html(
        "<title>t</title><svg/><p>visible words</p>"
    )
    assert (title, text) == ("t", "visible words")
