"""Crawl-ingestion queries: HTML -> text extraction and WARC records.

The two edges every web-scale training-data pipeline starts with,
driver-graded: t15 runs the real HTML extractor (llm/html_text.py,
stdlib HTMLParser) over an invertible JVM-rendered HTML wrapping of
the WHOLE documents corpus plus hand-adversarial planted markup whose
expected extractions are hand-written literals; t16 parses a planted
.warc.gz (per-record gzip members, chunked and gzip-coded HTTP bodies)
into typed record rows against hand-written expected values — the
full WARC -> HTTP -> HTML -> text chain in one graded row.
"""

from __future__ import annotations

import functools
import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries import load_table, register

# ---------------------------------------------------------------------------
# t15: HTML extraction
#
# Corpus wrapping (JVM-side, Catalyst concat — Python never sees the
# template): escape &<> in text, embed in a template with a styled
# head, an h1, a script containing fake markup, one anchor, and an
# entity in the tail. Extraction must invert all of it, so the oracle
# is one whitespace-collapse over the UNESCAPED original — escape ->
# parse -> unescape is the identity.

_PLANTED_HTML: list[tuple[int, str, str, str, int]] = [
    # (doc_id, html, expected_title, expected_text, expected_n_links)
    (
        9_000_000_001,
        '<html><head><title> Tricky &amp; Co. </title></head><body>'
        '<p>A&nbsp;B &lt;tag&gt; &#65;&#x42;</p><!-- comment out -->'
        '<div>c<br>d</div><noscript><p>hidden</p></noscript>'
        '<ul><li>one</li><li>two</li></ul>'
        '<a href="http://x">x</a> and <a name="y">y</a></body></html>',
        "Tricky & Co.",
        'A B <tag> AB c d one two x and y',
        1,
    ),
    (
        9_000_000_002,
        '<p>unclosed <b>bold<div>block'
        '<script>var s = "<p>not text</p>";</script>tail',
        "",
        "unclosed bold block tail",
        0,
    ),
    (
        9_000_000_003,
        '<HTML><BODY><P CLASS="x">Upper &quot;case&quot; tags</P>'
        '<img src="i.png" alt="alt text"/><br/>after</BODY></HTML>',
        "",
        'Upper "case" tags after',
        0,
    ),
    (
        9_000_000_004,
        '<style>p{x}</style>plain text only &copy; 2026',
        "",
        "plain text only © 2026",
        0,
    ),
    (
        # inline-svg <title> (an accessibility label) precedes the real
        # document <title>: the svg subtree is dropped wholesale and
        # its title must NOT shadow the document title (the r12 ADVICE
        # fix, now graded — a regression flips both title and text)
        9_000_000_005,
        '<div><svg viewBox="0 0 8 8"><title>svg shadow label</title>'
        '<desc>nope</desc><circle r="4"/></svg>icon</div>'
        '<head><title>Real &amp; Actual</title></head>'
        '<p>after svg</p><a href="/l">link</a>',
        "Real & Actual",
        "icon after svg link",
        1,
    ),
]


def _corpus_html() -> F.Column:
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit('<html><head><title>Doc '), did,
        F.lit('</title><style>p{color:red}</style></head><body><h1>Doc '),
        did,
        F.lit('</h1><p>'), esc,
        F.lit('</p><script>var t="<p>no</p>";</script>'
              '<a href="/r">ref</a> tail &amp; done</body></html>'),
    )


def _planted_values_sql() -> str:
    rows = []
    for did, _html, title, text, n_links in _PLANTED_HTML:
        t = title.replace("'", "''")
        x = text.replace("'", "''")
        rows.append(
            f"(CAST({did} AS BIGINT), '{t}', '{x}', CAST({n_links} AS INT))"
        )
    return ",\n        ".join(rows)


@register(
    "t15_html_extract",
    f"""
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           trim(regexp_replace(
               'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
                      || ' ref tail & done',
               '\\s+', ' ', 'g')) AS text,
           CAST(1 AS INT) AS n_links
    FROM documents
    UNION ALL
    SELECT * FROM (VALUES
        {_planted_values_sql()}
    ) AS planted(doc_id, title, text, n_links)
    """,
    survey_ops=("X-CRAWL-1",),
    doc="HTML -> text extraction (llm/html_text.py, stdlib HTMLParser: "
    "script/style/noscript subtrees dropped with word-boundary "
    "semantics, entities decoded, comments/attributes ignored, title "
    "captured separately, block tags as whitespace, single-space "
    "collapse, href-anchor count). Graded two ways in one row: the "
    "WHOLE corpus wrapped in an invertible JVM-rendered template "
    "(escape -> parse -> unescape is the identity, so the oracle is "
    "one regexp whitespace-collapse over the original text), plus "
    "hand-adversarial planted markup (nested unclosed tags, fake "
    "markup inside script CDATA, numeric/named entities, &nbsp; as "
    "unicode whitespace, uppercase tags, self-closing void tags, an "
    "inline-svg <title> that must not shadow the document title) "
    "whose expected extractions are HAND-WRITTEN literals — the "
    "expectation is independent of the extractor. Map-only "
    "Arrow-batched mapInPandas; raw HTML crosses to Python once.",
)
def t15_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.html_text import html_extract

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", _corpus_html().alias("html"))
    planted = spark.createDataFrame(
        [(did, html) for did, html, _t, _x, _n in _PLANTED_HTML],
        "doc_id long, html string",
    )
    return html_extract(corpus.unionByName(planted))


# ---------------------------------------------------------------------------
# t16: WARC records
#
# The planted archive is built at import from fixed strings with
# deterministic gzip (mtime=0) — one gzip member per record, the
# Common Crawl layout — and covers: warcinfo, request, a plain HTTP
# response, a chunked-transfer response, a gzip-content-coded
# response, a 404 text/plain, a resource record, and a revisit. The
# oracle rows are hand-written (lengths counted from the fixed body
# strings), so parser and expectation share nothing but the format
# spec. tests/test_warc_html.py additionally pins one record's RAW
# BYTES hand-assembled without the builder.

_B3 = b"<html><head><title>T3</title></head><body><p>Hello crawl world one</p></body></html>"
_B4 = b"<html><body><p>chunked body decoded</p></body></html>"
_B5 = b"<html><body><p>gzip content decoded</p></body></html>"
_B6 = b"not found  here"  # double space: collapse is graded
_B7 = b"raw resource\n"


def _rec(headers: dict, body: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        + "".join(f"{k}: {v}\r\n" for k, v in headers.items())
        + f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body + b"\r\n\r\n"


@functools.lru_cache(maxsize=1)
def planted_warc_gz() -> bytes:
    r3 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: %d\r\n\r\n" % len(_B3)
    ) + _B3
    c1, c2 = _B4[:20], _B4[20:]
    r4 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + hex(len(c1))[2:].encode() + b"\r\n" + c1 + b"\r\n"
        + hex(len(c2))[2:].encode() + b"\r\n" + c2 + b"\r\n0\r\n\r\n"
    )
    g5 = gzip.compress(_B5, mtime=0)
    r5 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\nContent-Length: %d\r\n\r\n" % len(g5)
    ) + g5
    r6 = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" + _B6
    records = [
        _rec({"WARC-Type": "warcinfo",
              "Content-Type": "application/warc-fields"},
             b"software: spark-graft test\r\n"),
        _rec({"WARC-Type": "request",
              "WARC-Target-URI": "http://example.com/a",
              "Content-Type": "application/http;msgtype=request"},
             b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"),
        _rec({"WARC-Type": "response",
              "WARC-Target-URI": "http://example.com/a",
              "Content-Type": "application/http;msgtype=response"}, r3),
        _rec({"WARC-Type": "response",
              "WARC-Target-URI": "http://example.com/b",
              "Content-Type": "application/http; msgtype=response"}, r4),
        _rec({"WARC-Type": "response",
              "WARC-Target-URI": "http://example.com/c",
              "Content-Type": "application/http;msgtype=response"}, r5),
        _rec({"WARC-Type": "response",
              "WARC-Target-URI": "http://example.com/d",
              "Content-Type": "application/http;msgtype=response"}, r6),
        _rec({"WARC-Type": "resource",
              "WARC-Target-URI": "http://example.com/e",
              "Content-Type": "text/plain"}, _B7),
        _rec({"WARC-Type": "revisit",
              "WARC-Target-URI": "http://example.com/a"}, b""),
        _rec({"WARC-Type": "response",
              "WARC-Target-URI": "http://example.com/f",
              "Content-Type": "application/http;msgtype=response"},
             b"HTTP/1.1 200 OK\r\n"
             b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n"
             + "<html><body><p>Ol\u00e1 caf\u00e9 \u00a1se\u00f1or!"
               "</p></body></html>".encode("latin1")),
    ]
    # adversarial member planted MID-archive (the r12 ADVICE fix, now
    # graded): a gzip member whose decompressed record blows the
    # 64 MiB bomb cap must be skipped WITHOUT dropping the rest of the
    # archive \u2014 a regression to stop-at-cap loses the four records
    # behind it and the hand-written oracle rows 5..8 catch it. The
    # skipped member yields nothing, so ordinals are unchanged.
    bomb = _rec(
        {"WARC-Type": "response",
         "WARC-Target-URI": "http://example.com/bomb",
         "Content-Type": "application/http;msgtype=response"},
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        + bytes((1 << 26) + 1),
    )
    members = [gzip.compress(r, mtime=0) for r in records]
    members.insert(5, gzip.compress(bomb, mtime=0, compresslevel=1))
    return b"".join(members)


# hand-written expected rows: (ordinal, type, uri, status, http_ct,
# n_body_bytes, text_head). Body lengths counted from the strings
# above: _B3 84, _B4 53, _B5 53, _B6 15, _B7 13.
_WARC_EXPECTED = """
    (0, 'warcinfo', NULL, NULL, NULL, NULL, NULL),
    (1, 'request', 'http://example.com/a', NULL, NULL, NULL, NULL),
    (2, 'response', 'http://example.com/a', 200,
     'text/html; charset=utf-8', 84, 'Hello crawl world one'),
    (3, 'response', 'http://example.com/b', 200, 'text/html', 53,
     'chunked body decoded'),
    (4, 'response', 'http://example.com/c', 200, 'text/html', 53,
     'gzip content decoded'),
    (5, 'response', 'http://example.com/d', 404, 'text/plain', 15,
     'not found here'),
    (6, 'resource', 'http://example.com/e', NULL, NULL, 13,
     'raw resource'),
    (7, 'revisit', 'http://example.com/a', NULL, NULL, NULL, NULL),
    (8, 'response', 'http://example.com/f', 200,
     'text/html; charset=ISO-8859-1', 49, 'Olá café ¡señor!')
"""


@register(
    "t16_warc_records",
    f"""
    SELECT CAST(1 AS BIGINT) AS warc_id,
           CAST(ordinal AS INT) AS ordinal,
           rec_type,
           target_uri,
           CAST(http_status AS INT) AS http_status,
           http_content_type,
           CAST(n_body_bytes AS BIGINT) AS n_body_bytes,
           text_head
    FROM (VALUES
        {_WARC_EXPECTED}
    ) AS warc(ordinal, rec_type, target_uri, http_status,
              http_content_type, n_body_bytes, text_head)
    """,
    survey_ops=("X-CRAWL-2",),
    doc="WARC crawl-archive ingestion (llm/warc.py, ISO 28500): "
    "per-record gzip members (the Common Crawl layout), WARC header "
    "parse, HTTP response parse INCLUDING chunked transfer decoding "
    "and gzip content decoding, then HTML -> text on text/html bodies "
    "— the full WARC -> HTTP -> HTML -> text chain in one graded row, "
    "incl. a declared-charset (ISO-8859-1) page whose text must decode "
    "per the Content-Type parameter, not as UTF-8, and a mid-archive "
    "gzip member over the 64 MiB bomb cap that must be skipped without "
    "dropping the records behind it "
    "(warcinfo/request/response/resource/revisit all typed). Oracle = "
    "hand-written record literals (lengths counted from the fixed "
    "body strings), independent of the parser; one record's raw bytes "
    "are additionally hand-assembled without the builder in "
    "tests/test_warc_html.py. Map-only explode: a 1 GB archive is one "
    "task, payload bytes never shuffle.",
)
def t16_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.warc import warc_records

    archives = spark.createDataFrame(
        [(1, bytearray(planted_warc_gz()))], "warc_id long, payload binary"
    )
    return warc_records(archives)


# ---------------------------------------------------------------------------
# t17: WebDataset tar-shard samples
#
# The sharded-tar convention multimodal training sets ship in: members
# group into samples by basename (000001.jpg + 000001.txt + 000001.json
# = sample 000001). The planted shard is a deterministic stdlib tar
# (all metadata zeroed); expected rows are hand-written.

_WDS_MEMBERS: list[tuple[str, bytes]] = [
    ("000001.jpg", b"\xff\xd8fakejpegbytes\xff\xd9"),
    ("000001.txt", b"a photo of a travel graph\n"),
    ("000001.json", b'{"width": 24, "height": 24}'),
    ("000002.png", b"\x89PNGfake"),
    ("000002.txt", b"  second caption  "),
    ("nested/dir/000003.txt", b"solo text sample"),
    ("000004.flac", b"fLaCfake"),
    ("000004.cls", b"7"),
]


def planted_webdataset_tar() -> bytes:
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in _WDS_MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


# hand-written expected samples (keys sorted by first appearance;
# sizes counted from the member strings above)
_WDS_EXPECTED = """
    ('000001', 3, 'jpg,json,txt', 70, 'a photo of a travel graph'),
    ('000002', 2, 'png,txt', 26, 'second caption'),
    ('nested/dir/000003', 1, 'txt', 16, 'solo text sample'),
    ('000004', 2, 'cls,flac', 9, '7')
"""


@register(
    "t17_webdataset_samples",
    f"""
    SELECT CAST(3 AS BIGINT) AS archive_id,
           sample_key,
           CAST(n_components AS INT) AS n_components,
           extensions,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           text
    FROM (VALUES
        {_WDS_EXPECTED}
    ) AS wds(sample_key, n_components, extensions, total_bytes, text)
    """,
    survey_ops=("X-CRAWL-3",),
    doc="WebDataset tar-shard ingestion (llm/archive.py, stdlib "
    "tarfile/zipfile with traversal sanitization and per-member/"
    "per-archive bomb caps): members group into samples by basename, "
    "text-class components (txt/cls) decode as caption/label "
    "text, json rides along as a metadata component, "
    "text, binary components contribute size only. One shard = one "
    "map task — the exact shape LAION-style sharded multimodal "
    "training data needs at 100 TB. Oracle = hand-written sample "
    "literals (sizes counted from the fixed member strings), "
    "independent of the reader.",
)
def t17_webdataset_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.archive import webdataset_samples

    shards = spark.createDataFrame(
        [(3, bytearray(planted_webdataset_tar()))],
        "archive_id long, payload binary",
    )
    return webdataset_samples(shards)


# ---------------------------------------------------------------------------
# t18: text normalization / mojibake repair
#
# The corpus is a VERIFIED fixed point of fix_text (ASCII, no controls
# — re-checked at sf0.001/0.01/0.1 when this row landed), so the
# corpus side of the oracle is the identity; the planted side carries
# hand-written (input, fixed) pairs covering cp1252 and double-encoded
# mojibake, sloppy-cp1252 C1 bytes, NFC, controls, CRLF, NBSP, and the
# no-false-fire guarantee for clean text that mentions marker chars.

_PLANTED_MOJIBAKE: list[tuple[int, str, str]] = [
    (9_100_000_001, "CafÃ©", "Café"),
    (9_100_000_002, "â€œquotedâ€\x9d â€” dash", "“quoted” — dash"),
    (9_100_000_003, "CafÃ\x83Â©", "Café"),  # double-encoded
    (9_100_000_004, "é composed", "é composed"),
    (9_100_000_005, "a\x00b\x07c\tkeep\r\nnl", "abc\tkeep\nnl"),
    (9_100_000_006, "nbsp and thin", "nbsp and thin"),
    (9_100_000_007, "Café already clean", "Café already clean"),
    (9_100_000_008, "mentions Ã alone", "mentions Ã alone"),
]


def _sql_str(s: str) -> str:
    """SQL string literal: quote doubling; raw control characters are
    legal inside standard SQL literals and DuckDB takes them as-is."""
    return "'" + s.replace("'", "''") + "'"


def _mojibake_values_sql() -> str:
    return ",\n        ".join(
        f"(CAST({did} AS BIGINT), {_sql_str(fixed)}, "
        f"{str(src != fixed).upper()})"
        for did, src, fixed in _PLANTED_MOJIBAKE
    )


@register(
    "t18_text_normalize",
    f"""
    SELECT doc_id, text, FALSE AS was_fixed FROM documents
    UNION ALL
    SELECT * FROM (VALUES
        {_mojibake_values_sql()}
    ) AS planted(doc_id, text, was_fixed)
    """,
    survey_ops=("X-CRAWL-4",),
    doc="Text normalization / mojibake repair (llm/textnorm.py, the "
    "C4/CCNet cleanup pass): cp1252-misdecoded UTF-8 repaired via the "
    "sloppy-cp1252 round trip (fires only when marker characters "
    "strictly reduce — clean text mentioning 'Ã' survives), iterated "
    "for double-encoding; Unicode NFC; control-char strip (tab/newline "
    "kept, CRLF folded); exotic-space fold. Corpus side of the oracle "
    "is the identity (the corpus is a verified fixed point at all "
    "three SFs); planted side is hand-written (input, fixed) pairs. "
    "Map-only Arrow-batched.",
)
def t18_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.textnorm import normalize_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [(did, src) for did, src, _f in _PLANTED_MOJIBAKE],
        "doc_id long, text string",
    )
    return normalize_text(docs.unionByName(planted))


# ---------------------------------------------------------------------------
# t19: URL canonicalization

_PLANTED_URLS: list[tuple[int, str, str | None]] = [
    (1, "HTTP://Example.COM:80/a/../b/./c?b=2&a=1&utm_source=x#frag",
     "http://example.com/b/c?a=1&b=2"),
    (2, "https://example.com:443/", "https://example.com/"),
    (3, "https://example.com", "https://example.com/"),
    (4, "http://example.com./%7Euser/", "http://example.com/~user/"),
    (5, "http://example.com:8080/p?fbclid=abc&z=1&z=0",
     "http://example.com:8080/p?z=0&z=1"),
    (6, "http://example.com/a/b/../../../c", "http://example.com/c"),
    (7, "http://EXAMPLE.com/a%2Fb/%41", "http://example.com/a%2Fb/A"),
    (8, "ftp://example.com/x", None),
    (9, "not a url", None),
    (10, "https://example.com/path/?q=sp%20ace",
     "https://example.com/path/?q=sp+ace"),
]


@register(
    "t19_url_normalize",
    f"""
    SELECT CAST(url_id AS BIGINT) AS url_id, url, canonical
    FROM (VALUES
        {",".join(
            f"({uid}, {_sql_str(src)}, "
            + ("NULL" if want is None else _sql_str(want)) + ")"
            for uid, src, want in _PLANTED_URLS
        )}
    ) AS urls(url_id, url, canonical)
    """,
    survey_ops=("X-CRAWL-5",),
    doc="URL canonicalization for dedup-by-URL (llm/urlnorm.py): "
    "scheme/host lowercasing, default-port and fragment stripping, "
    "RFC 3986 dot-segment resolution, unreserved percent-escape "
    "decoding (%2F stays escaped — it is path-significant), tracking-"
    "param removal (utm_*/fbclid/gclid/...), stable (key, value) query "
    "ordering; non-http(s)/unparseable input yields NULL so callers "
    "group on the canonical column without losing raw URLs. Oracle = "
    "hand-written canonical forms.",
)
def t19_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from travel_data_ingestion_spark.llm.urlnorm import normalize_url

    schema = T.StructType(
        [
            T.StructField("url_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("canonical", T.StringType()),
        ]
    )
    urls = spark.createDataFrame(
        [(uid, src) for uid, src, _w in _PLANTED_URLS],
        "url_id long, url string",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url_id": pdf["url_id"],
                    "url": pdf["url"],
                    "canonical": [normalize_url(u) for u in pdf["url"]],
                }
            )

    return urls.mapInPandas(batches, schema=schema)


# ---------------------------------------------------------------------------
# t20: crawled-audio tag extraction
#
# The metadata join key a media crawl actually uses (title/artist/
# album/date/genre) across the tag homes llm/tags.py reads. Planted
# payloads are hand-assembled from the published tag layouts at import
# (deterministic, no shared builder with the parser); expected rows
# are hand-written literals. The ID3v2.3 WHOLE-TAG unsynchronisation
# and v2.4 per-frame unsync fixtures grade the r12 ADVICE fix class —
# a regression to naive frame walking corrupts both titles.


def _t20_syncsafe(v: int) -> bytes:
    return bytes(((v >> s) & 0x7F) for s in (21, 14, 7, 0))


def _t20_vc(pairs: list[tuple[str, str]]) -> bytes:
    import struct

    out = struct.pack("<I", 1) + b"x" + struct.pack("<I", len(pairs))
    for k, v in pairs:
        item = f"{k}={v}".encode()
        out += struct.pack("<I", len(item)) + item
    return out


@functools.lru_cache(maxsize=1)
def planted_audio() -> list[tuple[int, bytes]]:
    import struct

    # 1: mp3 w/ ID3v2.3 whole-tag unsynchronisation (header flag 0x80:
    # 0x00 stuffed after every 0xFF across the body; the UTF-16 BOM is
    # the common real-world trigger)
    tit = b"\x01" + "Uñsync Title".encode("utf-16")
    body = b"TIT2" + struct.pack(">I", len(tit)) + b"\x00\x00" + tit
    body += b"TPE1" + struct.pack(">I", 5) + b"\x00\x00" + b"\x00Art\xff"
    body += b"TCON" + struct.pack(">I", 5) + b"\x00\x00" + b"\x00Rock"
    stuffed = body.replace(b"\xff", b"\xff\x00")
    a1 = (b"ID3\x03\x00\x80" + _t20_syncsafe(len(stuffed)) + stuffed
          + b"\xff\xfb" + bytes(64))
    # 2: ID3v2.4 per-frame unsync (format flag 0x02, stored syncsafe
    # size counts the stuffed bytes) + a plain TDRC frame
    t24 = b"\x01" + "Tïtle 24".encode("utf-16")
    st24 = t24.replace(b"\xff", b"\xff\x00")
    fr = b"TIT2" + _t20_syncsafe(len(st24)) + b"\x00\x02" + st24
    fr += b"TDRC" + _t20_syncsafe(5) + b"\x00\x00" + b"\x002026"
    a2 = b"ID3\x04\x00\x00" + _t20_syncsafe(len(fr)) + fr
    # 3: bare mp3 frame sync with only the ID3v1 128-byte trailer
    v1 = (b"TAG" + b"V1 Crawl".ljust(30, b"\x00")
          + b"V1 Artist".ljust(30, b"\x00")
          + b"V1 Album".ljust(30, b"\x00") + b"1999" + bytes(31))
    a3 = b"\xff\xfb" + bytes(200) + v1
    # 4: WAV LIST INFO chunk after the data chunk
    info = (b"INAM" + struct.pack("<I", 10) + b"Wav Crawl\x00"
            + b"IART" + struct.pack("<I", 8) + b"Wav Art\x00"
            + b"IGNR" + struct.pack("<I", 6) + b"field\x00")
    lst = b"LIST" + struct.pack("<I", 4 + len(info)) + b"INFO" + info
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wbody = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", 4) + bytes(4) + lst)
    a4 = b"RIFF" + struct.pack("<I", 4 + len(wbody)) + b"WAVE" + wbody
    # 5: native FLAC VORBIS_COMMENT metadata block
    vc = _t20_vc([("TITLE", "Flac Crawl"), ("DATE", "2026-01-02")])
    a5 = (b"fLaC" + bytes([0x00]) + (34).to_bytes(3, "big") + bytes(34)
          + bytes([0x84]) + len(vc).to_bytes(3, "big") + vc)
    # 6: not audio at all -> container NULL, no tags
    a6 = b"just some crawled text bytes"
    return [
        (7_000_000_001, a1), (7_000_000_002, a2), (7_000_000_003, a3),
        (7_000_000_004, a4), (7_000_000_005, a5), (7_000_000_006, a6),
    ]


_AUDIO_TAG_EXPECTED = """
    (7000000001, 'id3v2', 'Uñsync Title', 'Artÿ', NULL, NULL, 'Rock'),
    (7000000002, 'id3v2', 'Tïtle 24', NULL, NULL, '2026', NULL),
    (7000000003, 'mp3', 'V1 Crawl', 'V1 Artist', 'V1 Album', '1999',
     NULL),
    (7000000004, 'wav', 'Wav Crawl', 'Wav Art', NULL, NULL, 'field'),
    (7000000005, 'flac', 'Flac Crawl', NULL, NULL, '2026-01-02', NULL),
    (7000000006, NULL, NULL, NULL, NULL, NULL, NULL)
"""


@register(
    "t20_audio_tags",
    f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, container, title,
           artist, album, date_tag, genre
    FROM (VALUES
        {_AUDIO_TAG_EXPECTED}
    ) AS tags(media_id, container, title, artist, album, date_tag,
              genre)
    """,
    survey_ops=("X-CRAWL-6",),
    doc="Crawled-audio tag extraction (llm/tags.py): ID3v2.2-2.4 "
    "(incl. WHOLE-TAG v2.3 unsynchronisation and per-frame v2.4 "
    "unsync — the r12 ADVICE fix class, graded), the ID3v1 trailer "
    "fallback, RIFF LIST INFO, and native-FLAC Vorbis comments, "
    "normalized to title/artist/album/date/genre. Planted payloads "
    "hand-assembled from the published layouts; oracle rows are "
    "hand-written literals. Arrow-batched mapInPandas — payload "
    "bytes cross to Python once and never return to the JVM, so a "
    "100 TB media corpus stays map-only with no payload shuffle.",
)
def t20_audio_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.tags import audio_tag_rows

    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in planted_audio()],
        "media_id long, payload binary",
    )
    return audio_tag_rows(media)


# ---------------------------------------------------------------------------
# t21: robots.txt frontier filtering
#
# The crawl stack's politeness gate, graded: planted robots.txt bodies
# exercising the RFC 9309 features (longest-match precedence with
# ties->Allow, '*' wildcards, '$' end-anchors, exact-agent groups vs
# the '*' fallback, group merging, crawl-delay, a missing-robots host)
# against a hand-written expected frontier. Expected rows are derived
# by hand from RFC 9309 §2.2.2, independent of the matcher.

_ROBOTS_A = (  # longest-match + wildcards + anchors + delay
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/public/\n"
    "Disallow: /*.zip$\n"
    "Crawl-delay: 1.5\n"
)
_ROBOTS_B = (  # exact-agent group shadows *, merging, tie->Allow
    "User-agent: DataBot\n"
    "Disallow: /raw\n"
    "Allow: /raw$\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
    "\n"
    "User-agent: DataBot\n"
    "Disallow: /feeds/\n"
)
_ROBOTS_C = "User-agent: OtherBot\nDisallow: /\n"  # no group for us, no *

_ROBOTS_FRONTIER: list[tuple[str, str, bool, float | None]] = [
    # (host, url, expected_allowed for DataBot, expected crawl_delay)
    ("a.com", "http://a.com/open/page", True, 1.5),
    ("a.com", "http://a.com/private/x", False, 1.5),
    ("a.com", "http://a.com/private/public/y", True, 1.5),   # 16 > 9
    ("a.com", "http://a.com/data/big.zip", False, 1.5),      # $ anchor
    ("a.com", "http://a.com/data/big.zip.txt", True, 1.5),   # not at end
    ("a.com", "http://a.com/robots.txt", True, 1.5),         # always
    ("b.com", "http://b.com/raw", True, None),    # /raw$ (5) > /raw (4)
    ("b.com", "http://b.com/rawer", False, None),            # /raw prefix
    ("b.com", "http://b.com/feeds/1", False, None),          # merged group
    ("b.com", "http://b.com/ok", True, None),     # exact group, NOT * deny
    ("c.com", "http://c.com/anything", True, None),          # no group
    ("d.com", "http://d.com/anything", True, None),          # no robots row
]


@register(
    "t21_robots_frontier",
    f"""
    SELECT host, url, allowed, crawl_delay
    FROM (VALUES
        {",".join(
            f"('{h}', '{u}', {str(a).upper()}, "
            + ("CAST(NULL AS DOUBLE)" if d is None else f"CAST({d} AS DOUBLE)")
            + ")"
            for h, u, a, d in _ROBOTS_FRONTIER
        )}
    ) AS fr(host, url, allowed, crawl_delay)
    """,
    survey_ops=("X-CRAWL-7",),
    doc="robots.txt frontier filtering (llm/robots.py, RFC 9309): the "
    "crawl politeness gate graded end-to-end — longest-match "
    "precedence (most octets, ties toward Allow), '*' wildcards via "
    "the linear-time matcher, '$' end-anchors, exact-agent group "
    "selection shadowing the '*' fallback, multi-group merging, "
    "per-host Crawl-delay surfaced for the scheduler, missing-robots "
    "hosts allowed, /robots.txt itself always fetchable. Expected "
    "rows hand-derived from RFC 9309 §2.2.2, independent of the "
    "matcher. The robots-side join is UNHINTED: at 100 TB the "
    "frontier is billions of URLs and the robots table millions of "
    "kilobyte rows — tens of GB, past Spark's 8 GB broadcast cap — "
    "so AQE broadcasts while small and demotes to a host-keyed "
    "shuffle join when it isn't; evaluation is an Arrow-batched map "
    "with a per-batch parser cache.",
)
def t21_robots_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.robots import filter_frontier

    frontier = spark.createDataFrame(
        [(h, u) for h, u, _a, _d in _ROBOTS_FRONTIER],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", _ROBOTS_A), ("b.com", _ROBOTS_B), ("c.com", _ROBOTS_C)],
        "host string, robots_txt string",
    )
    return filter_frontier(frontier, robots, agent="DataBot/2.0")


# ---------------------------------------------------------------------------
# t22: per-host politeness scheduling
#
# crawl_delay became a column in t21; this grades the operator that
# CONSUMES it: group the allowed frontier by host, order within host,
# and assign each URL the earliest offset (seconds from the host's
# first fetch) the scheduler may issue it. Expected rows are derived
# by hand from the t21 fixtures: per host, urls sort lexicographically,
# fetch_seq counts from 0, fetch_after = fetch_seq * crawl_delay
# (default 1.0 for hosts declaring none), and max_per_host=3 drops
# a.com's 4th allowed URL (its robots.txt) — the crawl-budget knob.

_SCHEDULE_EXPECTED = """
    ('a.com', 'http://a.com/data/big.zip.txt', 0, 0.0),
    ('a.com', 'http://a.com/open/page', 1, 1.5),
    ('a.com', 'http://a.com/private/public/y', 2, 3.0),
    ('b.com', 'http://b.com/ok', 0, 0.0),
    ('b.com', 'http://b.com/raw', 1, 1.0),
    ('c.com', 'http://c.com/anything', 0, 0.0),
    ('d.com', 'http://d.com/anything', 0, 0.0)
"""


@register(
    "t22_politeness_schedule",
    f"""
    SELECT host, url, CAST(fetch_seq AS BIGINT) AS fetch_seq,
           CAST(fetch_after AS DOUBLE) AS fetch_after
    FROM (VALUES
        {_SCHEDULE_EXPECTED}
    ) AS sched(host, url, fetch_seq, fetch_after)
    """,
    survey_ops=("X-CRAWL-8",),
    doc="Per-host politeness scheduling (llm/robots.py "
    "schedule_frontier): the operator that CONSUMES t21's crawl_delay "
    "column — the RFC-filtered frontier is grouped by host, ordered "
    "within host, and each URL gets fetch_seq (per-host issue order) "
    "and fetch_after = fetch_seq * crawl_delay seconds (default 1.0 "
    "when the host declares none); max_per_host=3 exercises the "
    "crawl-budget cap (a.com's 4th allowed URL drops). Expected rows "
    "hand-derived from the t21 fixtures. At 100 TB: one host-keyed "
    "window — the SAME partitioning the unhinted robots join demotes "
    "to at scale, so the exchange is reused; per-host ordering IS the "
    "politeness semantics, and max_per_host bounds the per-host sort "
    "the way real crawl budgets do. Native expressions only.",
)
def t22_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.robots import (
        filter_frontier,
        schedule_frontier,
    )

    frontier = spark.createDataFrame(
        [(h, u) for h, u, _a, _d in _ROBOTS_FRONTIER],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", _ROBOTS_A), ("b.com", _ROBOTS_B), ("c.com", _ROBOTS_C)],
        "host string, robots_txt string",
    )
    filtered = filter_frontier(frontier, robots, agent="DataBot/2.0")
    return schedule_frontier(filtered, default_delay=1.0, max_per_host=3)


# ---------------------------------------------------------------------------
# t23: sitemap capture
#
# Rfc9309Rules.sitemaps parsed `Sitemap:` records since r14; this
# surfaces them end-to-end as the per-host sitemap-URL table a crawler
# seeds its frontier from. Fixtures exercise the records' GLOBAL scope
# (a Sitemap line inside a group still binds to the whole file), a
# duplicate declaration (deduplicated per host), a sitemap-only
# robots.txt with no groups, a cross-host sitemap URL (the protocol
# allows it), and sitemap-less / missing robots bodies (no rows).

_ROBOTS_SM_E = (
    "Sitemap: https://e.com/sitemap.xml\n"          # before any group
    "User-agent: *\n"
    "Disallow: /x\n"
    "Sitemap: https://e.com/sitemap-news.xml\n"     # mid-group: global
    "User-agent: Other\n"
    "Disallow: /\n"
    "Sitemap: https://e.com/sitemap.xml\n"          # duplicate -> dedup
)
_ROBOTS_SM_F = "User-agent: *\nDisallow:\n"         # none declared
_ROBOTS_SM_G = "Sitemap: https://cdn.g-static.com/sm/root.xml.gz\n"

_SITEMAP_EXPECTED = """
    ('e.com', 'https://e.com/sitemap.xml'),
    ('e.com', 'https://e.com/sitemap-news.xml'),
    ('g.com', 'https://cdn.g-static.com/sm/root.xml.gz')
"""


@register(
    "t23_sitemap_capture",
    f"""
    SELECT host, sitemap_url
    FROM (VALUES
        {_SITEMAP_EXPECTED}
    ) AS sm(host, sitemap_url)
    """,
    survey_ops=("X-CRAWL-9",),
    doc="Sitemap capture (llm/robots.py sitemap_urls): per-host "
    "sitemap-URL table extracted from the robots corpus — the "
    "standard crawl-frontier seed. `Sitemap:` records are GLOBAL "
    "(file-scoped even when they appear inside an agent group, per "
    "RFC 9309 / sitemaps.org), duplicates dedupe within the host's "
    "row, sitemap-only files with no groups parse, cross-host URLs "
    "pass through verbatim, and hosts with no declaration (or a NULL "
    "body) emit nothing. Expected rows are hand literals. At 100 TB: "
    "an Arrow-batched map over the one-row-per-host robots table — "
    "no join, no shuffle, nothing driver-side.",
)
def t23_sitemap_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.robots import sitemap_urls

    robots = spark.createDataFrame(
        [
            ("e.com", _ROBOTS_SM_E),
            ("f.com", _ROBOTS_SM_F),
            ("g.com", _ROBOTS_SM_G),
            ("h.com", None),
        ],
        "host string, robots_txt string",
    )
    return sitemap_urls(robots)


# ---------------------------------------------------------------------------
# t24: sitemap XML parsing
#
# The consumer of t23's sitemap-URL table: parse the fetched sitemap
# documents themselves (sitemaps.org protocol) into the frontier-seed
# URL table. Fixtures exercise <urlset> with all optional fields, a
# CDATA loc (whose &amp; stays literal — CDATA is not entity-decoded),
# a loc-less entry (dropped), junk and out-of-range <priority>
# (-> NULL), a namespace-PREFIXED <sitemapindex> (kind='sitemap'), a
# gzipped document, a DOCTYPE entity bomb (rejected whole — protocol
# sitemaps have no DTD), and plain garbage (zero rows).

_SM_URLSET = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"  <url><loc>https://e.com/a</loc><lastmod>2026-01-02</lastmod>"
    b"<changefreq>daily</changefreq><priority>0.8</priority></url>\n"
    b"  <url><loc><![CDATA[https://e.com/b?x=1&amp;y=2]]></loc></url>\n"
    b"  <url><lastmod>2026-01-01</lastmod></url>\n"
    b"  <url><loc>https://e.com/c</loc><priority>junk</priority></url>\n"
    b"  <url><loc>https://e.com/d</loc><priority>7</priority></url>\n"
    b"</urlset>"
)
_SM_INDEX = (
    b'<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/'
    b'sitemap/0.9">\n'
    b" <sm:sitemap><sm:loc>https://f.com/s1.xml</sm:loc>"
    b"<sm:lastmod>2025-12-31</sm:lastmod></sm:sitemap>\n"
    b"</sm:sitemapindex>"
)
_SM_BOMB = (
    b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY lol "lol">]>'
    b"<urlset><url><loc>https://h.com/x</loc></url></urlset>"
)

_SITEMAP_PARSE_EXPECTED = """
    ('e.com', 'https://e.com/sitemap.xml', 'url', 'https://e.com/a',
     '2026-01-02', 'daily', CAST(0.8 AS DOUBLE)),
    ('e.com', 'https://e.com/sitemap.xml', 'url',
     'https://e.com/b?x=1&amp;y=2', NULL, NULL, CAST(NULL AS DOUBLE)),
    ('e.com', 'https://e.com/sitemap.xml', 'url', 'https://e.com/c',
     NULL, NULL, CAST(NULL AS DOUBLE)),
    ('e.com', 'https://e.com/sitemap.xml', 'url', 'https://e.com/d',
     NULL, NULL, CAST(NULL AS DOUBLE)),
    ('f.com', 'https://f.com/sitemap_index.xml', 'sitemap',
     'https://f.com/s1.xml', '2025-12-31', NULL, CAST(NULL AS DOUBLE)),
    ('g.com', 'https://g.com/sitemap.xml.gz', 'url', 'https://g.com/z',
     NULL, 'weekly', CAST(0.1 AS DOUBLE))
"""


@register(
    "t24_sitemap_parse",
    f"""
    SELECT host, sitemap_url, kind, loc, lastmod, changefreq, priority
    FROM (VALUES
        {_SITEMAP_PARSE_EXPECTED}
    ) AS sm(host, sitemap_url, kind, loc, lastmod, changefreq, priority)
    """,
    survey_ops=("X-CRAWL-10",),
    doc="Sitemap XML parsing (llm/sitemap.py, sitemaps.org protocol): "
    "fetched sitemap documents -> the frontier-seed URL table. "
    "<urlset> entries with loc/lastmod/changefreq/priority (junk or "
    "out-of-range priority -> NULL, loc-less entries dropped, CDATA "
    "locs kept verbatim), namespace-prefixed <sitemapindex> children "
    "as kind='sitemap' recursion rows, gzip members sniffed and "
    "bomb-capped (50 MB / 50k entries, the protocol limits doubling "
    "as hostile-input budgets), DOCTYPE rejected whole (no DTD in the "
    "protocol; closes entity-expansion bombs), malformed XML -> zero "
    "rows. Expected rows hand-written. At 100 TB: Arrow-batched "
    "mapInPandas over the fetched documents — payload bytes cross to "
    "Python once, map-only, no shuffle.",
)
def t24_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip

    from travel_data_ingestion_spark.llm.sitemap import parse_sitemaps

    gz = gzip.compress(
        b"<urlset><url><loc>https://g.com/z</loc>"
        b"<changefreq>weekly</changefreq><priority>0.1</priority>"
        b"</url></urlset>",
        mtime=0,
    )
    docs = spark.createDataFrame(
        [
            ("e.com", "https://e.com/sitemap.xml", bytearray(_SM_URLSET)),
            ("f.com", "https://f.com/sitemap_index.xml",
             bytearray(_SM_INDEX)),
            ("g.com", "https://g.com/sitemap.xml.gz", bytearray(gz)),
            ("h.com", "https://h.com/sitemap.xml", bytearray(_SM_BOMB)),
            ("i.com", "https://i.com/sitemap.xml",
             bytearray(b"<html><body>nope</body></html>")),
            ("j.com", "https://j.com/sitemap.xml", None),
        ],
        "host string, sitemap_url string, content binary",
    )
    return parse_sitemaps(docs)


# ---------------------------------------------------------------------------
# t27: recrawl freshness scheduling
#
# The freshness consumer of t24: sitemap lastmod/changefreq ->
# next-due computation against a FIXED reference instant (never the
# wall clock, so outputs replay and oracle-compare). Fixture covers
# every changefreq enum, a full-timestamp lastmod, a date-only
# lastmod, the W3C 'T'-separated wire formats real sitemaps emit
# (second- and minute-precision, '+hh:mm' and 'Z' offsets, fractional
# seconds), garbage lastmod (-> NULL due), 'never' and absent
# changefreq (no freshness contract -> NULL interval), and both the
# overdue and not-yet-due sides of the boundary.

_RECRAWL_NOW = "2026-02-01 00:00:00"
_RECRAWL_ENTRIES = [
    # (host, loc, lastmod, changefreq)
    ("e.com", "https://e.com/a", "2026-01-31 23:00:00", "hourly"),
    ("e.com", "https://e.com/b", "2026-01-31 23:00:01", "hourly"),
    ("e.com", "https://e.com/c", "2026-01-25", "weekly"),
    ("e.com", "https://e.com/d", "2026-01-31", "always"),
    ("f.com", "https://f.com/x", "2026-01-01", "monthly"),
    ("f.com", "https://f.com/y", "2025-01-01", "yearly"),
    ("f.com", "https://f.com/z", "2026-01-31", "daily"),
    ("g.com", "https://g.com/n", "2026-01-31", "never"),
    ("g.com", "https://g.com/m", "2026-01-31", None),
    ("g.com", "https://g.com/g", "not a date", "daily"),
    ("g.com", "https://g.com/h", None, "daily"),
    # W3C 'T'-separated wire formats (sitemaps.org mandates W3C
    # datetime): offsets convert to UTC on both engines
    ("h.com", "https://h.com/t1", "2026-01-31T22:30:00+00:00", "hourly"),
    ("h.com", "https://h.com/t2", "2026-01-31T23:30:00+01:00", "hourly"),
    ("h.com", "https://h.com/t3", "2026-01-31T21:15:00Z", "daily"),
    ("h.com", "https://h.com/t4", "2026-01-31T20:45+00:00", "hourly"),
    ("h.com", "https://h.com/t5", "2026-01-31T19:00:00.123456Z", "hourly"),
    ("h.com", "https://h.com/t6", "2026-01-31T18:00", "hourly"),
]


@register(
    "t27_recrawl_priority",
    f"""
    WITH entries(host, loc, lastmod, changefreq) AS (VALUES
        {",".join(
            "(" + ", ".join(
                "NULL" if v is None else f"'{v}'" for v in row
            ) + ")"
            for row in _RECRAWL_ENTRIES
        )}
    ),
    norm AS (
      -- mirror of the Spark side's normalizer: strip W3C fractional
      -- seconds; %z takes numeric offsets only, so 'Z' maps to +00:00
      SELECT host, loc, lastmod, changefreq,
             regexp_replace(lastmod,
               '^(\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}})\\.\\d+',
               '\\1') AS lm_n
      FROM entries
    ),
    mapped AS (
      SELECT host, loc, lastmod, changefreq,
             CASE lower(changefreq)
               WHEN 'always' THEN 0 WHEN 'hourly' THEN 3600
               WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
               WHEN 'monthly' THEN 2592000 WHEN 'yearly' THEN 31536000
             END AS interval_sec,
             COALESCE(
               try_strptime(lm_n, '%Y-%m-%d %H:%M:%S'),
               try_strptime(replace(lm_n, 'Z', '+00:00'),
                            '%Y-%m-%dT%H:%M:%S%z'),
               try_strptime(lm_n, '%Y-%m-%dT%H:%M:%S'),
               try_strptime(replace(lm_n, 'Z', '+00:00'),
                            '%Y-%m-%dT%H:%M%z'),
               try_strptime(lm_n, '%Y-%m-%dT%H:%M'),
               try_strptime(lm_n, '%Y-%m-%d')) AS lm
      FROM norm
    ),
    due AS (
      SELECT host, loc, CAST(interval_sec AS BIGINT) AS interval_sec,
             lm + to_seconds(interval_sec) AS due_ts
      FROM mapped
    )
    SELECT host, loc, interval_sec,
           strftime(due_ts, '%Y-%m-%d %H:%M:%S') AS next_due,
           CASE WHEN due_ts IS NOT NULL
                THEN epoch(TIMESTAMP '{_RECRAWL_NOW}') - epoch(due_ts) >= 0
           END AS overdue,
           CASE WHEN due_ts IS NOT NULL
                THEN CAST(epoch(TIMESTAMP '{_RECRAWL_NOW}')
                          - epoch(due_ts) AS BIGINT)
           END AS staleness_sec
    FROM due
    """,
    survey_ops=("X-CRAWL-11",),
    doc="Recrawl freshness scheduling (llm/sitemap.py recrawl_priority "
    "— the consumer of t24's lastmod/changefreq): the sitemaps.org "
    "changefreq enum maps to seconds ('always'=0; 'never'/unknown/"
    "absent -> NULL, no freshness contract), lastmod parses with "
    "try-semantics (W3C date or full timestamp; garbage -> NULL), "
    "next_due = lastmod + interval, and overdue/staleness_sec are "
    "computed against a FIXED reference instant (never the wall "
    "clock — replay-deterministic, oracle-comparable). Native CASE "
    "chain + timestamp arithmetic, map-only at any corpus size.",
)
def t27_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.sitemap import recrawl_priority

    entries = spark.createDataFrame(
        _RECRAWL_ENTRIES,
        "host string, loc string, lastmod string, changefreq string",
    )
    return recrawl_priority(entries, now=_RECRAWL_NOW)


# ---------------------------------------------------------------------------
# t28: outlink extraction — the crawl DISCOVERY side
#
# The frontier's input feed: every <a href> of a fetched page resolved
# to an absolute fetchable URL. Fixtures exercise <base href> override
# (the spec's first-wins rule), relative/absolute-path/protocol-
# relative resolution, fragment stripping, javascript:/mailto: scheme
# drops, per-doc dedup, rel=nofollow capture (case-insensitive,
# multi-token rel), links inside dropped subtrees (inline <svg>)
# excluded, and href-less anchors ignored. Expected rows hand-derived
# from RFC 3986 resolution.

_OUTLINK_PAGES = [
    (1, "https://e.com/dir/page1",
     '<html><head><base href="https://cdn.e.com/app/"></head><body>'
     '<a href="page2">r</a>'
     '<a href="/root">a</a>'
     '<a href="https://other.com/x#frag">f</a>'
     '<a href="//proto.com/y">p</a>'
     '<a href="javascript:void(0)">j</a>'
     '<a href="mailto:a@b.c">m</a>'
     '<a href="page2">dup</a>'
     '<a rel="NoFollow external" href="https://nf.com/">n</a>'
     '<svg><a href="https://svg.com/drop">s</a></svg>'
     "<a>nohref</a></body></html>"),
    (2, "https://f.com/a/b/c",
     '<a href="../up">u</a><a href="?q=1">q</a>'),
    (3, "https://g.com/", "<p>no links at all</p>"),
]

_OUTLINK_EXPECTED = """
    (1, 'https://e.com/dir/page1', 'https://cdn.e.com/app/page2', FALSE),
    (1, 'https://e.com/dir/page1', 'https://cdn.e.com/root', FALSE),
    (1, 'https://e.com/dir/page1', 'https://other.com/x', FALSE),
    (1, 'https://e.com/dir/page1', 'https://proto.com/y', FALSE),
    (1, 'https://e.com/dir/page1', 'https://nf.com/', TRUE),
    (2, 'https://f.com/a/b/c', 'https://f.com/a/up', FALSE),
    (2, 'https://f.com/a/b/c', 'https://f.com/a/b/c?q=1', FALSE)
"""


@register(
    "t28_outlink_extract",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, url, link, nofollow
    FROM (VALUES
        {_OUTLINK_EXPECTED}
    ) AS ol(doc_id, url, link, nofollow)
    """,
    survey_ops=("X-CRAWL-12",),
    doc="Outlink extraction (llm/html_text.py html_outlinks — the "
    "crawl DISCOVERY side feeding the frontier): every <a href> of a "
    "fetched page resolved to an absolute URL per RFC 3986 against "
    "the page URL or the document's first <base href> (the spec's "
    "first-wins rule), fragments stripped, non-fetchable schemes "
    "(javascript:/mailto:/data:) dropped, per-document "
    "order-preserving dedup, rel=nofollow captured case-"
    "insensitively from multi-token rel, links inside dropped "
    "subtrees (inline svg/template/noscript) excluded, 10k-per-doc "
    "hostile-input budget. Expected rows hand-derived. Arrow-batched "
    "mapInPandas, map-only — HTML crosses to Python once and never "
    "returns.",
)
def t28_outlink_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.html_text import html_outlinks

    pages = spark.createDataFrame(
        _OUTLINK_PAGES, "doc_id long, url string, html string"
    )
    return html_outlinks(pages)


# ---------------------------------------------------------------------------
# t29: PageRank over the outlink graph
#
# Crawl prioritization / page-quality signal over t28's (url, link)
# edges. The graded graph is a planted literal (a hub, a cycle back
# into it, a dangling node, and a feeder into the dangling node), so
# every structural case of the algebra — out-degree split, cycle
# feedback, dangling-mass redistribution — shows up in the values.
# The oracle is GENERATED from the same (k, damping): k unrolled SQL
# stages of the same per-iteration algebra.

_PR_EDGES = [
    (1, 2), (1, 3), (1, 4),   # hub 1 splits rank three ways
    (2, 3), (3, 4), (4, 1),   # chain cycling back into the hub
    (2, 1),                   # second out-edge for node 2
    (6, 5),                   # feeder into the dangling node 5
]
_PR_K = 10
_PR_DAMPING = 0.85


def _pagerank_oracle_sql(edges, k: int, damping: float) -> str:
    vals = ",".join(f"({s}, {t})" for s, t in edges)
    d = float(damping)
    ctes = [f"""
    edges(src, dst) AS (VALUES {vals}),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges)
    ),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""]
    for i in range(1, k + 1):
        prev = f"r{i - 1}"
        ctes.append(f"""
    dm{i} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), 0) AS dmass
      FROM {prev} r LEFT JOIN outdeg o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    c{i} AS MATERIALIZED (
      SELECT e.dst AS node, SUM(r.rank / o.outdeg) AS inc
      FROM {prev} r
      JOIN outdeg o ON r.node = o.src
      JOIN edges e ON e.src = r.node
      GROUP BY e.dst
    ),
    r{i} AS MATERIALIZED (
      SELECT nd.node,
             (1 - {d}) / nn.n
             + {d} * (COALESCE(c.inc, 0) + dm.dmass / nn.n) AS rank
      FROM nodes nd
      CROSS JOIN nn CROSS JOIN dm{i} dm
      LEFT JOIN c{i} c ON nd.node = c.node
    )""")
    return (
        "WITH " + ",".join(ctes)
        + f"\n    SELECT CAST(node AS BIGINT) AS node,"
          f" ROUND(rank, 8) AS rank FROM r{k}"
    )


@register(
    "t29_pagerank",
    _pagerank_oracle_sql(_PR_EDGES, _PR_K, _PR_DAMPING),
    survey_ops=("X-CRAWL-13",),
    doc="PageRank over the outlink graph (llm/linkgraph.py — crawl "
    "prioritization / the page-quality signal rank-weighted curation "
    "samples by): k=10 power iterations at damping 0.85 with uniform "
    "dangling-mass redistribution. Per iteration: ONE shuffle join "
    "keyed on the source node + one destination aggregation; the "
    "dangling mass is a 1-row aggregate attached via crossJoin "
    "(broadcast nested loop over one row) — nothing data-scaled ever "
    "reaches the driver; the rank table re-persists per iteration "
    "(the dd06/BPE loop shape). Graded graph plants a hub, a cycle, "
    "a dangling node, and its feeder, so out-degree splits, cycle "
    "feedback, and dangling redistribution are all value-graded; "
    "oracle generated from the same (k, damping).",
)
def t29_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.linkgraph import pagerank

    edges = spark.createDataFrame(_PR_EDGES, "src long, dst long")
    return pagerank(edges, k=_PR_K, damping=_PR_DAMPING)


# ---------------------------------------------------------------------------
# t30: one full crawl-frontier round — the COMPOSITION
#
# Every crawl stage above grades in isolation; this member runs the
# loop a real crawler executes per round (llm/frontier.py crawl_round):
# outlinks (t28, nofollow dropped) + sitemap 'url' seeds (t24) ->
# canonicalize (t19) -> distinct -> anti-join the fetch ledger (the
# exactly-once shape) -> robots filter (t21) -> politeness schedule
# (t22). The fixture makes every stage's effect visible in the output:
# a robots-disallowed link, two raw links collapsing to one canonical,
# ledger hits discovered via page AND sitemap, a nofollow link, a
# non-http link, a $-anchored robots kill, and a child-sitemap row
# that must NOT become a frontier URL. Expected rows hand-derived.

_CRAWL_ROUND_PAGES = [
    (1, "https://a.com/start",
     '<a href="/private/secret">x</a>'
     '<a href="/open/page?utm_source=x&b=2&a=1#frag">y</a>'
     '<a href="/open/page?a=1&b=2">dup-after-normalize</a>'
     '<a href="/fetched">in-ledger</a>'
     '<a href="/start">self-in-ledger</a>'
     '<a href="https://b2.com/new">cross-host</a>'
     '<a rel="nofollow" href="https://a.com/nf">nf</a>'
     '<a href="mailto:x@y.z">not-a-crawl-url</a>'
     '<a href="/private/public/ok">allow-overrides</a>'),
    (2, "https://b2.com/idx",
     '<a href="../one">up</a>'
     '<a href="https://a.com/data/big.zip">dollar-anchor-kill</a>'),
]

# parse_sitemaps-shaped seed rows: one fresh URL, one ledger hit, one
# child sitemap (recursion target, not a frontier URL)
_CRAWL_ROUND_SITEMAP = [
    ("a.com", "https://a.com/sitemap.xml", "url",
     "https://a.com/sm/page", None, None, None),
    ("a.com", "https://a.com/sitemap.xml", "url",
     "https://a.com/fetched", None, None, None),
    ("a.com", "https://a.com/sitemap.xml", "sitemap",
     "https://a.com/sm/child.xml", None, None, None),
]

_CRAWL_ROUND_LEDGER = [
    "https://a.com/start", "https://b2.com/idx", "https://a.com/fetched",
]

# hand-derived: a.com survivors sort (open < private < sm) at delay
# 1.5 (_ROBOTS_A); b2.com has no robots row -> allowed, default 1.0
_CRAWL_ROUND_EXPECTED = """
    ('a.com', 'https://a.com/open/page?a=1&b=2', 0, 0.0),
    ('a.com', 'https://a.com/private/public/ok', 1, 1.5),
    ('a.com', 'https://a.com/sm/page', 2, 3.0),
    ('b2.com', 'https://b2.com/new', 0, 0.0),
    ('b2.com', 'https://b2.com/one', 1, 1.0)
"""


@register(
    "t30_crawl_round",
    f"""
    SELECT host, url, CAST(fetch_seq AS BIGINT) AS fetch_seq,
           CAST(fetch_after AS DOUBLE) AS fetch_after
    FROM (VALUES
        {_CRAWL_ROUND_EXPECTED}
    ) AS fr(host, url, fetch_seq, fetch_after)
    """,
    survey_ops=("X-CRAWL-14",),
    doc="One full crawl-frontier round (llm/frontier.py crawl_round — "
    "the composition of the graded crawl stages): fetched pages -> "
    "outlinks (t28, nofollow dropped) unioned with sitemap 'url' "
    "seeds (t24) -> URL canonicalization (t19; junk/non-http dropped, "
    "raw variants collapse) -> distinct -> anti-join the fetch ledger "
    "(exactly-once across rounds) -> robots filter (t21, unhinted "
    "join) -> per-host politeness schedule (t22). The fixture "
    "exercises every stage's drop/keep in one output; expected rows "
    "hand-derived. 100 TB: two uniform-key shuffles (canonical "
    "distinct + ledger anti-join) plus the host-keyed exchange the "
    "robots join demotes to and the politeness window reuses.",
)
def t30_crawl_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.frontier import crawl_round

    pages = spark.createDataFrame(
        _CRAWL_ROUND_PAGES, "doc_id long, url string, html string"
    )
    robots = spark.createDataFrame(
        [("a.com", _ROBOTS_A)], "host string, robots_txt string"
    )
    ledger = spark.createDataFrame(
        [(u,) for u in _CRAWL_ROUND_LEDGER], "canonical string"
    )
    sitemap_entries = spark.createDataFrame(
        _CRAWL_ROUND_SITEMAP,
        "host string, sitemap_url string, kind string, loc string, "
        "lastmod string, changefreq string, priority double",
    )
    return crawl_round(
        pages, robots, ledger,
        agent="DataBot/2.0",
        sitemap_entries_df=sitemap_entries,
        default_delay=1.0,
    )


# ---------------------------------------------------------------------------
# t31: incremental link-graph index — the dd08/t14 pattern for t29
#
# The crawl graph GROWS per fetch round; every other index family
# (MinHash, embedding, pHash, DocFreq, PQ) has an incremental twin
# with a batched==one-shot invariant — this is the link graph's.
# Sources ingest in two disjoint batches (with a full replay proving
# per-source exactly-once and an LSM compact() between), then rank()
# re-ranks from the PERSISTED adjacency; the oracle is the one-shot
# t29 PageRank oracle over the union graph — identical (k, damping).

def _t31_oracle() -> str:
    # node ids persist as strings in the index (URL semantics); cast
    # the oracle's BIGINT nodes to match the graded column type
    inner = _pagerank_oracle_sql(_PR_EDGES, _PR_K, _PR_DAMPING)
    return (
        "SELECT CAST(node AS VARCHAR) AS node, rank FROM (\n"
        + inner + "\n)"
    )


@register(
    "t31_incremental_linkgraph",
    _t31_oracle(),
    survey_ops=("X-CRAWL-15",),
    doc="Incremental link-graph maintenance graded end-to-end "
    "(link_index.LinkGraphIndex — the dd08/t14 incremental-index "
    "pattern for the outlink graph): t29's edge set ingests in TWO "
    "disjoint source batches through update() (per-source "
    "exactly-once via the src ledger; each batch one O(batch-edges) "
    "hive partition), a full-corpus REPLAY after them proves "
    "resubmitted sources are anti-joined away, an LSM compact() "
    "folds the partitions, and rank() re-ranks from the PERSISTED "
    "adjacency — no HTML re-parse, no edge re-derivation. The "
    "oracle is the one-shot t29 PageRank oracle over the union "
    "graph at the same (k, damping), so a green row proves batched "
    "incremental maintenance + persisted-adjacency re-rank equals "
    "from-scratch ranking; tests/test_link_index.py pins the same "
    "invariant across crash windows (orphan claim, compact "
    "crash-heal). At 100 TB: update is one src-keyed anti-join + "
    "one partition write; rank reads few large folded files.",
)
def t31_incremental_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from travel_data_ingestion_spark.link_index import LinkGraphIndex

    scratch = tempfile.mkdtemp(prefix="t31_linkgraph_index_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)

    idx = LinkGraphIndex(f"{scratch}/lgi")
    all_edges = spark.createDataFrame(_PR_EDGES, "src long, dst long")
    idx.update(spark, all_edges.filter(F.col("src") <= 2))
    idx.update(spark, all_edges.filter(F.col("src") > 2))
    idx.update(spark, all_edges)  # full replay: every source ledgered
    idx.compact(spark)
    return idx.rank(spark, k=_PR_K, damping=_PR_DAMPING)
