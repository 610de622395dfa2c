"""llm/sitemap.py: sitemaps.org parsing on trusted and hostile input.

The graded member (t24, su07) pins the end-to-end frontier-seed rows;
these tests pin the parser's protocol corners directly: caps, gzip
bombs, DTD rejection, namespace tolerance, CDATA verbatimness,
mis-nesting tolerance, and the Spark wrapper's schema/NULL shape.
"""

from __future__ import annotations

import gzip

import pytest

from travel_data_ingestion_spark.llm.sitemap import (
    _MAX_ENTRIES,
    parse_sitemap_bytes,
    parse_sitemaps,
)


def _urlset(entries: bytes) -> bytes:
    return b"<urlset>" + entries + b"</urlset>"


def test_urlset_fields_and_priority_validation():
    rows = parse_sitemap_bytes(_urlset(
        b"<url><loc>https://a/x</loc><lastmod>2026-01-01</lastmod>"
        b"<changefreq>hourly</changefreq><priority>0.5</priority></url>"
        b"<url><loc>https://a/y</loc><priority>1.5</priority></url>"
        b"<url><loc>https://a/z</loc><priority>nan</priority></url>"
        b"<url><loc>https://a/w</loc><priority>inf</priority></url>"
    ))
    assert [(r["loc"], r["priority"]) for r in rows] == [
        ("https://a/x", 0.5),
        ("https://a/y", None),   # spec range is [0, 1]
        ("https://a/z", None),   # NaN rejected
        ("https://a/w", None),   # inf rejected
    ]
    assert rows[0]["lastmod"] == "2026-01-01"
    assert rows[0]["changefreq"] == "hourly"
    assert all(r["kind"] == "url" for r in rows)


def test_sitemapindex_and_namespace_prefixes():
    rows = parse_sitemap_bytes(
        b'<x:sitemapindex xmlns:x="u"><x:sitemap>'
        b"<x:loc>https://a/s1.xml.gz</x:loc></x:sitemap>"
        b"<x:sitemap><x:lastmod>2026</x:lastmod></x:sitemap>"  # no loc
        b"</x:sitemapindex>"
    )
    assert rows == [{"kind": "sitemap", "loc": "https://a/s1.xml.gz",
                     "lastmod": None, "changefreq": None,
                     "priority": None}]


def test_cdata_loc_is_verbatim_and_entities_decode_outside():
    rows = parse_sitemap_bytes(_urlset(
        b"<url><loc><![CDATA[https://a/?x=1&amp;y=2]]></loc></url>"
        b"<url><loc>https://a/?x=1&amp;y=2</loc></url>"
    ))
    # CDATA content is NOT entity-decoded; regular text is
    assert rows[0]["loc"] == "https://a/?x=1&amp;y=2"
    assert rows[1]["loc"] == "https://a/?x=1&y=2"


def test_doctype_rejected_whole():
    # any DTD means not-a-protocol-sitemap; rejecting it outright
    # closes the billion-laughs entity-expansion class
    assert parse_sitemap_bytes(
        b'<?xml version="1.0"?><!DOCTYPE a [<!ENTITY l "x">]>'
        + _urlset(b"<url><loc>https://a/x</loc></url>")
    ) == []


def test_garbage_wrong_root_and_null_are_empty():
    assert parse_sitemap_bytes(b"<html><p>hi</p></html>") == []
    assert parse_sitemap_bytes(b"\x00\xff not xml") == []
    assert parse_sitemap_bytes(None) == []
    assert parse_sitemap_bytes(b"") == []


def test_entry_budget_caps_hostile_documents():
    # 50k+1 entries: the protocol cap keeps the first 50k and stops
    many = b"".join(
        b"<url><loc>https://a/%d</loc></url>" % i
        for i in range(_MAX_ENTRIES + 10)
    )
    rows = parse_sitemap_bytes(_urlset(many))
    assert len(rows) == _MAX_ENTRIES
    assert rows[-1]["loc"] == "https://a/%d" % (_MAX_ENTRIES - 1)


def test_gzip_roundtrip_and_bomb_cap():
    doc = _urlset(b"<url><loc>https://a/x</loc></url>")
    assert parse_sitemap_bytes(gzip.compress(doc, mtime=0)) == \
        parse_sitemap_bytes(doc)
    # a ~51 MB decompressed bomb (tiny compressed) must be refused
    bomb = gzip.compress(b"\x00" * (51 * 1024 * 1024), mtime=0)
    assert parse_sitemap_bytes(bomb) == []
    # truncated gzip: total, no raise
    assert parse_sitemap_bytes(gzip.compress(doc, mtime=0)[:20]) == []


def test_misnested_tags_tolerated():
    # a stray unclosed tag inside an entry must not corrupt later rows
    rows = parse_sitemap_bytes(_urlset(
        b"<url><loc>https://a/1</loc><foo><bar></bar></foo></url>"
        b"<url><loc>https://a/2</loc></url>"
    ))
    assert [r["loc"] for r in rows] == ["https://a/1", "https://a/2"]


@pytest.mark.usefixtures("spark")
def test_parse_sitemaps_wrapper_schema_and_nulls(spark):
    df = parse_sitemaps(spark.createDataFrame(
        [
            ("a.com", "https://a.com/s.xml", bytearray(_urlset(
                b"<url><loc>https://a.com/x</loc>"
                b"<priority>0.3</priority></url>"))),
            ("b.com", "https://b.com/s.xml", None),
        ],
        "host string, sitemap_url string, content binary",
    ))
    assert [f.name for f in df.schema.fields] == [
        "host", "sitemap_url", "kind", "loc", "lastmod", "changefreq",
        "priority",
    ]
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.host, r.kind, r.loc, r.priority) == (
        "a.com", "url", "https://a.com/x", 0.3)
    assert r.lastmod is None and r.changefreq is None


def test_recrawl_priority_case_and_boundary(spark):
    """changefreq matches case-insensitively; the overdue boundary is
    >= (due exactly now = overdue, staleness 0)."""
    from travel_data_ingestion_spark.llm.sitemap import recrawl_priority

    entries = spark.createDataFrame(
        [
            ("a", "u1", "2026-01-31 23:00:00", "Hourly"),   # due == now
            ("a", "u2", "2026-01-31 23:00:01", "HOURLY"),   # 1s early
        ],
        "host string, loc string, lastmod string, changefreq string",
    )
    rows = {r.loc: (r.interval_sec, r.next_due, r.overdue, r.staleness_sec)
            for r in recrawl_priority(entries, "2026-02-01 00:00:00").collect()}
    assert rows["u1"] == (3600, "2026-02-01 00:00:00", True, 0)
    assert rows["u2"] == (3600, "2026-02-01 00:00:01", False, -1)


def test_gunzip_rejects_truncated_member():
    """A gzip stream cut mid-member (eof False, no unconsumed tail)
    must be rejected, not returned as partial-but-valid output."""
    from travel_data_ingestion_spark.llm.sitemap import _gunzip_capped

    doc = _urlset(b"".join(
        b"<url><loc>https://a/%d</loc></url>" % i for i in range(200)
    ))
    z = gzip.compress(doc, mtime=0)
    assert _gunzip_capped(z) == doc
    # cut before the member ends: partial output exists but the member
    # is incomplete -> None (previously accepted because only the
    # cap-stop condition was checked)
    assert _gunzip_capped(z[: len(z) - 5]) is None
    assert parse_sitemap_bytes(z[: len(z) - 5]) == []


def test_recrawl_priority_w3c_lastmod_formats(spark):
    """The sitemaps.org lastmod wire format is W3C datetime —
    'T'-separated with an optional offset; all forms must parse and
    offsets must convert to UTC (previously only 'yyyy-MM-dd
    HH:mm:ss' and date-only parsed; real full-timestamp lastmods
    silently dropped out of freshness scheduling)."""
    from travel_data_ingestion_spark.llm.sitemap import recrawl_priority

    entries = spark.createDataFrame(
        [
            ("h", "u1", "2026-01-31T22:30:00+00:00", "hourly"),
            ("h", "u2", "2026-01-31T23:30:00+01:00", "hourly"),  # = u1
            ("h", "u3", "2026-01-31T21:15:00Z", "hourly"),
            ("h", "u4", "2026-01-31T20:45+00:00", "hourly"),
            ("h", "u5", "2026-01-31T19:00:00.123456Z", "hourly"),
            ("h", "u6", "2026-01-31T18:00", "hourly"),
            ("h", "u7", "2026-01-31T18:00:00+25:99", "hourly"),  # junk
        ],
        "host string, loc string, lastmod string, changefreq string",
    )
    rows = {r.loc: (r.next_due, r.overdue)
            for r in recrawl_priority(entries, "2026-02-01 00:00:00")
            .collect()}
    assert rows["u1"] == ("2026-01-31 23:30:00", True)
    assert rows["u2"] == ("2026-01-31 23:30:00", True)  # offset -> UTC
    assert rows["u3"] == ("2026-01-31 22:15:00", True)
    assert rows["u4"] == ("2026-01-31 21:45:00", True)
    assert rows["u5"] == ("2026-01-31 20:00:00", True)
    assert rows["u6"] == ("2026-01-31 19:00:00", True)
    assert rows["u7"] == (None, None)
