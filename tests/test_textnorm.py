"""Text normalization (mojibake/NFC/controls) and URL canonicalization."""

from __future__ import annotations

import random
import unicodedata

from travel_data_ingestion_spark.llm.textnorm import fix_text
from travel_data_ingestion_spark.llm.urlnorm import normalize_url
from travel_data_ingestion_spark.queries.llm_crawl import (
    _PLANTED_MOJIBAKE,
    _PLANTED_URLS,
)


def test_planted_mojibake_expectations_hold():
    for did, src, want in _PLANTED_MOJIBAKE:
        assert fix_text(src) == want, did


def test_mojibake_repair_cases():
    # cp1252 round trip incl. the sloppy C1 codepoints (0x9d)
    assert fix_text("â€œqâ€\x9d") == "“q”"
    # double-encoded needs two passes
    twice = "Café".encode("utf8").decode("latin1")
    twice = twice.encode("utf8").decode("latin1")
    assert fix_text(twice) == "Café"
    # no false fire: repair must strictly reduce markers
    assert fix_text("mentions Ã alone") == "mentions Ã alone"
    assert fix_text("Café clean") == "Café clean"
    # NFC: decomposed composes
    assert fix_text("é") == "é"
    assert unicodedata.is_normalized("NFC", fix_text("éx̊"))


def test_controls_and_spaces():
    assert fix_text("a\x00b\x07c") == "abc"
    assert fix_text("keep\ttab\nand nl") == "keep\ttab\nand nl"
    assert fix_text("crlf\r\nx\ry") == "crlf\nx\ny"
    assert fix_text("zw​j‍﻿bom") == "zwjbom"
    assert fix_text("nb sp  thin 　wide") == "nb sp  thin  wide"


def test_totality():
    assert fix_text(None) is None
    assert fix_text("") == ""
    rng = random.Random(2)
    for n in (1, 10, 300):
        s = "".join(chr(rng.randrange(1, 0x2FFF)) for _ in range(n))
        out = fix_text(s)
        assert isinstance(out, str)
        assert unicodedata.is_normalized("NFC", out)


def test_planted_url_expectations_hold():
    for uid, src, want in _PLANTED_URLS:
        assert normalize_url(src) == want, uid


def test_url_idempotence_and_dedup_property():
    # canonicalization is idempotent on its own output
    for _uid, src, want in _PLANTED_URLS:
        if want is not None:
            assert normalize_url(want) == want
    # the dedup story: all these spellings collapse to one key
    spellings = [
        "http://Example.com/a/b/c?y=2&x=1",
        "HTTP://EXAMPLE.COM:80/a/b/c?x=1&y=2#frag",
        "http://example.com/a/./b/../b/c?utm_campaign=q&y=2&x=1",
    ]
    keys = {normalize_url(u) for u in spellings}
    assert keys == {"http://example.com/a/b/c?x=1&y=2"}


def test_url_hostility():
    rng = random.Random(6)
    for n in (0, 5, 60):
        blob = "".join(chr(rng.randrange(32, 300)) for _ in range(n))
        normalize_url(blob)
        normalize_url("http://" + blob)
        normalize_url("https://h/" + blob)
    assert normalize_url(None) is None
    assert normalize_url("http://") is None
    assert normalize_url("http://[::1:bad") is None


def test_normalize_text_operator(spark):
    from travel_data_ingestion_spark.llm.textnorm import normalize_text

    df = spark.createDataFrame(
        [(1, "CafÃ©"), (2, "clean text")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in normalize_text(df).collect()}
    assert rows[1].text == "Café" and rows[1].was_fixed is True
    assert rows[2].text == "clean text" and rows[2].was_fixed is False


def test_url_bad_port_returns_none():
    # .port raises ValueError on these; contract says unparseable -> None
    assert normalize_url("http://h:99999/x") is None
    assert normalize_url("http://h:abc/x") is None
    assert normalize_url("http://h:-1/x") is None
    assert normalize_url("https://example.com:65536/") is None
    # boundary: 65535 is a VALID port and survives
    assert normalize_url("http://h:65535/x") == "http://h:65535/x"
