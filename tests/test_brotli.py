"""Brotli content-coding for the crawl stack (llm/brotli_dec.py over
the SYSTEM libbrotlidec).

The decoder side is always the system library (never an in-repo
reimplementation), so conformance here means: a stream produced by
the system ENCODER (libbrotlienc, loaded independently by this test)
round-trips exactly; a library-produced pinned stream keeps the
default lane anchored even if the encoder lib disappears; hostile
bytes, truncation, and bombs degrade to None; and a WARC response
record with ``Content-Encoding: br`` flows through parse_warc
end-to-end.
"""

from __future__ import annotations

import ctypes
import random

import pytest

from travel_data_ingestion_spark.llm.brotli_dec import (
    available,
    brotli_decompress,
)
from travel_data_ingestion_spark.llm.warc import parse_warc

needs_brotli_dec = pytest.mark.skipif(
    not available(), reason="libbrotlidec not available"
)


def _load_encoder():
    try:
        enc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlienc.so.1")
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ]
        return enc
    except (OSError, AttributeError):
        return None


_ENC = _load_encoder()
needs_brotli_enc = pytest.mark.skipif(
    _ENC is None or not available(), reason="libbrotlienc not available"
)


def _bcompress(data: bytes, q: int = 9) -> bytes:
    out_len = ctypes.c_size_t(len(data) + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    assert _ENC.BrotliEncoderCompress(
        q, 22, 0, len(data), data, ctypes.byref(out_len), out) == 1
    return out.raw[: out_len.value]


# produced once by the system libbrotlienc at quality 11 from
# b"hello brotli from the system encoder\n" * 4
_PINNED_BR = bytes.fromhex(
    "1b930048c46dec7b967b0b0e210a24d8800387128a64123e39a619a7ad7a3f61"
    "4f885e7c2a10"
)
_PINNED_PLAIN = b"hello brotli from the system encoder\n" * 4


@needs_brotli_dec
def test_pinned_system_stream_decodes():
    assert brotli_decompress(_PINNED_BR, 1 << 20) == _PINNED_PLAIN


@needs_brotli_enc
def test_live_roundtrip_and_totality():
    rng = random.Random(11)
    for size in (0, 1, 100, 50_000):
        data = bytes(rng.randrange(256) for _ in range(size))
        c = _bcompress(data)
        assert brotli_decompress(c, 1 << 26) == data
    text = b"The quick brown fox jumps over the lazy dog. " * 2000
    c = _bcompress(text, q=11)
    assert len(c) < len(text) // 50  # it really compressed
    assert brotli_decompress(c, 1 << 26) == text
    # truncation / garbage / bomb cap all -> None, never raise
    assert brotli_decompress(c[: len(c) // 2], 1 << 26) is None
    for n in (1, 10, 200):
        blob = bytes(rng.randrange(256) for _ in range(n))
        brotli_decompress(blob, 1 << 26)  # total
    bomb = _bcompress(bytes(1 << 22))
    assert brotli_decompress(bomb, 1 << 20) is None  # cap
    assert brotli_decompress(bomb, 1 << 26) == bytes(1 << 22)


@needs_brotli_enc
def test_warc_response_with_br_content_coding():
    html = b"<html><title>Br</title><p>brotli body</p></html>"
    coded = _bcompress(html, q=11)
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: br\r\n\r\n" + coded)
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://br.example/\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n")
    recs = parse_warc(raw)
    assert len(recs) == 1
    assert recs[0]["http_status"] == 200
    assert recs[0]["body"] == html
    # a truncated br body drops the record, never raises
    http_bad = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Encoding: br\r\n\r\n" + coded[: len(coded) // 2])
    raw_bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Type: application/http;msgtype=response\r\n"
               + b"Content-Length: %d\r\n\r\n" % len(http_bad) + http_bad)
    recs = parse_warc(raw_bad)
    assert recs == [] or recs[0]["body"] is None
