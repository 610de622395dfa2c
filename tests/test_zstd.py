"""Zstandard support for the crawl stack (llm/zstd_dec.py over the
SYSTEM libzstd): HTTP ``Content-Encoding: zstd`` (RFC 8878) and
``.tar.zst`` WebDataset shards.

Like test_brotli.py: the decoder IS the system library, so evidence
is round trips against the independently-loaded system ENCODER, a
library-produced pinned vector for the default lane, totality on
hostile bytes, and the end-to-end WARC/archive paths.
"""

from __future__ import annotations

import ctypes
import io
import random
import tarfile

import pytest

from travel_data_ingestion_spark.llm.archive import iter_members
from travel_data_ingestion_spark.llm.warc import parse_warc
from travel_data_ingestion_spark.llm.zstd_dec import (
    available,
    zstd_decompress,
)

needs_zstd = pytest.mark.skipif(not available(),
                                reason="libzstd not available")


def _load_encoder():
    try:
        enc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libzstd.so.1")
        enc.ZSTD_compress.restype = ctypes.c_size_t
        enc.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_int]
        enc.ZSTD_isError.restype = ctypes.c_uint
        enc.ZSTD_compressBound.restype = ctypes.c_size_t
        return enc
    except (OSError, AttributeError):
        return None


_ENC = _load_encoder()
needs_zstd_enc = pytest.mark.skipif(_ENC is None or not available(),
                                    reason="libzstd not available")


def _zc(data: bytes, lvl: int = 9) -> bytes:
    bound = _ENC.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = _ENC.ZSTD_compress(out, bound, data, len(data), lvl)
    assert not _ENC.ZSTD_isError(n)
    return out.raw[:n]


# produced once by the system libzstd at level 19 from
# b"pinned zstd vector from the system encoder\n" * 3
_PINNED_ZST = bytes.fromhex(
    "28b52ffd2081850100b2c20910c0b7014024575a92a145c9ffdf3bd66f205f48"
    "77db578dfa626d98c1894b2faed5e3fadd200101001b37a932"
)
_PINNED_PLAIN = b"pinned zstd vector from the system encoder\n" * 3


@needs_zstd
def test_pinned_system_stream_decodes():
    assert zstd_decompress(_PINNED_ZST, 1 << 20) == _PINNED_PLAIN


@needs_zstd_enc
def test_live_roundtrip_multiframe_and_totality():
    rng = random.Random(4)
    for size in (0, 1, 100, 50_000):
        d = bytes(rng.randrange(256) for _ in range(size))
        assert zstd_decompress(_zc(d), 1 << 26) == d
    # concatenated frames are legal zstd and common in dumps
    assert zstd_decompress(_zc(b"AB") + _zc(b"CD"), 1 << 20) == b"ABCD"
    text = b"lorem ipsum dolor " * 3000
    c = _zc(text, 19)
    assert zstd_decompress(c[: len(c) // 2], 1 << 26) is None  # truncated
    assert zstd_decompress(b"\x28\xb5\x2f\xfdgarbage!!", 1 << 26) is None
    for n in (1, 10, 300):
        zstd_decompress(bytes(rng.randrange(256) for _ in range(n)),
                        1 << 26)  # total
    bomb = _zc(bytes(1 << 22))
    assert zstd_decompress(bomb, 1 << 20) is None  # cap
    assert zstd_decompress(bomb, 1 << 26) == bytes(1 << 22)


@needs_zstd_enc
def test_warc_response_with_zstd_content_coding():
    body = b"zstd-coded page body " * 40
    coded = _zc(body, 19)
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: zstd\r\n\r\n" + coded)
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://z.example/\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n")
    recs = parse_warc(raw)
    assert len(recs) == 1 and recs[0]["body"] == body


@needs_zstd_enc
def test_tar_zst_webdataset_shard():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key in ("000001", "000002"):
            for ext, data in ((".txt", f"caption {key}".encode()),
                              (".json", b'{"k": 1}')):
                ti = tarfile.TarInfo(key + ext)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
    shard = _zc(buf.getvalue(), 19)
    members = list(iter_members(shard))
    assert [m[0] for m in members] == [
        "000001.txt", "000001.json", "000002.txt", "000002.json"]
    assert members[0][1] == b"caption 000001"
    # truncated shard: total, yields nothing (the zstd layer rejects
    # the incomplete frame before the tar walk starts)
    assert list(iter_members(shard[: len(shard) // 2])) == []


def test_tar_xz_and_bz2_sniff_via_stdlib():
    # stdlib tarfile sniffs xz/bz2 transparently — pin it so the
    # archive surface's format list is test-backed, not assumed
    import bz2
    import lzma

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"hello compressed tars"
        ti = tarfile.TarInfo("a.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    for comp in (lzma.compress, bz2.compress):
        members = list(iter_members(comp(buf.getvalue())))
        assert members == [("a.txt", b"hello compressed tars", False)], comp


@needs_zstd_enc
def test_tar_zst_with_leading_skippable_frame():
    # RFC 8878 §3.1.2: a zstd file may open with a SKIPPABLE frame
    # (magic 0x184D2A50..5F LE — seek tables etc.) before the first
    # standard frame. ZSTD_decompressStream skips them, so the sniff
    # must route such payloads to the zstd path instead of letting
    # tarfile fail and the shard silently yield no members.
    import struct

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"behind a skippable frame"
        ti = tarfile.TarInfo("a.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    for magic in (0x184D2A50, 0x184D2A5F):  # range endpoints
        skip_payload = b"seek-table-ish junk"
        skippable = (struct.pack("<I", magic)
                     + struct.pack("<I", len(skip_payload)) + skip_payload)
        shard = skippable + _zc(buf.getvalue(), 9)
        # decoder itself skips the frame
        assert zstd_decompress(shard, 1 << 20) == buf.getvalue()
        # and the archive sniff now recognizes it as zstd
        members = list(iter_members(shard))
        assert members == [("a.txt", b"behind a skippable frame", False)]
