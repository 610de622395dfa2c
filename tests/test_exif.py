"""EXIF orientation probe + upright transform.

Fixtures hand-assembled per container (JPEG APP1 spliced into the real
GAMMA fixture, TIFF IFD entry, PNG eXIf chunk with CRC, WebP EXIF
chunk) in both byte orders; apply_orientation is pinned against the
ground truth of literally rotating/flipping a labeled asymmetric
image with an independent per-pixel index map.
"""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np

from travel_data_ingestion_spark.llm.exif import (
    apply_orientation,
    exif_orientation,
)


def _tiff_with_orientation(val: int, endian: str = "<") -> bytes:
    if endian == "<":
        hdr = b"II*\x00" + struct.pack("<I", 8)
        entry = struct.pack("<HHIHH", 0x0112, 3, 1, val, 0)
        return hdr + struct.pack("<H", 1) + entry + struct.pack("<I", 0)
    hdr = b"MM\x00*" + struct.pack(">I", 8)
    entry = struct.pack(">HHIHH", 0x0112, 3, 1, val, 0)
    return hdr + struct.pack(">H", 1) + entry + struct.pack(">I", 0)


def test_tiff_both_byte_orders():
    for endian in ("<", ">"):
        for val in (1, 3, 6, 8):
            assert exif_orientation(_tiff_with_orientation(val, endian)) == val
    # out-of-range orientation rejected
    assert exif_orientation(_tiff_with_orientation(9)) is None


def test_jpeg_app1_spliced_into_real_fixture():
    from travel_data_ingestion_spark.queries.llm_multimodal import _GAMMA_JPEG

    body = b"Exif\x00\x00" + _tiff_with_orientation(6)
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    tagged = _GAMMA_JPEG[:2] + app1 + _GAMMA_JPEG[2:]
    assert exif_orientation(tagged) == 6
    assert exif_orientation(_GAMMA_JPEG) is None  # untagged original
    # the tagged file still decodes identically
    from travel_data_ingestion_spark.llm.jpeg import decode_jpeg

    assert decode_jpeg(tagged) == decode_jpeg(_GAMMA_JPEG)


def test_png_exif_chunk():
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    exif = chunk(b"eXIf", _tiff_with_orientation(8, ">"))
    idat = chunk(b"IDAT", zlib.compress(b"\x00\x80"))
    iend = chunk(b"IEND", b"")
    png = b"\x89PNG\r\n\x1a\n" + ihdr + exif + idat + iend
    assert exif_orientation(png) == 8
    png_untagged = b"\x89PNG\r\n\x1a\n" + ihdr + idat + iend
    assert exif_orientation(png_untagged) is None


def test_webp_exif_chunk():
    body = b"Exif\x00\x00" + _tiff_with_orientation(3)
    exif = b"EXIF" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        exif += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(exif)) + b"WEBP" + exif
    assert exif_orientation(payload) == 3


def test_apply_orientation_ground_truth():
    # 3x2 labeled image: pixel (r, c) has value r*10 + c in all channels
    w, h = 3, 2
    base = np.array(
        [[[r * 10 + c] * 3 for c in range(w)] for r in range(h)],
        dtype=np.uint8,
    )
    rgb = base.tobytes()

    def px(buf, ww, r, c):
        return buf[(r * ww + c) * 3]

    # orientation 6 (90 CW): output (r', c') = input (h-1-c', r')
    ow, oh, out = apply_orientation(w, h, rgb, 6)
    assert (ow, oh) == (h, w)
    for r in range(oh):
        for c in range(ow):
            assert px(out, ow, r, c) == px(rgb, w, h - 1 - c, r)
    # cross-check all eight against numpy directly
    expect = {
        1: base,
        2: base[:, ::-1],
        3: base[::-1, ::-1],
        4: base[::-1, :],
        5: np.transpose(base, (1, 0, 2)),
        6: np.rot90(base, k=-1, axes=(0, 1)),
        7: np.rot90(base[:, ::-1], k=-1, axes=(0, 1)),
        8: np.rot90(base, k=1, axes=(0, 1)),
    }
    for o, exp in expect.items():
        ow, oh, out = apply_orientation(w, h, rgb, o)
        got = np.frombuffer(out, np.uint8).reshape(oh, ow, 3)
        assert np.array_equal(got, exp), o
    # round trips: applying 6 then 8... 6 followed by 8 restores
    ow, oh, out = apply_orientation(w, h, rgb, 6)
    ow2, oh2, out2 = apply_orientation(ow, oh, out, 8)
    assert (ow2, oh2, out2) == (w, h, rgb)


def test_totality():
    rng = random.Random(12)
    for n in (0, 2, 12, 200):
        blob = bytes(rng.randrange(256) for _ in range(n))
        for prefix in (b"", b"\xff\xd8", b"II*\x00", b"MM\x00*",
                       b"\x89PNG\r\n\x1a\n", b"RIFF0000WEBP"):
            exif_orientation(prefix + blob)
    assert apply_orientation(2, 2, b"short", 6) == (2, 2, b"short")
    assert apply_orientation(1, 1, b"\x00\x00\x00", None) == (1, 1, b"\x00\x00\x00")
