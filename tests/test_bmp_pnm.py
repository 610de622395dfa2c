"""BMP (incl. RLE) and the full netpbm family (P1-P6).

decode_bmp covers BITMAPINFOHEADER/V4/V5 BMPs (palette 1/4/8-bit,
truecolor 16/24/32-bit, BI_RGB, BI_BITFIELDS, and BI_RLE8/BI_RLE4
run-length images, bottom-up and top-down, 4-byte row padding);
decode_pnm covers ASCII and binary
netpbm with comments and 16-bit maxvals. Both are cross-checked
against independent forward builders written from the format docs, and
against real-world files shipped by system packages.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.multimodal import (
    decode_bmp,
    decode_image,
    decode_pnm,
    phash_bytes,
)


# ------------------------------------------------------------- forward
def _bmp(
    rgb: np.ndarray,
    bpp: int = 24,
    top_down: bool = False,
    bitfields: tuple | None = None,
    palette: np.ndarray | None = None,
    idx: np.ndarray | None = None,
) -> bytes:
    """Independent forward BMP writer: rows padded to 4 bytes, BGR
    order, bottom-up unless top_down."""
    h, w = (idx.shape if idx is not None else rgb.shape[:2])
    comp = 3 if bitfields else 0
    stride = ((w * bpp + 31) // 32) * 4
    rows = []
    for y in range(h):
        if bpp == 24:
            line = rgb[y, :, ::-1].astype(np.uint8).tobytes()
        elif bpp == 32:
            rm, gm, bm = bitfields or (0xFF0000, 0xFF00, 0xFF)
            vals = np.zeros(w, np.uint32)
            for mask, c in ((rm, 0), (gm, 1), (bm, 2)):
                shift = (mask & -mask).bit_length() - 1
                width = (mask >> shift).bit_length()
                top = (1 << width) - 1
                ch = (rgb[y, :, c].astype(np.uint32) * top + 127) // 255
                vals |= ch << shift
            line = vals.astype("<u4").tobytes()
        elif bpp == 16:
            rm, gm, bm = bitfields or (0x7C00, 0x3E0, 0x1F)
            vals = np.zeros(w, np.uint32)
            for mask, c in ((rm, 0), (gm, 1), (bm, 2)):
                shift = (mask & -mask).bit_length() - 1
                width = (mask >> shift).bit_length()
                top = (1 << width) - 1
                ch = (rgb[y, :, c].astype(np.uint32) * top + 127) // 255
                vals |= ch << shift
            line = vals.astype("<u2").tobytes()
        else:  # palette bpp 1/4/8: pack MSB-first
            bits = []
            for x in range(w):
                v = int(idx[y, x])
                for j in range(bpp - 1, -1, -1):
                    bits.append((v >> j) & 1)
            while len(bits) % 8:
                bits.append(0)
            line = np.packbits(np.array(bits, np.uint8)).tobytes()
        rows.append(line + bytes(stride - len(line)))
    if not top_down:
        rows = rows[::-1]
    data = b"".join(rows)
    pal = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal = b"".join(
            bytes([int(b), int(g), int(r), 0]) for r, g, b in palette.tolist()
        )
    masks = struct.pack("<III", *bitfields) if bitfields else b""
    hdr = struct.pack(
        "<iihhIIiiII",
        w,
        -h if top_down else h,
        1,
        bpp,
        comp,
        len(data),
        2835,
        2835,
        n_colors,
        0,
    )
    info = struct.pack("<I", 40) + hdr + masks + pal
    off = 14 + len(info)
    return b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) + info + data


def _rand_rgb(seed, w, h):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


# --------------------------------------------------------------- tests
def test_bmp_24bit_bottom_up_and_top_down():
    rgb = _rand_rgb(1, 7, 5)  # odd width exercises row padding
    for td in (False, True):
        got = decode_bmp(_bmp(rgb, bpp=24, top_down=td))
        assert got == (7, 5, rgb.tobytes()), td


def test_bmp_32bit_default_and_custom_bitfields():
    rgb = _rand_rgb(2, 6, 4)
    assert decode_bmp(_bmp(rgb, bpp=32)) == (6, 4, rgb.tobytes())
    # BGRA-style masks (alpha bits present but unmasked -> dropped)
    got = decode_bmp(_bmp(rgb, bpp=32, bitfields=(0xFF0000, 0xFF00, 0xFF)))
    assert got == (6, 4, rgb.tobytes())
    # RGBA layout (red in the LOW byte)
    got = decode_bmp(_bmp(rgb, bpp=32, bitfields=(0xFF, 0xFF00, 0xFF0000)))
    assert got == (6, 4, rgb.tobytes())


def test_bmp_16bit_555_and_565_round_through_quantization():
    rgb = _rand_rgb(3, 9, 3)
    for bf in (None, (0xF800, 0x7E0, 0x1F)):  # default 555, explicit 565
        payload = _bmp(rgb, bpp=16, bitfields=bf)
        got = decode_bmp(payload)
        assert got is not None and (got[0], got[1]) == (9, 3)
        dec = np.frombuffer(got[2], np.uint8).reshape(3, 9, 3).astype(int)
        # 5/6-bit channels: worst-case quantization error is bounded
        assert np.abs(dec - rgb.astype(int)).max() <= 5


def test_bmp_palette_depths():
    rng = np.random.RandomState(4)
    for bpp, ncol in ((1, 2), (4, 11), (8, 200)):
        palette = rng.randint(0, 256, (ncol, 3))
        idx = rng.randint(0, ncol, (5, 7))
        payload = _bmp(None, bpp=bpp, palette=palette, idx=idx)
        expect = palette[idx].astype(np.uint8).tobytes()
        assert decode_bmp(payload) == (7, 5, expect), bpp
    # palette index past the color table: malformed
    bad = _bmp(None, bpp=4, palette=rng.randint(0, 256, (3, 3)), idx=np.full((2, 2), 9))
    assert decode_bmp(bad) is None


def test_bmp_noncontiguous_bitfields_gated():
    """A non-contiguous BI_BITFIELDS mask would silently mis-scale in
    _bitfield_channel (ADVICE r9); decode_bmp must route it to None."""
    rgb = _rand_rgb(6, 5, 4)
    good = _bmp(rgb, bpp=32, bitfields=(0xFF0000, 0xFF00, 0xFF))
    assert decode_bmp(good) is not None
    for masks in (
        (0xF0F000, 0xFF00, 0xFF),  # red has a hole
        (0xFF0000, 0b1010 << 8, 0xFF),  # green non-contiguous
        (0xFF0000, 0xFF00, 0x55),  # blue non-contiguous
    ):
        b = bytearray(good)
        struct.pack_into("<III", b, 54, *masks)
        assert decode_bmp(bytes(b)) is None, masks
    # a mask wider than bpp is equally malformed
    b16 = bytearray(_bmp(rgb, bpp=16, bitfields=(0xF800, 0x7E0, 0x1F)))
    struct.pack_into("<III", b16, 54, 0x1F8000, 0x7E0, 0x1F)
    assert decode_bmp(bytes(b16)) is None
    # an all-zero mask stays legal (channel reads as 0)
    z = bytearray(good)
    struct.pack_into("<III", z, 54, 0xFF0000, 0xFF00, 0)
    got = decode_bmp(bytes(z))
    assert got is not None
    dec = np.frombuffer(got[2], np.uint8).reshape(4, 5, 3)
    assert (dec[:, :, 2] == 0).all() and (dec[:, :, 0] == rgb[:, :, 0]).all()


def test_bmp_malformed_rejected():
    rgb = _rand_rgb(5, 4, 4)
    good = _bmp(rgb)
    assert decode_bmp(good) is not None
    assert decode_bmp(b"BMshort") is None
    assert decode_bmp(good[: len(good) - 8]) is None  # truncated data
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8 on a 24-bit image: depth mismatch, gated
    assert decode_bmp(bytes(rle)) is None
    core = bytearray(good)
    struct.pack_into("<I", core, 14, 12)  # BITMAPCOREHEADER: gated
    assert decode_bmp(bytes(core)) is None
    assert decode_bmp(b"") is None


def test_pnm_ascii_variants():
    # P1: 1 = black, digits may be packed
    p1 = b"P1\n# comment\n3 2\n011\n100\n"
    assert decode_pnm(p1) == (
        3,
        2,
        bytes([255, 255, 255, 0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 255, 255]),
    )
    # P2 with maxval scaling
    p2 = b"P2\n2 2\n100\n0 50 100 25\n"
    g = [0, 128, 255, 64]  # exact-round 50*255/100=127.5 -> 128
    assert decode_pnm(p2) == (2, 2, bytes(v for x in g for v in (x, x, x)))
    # P3 RGB
    p3 = b"P3\n1 2\n255\n1 2 3\n4 5 6\n"
    assert decode_pnm(p3) == (1, 2, bytes([1, 2, 3, 4, 5, 6]))
    # sample above maxval: malformed
    assert decode_pnm(b"P2\n1 1\n10\n11\n") is None


def test_pnm_binary_variants():
    # P5 8-bit
    p5 = b"P5\n3 1\n255\n" + bytes([0, 128, 255])
    assert decode_pnm(p5) == (3, 1, bytes([0, 0, 0, 128, 128, 128, 255, 255, 255]))
    # P5 16-bit big-endian, exact-rounded to 8
    p5w = b"P5\n2 1\n65535\n" + struct.pack(">HH", 0, 65535)
    assert decode_pnm(p5w) == (2, 1, bytes([0, 0, 0, 255, 255, 255]))
    # P4 bitmap: MSB-first rows, 1 = black
    p4 = b"P4\n9 1\n" + bytes([0b10100000, 0b10000000])
    expect = bytes(
        v
        for bit in [1, 0, 1, 0, 0, 0, 0, 0, 1]
        for v in ((0, 0, 0) if bit else (255, 255, 255))
    )
    assert decode_pnm(p4) == (9, 1, expect)
    # P6 with a comment (the strict decode_ppm rejects, the general
    # parser handles)
    p6 = b"P6\n# made by hand\n1 1\n255\n\x01\x02\x03"
    assert decode_pnm(p6) == (1, 1, bytes([1, 2, 3]))
    assert decode_image(p6) == (1, 1, bytes([1, 2, 3]))
    # truncated binary body
    assert decode_pnm(b"P5\n4 4\n255\n\x00\x00") is None


def test_pnm_and_bmp_adversarial_totality():
    rng = np.random.RandomState(77)
    bases = [
        _bmp(_rand_rgb(6, 5, 4)),
        b"P5\n5 4\n255\n" + bytes(rng.randint(0, 256, 20).astype("uint8")),
        b"P3\n2 2\n255\n" + b" ".join(b"%d" % v for v in rng.randint(0, 256, 12)),
    ]
    for base in bases:
        for _ in range(200):
            b = bytearray(base)
            for _k in range(rng.randint(1, 6)):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            for fn in (decode_bmp, decode_pnm, decode_image):
                r = fn(bytes(b))
                assert r is None or len(r[2]) == r[0] * r[1] * 3
    for n in (0, 1, 3, 14, 54):
        junk = bytes(rng.randint(0, 256, n).astype("uint8"))
        assert decode_bmp(junk) is None and decode_pnm(junk) is None


def test_phash_format_invariance_extends_to_bmp():
    """The same pixels hash identically through PPM and lossless BMP
    containers — 24-bit BMP is exact, so hamming is 0, not 'small'."""
    rgb = _rand_rgb(8, 16, 16)
    ppm = b"P6\n16 16\n255\n" + rgb.tobytes()
    assert phash_bytes(_bmp(rgb, bpp=24)) == phash_bytes(ppm)
    assert phash_bytes(_bmp(rgb, bpp=32, top_down=True)) == phash_bytes(ppm)


_REAL = [
    (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.bmp",
        decode_bmp,
        (16, 16),
    ),
    (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.pgm",
        decode_pnm,
        (16, 16),
    ),
    (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.pbm",
        decode_pnm,
        (16, 16),
    ),
]


@pytest.mark.parametrize("path,fn,dims", _REAL)
def test_real_world_interop(path, fn, dims):
    """Files written by real tools (CPython's test data: a V5-header
    32-bit BI_BITFIELDS BMP, binary PGM/PBM)."""
    if not os.path.exists(path):
        pytest.skip(f"interop fixture not on this machine: {path}")
    payload = open(path, "rb").read()
    r = fn(payload)
    assert r is not None and (r[0], r[1]) == dims
    assert decode_image(payload) == r  # routed by the single entry


def test_real_world_same_logo_pairs_across_containers():
    """The SAME 16x16 Python-logo pixels shipped as BMP and PGM by
    CPython's test suite: the grayscale PGM is a luma rendering of the
    color BMP, so the two land near each other in pHash space — the
    cross-container near-dup case the whole media pipeline exists for."""
    base = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data"
    pb, pg = f"{base}/python.bmp", f"{base}/python.pgm"
    if not (os.path.exists(pb) and os.path.exists(pg)):
        pytest.skip("interop fixtures not on this machine")
    d = phash_bytes(open(pb, "rb").read()) ^ phash_bytes(open(pg, "rb").read())
    assert bin(d & ((1 << 64) - 1)).count("1") <= 16  # same structure


def _rle_encode(idx: np.ndarray, bpp: int) -> bytes:
    """Forward BI_RLE encoder: encoded runs per bottom-up row, EOL
    between rows, EOB at the end. RLE4 packs the run value as two
    alternating nibbles (uniform runs here, so both nibbles equal)."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        x = 0
        while x < w:
            v = int(idx[y, x])
            run = 1
            while x + run < w and idx[y, x + run] == v and run < 255:
                run += 1
            val = v if bpp == 8 else (v << 4) | v
            out += bytes([run, val])
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def _bmp_rle_file(idx: np.ndarray, palette: np.ndarray, bpp: int,
                  data: bytes | None = None) -> bytes:
    """Minimal BMP container around RLE data (comp 1 or 2)."""
    h, w = idx.shape
    data = data if data is not None else _rle_encode(idx, bpp)
    comp = 1 if bpp == 8 else 2
    pal = b"".join(bytes([int(b), int(g), int(r), 0]) for r, g, b in palette.tolist())
    hdr = struct.pack("<iihhIIiiII", w, h, 1, bpp, comp, len(data), 2835, 2835,
                      len(palette), 0)
    data_off = 14 + 40 + len(pal)
    return (b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
            + struct.pack("<I", 40) + hdr + pal + data)


def test_bmp_rle8_and_rle4_roundtrip():
    from travel_data_ingestion_spark.llm.multimodal import decode_bmp

    rng = np.random.RandomState(51)
    # runs-heavy content (posterized) exercises both run and row logic
    pal8 = rng.randint(0, 256, (200, 3))
    idx8 = (rng.randint(0, 200, (9, 13)) // 40 * 40).astype(np.uint8)
    got = decode_bmp(_bmp_rle_file(idx8, pal8, 8))
    assert got == (13, 9, pal8[idx8].astype(np.uint8).tobytes())
    pal4 = rng.randint(0, 256, (16, 3))
    idx4 = (rng.randint(0, 16, (6, 11)) // 4 * 4).astype(np.uint8)
    got = decode_bmp(_bmp_rle_file(idx4, pal4, 4))
    assert got == (11, 6, pal4[idx4].astype(np.uint8).tobytes())


def test_bmp_rle_absolute_delta_and_gates():
    from travel_data_ingestion_spark.llm.multimodal import decode_bmp

    pal = np.arange(48).reshape(16, 3)
    # hand-crafted stream on a 6x2 canvas (bottom-up):
    # bottom row: absolute run of 5 nibbles [1,2,3,4,5] (3 bytes + pad),
    # 1-pixel run of 6; EOL; top row: delta skip 2 -> run 4 of 7; EOB
    data = bytes([
        0, 5, 0x12, 0x34, 0x50, 0x00,   # absolute 5, padded to word
        1, 0x66,                        # run 1 of value 6
        0, 0,                           # EOL
        0, 2, 2, 0,                     # delta dx=2 dy=0
        4, 0x77,                        # run 4 of value 7
        0, 1,                           # EOB
    ])
    idx = np.zeros((2, 6), np.uint8)
    got = decode_bmp(_bmp_rle_file(idx, pal, 4, data=data))
    assert got is not None
    dec = np.frombuffer(got[2], np.uint8).reshape(2, 6, 3)
    expect_bottom = [1, 2, 3, 4, 5, 6]
    expect_top = [0, 0, 7, 7, 7, 7]
    assert [tuple(px) for px in dec[1]] == [tuple(pal[v]) for v in expect_bottom]
    assert [tuple(px) for px in dec[0]] == [tuple(pal[v]) for v in expect_top]
    # gates: run overflowing the row, RLE with top-down height, RLE8
    # with bpp 4 mismatch
    overflow = bytes([8, 0x11, 0, 1])  # 8 px into a 6-px row
    assert decode_bmp(_bmp_rle_file(idx, pal, 4, data=overflow)) is None
    f = bytearray(_bmp_rle_file(idx, pal, 4))
    struct.pack_into("<i", f, 22, -2)  # negative height = top-down
    assert decode_bmp(bytes(f)) is None
    f = bytearray(_bmp_rle_file(idx, pal, 4))
    struct.pack_into("<I", f, 30, 1)  # comp=RLE8 but bpp=4
    assert decode_bmp(bytes(f)) is None


def test_bmp_rle_adversarial_totality():
    from travel_data_ingestion_spark.llm.multimodal import decode_bmp

    rng = np.random.RandomState(52)
    pal = rng.randint(0, 256, (256, 3))
    idx = (rng.randint(0, 256, (8, 10)) // 32 * 32).astype(np.uint8)
    base = _bmp_rle_file(idx, pal, 8)
    for _ in range(250):
        b = bytearray(base)
        for _k in range(rng.randint(1, 6)):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        r = decode_bmp(bytes(b))
        assert r is None or len(r[2]) == r[0] * r[1] * 3


def _ico(entries: list[tuple[int, int, bytes]], kind: int = 1) -> bytes:
    """Forward ICO/CUR writer: entries = (w, h, payload_bytes)."""
    out = bytearray(struct.pack("<HHH", 0, kind, len(entries)))
    off = 6 + 16 * len(entries)
    body = bytearray()
    for w, h, data in entries:
        out += bytes([w % 256, h % 256, 0, 0]) + struct.pack(
            "<HHII", 1, 32, len(data), off + len(body)
        )
        body += data
    return bytes(out + body)


def _ico_dib(rgb: np.ndarray) -> bytes:
    """Headerless BMP DIB with doubled height + an AND mask, the
    classic icon payload: reuse the BMP writer and strip its file
    header."""
    h, w = rgb.shape[:2]
    f = _bmp(rgb, bpp=24)
    dib = bytearray(f[14:])
    struct.pack_into("<i", dib, 8, h * 2)  # height counts XOR + AND
    mask_stride = ((w + 31) // 32) * 4
    return bytes(dib) + bytes(mask_stride * h)  # all-opaque AND mask


def test_ico_container_decodes_largest_entry():
    from travel_data_ingestion_spark.llm.multimodal import (
        decode_ico,
        encode_png,
    )

    small = _rand_rgb(61, 8, 8)
    big = _rand_rgb(62, 16, 16)
    # mixed entries: DIB small + PNG big -> the larger (PNG) wins
    ico = _ico([(8, 8, _ico_dib(small)),
                (16, 16, encode_png(16, 16, big.tobytes()))])
    assert decode_ico(ico) == (16, 16, big.tobytes())
    assert decode_image(ico) == (16, 16, big.tobytes())  # routed
    # DIB-only icon (alpha/AND mask dropped), CUR container kind too
    for kind in (1, 2):
        ico = _ico([(8, 8, _ico_dib(small))], kind=kind)
        assert decode_ico(ico) == (8, 8, small.tobytes()), kind
    # a corrupt largest entry falls back to the next-largest
    broken = _ico([(16, 16, b"\x89PNG\r\n\x1a\ngarbage"),
                   (8, 8, _ico_dib(small))])
    assert decode_ico(broken) == (8, 8, small.tobytes())
    assert decode_ico(b"\x00\x00\x03\x00\x01\x00") is None  # bad type
    assert decode_ico(b"") is None


def test_ico_real_world_python_logo():
    """CPython's idle.ico: 4 entries (three DIBs + a 256px PNG); the
    largest must decode, and the PNG entry's pixels must match what
    decode_png returns for the embedded bytes."""
    path = "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle.ico"
    if not os.path.exists(path):
        pytest.skip("interop fixture not on this machine")
    from travel_data_ingestion_spark.llm.multimodal import decode_ico

    b = open(path, "rb").read()
    r = decode_ico(b)
    assert r is not None and (r[0], r[1]) == (256, 256)
    assert decode_image(b) == r


def test_ico_adversarial_totality():
    from travel_data_ingestion_spark.llm.multimodal import decode_ico

    rng = np.random.RandomState(63)
    base = _ico([(8, 8, _ico_dib(_rand_rgb(64, 8, 8)))])
    for _ in range(250):
        b = bytearray(base)
        for _k in range(rng.randint(1, 6)):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        r = decode_ico(bytes(b))
        assert r is None or len(r[2]) == r[0] * r[1] * 3
