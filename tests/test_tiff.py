"""Strip-based TIFF decode (none / PackBits / TIFF-LZW).

Cross-checked against an independent forward builder (including a
spec-side MSB-first early-change LZW compressor — TIFF's variant, not
GIF's) and CPython's real test TIFF, which carries the same Python
logo as its BMP sibling: the two must pair at pHash hamming 0.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.multimodal import (
    decode_image,
    decode_tiff,
    phash_bytes,
)


def _entries(bo, tags):
    """tags: list of (tag, type, values). Returns (ifd_bytes, extra)."""
    _SZ = {1: 1, 3: 2, 4: 4}
    out = b""
    extra = b""
    # extra data lands after the IFD: header(8) + count(2) + 12*n + next(4)
    base = 8 + 2 + 12 * len(tags) + 4
    for tag, typ, vals in tags:
        total = _SZ[typ] * len(vals)
        if typ == 3:
            raw = struct.pack(bo + "%dH" % len(vals), *vals)
        elif typ == 4:
            raw = struct.pack(bo + "%dI" % len(vals), *vals)
        else:
            raw = bytes(vals)
        if total <= 4:
            val_bytes = raw + bytes(4 - total)
        else:
            val_bytes = struct.pack(bo + "I", base + len(extra))
            extra += raw
        out += struct.pack(bo + "HHI", tag, typ, len(vals)) + val_bytes
    return out, extra


def _tiff(w, h, data, comp=1, photo=2, spp=3, bits=8, bo="<", colormap=None,
          rows_per_strip=None, strips=None, predictor=None, planar=None,
          tiles=None):
    """Forward TIFF builder. ``strips`` overrides data (already-encoded
    per-strip payloads); ``tiles`` = (tile_w, tile_l, [encoded blocks])
    switches to the tiled layout (tags 322-325)."""
    tags = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [bits] * spp),
        (259, 3, [comp]),
        (262, 3, [photo]),
        (277, 3, [spp]),
    ]
    if rows_per_strip:
        tags.append((278, 4, [rows_per_strip]))
    if colormap is not None:
        tags.append((320, 3, list(colormap)))
    if predictor is not None:
        tags.append((317, 3, [predictor]))
    if planar is not None:
        tags.append((284, 3, [planar]))
    if tiles is not None:
        tile_w, tile_l, blocks = tiles
        tags.append((322, 4, [tile_w]))
        tags.append((323, 4, [tile_l]))
        off_tag, cnt_tag, strips = 324, 325, blocks
    else:
        off_tag, cnt_tag = 273, 279
        strips = strips if strips is not None else [data]
    # two passes: sizes depend on the IFD length, which depends on tag
    # count — compute layout with placeholder offsets first
    tags_full = tags + [
        (off_tag, 4, [0] * len(strips)),
        (cnt_tag, 4, [len(s) for s in strips]),
    ]
    tags_full.sort()
    ifd, extra = _entries(bo, tags_full)
    data_at = 8 + 2 + len(ifd) + 4 + len(extra)
    offs = []
    at = data_at
    for s in strips:
        offs.append(at)
        at += len(s)
    tags_final = tags + [(off_tag, 4, offs), (cnt_tag, 4, [len(s) for s in strips])]
    tags_final.sort()
    ifd, extra = _entries(bo, tags_final)
    hdr = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    return (
        hdr
        + struct.pack(bo + "H", len(tags_final))
        + ifd
        + struct.pack(bo + "I", 0)
        + extra
        + b"".join(strips)
    )


def _packbits_enc(data: bytes) -> bytes:
    """Trivial valid PackBits: emit literal runs of <=128 bytes."""
    out = bytearray()
    for i in range(0, len(data), 128):
        seg = data[i : i + 128]
        out.append(len(seg) - 1)
        out += seg
    return bytes(out)


def _lzw_enc(data: bytes) -> bytes:
    """Spec-side TIFF LZW compressor: MSB-first packing, early-change
    width growth, Clear emitted first, EOI last."""
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # Clear
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # EARLY CHANGE: the encoder widens when next_code+1 would
        # overflow, one code before the table is actually full
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        put(table[prev], width)
    put(257, width)  # EOI
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def _rand_rgb(seed, w, h, ch=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, ch)).astype(np.uint8)


def test_uncompressed_rgb_and_rgba():
    rgb = _rand_rgb(1, 7, 5)
    assert decode_tiff(_tiff(7, 5, rgb.tobytes())) == (7, 5, rgb.tobytes())
    rgba = _rand_rgb(2, 6, 4, 4)
    got = decode_tiff(_tiff(6, 4, rgba.tobytes(), spp=4))
    assert got == (6, 4, np.ascontiguousarray(rgba[:, :, :3]).tobytes())
    # big-endian byte order
    assert decode_tiff(_tiff(7, 5, rgb.tobytes(), bo=">")) == (7, 5, rgb.tobytes())


def test_gray_and_white_is_zero():
    g = _rand_rgb(3, 5, 4, 1)
    expect = np.repeat(g, 3, axis=2).tobytes()
    assert decode_tiff(_tiff(5, 4, g.tobytes(), photo=1, spp=1)) == (5, 4, expect)
    inv = np.repeat(255 - g, 3, axis=2).tobytes()
    assert decode_tiff(_tiff(5, 4, g.tobytes(), photo=0, spp=1)) == (5, 4, inv)


def test_palette_and_16bit():
    rng = np.random.RandomState(4)
    idx = rng.randint(0, 256, (4, 6, 1)).astype(np.uint8)
    cmap16 = rng.randint(0, 65536, 3 * 256)
    pal8 = ((cmap16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    expect = pal8.reshape(3, 256).T[idx[:, :, 0]].tobytes()
    got = decode_tiff(_tiff(6, 4, idx.tobytes(), photo=3, spp=1, colormap=cmap16))
    assert got == (6, 4, expect)
    v16 = rng.randint(0, 65536, (3, 4, 3))
    expect16 = ((v16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8).tobytes()
    got16 = decode_tiff(_tiff(4, 3, v16.astype("<u2").tobytes(), bits=16))
    assert got16 == (4, 3, expect16)


def test_bilevel_1bit():
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1]], dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    got = decode_tiff(_tiff(9, 1, packed, photo=1, spp=1, bits=1))
    expect = np.repeat((bits * 255).reshape(1, 9, 1), 3, axis=2).tobytes()
    assert got == (9, 1, expect)


def test_packbits_and_lzw_strips():
    rgb = _rand_rgb(5, 16, 10)
    raw = rgb.tobytes()
    row_bytes = 16 * 3
    # two strips of 5 rows each, each compression
    for comp, enc in ((32773, _packbits_enc), (5, _lzw_enc)):
        strips = [
            enc(raw[: 5 * row_bytes]),
            enc(raw[5 * row_bytes :]),
        ]
        payload = _tiff(16, 10, None, comp=comp, rows_per_strip=5, strips=strips)
        assert decode_tiff(payload) == (16, 10, raw), comp


def test_lzw_long_runs_exercise_width_growth():
    """>254 distinct sequences force 9->10->11 bit codes with the
    early-change discipline on both sides."""
    rng = np.random.RandomState(7)
    data = (rng.randint(0, 8, 6000) * 32).astype(np.uint8).tobytes()
    payload = _tiff(100, 20, None, comp=5, spp=3, strips=[_lzw_enc(data)])
    assert decode_tiff(payload) == (100, 20, data)


def _hdiff(arr):
    """Forward horizontal differencing (what a Predictor=2 encoder
    writes): first sample of each row kept, the rest deltas mod 2^bits."""
    d = arr.copy()
    d[:, 1:, :] = arr[:, 1:, :] - arr[:, :-1, :]
    return d


def test_predictor2_horizontal_differencing():
    """The common real-world LZW layout: Predictor=2 strips must be
    un-differenced after decompression (ADVICE r9: the repro row
    [0,30,60,90] previously decoded to [0,30,30,30])."""
    # the literal ADVICE repro: a gray row of deltas 0,30,30,30
    row = np.array([[[0], [30], [60], [90]]], dtype=np.uint8)
    p = _tiff(4, 1, _hdiff(row).tobytes(), photo=1, spp=1, predictor=2)
    assert decode_tiff(p) == (4, 1, np.repeat(row, 3, axis=2).tobytes())
    # RGB with LZW strips, values that wrap mod 256, multiple strips
    rgb = _rand_rgb(31, 9, 6)
    diffed = _hdiff(rgb)
    strips = [
        _lzw_enc(diffed[:3].tobytes()),
        _lzw_enc(diffed[3:].tobytes()),
    ]
    p = _tiff(9, 6, None, comp=5, strips=strips, rows_per_strip=3,
              predictor=2)
    assert decode_tiff(p) == (9, 6, rgb.tobytes())
    # 16-bit: differencing operates on 16-bit values BEFORE the 8-bit
    # exact-round scale
    g16 = np.random.RandomState(32).randint(0, 65536, (4, 7, 1))
    g16 = g16.astype(np.uint16)
    d16 = g16.copy()
    d16[:, 1:, :] = g16[:, 1:, :] - g16[:, :-1, :]
    p = _tiff(7, 4, d16.astype("<u2").tobytes(), photo=1, spp=1, bits=16,
              predictor=2)
    want = ((g16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert decode_tiff(p) == (7, 4, np.repeat(want, 3, axis=2).tobytes())
    # big-endian container: differencing reversed on the BE 16-bit values
    p = _tiff(7, 4, d16.astype(">u2").tobytes(), photo=1, spp=1, bits=16,
              predictor=2, bo=">")
    assert decode_tiff(p) == (7, 4, np.repeat(want, 3, axis=2).tobytes())
    # Predictor=1 is explicit none; 3 (float) and 2-on-bilevel are gated
    assert decode_tiff(_tiff(4, 1, row.tobytes(), photo=1, spp=1,
                             predictor=1)) is not None
    assert decode_tiff(_tiff(9, 6, rgb.tobytes(), predictor=3)) is None
    bil = _tiff(8, 1, b"\xaa", photo=1, spp=1, bits=1, predictor=2)
    assert decode_tiff(bil) is None


def test_codec_and_layout_gates():
    rgb = _rand_rgb(6, 4, 4)
    base = _tiff(4, 4, rgb.tobytes())
    assert decode_tiff(base) is not None
    jpeg_in_tiff = _tiff(4, 4, rgb.tobytes(), comp=7)  # JPEG compression
    assert decode_tiff(jpeg_in_tiff) is None
    assert decode_tiff(b"II\x2b\x00") is None  # BigTIFF magic
    assert decode_tiff(b"") is None
    assert decode_tiff(base[:40]) is None or decode_tiff(base[:40])[0] == 4


def test_real_world_tiff_pairs_with_bmp_sibling():
    """CPython ships the same Python logo as TIFF and BMP: real files
    from real encoders must decode to the same perceptual hash."""
    base = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data"
    t, b = f"{base}/python.tiff", f"{base}/python.bmp"
    if not (os.path.exists(t) and os.path.exists(b)):
        pytest.skip("interop fixtures not on this machine")
    tb = open(t, "rb").read()
    r = decode_tiff(tb)
    assert r is not None and (r[0], r[1]) == (16, 16)
    assert decode_image(tb) == r  # routed
    d = phash_bytes(tb) ^ phash_bytes(open(b, "rb").read())
    assert bin(d & ((1 << 64) - 1)).count("1") == 0


def test_tiff_adversarial_totality():
    rng = np.random.RandomState(88)
    base = _tiff(8, 6, _rand_rgb(9, 8, 6).tobytes())
    lzw = _tiff(8, 6, None, comp=5, strips=[_lzw_enc(_rand_rgb(9, 8, 6).tobytes())])
    pred = _tiff(8, 6, None, comp=5, predictor=2,
                 strips=[_lzw_enc(_hdiff(_rand_rgb(10, 8, 6)).tobytes())])
    import zlib

    rgbt = _rand_rgb(11, 8, 6)
    tiled = _tiff(8, 6, None, comp=8,
                  tiles=(8, 4, _tile_blocks(rgbt, 8, 4, zlib.compress)))
    planar = _tiff(8, 6, None, planar=2,
                   strips=[rgbt[:, :, c:c+1].tobytes() for c in range(3)])
    for b0 in (base, lzw, pred, tiled, planar):
        for _ in range(250):
            b = bytearray(b0)
            for _k in range(rng.randint(1, 6)):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            r = decode_tiff(bytes(b))
            assert r is None or len(r[2]) == r[0] * r[1] * 3
    for n in (0, 1, 4, 9, 30):
        assert decode_tiff(bytes(rng.randint(0, 256, n).astype("uint8"))) is None


def test_deflate_strips_and_bomb_cap():
    """Compression 8/32946 (Deflate) inflates with stdlib zlib, capped
    at exactly the bytes the image needs."""
    import zlib

    rgb = _rand_rgb(41, 9, 7)
    raw = rgb.tobytes()
    for comp in (8, 32946):
        p = _tiff(9, 7, None, comp=comp, strips=[zlib.compress(raw)])
        assert decode_tiff(p) == (9, 7, raw), comp
    # deflate + predictor 2 (the libtiff zip default pairing)
    p = _tiff(9, 7, None, comp=8, predictor=2,
              strips=[zlib.compress(_hdiff(rgb).tobytes())])
    assert decode_tiff(p) == (9, 7, raw)
    # two strips
    row_bytes = 9 * 3
    p = _tiff(9, 7, None, comp=8, rows_per_strip=4,
              strips=[zlib.compress(raw[: 4 * row_bytes]),
                      zlib.compress(raw[4 * row_bytes:])])
    assert decode_tiff(p) == (9, 7, raw)
    # a strip that inflates far past the image's needs is truncated at
    # the cap, not materialized: the first `need` bytes still win
    bomb = zlib.compress(raw + bytes(1 << 22))
    p = _tiff(9, 7, None, comp=8, strips=[bomb])
    assert decode_tiff(p) == (9, 7, raw)
    # garbage deflate stream -> honest None
    p = _tiff(9, 7, None, comp=8, strips=[b"\x00not-zlib"])
    assert decode_tiff(p) is None


def _tile_blocks(rgb, tw, tl, enc):
    """Split an image into padded (tl, tw) tiles, encode each."""
    h, w, ch = rgb.shape
    blocks = []
    for ty in range(-(-h // tl)):
        for tx in range(-(-w // tw)):
            tile = np.zeros((tl, tw, ch), rgb.dtype)
            ys, xs = ty * tl, tx * tw
            ye, xe = min(ys + tl, h), min(xs + tw, w)
            tile[: ye - ys, : xe - xs] = rgb[ys:ye, xs:xe]
            blocks.append(enc(tile.tobytes()))
    return blocks


def test_tiled_layout_all_compressions():
    """Tiled TIFF (tags 322-325): a 2x2 grid with edge padding must
    stitch back to the exact image under every supported codec, and
    Predictor=2 differencing restarts at each TILE row."""
    import zlib

    rgb = _rand_rgb(43, 20, 14)  # tiles 16x8 -> 2 across, 2 down, padded
    for comp, enc in (
        (1, lambda b: b),
        (32773, _packbits_enc),
        (5, _lzw_enc),
        (8, zlib.compress),
    ):
        p = _tiff(20, 14, None, comp=comp, tiles=(16, 8, _tile_blocks(rgb, 16, 8, enc)))
        assert decode_tiff(p) == (20, 14, rgb.tobytes()), comp
    # predictor 2: forward-difference each tile independently
    blocks = [
        _lzw_enc(b)
        for b in (
            _hdiff(np.frombuffer(blk, np.uint8).reshape(8, 16, 3)).tobytes()
            for blk in _tile_blocks(rgb, 16, 8, lambda b: b)
        )
    ]
    p = _tiff(20, 14, None, comp=5, predictor=2, tiles=(16, 8, blocks))
    assert decode_tiff(p) == (20, 14, rgb.tobytes())
    # 16-bit tiled gray
    g16 = np.random.RandomState(44).randint(0, 65536, (6, 10, 1)).astype("<u2")
    blocks = _tile_blocks(g16, 8, 4, lambda b: b)
    p = _tiff(10, 6, None, photo=1, spp=1, bits=16, tiles=(8, 4, blocks))
    want = ((g16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert decode_tiff(p) == (10, 6, np.repeat(want, 3, axis=2).tobytes())
    # gates: missing tile counts, tiled+planar, tiled bilevel
    assert decode_tiff(_tiff(20, 14, None, comp=1, planar=2,
                             tiles=(16, 8, _tile_blocks(rgb, 16, 8, lambda b: b)))) is None
    bil = np.packbits(np.ones((8, 16), np.uint8), axis=1).tobytes()
    assert decode_tiff(_tiff(16, 8, None, photo=1, spp=1, bits=1,
                             tiles=(16, 8, [bil]))) is None


def test_planar_configuration_2():
    """PlanarConfiguration=2: per-plane strip groups reassemble to the
    chunky image; Predictor=2 runs per plane row; 16-bit planes scale
    exactly."""
    import zlib

    rgb = _rand_rgb(45, 7, 6)
    planes = [rgb[:, :, c : c + 1].tobytes() for c in range(3)]
    # one strip per plane, uncompressed
    p = _tiff(7, 6, None, planar=2, strips=planes)
    assert decode_tiff(p) == (7, 6, rgb.tobytes())
    # two strips per plane + deflate + predictor
    prb = 7
    strips = []
    for c in range(3):
        d = _hdiff(rgb[:, :, c : c + 1])
        strips.append(zlib.compress(d[:4].tobytes()))
        strips.append(zlib.compress(d[4:].tobytes()))
    p = _tiff(7, 6, None, comp=8, planar=2, predictor=2, rows_per_strip=4,
              strips=strips)
    assert decode_tiff(p) == (7, 6, rgb.tobytes())
    # 16-bit planar gray+RGB
    v16 = np.random.RandomState(46).randint(0, 65536, (5, 4, 3)).astype("<u2")
    strips = [v16[:, :, c : c + 1].tobytes() for c in range(3)]
    p = _tiff(4, 5, None, planar=2, bits=16, strips=strips)
    want = ((v16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert decode_tiff(p) == (4, 5, want.tobytes())
    # short plane list: gated
    p = _tiff(7, 6, None, planar=2, strips=planes[:2])
    assert decode_tiff(p) is None
