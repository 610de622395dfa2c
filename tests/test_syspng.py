"""SYSTEM-libpng conformance for the package PNG decoder (round-12
watch item 1: the PNG evidence loop was in-repo-dual — independent
forward filter/packer cross-check — with the installed libpng unused).

PNG is lossless, so the bar is PIXEL equality: a libpng-encoded
stream (libpng's own filter heuristics, interlace serialization, zlib
parameters — bytes the package never produced) must decode to exactly
the source samples mapped through the package's documented
normalization. The pinned vectors run lane-default without any
toolchain; the live matrix (every legal color-type/depth/interlace
combination, forced filter strategies, odd geometries) skips when
gcc/png.h/libpng are absent. The cross-decode direction feeds 8-bit
non-alpha images through libpng's simplified read API and requires
byte-identical RGB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from syspng_shim import (
    GA,
    GRAY,
    PALETTE,
    RGB,
    RGBA,
    build_shim,
    expected_rgb,
    sys_decode_png_rgb,
    sys_encode_png,
)
from syspng_vectors import VECTORS
from travel_data_ingestion_spark.llm.multimodal import decode_png

needs_syspng = pytest.mark.skipif(
    build_shim() is None, reason="gcc/png.h/libpng not available"
)


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_pinned_libpng_streams_decode_exact(name):
    payload, w, h, want = VECTORS[name]
    got = decode_png(payload)
    assert got is not None, name
    gw, gh, rgb = got
    assert (gw, gh) == (w, h)
    assert hashlib.sha256(rgb).hexdigest() == want, name


_MATRIX = [
    (color, depth, interlace)
    for color, depths in ((GRAY, (1, 2, 4, 8, 16)), (RGB, (8, 16)),
                          (GA, (8, 16)), (RGBA, (8, 16)),
                          (PALETTE, (1, 2, 4, 8)))
    for depth in depths
    for interlace in (0, 1)
]


@needs_syspng
@pytest.mark.parametrize("color,depth,interlace", _MATRIX)
def test_live_libpng_matrix_decodes_exact(color, depth, interlace):
    rng = np.random.default_rng(color * 100 + depth * 10 + interlace)
    for h, w in ((13, 21), (1, 1), (9, 2)):
        mx = (1 << depth) - 1
        if color == PALETTE:
            pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
            samples = rng.integers(0, mx + 1, (h, w), dtype=np.uint8)
        else:
            pal = None
            ch = {GRAY: None, RGB: 3, GA: 2, RGBA: 4}[color]
            shape = (h, w) if ch is None else (h, w, ch)
            dt = np.uint16 if depth == 16 else np.uint8
            samples = rng.integers(0, mx + 1, shape).astype(dt)
        payload = sys_encode_png(samples, color, depth, interlace, pal)
        assert payload is not None, (color, depth, interlace, h, w)
        got = decode_png(payload)
        assert got is not None, (color, depth, interlace, h, w)
        gw, gh, rgb = got
        arr = np.frombuffer(rgb, dtype=np.uint8).reshape(gh, gw, 3)
        assert np.array_equal(arr, expected_rgb(samples, color, depth, pal))


@needs_syspng
@pytest.mark.parametrize("filters", [0x08, 0x10, 0x20, 0x40, 0x80, 0xF8])
def test_live_forced_filter_strategies(filters):
    # smooth content exercises each filter type productively
    y, x = np.mgrid[0:24, 0:31]
    img = np.stack([(x * 7 + y * 3) % 256, (x * x // 4 + y) % 256,
                    (255 - x * 5) % 256], axis=-1).astype(np.uint8)
    payload = sys_encode_png(img, RGB, 8, 0, filters=filters)
    assert payload is not None
    got = decode_png(payload)
    assert got is not None
    gw, gh, rgb = got
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(gh, gw, 3)
    assert np.array_equal(arr, img)


@needs_syspng
def test_cross_decode_byte_identical_rgb8():
    # both decoders read the same 8-bit RGB stream: RGB bytes must be
    # IDENTICAL (no conversion latitude exists for this type)
    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    for interlace in (0, 1):
        payload = sys_encode_png(img, RGB, 8, interlace)
        ref = sys_decode_png_rgb(payload)
        assert ref is not None
        w, h, sysrgb = ref
        got = decode_png(payload)
        gw, gh, rgb = got
        arr = np.frombuffer(rgb, dtype=np.uint8).reshape(gh, gw, 3)
        assert (gw, gh) == (w, h)
        assert np.array_equal(arr, sysrgb)
