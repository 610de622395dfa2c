"""SYSTEM-libjpeg conformance for the package JPEG decoder — the
third-party anchor closing round-12 watch item 1.

The QM-coder bug class (r11's Table D.3 column swap, r13's interval-
placement inversion found BY this battery) shares one signature: an
in-repo encoder/decoder pair agrees with itself while real-world
streams decode to garbage. The only defense is an oracle the repo
didn't write: here the installed libjpeg, via two public-API C shims
(tests/sysjpeg_shim.py) compiled against the system headers.

Comparison surface: RAW DCT COEFFICIENTS (jpeg_read_coefficients).
Two correct entropy decoders must agree on every coefficient bit;
pixels may legally differ by IDCT/upsampling rounding (T.81 gives
decoders numerical latitude there), so coefficient equality is both
exact and the right claim.

Lanes: the pinned vectors (tests/sysjpeg_vectors.py — streams encoded
by the system libjpeg, expectations hashed from ITS decoder) run in
the default lane with no toolchain; the live battery (encode fresh
streams through the system encoder in all four entropy modes, both
directions) skips when gcc/headers/library are absent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sysjpeg_shim import (
    build_shims,
    coefs_match,
    repo_decode_coefs,
    sys_decode_coefs,
    sys_decode_pixels,
    sys_encode,
)
from sysjpeg_vectors import VECTORS

needs_sysjpeg = pytest.mark.skipif(
    build_shims() is None, reason="gcc/jpeglib.h/libjpeg not available"
)


# ---------------------------------------------------------------------------
# pinned vectors: default lane, no toolchain required


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_pinned_system_streams_decode_coefficient_exact(name):
    payload, comps = VECTORS[name]
    rep = repo_decode_coefs(payload)
    assert rep is not None, f"{name}: package decoder rejected the stream"
    assert len(rep) == len(comps)
    for (hb, wb, want), got in zip(comps, rep):
        assert got.shape[0] >= hb and got.shape[1] >= wb, name
        digest = hashlib.sha256(
            np.ascontiguousarray(got[:hb, :wb].astype(np.int16)).tobytes()
        ).hexdigest()
        assert digest == want, f"{name}: coefficient mismatch vs libjpeg"


def test_pinned_streams_also_decode_to_pixels(name=None):
    # the full pipeline (dequant + IDCT + upsample) stays total on
    # every pinned stream and returns the advertised geometry
    from travel_data_ingestion_spark.llm.jpeg import decode_jpeg

    for name, (payload, _comps) in sorted(VECTORS.items()):
        got = decode_jpeg(payload)
        assert got is not None, name
        w, h, rgb = got
        assert len(rgb) == w * h * 3


# ---------------------------------------------------------------------------
# live battery: system encoder -> package decoder (all four modes)


def _photo(w, h, seed, gray=False):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (120 + 60 * np.sin(x / 5.3 + seed) + 45 * np.cos(y / 4.1 - seed)
            + rng.normal(0, 14, (h, w)))
    if gray:
        return np.clip(base, 0, 255).astype(np.uint8)
    rgb = np.stack(
        [base, np.roll(base, 3, axis=1) * 0.9 + 20, 255 - base * 0.7], axis=-1
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


@needs_sysjpeg
@pytest.mark.parametrize("mode", ["b", "p", "a", "P"])
def test_live_system_encodes_decode_coefficient_exact(mode):
    for seed, (w, h, q, gray, restart) in enumerate(
        [
            (40, 32, 85, False, 0),
            (33, 25, 60, False, 0),   # odd dims: partial MCUs
            (24, 24, 95, True, 0),    # grayscale
            (48, 32, 75, False, 3),   # restart markers
        ]
    ):
        img = _photo(w, h, seed + 10, gray=gray)
        payload = sys_encode(img, q, mode, restart)
        assert payload is not None
        assert coefs_match(payload) is True, (mode, seed)


@needs_sysjpeg
def test_live_noise_stress_all_modes():
    # noise maximizes entropy-coder state churn (every context visited)
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    for mode in "bpaP":
        payload = sys_encode(img, 92, mode)
        assert payload is not None
        assert coefs_match(payload) is True, mode


# ---------------------------------------------------------------------------
# live battery: package arithmetic encoder -> system decoder
# (the direction that catches a self-consistent in-repo coder pair)


@needs_sysjpeg
def test_repo_arith_encodes_decode_in_system_libjpeg():
    from test_jpeg_arith import encode_jpeg_arith, encode_jpeg_arith_progressive

    img = _photo(32, 24, 7)
    noise = np.random.default_rng(8).integers(0, 256, (24, 33, 3),
                                              dtype=np.uint8)
    for arr in (img, noise):
        for enc in (encode_jpeg_arith, encode_jpeg_arith_progressive):
            payload = enc(arr)
            ref = sys_decode_coefs(payload)
            assert ref is not None, "system libjpeg rejected the repo stream"
            rep = repo_decode_coefs(payload)
            for (hb, wb, rb), rp in zip(ref, rep):
                assert np.array_equal(rp[:hb, :wb], rb)
            # pixel-level: only IDCT-rounding apart from the system render
            pix = sys_decode_pixels(payload)
            assert pix is not None
            from travel_data_ingestion_spark.llm.jpeg import decode_jpeg

            w, h, rgb = decode_jpeg(payload)
            got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, -1)
            assert got.shape == pix[3].shape
            assert np.abs(got.astype(int) - pix[3].astype(int)).max() <= 3


@needs_sysjpeg
def test_mini_stream_fuzz_matches_system_decoder():
    # raw entropy-byte fuzz over a 1-block frame: every byte pattern
    # must drive the package QM decoder to the system decoder's exact
    # coefficients (this is the harness that caught the interval
    # inversion live)
    def mini_jpeg(ent):
        dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
        sof = (b"\xff\xc9" + (11).to_bytes(2, "big") + b"\x08"
               + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + b"\x01" + b"\x01\x11\x00")
        sos = (b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + b"\x01\x00"
               + b"\x00\x3f\x00")
        return b"\xff\xd8" + dqt + sof + sos + ent + b"\xff\xd9"

    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(2, 20))
        raw = bytes(int(x) for x in rng.integers(0, 256, size=n))
        ent = raw.replace(b"\xff", b"\xff\x00")  # keep in-segment
        payload = mini_jpeg(ent)
        ref = sys_decode_coefs(payload)
        rep = repo_decode_coefs(payload)
        if ref is None:
            assert rep is None or True  # system rejected: nothing to pin
            continue
        assert rep is not None
        hb, wb, rb = ref[0]
        assert np.array_equal(rep[0][:hb, :wb], rb), ent.hex()
