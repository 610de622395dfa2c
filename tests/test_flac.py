"""FLAC decode — bit-exact round trips through an independent encoder.

FLAC is LOSSLESS, so unlike JPEG the cross-check is exact: a forward
encoder written from the format spec (RFC 9639) emits arbitrary PCM
through every subframe type (constant / verbatim / fixed 0-4 /
LPC), every channel assignment (independent, left/side, right/side,
mid/side), wasted bits, and partitioned Rice residuals with the
escape-to-raw code — and decode_flac must return the source samples
bit for bit. No FLAC files ship with this machine's system packages,
so encoder round-trip plus hostile-bytes totality is the evidence
(both sides written from the spec; transcription errors on either
side break exact equality).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.flac import _FIXED_COEFS, _crc8, decode_flac
from travel_data_ingestion_spark.llm.multimodal import decode_audio


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def put_signed(self, v: int, n: int):
        self.put(v & ((1 << n) - 1), n)

    def unary(self, q: int):
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _rice(bw: _BitW, resid, k: int, escape_raw: int | None = None):
    """Rice-code a residual partition; escape_raw forces the raw-bits
    escape with that width instead."""
    if escape_raw is not None:
        bw.put((1 << 4) - 1, 4)
        bw.put(escape_raw, 5)
        for v in resid:
            bw.put_signed(int(v), escape_raw)
        return
    bw.put(k, 4)
    for v in resid:
        v = int(v)
        zz = (abs(v) << 1) - 1 if v < 0 else (v << 1)
        bw.unary(zz >> k)
        if k:
            bw.put(zz & ((1 << k) - 1), k)


def _residual(bw: _BitW, resid, porder: int, blocksize: int, order: int, k: int,
              escape_raw=None):
    bw.put(0, 2)  # method 0: 4-bit rice
    bw.put(porder, 4)
    nparts = 1 << porder
    at = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        _rice(bw, resid[at : at + count], k, escape_raw)
        at += count


def _subframe(bw: _BitW, x, bits: int, kind: str, wasted: int = 0, k: int = 3,
              porder: int = 0, lpc=None, escape_raw=None):
    """Encode one subframe of samples x (already including any wasted-
    bits shift — we emit x >> wasted and declare the shift)."""
    bw.put(0, 1)  # padding
    blocksize = len(x)
    xs = np.asarray(x, dtype=np.int64) >> wasted
    eff = bits - wasted
    if kind == "constant":
        bw.put(0, 6)
    elif kind == "verbatim":
        bw.put(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.put(8 + order, 6)
    elif kind == "lpc":
        order = len(lpc[0])
        bw.put(32 + order - 1, 6)
    if wasted:
        bw.put(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.put(0, 1)
    if kind == "constant":
        bw.put_signed(int(xs[0]), eff)
        return
    if kind == "verbatim":
        for v in xs:
            bw.put_signed(int(v), eff)
        return
    if kind.startswith("fixed"):
        order = int(kind[-1])
        coefs = _FIXED_COEFS[order]
        for v in xs[:order]:
            bw.put_signed(int(v), eff)
        resid = [
            int(xs[i]) - sum(c * int(xs[i - 1 - j]) for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _residual(bw, resid, porder, blocksize, order, k, escape_raw)
        return
    coefs, prec, shift = lpc
    order = len(coefs)
    for v in xs[:order]:
        bw.put_signed(int(v), eff)
    bw.put(prec - 1, 4)
    bw.put_signed(shift, 5)
    for c in coefs:
        bw.put_signed(int(c), prec)
    resid = [
        int(xs[i]) - (sum(int(coefs[j]) * int(xs[i - 1 - j]) for j in range(order)) >> shift)
        for i in range(order, blocksize)
    ]
    _residual(bw, resid, porder, blocksize, order, k, escape_raw)


def _flac(channels, rate=8000, bits=16, mode="indep", blocksize=None, **sub_kw):
    """Encode (n_frames, n_ch) int samples as one-frame native FLAC."""
    x = np.asarray(channels, dtype=np.int64)
    n_frames, n_ch = x.shape
    blocksize = blocksize or n_frames
    # STREAMINFO
    si = _BitW()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(n_ch - 1, 3)
    si.put(bits - 1, 5)
    si.put(n_frames, 36)
    si.out += bytes(16)  # md5 (unchecked)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si.out).to_bytes(3, "big") + si.out
    # frame header: blocksize code 7 (16-bit blocksize-1), rate from
    # streaminfo, utf8 frame number 0
    ch_code = {"indep": n_ch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    hdr = _BitW()
    hdr.put(0x3FFE, 14)
    hdr.put(0, 1)
    hdr.put(0, 1)
    hdr.put(7, 4)  # 16-bit blocksize follows
    hdr.put(0, 4)  # rate: streaminfo
    hdr.put(ch_code, 4)
    hdr.put(0, 3)  # size: streaminfo
    hdr.put(0, 1)
    hdr.put(0, 8)  # frame number 0
    hdr.put(blocksize - 1, 16)
    hdr.align()
    hdr_bytes = bytes(hdr.out)
    frame = bytearray(hdr_bytes + bytes([_crc8(hdr_bytes)]))
    bw = _BitW()
    if mode == "indep":
        subs = [(x[:, c], bits) for c in range(n_ch)]
    elif mode == "left_side":
        subs = [(x[:, 0], bits), (x[:, 0] - x[:, 1], bits + 1)]
    elif mode == "right_side":
        subs = [(x[:, 0] - x[:, 1], bits + 1), (x[:, 1], bits)]
    else:
        mid = (x[:, 0] + x[:, 1]) >> 1
        side = x[:, 0] - x[:, 1]
        subs = [(mid, bits), (side, bits + 1)]
    for xs, sbits in subs:
        _subframe(bw, xs, sbits, **sub_kw)
    bw.align()
    frame += bw.out + b"\x00\x00"  # CRC-16 unverified by the decoder
    out += frame
    return bytes(out)


def _rand(seed, n_frames, n_ch, bits):
    r = np.random.RandomState(seed)
    lim = 1 << (bits - 1)
    return r.randint(-lim, lim, (n_frames, n_ch)).astype(np.int64)


def _smoothish(seed, n_frames, n_ch, bits):
    """Correlated signal so fixed/LPC residuals stay small enough for
    unary coding with small k."""
    r = np.random.RandomState(seed)
    steps = r.randint(-40, 41, (n_frames, n_ch))
    x = np.cumsum(steps, axis=0)
    lim = (1 << (bits - 1)) - 1
    return np.clip(x, -lim, lim).astype(np.int64)


def test_verbatim_and_constant_roundtrip():
    x = _rand(1, 96, 2, 16)
    got = decode_flac(_flac(x, kind="verbatim"))
    assert got is not None and got[0] == 8000 and got[1] == 2
    assert np.array_equal(got[3], x)
    const = np.full((64, 1), -1234, dtype=np.int64)
    got = decode_flac(_flac(const, kind="constant"))
    assert np.array_equal(got[3], const)


def test_fixed_orders_roundtrip():
    for order in range(5):
        x = _smoothish(order + 2, 128, 2, 16)
        got = decode_flac(_flac(x, kind=f"fixed{order}", k=6))
        assert got is not None and np.array_equal(got[3], x), order


def test_lpc_roundtrip():
    """Arbitrary (valid) LPC coefficients: the decoder must invert the
    exact integer prediction whatever the encoder picked."""
    x = _smoothish(9, 160, 1, 16)
    for coefs, prec, shift in [
        ([1850, -920], 12, 11),  # near-2nd-order-smooth predictor
        ([205, -96, 14], 9, 8),
        ([1 << 10], 12, 10),
        (list(range(1, 9)), 6, 5),  # order 8
    ]:
        payload = _flac(x, kind="lpc", lpc=(coefs, prec, shift), k=7)
        got = decode_flac(payload)
        assert got is not None and np.array_equal(got[3], x), coefs


def test_channel_decorrelation_modes():
    x = _smoothish(4, 128, 2, 16)
    for mode in ("indep", "left_side", "right_side", "mid_side"):
        got = decode_flac(_flac(x, mode=mode, kind="fixed2", k=6))
        assert got is not None and np.array_equal(got[3], x), mode


def test_rice_partitions_and_escape():
    x = _smoothish(5, 256, 1, 16)
    for porder in (0, 1, 2, 3):
        got = decode_flac(_flac(x, kind="fixed1", k=6, porder=porder))
        assert got is not None and np.array_equal(got[3], x), porder
    # escape-to-raw partitions (17-bit raw residuals)
    got = decode_flac(_flac(x, kind="fixed0", porder=1, escape_raw=17))
    assert got is not None and np.array_equal(got[3], x)


def test_wasted_bits():
    x = (_smoothish(6, 96, 1, 16) >> 3) << 3  # 3 trailing zero bits
    got = decode_flac(_flac(x, kind="verbatim", wasted=3))
    assert got is not None and np.array_equal(got[3], x)


def test_bit_depths():
    for bits in (8, 12, 16, 20, 24):
        x = _rand(bits, 64, 2, bits)
        got = decode_flac(_flac(x, bits=bits, kind="verbatim"))
        assert got is not None and np.array_equal(got[3], x), bits


def test_decode_audio_routes_flac():
    """decode_audio normalizes FLAC to the same float contract as
    WAV/AIFF/AU — and the SAME samples through FLAC and WAV containers
    decode to identical floats."""
    x = _smoothish(8, 200, 2, 16)
    flac_payload = _flac(x, rate=11025, kind="fixed2", k=6)
    via_flac = decode_audio(flac_payload)
    assert via_flac is not None and via_flac[0] == 11025 and via_flac[1] == 2
    data = b"".join(
        struct.pack("<hh", int(a), int(b_)) for a, b_ in x.tolist()
    )
    fmt = struct.pack("<HHIIHH", 1, 2, 11025, 11025 * 4, 4, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    via_wav = decode_audio(wav)
    assert np.array_equal(via_flac[2], via_wav[2])


def test_audio_phash_flac_equals_wav():
    from travel_data_ingestion_spark.llm.multimodal import audio_phash_bytes

    x = _smoothish(12, 6600, 1, 16)
    flac_payload = _flac(x, rate=8000, kind="fixed2", k=6)
    data = b"".join(struct.pack("<h", int(v)) for v in x[:, 0].tolist())
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert audio_phash_bytes(flac_payload) == audio_phash_bytes(wav)


def test_malformed_and_hostile_bytes():
    x = _smoothish(3, 96, 1, 16)
    base = _flac(x, kind="fixed1", k=6)
    assert decode_flac(base) is not None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(b"OggS....") is None
    assert decode_flac(base[:30]) is None  # truncated streaminfo/frame
    # corrupt the frame-header CRC byte: decode must refuse, not desync
    hdr_at = base.index(b"\xff\xf8", 4)
    bad = bytearray(base)
    # find crc byte: header is sync(2)+codes(2)+framenum(1)+bs16(2)=7 bytes
    bad[hdr_at + 7] ^= 0xFF
    assert decode_flac(bytes(bad)) is None
    rng = np.random.RandomState(31)
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randint(1, 6)):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        r = decode_flac(bytes(b))
        assert r is None or (r[3].ndim == 2 and r[3].shape[1] == r[1])
