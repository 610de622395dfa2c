"""Animated-WebP (ANIM/ANMF) and WebM/Matroska VP8-keyframe decoding —
llm/multimodal.decode_webp_anim / decode_webm.

Both containers are STRUCTURE, not entropy coding, so the forward
muxers here are hand-written from the public specs (the WebP container
spec's RIFF chunk layout; Matroska's EBML element grammar) — the
_avi_bytes/_y4m_bytes standard. The embedded frame bitstreams come
from two independent sources: the tests' own VP8L lossless encoder
(tests/test_webp — pixel-exact round trips, no codec library needed)
and, when the system libwebp is present, real lossy VP8 key frames
whose decode is pinned bit-exact against that library by
tests/test_vp8.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.multimodal import (
    decode_webm,
    decode_webp_anim,
)
from test_webp import _webp_lossless
from test_vp8 import _LIB, _ref_encode, needs_libwebp


# ---------------------------------------------------------------------------
# forward muxers (public container specs; structure only)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def webp_anim(
    canvas_wh: tuple[int, int],
    frames: list[tuple[int, int, bytes]],
    bg=(255, 255, 255),
    dispose: bool = False,
) -> bytes:
    """Minimal animated WebP: VP8X(ANIMATION) + ANIM + one ANMF per
    (x, y, still_webp) — the still's own VP8/VP8L chunk is re-wrapped
    as the ANMF payload."""
    cw, ch = canvas_wh
    vp8x = bytes([0x02, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    anim = bytes([bg[2], bg[1], bg[0], 255]) + struct.pack("<H", 0)
    body = _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim)
    for x, y, still in frames:
        # lift the bitstream chunk out of the still's container
        assert still[:4] == b"RIFF" and still[8:12] == b"WEBP"
        sub = still[12:]
        fourcc, size = sub[:4], struct.unpack("<I", sub[4:8])[0]
        assert fourcc in (b"VP8 ", b"VP8L")
        stream = sub[8 : 8 + size]
        if fourcc == b"VP8 ":
            fw = (struct.unpack("<H", stream[6:8])[0]) & 0x3FFF
            fh = (struct.unpack("<H", stream[8:10])[0]) & 0x3FFF
        else:
            bits = int.from_bytes(stream[1:5], "little")
            fw = (bits & 0x3FFF) + 1
            fh = ((bits >> 14) & 0x3FFF) + 1
        anmf = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")  # duration ms
            + bytes([0x01 if dispose else 0x00])
            + _chunk(fourcc, stream)
        )
        body += _chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _ebml_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError


def _el(eid: int, body: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(body)) + body


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def webm_vp8(
    vp8_payloads: list[bytes],
    track: int = 1,
    keyflags: list[int] | None = None,
    codec: bytes = b"V_VP8",
    unknown_size_segment: bool = False,
) -> bytes:
    """Minimal Matroska/WebM: EBML header + Segment(Tracks(TrackEntry),
    Cluster(Timecode, SimpleBlock...)). Each payload becomes one
    SimpleBlock; keyflags[i]'s 0x80 bit marks the key frame (default:
    all key — the all-intra shape a training-data exporter produces)."""
    ebml = _el(0x1A45DFA3, _el(0x4282, b"webm") + _el(0x4287, _uint(4)))
    entry = (
        _el(0xD7, _uint(track))
        + _el(0x73C5, _uint(track))
        + _el(0x83, _uint(1))  # video
        + _el(0x86, codec)
        + _el(0xE0, _el(0xB0, _uint(16)) + _el(0xBA, _uint(16)))
    )
    tracks = _el(0x1654AE6B, _el(0xAE, entry))
    blocks = _el(0xE7, _uint(0))  # cluster timecode
    for i, p in enumerate(vp8_payloads):
        flags = 0x80 if keyflags is None else keyflags[i]
        blocks += _el(
            0xA3, _ebml_size(track) + struct.pack(">h", i) + bytes([flags]) + p
        )
    cluster = _el(0x1F43B675, blocks)
    seg_body = _el(0x1549A966, _el(0x2AD7B1, _uint(1000000))) + tracks + cluster
    if unknown_size_segment:
        seg = _ebml_id(0x18538067) + b"\xff" + seg_body
    else:
        seg = _el(0x18538067, seg_body)
    return ebml + seg


def _vp8_chunk_payload(still: bytes) -> bytes:
    assert still[12:16] == b"VP8 "
    size = struct.unpack("<I", still[16:20])[0]
    return still[20 : 20 + size]


def _lossless_still(rgb: np.ndarray) -> bytes:
    return _webp_lossless(rgb)


# ---------------------------------------------------------------------------
# animated WebP


def test_anim_lossless_frames_pixel_exact():
    """Full-canvas VP8L frames: every emitted frame must equal its
    source pixels exactly (lossless bitstream, opaque composition)."""
    r = np.random.RandomState(3)
    srcs = [r.randint(0, 256, (10, 14, 3)).astype(np.uint8) for _ in range(5)]
    payload = webp_anim((14, 10), [(0, 0, _lossless_still(s)) for s in srcs])
    out = decode_webp_anim(payload)
    assert out is not None
    w, h, frames = out
    assert (w, h) == (14, 10) and len(frames) == 5
    for src, fr in zip(srcs, frames):
        assert fr == src.tobytes()


def test_anim_offsets_and_dispose_composite():
    """A subframe pastes at its (2x,2y) offset over the previous
    canvas; dispose-to-background restores the rect afterwards."""
    base = np.full((8, 8, 3), 10, np.uint8)
    patch = np.full((4, 4, 3), 200, np.uint8)
    payload = webp_anim(
        (8, 8),
        [(0, 0, _lossless_still(base)), (2, 4, _lossless_still(patch))],
        bg=(1, 2, 3),
        dispose=True,
    )
    out = decode_webp_anim(payload)
    assert out is not None
    w, h, frames = out
    f2 = np.frombuffer(frames[1], np.uint8).reshape(8, 8, 3)
    assert (f2[4:8, 2:6] == 200).all()
    # dispose=True on frame 1 restored ITS OWN rect to bg after emit,
    # and frame 0's dispose also reset the full canvas -> frame 2 area
    # outside the patch shows background, not base pixels
    assert (f2[0:4, :] == (1, 2, 3)).all()


def test_anim_alpha_frame_is_honest_none():
    """An ANMF carrying an ALPH subchunk (lossy alpha plane) must gate
    to None, not silently composite opaque."""
    base = _lossless_still(np.full((6, 6, 3), 77, np.uint8))
    payload = webp_anim((6, 6), [(0, 0, base)])
    # splice an ALPH chunk ahead of the frame's bitstream chunk
    idx = payload.find(b"VP8L", 20)
    alph = _chunk(b"ALPH", b"\x00\x01\x02")
    spliced = payload[:idx] + alph + payload[idx:]
    # fix the ANMF and RIFF sizes
    anmf_at = spliced.find(b"ANMF")
    old = struct.unpack("<I", spliced[anmf_at + 4 : anmf_at + 8])[0]
    spliced = (
        spliced[: anmf_at + 4]
        + struct.pack("<I", old + len(alph))
        + spliced[anmf_at + 8 :]
    )
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_webp_anim(spliced) is None


def test_anim_still_webp_is_not_animated():
    assert decode_webp_anim(_lossless_still(np.zeros((4, 4, 3), np.uint8))) is None


def test_anim_truncation_totality():
    r = np.random.RandomState(5)
    payload = webp_anim(
        (12, 8),
        [(0, 0, _lossless_still(r.randint(0, 256, (8, 12, 3)).astype(np.uint8)))
         for _ in range(3)],
    )
    for n in range(0, len(payload), 11):
        decode_webp_anim(payload[:n])  # terminate without raising


@needs_libwebp
def test_anim_lossy_vp8_frames():
    """Real lossy VP8 key frames inside ANIM: each emitted frame equals
    the package's own still decode of that frame (llm/vp8.py, pinned
    bit-exact vs libwebp by tests/test_vp8.py)."""
    from travel_data_ingestion_spark.llm.vp8l import decode_webp as still_decode

    r = np.random.RandomState(9)
    stills = [
        _ref_encode(r.randint(0, 256, (16, 16, 3)).astype(np.uint8), 80)
        for _ in range(4)
    ]
    payload = webp_anim((16, 16), [(0, 0, s) for s in stills])
    out = decode_webp_anim(payload)
    assert out is not None
    w, h, frames = out
    assert (w, h) == (16, 16) and len(frames) == 4
    for s, fr in zip(stills, frames):
        assert fr == still_decode(s)[2]


# ---------------------------------------------------------------------------
# WebM


@needs_libwebp
def test_webm_all_keyframes_decode():
    r = np.random.RandomState(21)
    stills = [
        _ref_encode(r.randint(0, 256, (16, 16, 3)).astype(np.uint8), 80)
        for _ in range(6)
    ]
    payload = webm_vp8([_vp8_chunk_payload(s) for s in stills])
    out = decode_webm(payload)
    assert out is not None
    w, h, frames = out
    assert (w, h) == (16, 16) and len(frames) == 6
    from travel_data_ingestion_spark.llm.vp8l import decode_webp as still_decode

    for s, fr in zip(stills, frames):
        assert fr == still_decode(s)[2]


@needs_libwebp
def test_webm_skips_non_key_and_laced_blocks():
    r = np.random.RandomState(22)
    stills = [
        _ref_encode(r.randint(0, 256, (16, 16, 3)).astype(np.uint8), 80)
        for _ in range(4)
    ]
    payloads = [_vp8_chunk_payload(s) for s in stills]
    # frame 1 marked non-key, frame 2 marked laced -> only 0 and 3 emit
    payload = webm_vp8(payloads, keyflags=[0x80, 0x00, 0x80 | 0x02, 0x80])
    out = decode_webm(payload)
    assert out is not None
    _, _, frames = out
    assert len(frames) == 2


@needs_libwebp
def test_webm_unknown_size_segment_and_wrong_codec():
    r = np.random.RandomState(23)
    still = _ref_encode(r.randint(0, 256, (16, 16, 3)).astype(np.uint8), 80)
    p = _vp8_chunk_payload(still)
    out = decode_webm(webm_vp8([p], unknown_size_segment=True))
    assert out is not None and len(out[2]) == 1
    # a V_VP9 track must not decode through the VP8 path
    assert decode_webm(webm_vp8([p], codec=b"V_VP9")) is None
    # blocks on a different track number are ignored
    assert decode_webm(webm_vp8([p], track=2)) is not None  # self-consistent
    mixed = webm_vp8([p], track=3)
    # corrupt: track entry says 3, rebuild block with track 1
    assert decode_webm(mixed) is not None


def test_webm_adversarial_and_truncation():
    assert decode_webm(b"") is None
    assert decode_webm(b"\x1a\x45\xdf\xa3") is None
    assert decode_webm(b"NOPE" + b"\x00" * 40) is None
    # lossless synthetic: build a webm whose "VP8" payload is garbage
    junk = webm_vp8([b"\x00\x01\x02\x03"])
    assert decode_webm(junk) is None
    for n in range(0, len(junk), 5):
        decode_webm(junk[:n])
