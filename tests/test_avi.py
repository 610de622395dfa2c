"""AVI video container decode (MJPEG and uncompressed DIB streams).

decode_avi parses the RIFF/LIST structure (hdrl/avih/strl/strh/strf,
movi frame chunks) and decodes what this environment honestly can:
MJPEG frames through the in-repo JPEG decoder, raw bottom-up BGR DIB
frames directly. Codec streams (H.264 etc.) return None. The forward
AVI writer here is independent; MJPEG frames come from the independent
T.81 encoder in test_jpeg, so the whole chain (container walk -> JPEG
entropy decode -> frame sampling -> pHash) is cross-checked.
"""

from __future__ import annotations

import struct

import numpy as np

from test_jpeg import _smooth, encode_jpeg

from travel_data_ingestion_spark.llm.multimodal import (
    decode_avi,
    phash_bytes,
    sample_frames,
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _avi(frames: list[bytes], w: int, h: int, compression: bytes,
         handler: bytes = b"MJPG", bits: int = 24) -> bytes:
    avih = struct.pack(
        "<IIIIIIIIII", 33333, 0, 0, 0, len(frames), 0, 1, 0, w, h
    ) + bytes(16)
    strh = b"vids" + handler + bytes(48)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bits, compression, 0, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _dib_frame(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        line = rgb[y, :, ::-1].astype(np.uint8).tobytes()
        rows.append(line + bytes(stride - len(line)))
    return b"".join(rows)


def test_mjpeg_avi_decodes_every_frame():
    imgs = [_smooth(24, 16, s) for s in range(5)]
    payload = _avi([encode_jpeg(i, quality=95) for i in imgs], 24, 16, b"MJPG")
    got = decode_avi(payload)
    assert got is not None and (got[0], got[1]) == (24, 16)
    assert len(got[2]) == 5
    for frame_rgb, img in zip(got[2], imgs):
        dec = np.frombuffer(frame_rgb, np.uint8).reshape(16, 24, 3).astype(int)
        assert np.abs(dec - img.astype(int)).max() <= 12  # q95 bound


def test_dib_avi_is_bit_exact():
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (9, 7, 3)).astype(np.uint8) for _ in range(3)]
    payload = _avi(
        [_dib_frame(i) for i in imgs], 7, 9, b"\x00\x00\x00\x00", handler=b"DIB "
    )
    got = decode_avi(payload)
    assert got is not None and (got[0], got[1]) == (7, 9)
    assert [f for f in got[2]] == [i.tobytes() for i in imgs]


def test_codec_streams_honestly_gated():
    img = _smooth(16, 16, 1)
    h264ish = _avi([b"\x00\x00\x01\x67fake-nal"], 16, 16, b"H264", handler=b"H264")
    assert decode_avi(h264ish) is None
    assert decode_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert decode_avi(b"") is None
    good = _avi([encode_jpeg(img)], 16, 16, b"MJPG")
    assert decode_avi(good) is not None
    assert decode_avi(good[:60]) is None  # truncated before any frame


def test_sample_frames_treats_avi_like_gif(spark):
    """Every-Nth REAL frame sampling from a video container: sampled
    frames re-enter the still pipeline, so a video frame pairs with the
    same image shipped as a still — cross-modality near-dup by frame."""
    imgs = [_smooth(24, 16, s) for s in range(7)]
    jpegs = [encode_jpeg(i, quality=95) for i in imgs]
    payload = _avi(jpegs, 24, 16, b"MJPG")
    # the same JPEG shipped as a still: its decode equals frame 3's
    # pixels exactly, so the pHash pair is hamming 0, not "close"
    still = jpegs[3]
    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(still)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = sample_frames(media, every_n=3).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_index for r in by_id[1]) == [0, 3, 6]
    assert [r.frame_index for r in by_id[2]] == [0]
    assert 3 not in by_id
    # frame 3 of the video pairs with the SAME image shipped as a still
    frame3 = next(bytes(r.payload) for r in by_id[1] if r.frame_index == 3)
    d = bin((phash_bytes(frame3) ^ phash_bytes(still)) & ((1 << 64) - 1)).count("1")
    assert d == 0


def test_avi_frame_count_bomb_bounded(monkeypatch):
    import travel_data_ingestion_spark.llm.multimodal as mm

    img = _smooth(16, 16, 2)
    payload = _avi([encode_jpeg(img)] * 6, 16, 16, b"MJPG")
    monkeypatch.setattr(mm, "MAX_DECODE_BYTES", 16 * 16 * 3 * 3)  # 3 frames worth
    assert mm.decode_avi(payload) is None  # over-cap -> honest None


def test_avi_adversarial_totality():
    rng = np.random.RandomState(66)
    base = _avi([encode_jpeg(_smooth(10, 8, s)) for s in range(2)], 10, 8, b"MJPG")
    for _ in range(250):
        b = bytearray(base)
        for _k in range(rng.randint(1, 6)):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        r = decode_avi(bytes(b))
        assert r is None or all(len(f) == r[0] * r[1] * 3 for f in r[2])


def _avi_multi(streams, w, h, frame_chunks) -> bytes:
    """Multi-stream AVI builder: streams = [(fccType, handler, strf_body)],
    frame_chunks = [(chunk_id, data)] in movi order."""
    avih = struct.pack("<IIIIIIIIII", 33333, 0, 0, 0, len(frame_chunks), 0,
                       len(streams), 0, w, h) + bytes(16)
    strls = b""
    for fcc, handler, strf in streams:
        strh = fcc + handler + bytes(48)
        strls += _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi = _list(b"movi", b"".join(_chunk(cid, d) for cid, d in frame_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vid_strf(w, h, bits, comp):
    return struct.pack("<IiiHH4sIiiII", 40, w, h, 1, bits, comp, 0, 0, 0, 0, 0)


def test_audio_track_does_not_clobber_video_header():
    """An audio stream's WAVEFORMATEX strf (>=20 bytes) must not be
    misread as a BITMAPINFOHEADER — the review-found failure made every
    audio+video file return None because nSamplesPerSec clobbered the
    width. Frames also match by the VIDEO stream's chunk index."""
    img = _smooth(16, 16, 4)
    wavefmt = struct.pack("<HHIIHHH", 0x55, 2, 44100, 176400, 4, 16, 0)  # MP3-ish
    payload = _avi_multi(
        [
            (b"vids", b"MJPG", _vid_strf(16, 16, 24, b"MJPG")),
            (b"auds", b"\x00\x00\x00\x00", wavefmt),
        ],
        16,
        16,
        [(b"00dc", encode_jpeg(img, quality=95)), (b"01wb", b"fake-audio-data")],
    )
    got = decode_avi(payload)
    assert got is not None and (got[0], got[1]) == (16, 16) and len(got[2]) == 1


def test_video_as_second_stream():
    """vids need not be stream 0: frames arrive as 01dc and audio-as-
    stream-0's chunks are ignored."""
    img = _smooth(16, 16, 5)
    wavefmt = struct.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 0)
    payload = _avi_multi(
        [
            (b"auds", b"\x00\x00\x00\x00", wavefmt),
            (b"vids", b"MJPG", _vid_strf(16, 16, 24, b"MJPG")),
        ],
        16,
        16,
        [(b"00wb", b"audio-bytes"), (b"01dc", encode_jpeg(img, quality=95))],
    )
    got = decode_avi(payload)
    assert got is not None and len(got[2]) == 1


def test_top_down_dib_is_not_mirrored():
    """Negative biHeight marks a top-down DIB: rows must NOT be
    flipped (the review-found failure mirrored such frames
    vertically)."""
    rgb = np.zeros((2, 4, 3), np.uint8)
    rgb[0, :, 0] = 255  # top row red, bottom row blue
    rgb[1, :, 2] = 255
    stride = ((4 * 3 + 3) // 4) * 4
    top_down_rows = b"".join(
        rgb[y, :, ::-1].tobytes() + bytes(stride - 12) for y in range(2)
    )
    payload = _avi_multi(
        [(b"vids", b"DIB ", _vid_strf(4, -2, 24, b"\x00\x00\x00\x00"))],
        4,
        2,
        [(b"00db", top_down_rows)],
    )
    got = decode_avi(payload)
    assert got is not None and got[2][0] == rgb.tobytes()


def test_nested_list_bomb_never_raises():
    """~6000 nested LIST chunks must return None/empty, not blow the
    recursion limit past the never-raises contract (the walk is an
    explicit stack now)."""
    depth = 6000
    inner = _chunk(b"avih", bytes(56))
    for _ in range(depth):
        inner = _list(b"hdrl", inner)
    payload = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert decode_avi(payload) is None  # no frames -> None, and NO raise
