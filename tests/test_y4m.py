"""YUV4MPEG2 (.y4m) decoder tests.

Y4M is uncompressed (header + raw planes), so the forward writer here
is trivial container plumbing; the substantive checks are the plane
layouts per colorspace, the Rec.601 limited-range conversion (pinned
against an independent float reference within integer-rounding
tolerance), nearest chroma upsampling, and the totality/bomb lanes
every decoder carries.
"""

from __future__ import annotations

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.multimodal import decode_y4m


def _y4m(frames_planes: list[bytes], w: int, h: int, cs: str = "420jpeg") -> bytes:
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, cs.encode())
    return head + b"".join(b"FRAME\n" + f for f in frames_planes)


def _planes(r, w, h, cs) -> bytes:
    if cs.startswith("420"):
        cw, ch = (w + 1) // 2, (h + 1) // 2
    elif cs == "422":
        cw, ch = (w + 1) // 2, h
    elif cs == "444":
        cw, ch = w, h
    else:  # mono
        cw = ch = 0
    return r.randint(0, 256, w * h + 2 * cw * ch).astype("uint8").tobytes()


@pytest.mark.parametrize("cs", ["420jpeg", "420mpeg2", "420paldv", "422", "444", "mono"])
def test_frame_walk_all_colorspaces(cs):
    w, h = 12, 10
    r = np.random.RandomState(3)
    payload = _y4m([_planes(r, w, h, cs) for _ in range(7)], w, h, cs)
    dec = decode_y4m(payload)
    assert dec is not None
    dw, dh, frames = dec
    assert (dw, dh) == (w, h)
    assert len(frames) == 7
    assert all(len(f) == w * h * 3 for f in frames)


@pytest.mark.parametrize("cs,bits", [
    ("420p10", 10), ("420p12", 12), ("420p16", 16),
    ("422p10", 10), ("444p12", 12),
])
def test_high_bit_depth_variants_decode(cs, bits):
    """ffmpeg's 16-bit-plane colorspaces parse as little-endian uint16
    right-shifted to 8 bits: a p1x stream whose samples are exact 8-bit
    values shifted up must decode IDENTICALLY to the 8-bit stream of
    the same values."""
    w, h = 12, 10
    r = np.random.RandomState(11)
    base = cs[:3]
    planes8 = [_planes(r, w, h, base) for _ in range(3)]
    payload8 = _y4m(planes8, w, h, base if base != "420" else "420jpeg")
    planes16 = [
        (np.frombuffer(p, np.uint8).astype("<u2") << (bits - 8)).tobytes()
        for p in planes8
    ]
    payload16 = _y4m(planes16, w, h, cs)
    d8, d16 = decode_y4m(payload8), decode_y4m(payload16)
    assert d8 is not None and d16 is not None
    assert d8 == d16
    # sub-8-bit precision rounds DOWN (plain right shift)
    bumped = (
        (np.frombuffer(planes8[0], np.uint8).astype("<u2") << (bits - 8)) + 1
    ).tobytes()
    db = decode_y4m(_y4m([bumped], w, h, cs))
    assert db is not None and db[2][0] == d8[2][0]


@pytest.mark.parametrize("cs", ["444alpha", "420jpegp10", "monop10", "999weird"])
def test_unknown_colorspaces_rejected_by_name(cs):
    """Names outside the supported set reject BY NAME — even when the
    frame body is sized so an 8-bit misparse would align."""
    w, h = 12, 10
    r = np.random.RandomState(11)
    base = cs[:3] if cs[:3] in ("420", "422", "444") else "444"
    payload = _y4m([_planes(r, w, h, base) for _ in range(3)], w, h, cs)
    assert decode_y4m(payload) is None


def test_rec601_limited_range_conversion():
    """The integer conversion tracks the float Rec.601 limited-range
    matrix within rounding (<= 1 count per channel), and pins the
    canonical anchors exactly: Y=16 -> black, Y=235 -> white."""
    w = h = 8
    r = np.random.RandomState(9)
    y = r.randint(16, 236, (h, w)).astype(np.float64)
    cb = r.randint(16, 241, (h, w)).astype(np.float64)
    cr = r.randint(16, 241, (h, w)).astype(np.float64)
    planes = (
        y.astype("uint8").tobytes()
        + cb.astype("uint8").tobytes()
        + cr.astype("uint8").tobytes()
    )
    dec = decode_y4m(_y4m([planes], w, h, "444"))
    assert dec is not None
    got = np.frombuffer(dec[2][0], np.uint8).reshape(h, w, 3).astype(np.float64)
    # independent float reference (ITU-R BT.601 + limited-range scaling)
    yv = (y - 16) * 255.0 / 219.0
    pb = (cb - 128) * 255.0 / 224.0
    pr = (cr - 128) * 255.0 / 224.0
    ref_r = np.clip(yv + 1.402 * pr, 0, 255)
    ref_g = np.clip(yv - 0.344136 * pb - 0.714136 * pr, 0, 255)
    ref_b = np.clip(yv + 1.772 * pb, 0, 255)
    for ref, ch in ((ref_r, 0), (ref_g, 1), (ref_b, 2)):
        assert np.abs(got[:, :, ch] - ref).max() <= 1.5
    # anchors: limited-range black and white, neutral chroma
    black = bytes([16] * (w * h)) + bytes([128] * (2 * w * h))
    white = bytes([235] * (w * h)) + bytes([128] * (2 * w * h))
    db = decode_y4m(_y4m([black], w, h, "444"))
    dw_ = decode_y4m(_y4m([white], w, h, "444"))
    assert set(db[2][0]) == {0}
    assert set(dw_[2][0]) == {255}


def test_chroma_nearest_upsample_420():
    """One chroma sample per 2x2 block: all four pixels of a block get
    identical chroma contribution."""
    w = h = 4
    y = bytes([128] * (w * h))
    cb = bytes([90, 200, 30, 160])  # 2x2 chroma plane
    cr = bytes([128] * 4)
    dec = decode_y4m(_y4m([y + cb + cr], w, h, "420jpeg"))
    got = np.frombuffer(dec[2][0], np.uint8).reshape(h, w, 3)
    # blue channel varies with cb; each 2x2 block is uniform
    for by in range(2):
        for bx in range(2):
            blk = got[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2, 2]
            assert len(set(blk.ravel().tolist())) == 1
    assert got[0, 0, 2] != got[0, 2, 2]  # different blocks differ


def test_mono_grayscale():
    w, h = 6, 2
    y = bytes(range(16, 16 + w * h))
    dec = decode_y4m(_y4m([y], w, h, "mono"))
    got = np.frombuffer(dec[2][0], np.uint8).reshape(h, w, 3)
    assert (got[:, :, 0] == got[:, :, 1]).all() and (got[:, :, 1] == got[:, :, 2]).all()
    assert got[0, 0, 0] == 0  # Y=16 -> black


def test_sample_frames_integration(spark):
    """decode_y4m plugs into sample_frames: a 29-frame clip yields
    indices 0/10/20 with n_frames=29 on the lean payloads=False path."""
    from travel_data_ingestion_spark.llm.multimodal import sample_frames
    from travel_data_ingestion_spark.queries.llm_multimodal import _y4m_bytes

    media = spark.createDataFrame(
        [(1, bytearray(_y4m_bytes(29, 12, 10)))], "media_id long, payload binary"
    )
    rows = sample_frames(media, every_n=10, payloads=False).collect()
    assert {(r.frame_index, r.n_frames) for r in rows} == {(0, 29), (10, 29), (20, 29)}


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:30],  # truncated mid-header/frame
        lambda p: b"",
        lambda p: p.replace(b"YUV4MPEG2", b"YUV4MPEG3", 1),
        lambda p: p.replace(b"C420jpeg", b"C999weird", 1),
        lambda p: p.replace(b"FRAME\n", b"FRUME\n", 1),
        lambda p: p.replace(b" W12", b" W0", 1),
    ],
)
def test_adversarial_returns_none(mutate):
    r = np.random.RandomState(5)
    payload = _y4m([_planes(r, 12, 10, "420jpeg") for _ in range(3)], 12, 10)
    assert decode_y4m(mutate(payload)) is None


def test_truncation_totality_sweep():
    r = np.random.RandomState(6)
    payload = _y4m([_planes(r, 6, 4, "422") for _ in range(4)], 6, 4, "422")
    full = decode_y4m(payload)
    assert full is not None and len(full[2]) == 4
    for cut in range(len(payload)):
        out = decode_y4m(payload[:cut])
        # a clean cut at a frame boundary decodes the prefix; anything
        # torn mid-frame is None — never an exception or hang
        assert out is None or (out[0], out[1]) == (6, 4)


def test_dimension_bomb_gated():
    huge = b"YUV4MPEG2 W99999 H99999 C444\nFRAME\n" + bytes(64)
    assert decode_y4m(huge) is None


def test_no_frames_is_none():
    assert decode_y4m(b"YUV4MPEG2 W4 H4 C444\n") is None
