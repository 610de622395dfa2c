"""MPEG audio (mp3) frame-walk metadata probe.

The probe is header arithmetic, so the tests build frames from the
published header layout independently (struct-packed fields, sizes
computed from the bitrate/samplerate definitions directly) and pin a
REAL-WORLD file: the public gsutil test fixture shipped with this
machine's google-cloud-sdk (skipped when absent). PCM decode is
deliberately absent — llm/mp3.py's module docstring records why — so
there is no round-trip here, only header truth.
"""

from __future__ import annotations

import os
import random

import pytest

from travel_data_ingestion_spark.llm.mp3 import probe_mp3

_GSUTIL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
)


def _hdr(ver: int, layer: int, br_idx: int, sr_idx: int, pad: int = 0,
         mode: int = 0) -> bytes:
    """ver: 3=MPEG1 2=MPEG2 0=MPEG2.5; layer: 1=I 2=II 3=III (human)."""
    layer_code = 4 - layer
    h = (0x7FF << 21) | (ver << 19) | (layer_code << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    return h.to_bytes(4, "big")


_KBPS_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_KBPS_V1_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
_KBPS_V1_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)


def _frame(ver: int, layer: int, br_idx: int, sr_idx: int, pad: int = 0,
           mode: int = 0) -> bytes:
    rate = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
            0: (11025, 12000, 8000)}[ver][sr_idx]
    kbps = {1: _KBPS_V1_L1, 2: _KBPS_V1_L2, 3: _KBPS_V1_L3}[layer][br_idx] \
        if ver == 3 else None
    if ver != 3:
        kbps = ((0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                 224, 256) if layer == 1 else
                (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                 160))[br_idx]
    if layer == 1:
        n = (12 * kbps * 1000 // rate + pad) * 4
    elif layer == 2:
        n = 144 * kbps * 1000 // rate + pad
    else:
        n = (144 if ver == 3 else 72) * kbps * 1000 // rate + pad
    return _hdr(ver, layer, br_idx, sr_idx, pad, mode) + bytes(n - 4)


def test_cbr_mpeg1_layer3_stereo():
    stream = b"".join(_frame(3, 3, 9, 0) for _ in range(30))  # 128k 44.1
    layer, rate, n_ch, n_frames, dur, kbps, vbr = probe_mp3(stream)
    assert (layer, rate, n_ch, n_frames) == (3, 44100, 2, 30)
    assert dur == pytest.approx(30 * 1152 / 44100)
    assert kbps == 128 and vbr is False


def test_padding_bit_changes_frame_size():
    # 44.1 kHz frames alternate padded/unpadded in real CBR streams
    frames = [_frame(3, 3, 9, 0, pad=i % 2) for i in range(20)]
    got = probe_mp3(b"".join(frames))
    assert got is not None and got[3] == 20


def test_layer1_and_layer2_sizing():
    l1 = b"".join(_frame(3, 1, 4, 1) for _ in range(12))  # L1 128k 48k
    layer, rate, _c, n_frames, dur, _k, _v = probe_mp3(l1)
    assert (layer, rate, n_frames) == (1, 48000, 12)
    assert dur == pytest.approx(12 * 384 / 48000)
    l2 = b"".join(_frame(3, 2, 8, 0) for _ in range(12))
    layer, rate, _c, n_frames, dur, _k, _v = probe_mp3(l2)
    assert (layer, rate, n_frames) == (2, 44100, 12)
    assert dur == pytest.approx(12 * 1152 / 44100)


def test_mpeg2_half_frames():
    stream = b"".join(_frame(2, 3, 5, 0, mode=3) for _ in range(16))
    layer, rate, n_ch, n_frames, dur, kbps, _v = probe_mp3(stream)
    assert (layer, rate, n_ch, n_frames, kbps) == (3, 22050, 1, 16, 40)
    assert dur == pytest.approx(16 * 576 / 22050)


def test_vbr_without_xing_averages_bitrates():
    frames = [_frame(3, 3, 9, 0), _frame(3, 3, 14, 0), _frame(3, 3, 1, 0),
              _frame(3, 3, 9, 0)]
    layer, _r, _c, n_frames, _d, kbps, vbr = probe_mp3(b"".join(frames))
    assert n_frames == 4 and vbr is True
    assert kbps == round((128 + 320 + 32 + 128) / 4)


def test_xing_header_frame_count_wins():
    first = bytearray(_frame(3, 3, 9, 0))  # stereo MPEG-1: side info 32
    at = 4 + 32
    first[at : at + 4] = b"Xing"
    first[at + 4 : at + 8] = (0x1).to_bytes(4, "big")  # frames flag
    first[at + 8 : at + 12] = (999).to_bytes(4, "big")
    stream = bytes(first) + b"".join(_frame(3, 3, 9, 0) for _ in range(3))
    _l, _r, _c, n_frames, dur, _k, vbr = probe_mp3(stream)
    assert n_frames == 999 and vbr is True
    assert dur == pytest.approx(999 * 1152 / 44100)


def test_id3v2_skip_and_id3v1_trim():
    body = b"".join(_frame(3, 3, 9, 0) for _ in range(8))
    size = 200
    id3 = (b"ID3\x04\x00\x00"
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
           + bytes(size))
    tagged = id3 + body + b"TAG" + bytes(125)
    got = probe_mp3(tagged)
    assert got is not None and got[3] == 8


def test_junk_prefix_needs_two_headers():
    # a lone 0xFFFB in junk must not count as a stream
    junk = bytes(50) + _hdr(3, 3, 9, 0) + bytes(50)
    assert probe_mp3(junk) is None
    # but junk followed by a real two-frame stream resyncs
    stream = bytes(37) + b"".join(_frame(3, 3, 9, 0) for _ in range(2))
    got = probe_mp3(stream)
    assert got is not None and got[3] == 2


def test_hostile_bytes_total():
    rng = random.Random(7)
    for n in (0, 1, 3, 4, 10, 1000):
        blob = bytes(rng.randrange(256) for _ in range(n))
        probe_mp3(blob)  # must not raise
        probe_mp3(b"\xff\xfb" + blob)
        probe_mp3(b"ID3" + blob)


@pytest.mark.skipif(not os.path.exists(_GSUTIL_MP3),
                    reason="gsutil test fixture not on this machine")
def test_real_world_file():
    data = open(_GSUTIL_MP3, "rb").read()
    layer, rate, n_ch, n_frames, dur, kbps, vbr = probe_mp3(data)
    # public fixture: MPEG-2 Layer III, 22.05 kHz mono, 64 kbps CBR
    assert (layer, rate, n_ch) == (3, 22050, 1)
    assert n_frames == 45 and vbr is False and kbps == 64
    assert dur == pytest.approx(45 * 576 / 22050)
    # byte accounting: 45 frames of 208/209 bytes + the ID3v2 tag
    # consume the whole file
    assert 9000 < 45 * (72 * 64000 // 22050) <= len(data)


def test_extract_audio_features_fills_metadata_for_gated_mp3(spark):
    from travel_data_ingestion_spark.llm.multimodal import (
        decode_audio,
        extract_audio_features,
    )

    stream = b"".join(_frame(3, 3, 9, 0) for _ in range(5))
    assert decode_audio(stream) is None  # PCM honestly gated
    media = spark.createDataFrame(
        [(1, bytearray(stream))], "media_id long, payload binary"
    )
    row = extract_audio_features(media).collect()[0]
    assert row.sample_rate == 44100 and row.n_channels == 2
    assert row.duration_s == pytest.approx(5 * 1152 / 44100, abs=1e-6)
    assert row.n_samples is None and row.rms is None
