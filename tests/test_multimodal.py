"""Multimodal binary-column plumbing tests (real PPM/WAV decode paths + opaque stub fallback)."""

from __future__ import annotations

import hashlib
import os

import pytest

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.llm.multimodal import (
    decode_image_stub,
    extract_features,
    media_from_documents,
)


def test_decode_stub_contract():
    w, h = decode_image_stub(b"hello world")
    assert 64 <= w < 256 and 64 <= h < 256
    # deterministic
    assert (w, h) == decode_image_stub(b"hello world")
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"x", fake=False)


def test_feature_extraction_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = media_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 20
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in feats:
        raw = src[r.media_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.digest == hashlib.md5(raw).hexdigest()
        assert 64 <= r.width < 256 and 64 <= r.height < 256


def test_ppm_render_decodes_for_real(spark):
    """ppm_media_from_documents emits well-formed binary P6 payloads and
    extract_features parses the ACTUAL header (dimensions = the render
    formula, byte count = header + w*h*3, digest = md5 of the blob)."""
    from travel_data_ingestion_spark.llm.multimodal import (
        decode_ppm,
        ppm_media_from_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = ppm_media_from_documents(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert set(feats) == set(payloads)
    for mid, r in feats.items():
        w, h = 8 + mid % 24, 8 + (mid // 7) % 24
        assert (r.width, r.height) == (w, h)
        dec = decode_ppm(payloads[mid])
        assert dec is not None and (dec[0], dec[1]) == (w, h)
        assert r.n_bytes == len(payloads[mid])
        assert r.digest == hashlib.md5(payloads[mid]).hexdigest()


def test_phash_pairs_are_perceptual_not_byte_level():
    """The planted near-duplicates differ at the BYTE level (distinct
    md5) yet land within hamming<=3 perceptually — the capability the
    md5-stub era could not provide."""
    from travel_data_ingestion_spark.llm.multimodal import phash_bytes
    from travel_data_ingestion_spark.queries.llm_multimodal import (
        _planted_pairs,
        planted_ppm_media,
    )

    from travel_data_ingestion_spark.llm.multimodal import audio_phash_bytes
    from travel_data_ingestion_spark.queries.llm_multimodal import (
        planted_audio_media,
        planted_image_media,
    )

    payloads = dict(planted_image_media())
    audio = dict(planted_audio_media())
    digests = {
        mid: hashlib.md5(p).hexdigest()
        for mid, p in list(payloads.items()) + list(audio.items())
    }
    assert len(set(digests.values())) == len(digests)  # all bytes distinct
    pairs = _planted_pairs()
    # alpha clique of 11 (PPM x3 + PNG/BMP/ICO + TIFF in four layouts:
    # PackBits, LZW+Pred2, Deflate strips, Deflate tiles + WebP-VP8L)
    # = 55 pairs, beta pair, gamma clique of 3 (PPM + Huffman-JPEG +
    # arithmetic-JPEG) = 3, delta clique of 3 (PPM/GIF/P3) = 3,
    # epsilon netpbm clique of 4 (P1/P2/P4/P5) = 6, zeta lossy-WebP
    # clique of 3 (VP8 stream + its PPM re-render + PNG) = 3, audio
    # clique of 10 (WAV/FLAC/AIFF/AU/mu-law/IMA/MS-ADPCM/half-gain/
    # Ogg-FLAC/Ogg-Vorbis) = 45 -> every clique fully connected
    assert len(pairs) == 55 + 1 + 3 + 3 + 6 + 3 + 45
    # at least one NON-ZERO hamming pair: genuinely near, not identical
    assert any(h > 0 for _a, _b, h in pairs)
    # no accidental image<->audio cross pairs
    assert not any(a < 4_000_000_000 <= b for a, b, _h in pairs)
    for a, b, h in pairs:
        fn = audio_phash_bytes if a in audio else phash_bytes
        src_map = audio if a in audio else payloads
        pa, pb = fn(src_map[a]), fn(src_map[b])
        assert bin((pa ^ pb) & (2**64 - 1)).count("1") == h <= 3


def test_phash_opaque_fallback_is_md5_stub():
    """Non-PPM payloads keep the documented md5-derived signature:
    identical bytes collide, distinct bytes are far apart."""
    from travel_data_ingestion_spark.llm.multimodal import phash_bytes

    a1, a2 = phash_bytes(b"not an image"), phash_bytes(b"not an image")
    b = phash_bytes(b"different bytes")
    assert a1 == a2
    assert bin((a1 ^ b) & (2**64 - 1)).count("1") > 3


def test_decode_ppm_rejects_malformed():
    from travel_data_ingestion_spark.llm.multimodal import decode_ppm

    assert decode_ppm(b"P6\n4 4\n255\n" + b"x" * 48) == (4, 4, b"x" * 48)
    assert decode_ppm(b"P6\n4 4\n255\n" + b"x" * 40) is None  # truncated
    assert decode_ppm(b"P6\n4 4\n65535\n" + b"x" * 48) is None  # wrong maxval
    assert decode_ppm(b"P5\n4 4\n255\n" + b"x" * 16) is None  # not P6
    assert decode_ppm(b"JFIF....") is None


def test_real_frame_sampling_over_planted_clips(spark):
    """mm02's graded signal is REAL: the planted GIF/AVI clips decode
    to their pinned frame counts, every 10th index is emitted, and the
    payloads=False lean variant returns no pixel bytes to the JVM."""
    from travel_data_ingestion_spark.llm.multimodal import sample_frames
    from travel_data_ingestion_spark.queries.llm_multimodal import (
        _PLANTED_VIDEO_FRAMES,
        planted_video_media,
    )

    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in planted_video_media()],
        "media_id long, payload binary",
    )
    lean = sample_frames(media, every_n=10, payloads=False)
    assert "payload" not in lean.columns
    rows = lean.collect()
    got = {}
    for r in rows:
        got.setdefault(r.media_id, []).append((r.frame_index, r.n_frames))
    assert set(got) == set(_PLANTED_VIDEO_FRAMES)
    for mid, n in _PLANTED_VIDEO_FRAMES.items():
        assert sorted(got[mid]) == [(i, n) for i in range(0, n, 10)], mid
    # the full variant emits decodable PPM frames for the same indices
    full = sample_frames(media, every_n=10).collect()
    assert {(r.media_id, r.frame_index) for r in full} == {
        (m, i) for m, pairs in got.items() for i, _n in pairs
    }
    from travel_data_ingestion_spark.llm.multimodal import decode_ppm

    assert all(decode_ppm(bytes(r.payload)) is not None for r in full)


def test_metadata_projection_skips_payload(spark):
    """Metadata-only consumers must not deserialize payload bytes: the
    optimized plan prunes the binary column from the scan."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = media_from_documents(docs)
    meta_only = media.select("media_id", "meta.n_bytes")
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def _wav_bytes(rate, n_ch, bits, samples):
    """Minimal RIFF/PCM writer for fixtures (little-endian)."""
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    ba = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * ba, ba, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decode_and_audio_features(spark):
    """Real RIFF/PCM parse: sample rate, channels, duration and RMS come
    from the decoded samples; non-WAV payloads keep NULL typed fields."""
    import math

    from travel_data_ingestion_spark.llm.multimodal import (
        decode_wav,
        extract_audio_features,
    )

    # 16-bit mono: a full-scale square wave -> RMS ~1.0
    sq = [32767, -32768] * 100
    wav16 = _wav_bytes(8000, 1, 16, sq)
    dec = decode_wav(wav16)
    assert dec is not None and dec[0] == 8000 and dec[1] == 1 and dec[2] == 16
    # 8-bit stereo silence -> RMS 0
    wav8 = _wav_bytes(4000, 2, 8, [0] * 80)
    media = spark.createDataFrame(
        [(1, bytearray(wav16)), (2, bytearray(wav8)), (3, bytearray(b"mp3junk"))],
        "media_id long, payload binary",
    )
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    f1 = feats[1]
    assert f1.sample_rate == 8000 and f1.n_channels == 1
    assert f1.n_samples == 200 and f1.duration_s == 0.025
    assert math.isclose(f1.rms, 1.0, rel_tol=1e-4)
    f2 = feats[2]
    assert (f2.sample_rate, f2.n_channels, f2.n_samples) == (4000, 2, 40)
    assert f2.duration_s == 0.01 and f2.rms == 0.0
    f3 = feats[3]
    assert f3.sample_rate is None and f3.rms is None and f3.n_bytes == 7


def test_decode_wav_rejects_non_pcm():
    import struct

    from travel_data_ingestion_spark.llm.multimodal import decode_wav

    # format tag 3 (IEEE float) is a codec-path format here
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(payload) is None
    assert decode_wav(b"RIFFxxxx") is None
    assert decode_wav(b"") is None


def _env_wav(seed: int, gain: float = 1.0, noise: float = 0.0) -> bytes:
    """Deterministic test clip: a tone whose amplitude envelope varies
    strongly across the hash's 65 segments (adjacent-energy comparisons
    are then robust to light noise, unlike white noise where adjacent
    energies tie)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = 6500
    t = np.arange(n)
    p1, p2 = 700 + 137 * seed, 211 + 53 * seed  # seed shapes the envelope
    env = 3000 + 2500 * np.sin(2 * np.pi * t / p1) + 1500 * np.sin(2 * np.pi * t / p2)
    x = env * np.sin(2 * np.pi * t / 29) * gain
    if noise:
        x = x + rng.normal(0, noise, n)
    return _wav_bytes(8000, 1, 16, np.clip(x, -32768, 32767).astype(int).tolist())


def test_audio_phash_gain_invariant_and_noise_robust():
    """Re-leveled copies hash identically (energy comparisons are
    monotone under gain); lightly noised copies land within a few bits;
    different audio is far — the audio twin of the image pHash
    contract."""
    from travel_data_ingestion_spark.llm.multimodal import audio_phash_bytes

    base = audio_phash_bytes(_env_wav(1))
    half = audio_phash_bytes(_env_wav(1, gain=0.5))
    noisy = audio_phash_bytes(_env_wav(1, noise=60.0))
    other = audio_phash_bytes(_env_wav(2))

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(base, half) == 0
    assert 0 <= ham(base, noisy) <= 3
    assert ham(base, other) > 10
    # undecodable / too-short payloads keep the md5 stub contract
    assert audio_phash_bytes(b"mp3junk") == audio_phash_bytes(b"mp3junk")
    short = _wav_bytes(8000, 1, 16, [100, -100] * 10)
    assert audio_phash_bytes(short) == audio_phash_bytes(short)


def test_audio_neardup_pairs_via_standard_hamming_blocking(spark):
    """audio_phash_signatures composes with the SAME hamming_pairs
    machinery the image/text paths use: planted re-leveled + noised
    copies pair, distinct clips don't — audio near-dup with zero new
    pair machinery."""
    from travel_data_ingestion_spark.llm.multimodal import (
        audio_phash_signatures,
    )
    from travel_data_ingestion_spark.queries.llm_dedup import hamming_pairs

    media = spark.createDataFrame(
        [
            (1, bytearray(_env_wav(1))),
            (2, bytearray(_env_wav(1, gain=0.7))),
            (3, bytearray(_env_wav(1, noise=60.0))),
            (4, bytearray(_env_wav(9))),
            (5, bytearray(b"not audio at all")),
        ],
        "media_id long, payload binary",
    )
    sigs = audio_phash_signatures(media)
    pairs = {
        (r.id_a, r.id_b)
        for r in hamming_pairs(sigs, "media_id", "phash").collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert all(4 not in p and 5 not in p for p in pairs)


def test_mixed_modality_binary_ingest_e2e(spark, tmp_path):
    """End-to-end media landing: raw PPM + WAV + opaque files through the
    binaryFile source, routed by extension-derived mime — image rows get
    real header dims + pixel pHash, audio rows get real PCM features,
    opaque rows fall back to the documented stubs. One schema, no codec
    library anywhere."""
    import numpy as np

    from travel_data_ingestion_spark.io import read_table
    from travel_data_ingestion_spark.llm.multimodal import (
        extract_audio_features,
        extract_features,
        mime_from_path,
        phash_signatures,
    )
    from pyspark.sql import functions as F

    from travel_data_ingestion_spark.llm.multimodal import encode_png

    land = tmp_path / "media_land"
    land.mkdir()
    img = np.random.RandomState(3).randint(0, 256, (12, 10, 3)).astype("uint8")
    (land / "shot.ppm").write_bytes(b"P6\n10 12\n255\n" + img.tobytes())
    # the SAME pixels re-encoded as a real compressed PNG: decodes to
    # identical dims and pHash-pairs with its PPM twin at hamming 0
    (land / "shot.png").write_bytes(encode_png(10, 12, img.tobytes()))
    (land / "clip.wav").write_bytes(_wav_bytes(16000, 1, 16, [1000, -1000] * 50))
    (land / "blob.bin").write_bytes(b"opaque-payload")

    raw = read_table(spark, str(land), fmt="binary")
    media = raw.select(
        F.xxhash64("path", "modificationTime").alias("media_id"),
        F.col("content").alias("payload"),
        mime_from_path(F.col("path")).alias("mime"),
        F.col("path").alias("source"),
    )
    by_mime = {os.path.basename(r.source): r.mime for r in media.collect()}
    assert by_mime == {
        "shot.ppm": "image/x-portable-pixmap",
        "shot.png": "image/png",
        "clip.wav": "audio/wav",
        "blob.bin": "application/octet-stream",
    }
    images = media.filter(F.col("mime").startswith("image/"))
    audio = media.filter(F.col("mime").startswith("audio/"))
    feats = extract_features(images).collect()
    assert len(feats) == 2
    assert {(f.width, f.height) for f in feats} == {(10, 12)}  # both REAL parses
    sigs = [r.phash for r in phash_signatures(images).collect()]
    assert len(sigs) == 2 and sigs[0] == sigs[1]  # format-invariant pHash
    af = extract_audio_features(audio).collect()
    assert len(af) == 1 and af[0].sample_rate == 16000 and af[0].n_samples == 100
    assert af[0].duration_s == 0.00625


def test_native_codec_hook_is_a_drop_in(tmp_path, monkeypatch):
    """The pluggable codec hook: a native decoder registered for a
    container must produce IDENTICAL feature/pHash results to the pure
    path (same canonical decode contract), payloads it declines fall
    through, and the env-var registration path loads on import — the
    mechanism that reaches executor Python workers."""
    import sys

    import numpy as np

    from travel_data_ingestion_spark.llm import multimodal as mm
    from travel_data_ingestion_spark.llm.multimodal import (
        decode_audio,
        decode_image,
        phash_bytes,
    )

    rgb = np.random.RandomState(3).randint(0, 256, (12, 10, 3)).astype("uint8")
    jpeg_like = b"\xff\xd8FAKE-NATIVE-ONLY"  # no pure decoder claims this
    ppm = b"P6\n10 12\n255\n" + rgb.tobytes()

    base_hash = phash_bytes(ppm)
    assert decode_image(jpeg_like) is None

    calls = []

    def fake_native(payload):
        calls.append(payload[:4])
        if payload == jpeg_like:
            return 10, 12, rgb.tobytes()
        return None  # decline: pure path takes over

    monkeypatch.setattr(mm, "_IMAGE_CODEC", fake_native)
    try:
        # the hook decodes a container the pure path cannot...
        assert decode_image(jpeg_like) == (10, 12, rgb.tobytes())
        # ...and its pHash is identical to the pure decode of the same
        # pixels — the drop-in contract oracles depend on
        assert phash_bytes(jpeg_like) == base_hash
        # declined payloads fall through to the pure decoders unchanged
        assert decode_image(ppm) == (10, 12, rgb.tobytes())
        assert phash_bytes(ppm) == base_hash
        assert calls  # the hook was genuinely consulted first
    finally:
        monkeypatch.undo()
    assert decode_image(jpeg_like) is None  # unregistered again

    # audio twin
    x = np.zeros((8, 1)) + 0.25

    def fake_audio(payload):
        return (8000, 1, x) if payload == b"FAKEAUDIO" else None

    monkeypatch.setattr(mm, "_AUDIO_CODEC", fake_audio)
    try:
        got = decode_audio(b"FAKEAUDIO")
        assert got is not None and got[0] == 8000 and (got[2] == x).all()
    finally:
        monkeypatch.undo()
    assert decode_audio(b"FAKEAUDIO") is None

    # env-var registration: the worker-side mechanism
    codec_mod = tmp_path / "fake_codec_mod.py"
    codec_mod.write_text(
        "def image_codec(payload):\n"
        "    if payload == b'MAGICIMG':\n"
        "        return 1, 1, b'abc'\n"
        "    return None\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_CODEC_MODULE", "fake_codec_mod")
    try:
        mm._load_codec_hooks()
        assert decode_image(b"MAGICIMG") == (1, 1, b"abc")
    finally:
        monkeypatch.setattr(mm, "_IMAGE_CODEC", None)
        sys.modules.pop("fake_codec_mod", None)
