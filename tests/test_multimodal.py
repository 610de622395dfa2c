"""Multimodal binary-column plumbing tests (stubbed decode)."""

from __future__ import annotations

import hashlib

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

    payloads = dict(planted_ppm_media())
    digests = {mid: hashlib.md5(p).hexdigest() for mid, p in payloads.items()}
    assert len(set(digests.values())) == len(digests)  # all bytes distinct
    pairs = _planted_pairs()
    assert len(pairs) == 4
    # at least one NON-ZERO hamming pair: genuinely near, not identical
    assert any(h > 0 for _a, _b, h in pairs)
    for a, b, h in pairs:
        pa, pb = phash_bytes(payloads[a]), phash_bytes(payloads[b])
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


def test_metadata_projection_skips_payload(spark):
    """Metadata-only consumers must not deserialize payload bytes: the
    optimized plan prunes the binary column from the scan."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = media_from_documents(docs)
    meta_only = media.select("media_id", "meta.n_bytes")
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
