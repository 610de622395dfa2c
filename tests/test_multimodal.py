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


def test_metadata_projection_skips_payload(spark):
    """Metadata-only consumers must not deserialize payload bytes: the
    optimized plan prunes the binary column from the scan."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = media_from_documents(docs)
    meta_only = media.select("media_id", "meta.n_bytes")
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
