"""Multimodal columns: opaque binary payloads + typed metadata.

Model: media (image/audio/video) travels as an opaque ``binary`` column
with a typed metadata struct alongside; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` operators so
Python touches whole columnar batches, never rows.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces deterministic pseudo-features
(byte length, md5 digest, fake width/height derived from the digest).
The Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and tested (tests/test_multimodal.py).

At 100 TB: binary payloads dominate size, so the operators (a) never
shuffle payload bytes (feature extraction is map-only; metadata-only
columns are projected before any join), and (b) bound batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


# extension -> mime for media landing files; anything unknown stays the
# opaque default so downstream format filters can still route it
MIME_BY_EXT = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "ppm": "image/x-portable-pixmap",
    "pgm": "image/x-portable-graymap",
    "webp": "image/webp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "mkv": "video/x-matroska",
}


def mime_from_path(path_col):
    """Column expression: mime type derived from a file path's extension
    (lowercased), ``application/octet-stream`` when unknown — JVM-side
    (a literal map lookup), so the streaming ingest path stays free of
    Python."""
    ext = F.lower(F.regexp_extract(path_col, r"\.([A-Za-z0-9]+)$", 1))
    pairs: list = []
    for k, v in MIME_BY_EXT.items():
        pairs.extend([F.lit(k), F.lit(v)])
    # try_element_at: a missing key is NULL under ANSI too (element_at
    # would raise there — NOTES determinism rule 6)
    return F.coalesce(
        F.try_element_at(F.create_map(*pairs), ext),
        F.lit("application/octet-stream"),
    )


def _dims_from_digest(digest: bytes) -> tuple[int, int]:
    """Deterministic fake (width, height) from a payload md5 digest —
    the single definition shared by the scalar stub and the batched
    kernel, so the two can never drift."""
    return 64 + digest[0] % 192, 64 + digest[1] % 192


def decode_image_stub(payload: bytes, fake: bool = True) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB: real decoding needs an image library not present in this
    container. With ``fake=True`` the dimensions derive deterministically
    from the payload digest, keeping every downstream operator testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library (e.g. Pillow); "
            "not available in this environment"
        )
    return _dims_from_digest(hashlib.md5(payload).digest())


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus: utf-8 payload bytes
    as the opaque binary stand-in, typed metadata alongside."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each partition arrives as an iterator of pandas
    DataFrames (Arrow batches); only the projected columns cross the
    JVM/Python boundary (payload + id), and output batches carry small
    feature rows — the payload never comes back."""
    cols = media.select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # hash each payload ONCE: digest column and stub dimensions
            # both derive from the same md5 (payloads dominate the batch,
            # so the second full pass over the bytes was pure waste)
            digests = [hashlib.md5(bytes(p)).digest() for p in payloads]
            dims = [_dims_from_digest(d) for d in digests]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": [d.hex() for d in digests],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return cols.mapInPandas(batches, schema=FEATURE_SCHEMA)


def phash_signatures(media: DataFrame) -> DataFrame:
    """Perceptual-hash signatures over the binary column, Arrow-batched.

    STUB HASH: a real dHash/pHash (decode -> downscale -> gradient bits)
    needs an image codec; this environment derives the 64-bit signature
    from the payload's md5 (first 16 hex digits, two's-complement), so
    only IDENTICAL payloads land at hamming 0 and distinct payloads are
    ~32 bits apart. The pipeline shape is the real one: payload bytes
    cross to Python once per batch, a long signature returns, and the
    pair generation downstream (queries.llm_dedup.hamming_pairs) never
    touches bytes again. A real perceptual hash slots into ``ph`` and
    the hamming<=3 blocking starts matching near-identical images."""
    cols = media.select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def ph(p) -> int:
            v = int(hashlib.md5(bytes(p)).hexdigest()[:16], 16)
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(ph).astype("int64"),
                }
            )

    return cols.mapInPandas(batches, schema="media_id long, phash long")


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_index) rows for a stubbed frame count of n_bytes // 1000 —
    the real decoder would replace the count, the plan shape stays."""
    n_frames = (F.col("meta.n_bytes") / 1000).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_index")
    )
