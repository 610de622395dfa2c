"""Multimodal plumbing as registered queries.

mm01 exercises the full binary-column path — documents -> opaque payload
+ metadata -> Arrow-batched mapInPandas feature extraction — with a
DuckDB oracle possible because the stubbed features are deterministic
(byte length + md5-derived dimensions are pure functions of the bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.llm.multimodal import (
    extract_features,
    media_from_documents,
)
from travel_data_ingestion_spark.queries import load_table, register


@register(
    "mm01_media_features",
    """
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    survey_ops=("X-MM-1",),
    doc="Binary-column feature extraction via Arrow-batched mapInPandas "
    "(payload bytes never return to the JVM; only small feature rows "
    "do). Oracle checks the deterministic features; width/height come "
    "from the stubbed decoder and are verified in "
    "tests/test_multimodal.py. Texts are ASCII so utf-8 byte length == "
    "char length in the oracle.",
)
def mm01_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "digest")


@register(
    "mm02_frame_sample",
    """
    SELECT doc_id AS media_id,
           UNNEST(range(0, GREATEST(CAST(length(text) // 1000 AS BIGINT), 1), 10))
             AS frame_index
    FROM documents
    """,
    survey_ops=("X-MM-2",),
    doc="Frame-sampling plan shape: one row per sampled frame index, "
    "generated JVM-side with sequence+explode (no Python). The stub "
    "frame count is n_bytes // 1000; a real video decoder slots into "
    "the same plan.",
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(media_from_documents(docs), every_n=10).select(
        "media_id", F.col("frame_index").cast("long").alias("frame_index")
    )


# Planted duplicate media: the synthetic corpus has zero exact-duplicate
# texts (verified at sf0.001/sf0.01), and the stub hash is md5-derived,
# so without planting, mm03's graded row would be vacuous (0 == 0).
# Both engines union the same literal payloads: one triple and one pair
# of identical "images" -> 4 hamming-0 pairs. IDs start at 3e9, above
# real doc_ids and the other fixtures' 1e9/2e9 blocks.
_PLANTED_MEDIA_BASE_ID = 3_000_000_000
_PLANTED_MEDIA = [
    (_PLANTED_MEDIA_BASE_ID + 0, "planted duplicate image payload alpha"),
    (_PLANTED_MEDIA_BASE_ID + 1, "planted duplicate image payload alpha"),
    (_PLANTED_MEDIA_BASE_ID + 2, "planted duplicate image payload alpha"),
    (_PLANTED_MEDIA_BASE_ID + 10, "planted duplicate image payload beta"),
    (_PLANTED_MEDIA_BASE_ID + 11, "planted duplicate image payload beta"),
]


def _phash_dedup_oracle() -> str:
    planted = ",\n        ".join(f"({i}, '{t}')" for i, t in _PLANTED_MEDIA)
    # md5-prefix-64 as signed BIGINT without overflowing DuckDB's checked
    # arithmetic: split into two 32-bit halves, sign-correct the high one.
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES
        {planted}
      ) AS planted(doc_id, text)
    ),
    halves AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h32,
             CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) AS l32
      FROM corpus
    ),
    sigs AS (
      SELECT doc_id,
             (h32 - CASE WHEN h32 >= 2147483648 THEN 4294967296 ELSE 0 END)
               * 4294967296 + l32 AS ph
      FROM halves
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ph, b.ph)) <= 3
    """


@register(
    "mm03_phash_dedup",
    _phash_dedup_oracle(),
    survey_ops=("X-MM-3",),
    doc="Multimodal near-dup detection: 64-bit perceptual-hash "
    "signatures over the binary media column (Arrow-batched "
    "mapInPandas — payload bytes cross to Python once, only a long "
    "returns), then pairs at hamming<=3 via the same distinct-"
    "signature pigeonhole blocking dd04 uses (llm_dedup.hamming_pairs: "
    "4x16-bit chunks, lossless, flood-proof). The hash itself is the "
    "documented md5-derived STUB (no image codec in this environment), "
    "so only identical payloads pair up — a real dHash drops into "
    "phash_signatures and the hamming<=3 blocking starts catching "
    "re-encoded/resized copies with the identical plan. Deterministic "
    "planted duplicates (same literals in both engines) keep the "
    "graded row non-vacuous on this duplicate-free corpus. At 100 TB: "
    "signature extraction is the only pass that reads payload bytes; "
    "pair generation runs on 8-byte signatures.",
)
def mm03_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.multimodal import phash_signatures
    from travel_data_ingestion_spark.queries.llm_dedup import hamming_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    planted = spark.createDataFrame(
        [(i, t, "planted") for i, t in _PLANTED_MEDIA],
        "doc_id long, text string, source string",
    )
    media = media_from_documents(docs.unionByName(planted))
    sigs = phash_signatures(media)
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
    "minima; the planted duplicate media collapse into a size-3 and a "
    "size-2 cluster every round, keeping the row non-vacuous. "
    "Propagation runs over edge endpoints only (O(pairs) per pass, "
    "converged-verified, memoized per run); the DuckDB oracle computes "
    "the same components with a recursive-CTE transitive closure. The "
    "incremental/streaming form of the same composition is "
    "ClusterIndex fed by mm03 pairs "
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
