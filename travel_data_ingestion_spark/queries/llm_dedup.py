"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over ``documents`` / ``embeddings``:

- exact (hash-groupBy)                         -> dd01, oracle-checked
- n-gram Jaccard (brute shingle self-join)     -> dd02, oracle-checked
- MinHash + LSH banding (the 100 TB scale path)-> dd03, rows-only check
- SimHash (bitwise near-dup)                   -> dd04, rows-only check
- embedding cosine near-dup                    -> dd05, oracle-checked

Scale notes: dd02's shingle self-join is quadratic in shingle frequency —
it is the *verifier*, not the candidate generator. At 100 TB, dd03
generates candidates in O(docs x bands) via LSH bucketing (band-hash
shuffle, uniform keys), and only candidate pairs pay the exact-Jaccard
verification. That is exactly how the pipeline composes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries import load_table, register

_TOKENIZE_SQL = "string_split_regex(trim(text), '\\s+')"

# 3-token shingles, distinct, as a DuckDB fragment (1-based lists).
_SHINGLES_SQL = f"""
  list_distinct(list_transform(
    range(1, greatest(len({_TOKENIZE_SQL}) - 1, 1)),
    i -> {_TOKENIZE_SQL}[i] || ' ' || {_TOKENIZE_SQL}[i+1] || ' ' || {_TOKENIZE_SQL}[i+2]))
"""


def _shingles(n: int = 3) -> F.Column:
    """Distinct n-token shingles as a native higher-order expression."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, gram).otherwise(F.array()))


@register(
    "dd01_exact_dedup",
    """
    WITH keyed AS (
      SELECT doc_id, source,
             md5(lower(trim(text))) AS content_key
      FROM documents
    )
    SELECT content_key,
           MIN(doc_id) AS kept_doc_id,
           COUNT(*) AS group_size,
           COUNT(*) - 1 AS n_removed
    FROM keyed
    GROUP BY content_key
    """,
    survey_ops=("X-DEDUP-1",),
    doc="Exact dedup: hash-groupBy on normalized content, keep the "
    "smallest doc_id per group. One shuffle on a uniform 128-bit key — "
    "no skew possible, scales to any corpus size.",
)
def dd01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.groupBy(key.alias("content_key")).agg(
        F.min("doc_id").alias("kept_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) - 1).alias("n_removed"),
    )


@register(
    "dd02_ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles
      FROM documents
      WHERE len({_TOKENIZE_SQL}) >= 3
    ),
    ex AS (
      SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle FROM sh
    ),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             MAX(a.n_sh) AS n_a, MAX(b.n_sh) AS n_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
    FROM common
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.35
    """,
    survey_ops=("X-DEDUP-2",),
    doc="n-gram Jaccard near-dup pairs by exact shingle-set comparison "
    "(3-token shingles, threshold 0.35). Quadratic in shingle frequency: "
    "this is the verification stage; candidate generation at scale is "
    "dd03's LSH.",
)
def dd02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sh = (
        docs.filter(F.size(toks) >= 3)
        .select("doc_id", _shingles(3).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.max("a.n_sh").alias("n_a"),
            F.max("b.n_sh").alias("n_b"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return common.filter(jac >= 0.35).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@register(
    "dd03_minhash_lsh_pairs",
    None,  # xxhash64 minhash signatures are engine-specific -> rows-only check
    survey_ops=("X-DEDUP-3",),
    doc="MinHash + LSH banding: 32 permutations (xxhash64 with seed "
    "columns), 8 bands x 4 rows; docs sharing any band bucket become "
    "candidates, candidates are verified with exact shingle Jaccard. "
    "This is the 100 TB dedup path: O(docs x 32) map work + a uniform "
    "band-hash shuffle; only colliding pairs pay the quadratic verify. "
    "Non-SQL-expressible in the oracle (engine-specific hash), checked "
    "rows-only; the verify stage reuses dd02's oracle-checked Jaccard.",
)
def dd03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_perm, n_bands = 32, 8
    rows_per_band = n_perm // n_bands
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sh = (
        docs.filter(F.size(toks) >= 3)
        .select("doc_id", _shingles(3).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    # 32 minhash values per doc in ONE aggregation pass (no per-perm scan).
    minhash = ex.groupBy("doc_id").agg(
        F.max("n_sh").alias("n_sh"),
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(n_perm)
        ],
    )
    # band signatures -> (band_id, sig) bucket keys
    bands = minhash.select(
        "doc_id",
        "n_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "n_sh", "band.band_id", "band.sig")
    ba, bb = bands.alias("a"), bands.alias("b")
    candidates = (
        ba.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    # exact-Jaccard verification of the candidate pairs only
    exa = ex.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    exb = ex.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("sh_b"))
    verified = (
        candidates.join(exa, "doc_a")
        .join(exb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        verified.filter(jac >= 0.35)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dd04_simhash",
    None,  # engine-specific 64-bit hash -> rows-only check
    survey_ops=("X-DEDUP-4",),
    doc="SimHash: 64-bit signature per doc (per-bit majority vote over "
    "xxhash64(token) bits), then near-dup pairs at hamming distance <= 3 "
    "via bit_count(xor). Signature build is one aggregation pass (64 "
    "conditional sums, all codegen'd). The pair scan here is brute-force "
    "(fine at this SF); at 100 TB you block on 4 16-bit signature chunks "
    "(pigeonhole: hamming<=3 pairs share at least one exact chunk).",
)
def dd04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("token"))
    h = F.xxhash64("token")
    # per-bit majority: sum(+1/-1) per bit, one pass
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: xor == or
    sigs = votes.select("doc_id", sig.alias("simhash"))
    a, b = sigs.alias("a"), sigs.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dd05_embedding_neardup",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
               AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, ROUND(cos_sim, 4) AS cos_sim
    FROM pairs WHERE ROUND(cos_sim, 4) >= 0.99
    """,
    survey_ops=("X-DEDUP-5",),
    doc="Embedding cosine near-dup pairs (threshold 0.99 on the rounded "
    "score; rounding pins cross-engine float determinism). Brute O(n^2) "
    "at this SF; the scale path is sim02's LSH bucketing, which cuts "
    "the candidate set before this exact scoring.",
)
def dd05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def dot(x: F.Column, y: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
        )

    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (
        F.sqrt(dot(F.col("a.e"), F.col("a.e"))) * F.sqrt(dot(F.col("b.e"), F.col("b.e")))
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.99)
    )


@register(
    "dd06_dedup_clusters",
    None,  # iterative fixpoint algorithm -> rows-only check
    survey_ops=("X-DEDUP-6",),
    doc="Near-dup clustering: connected components over the dd02 "
    "candidate-pair graph via iterative minimum-label propagation "
    "(large-star/small-star style). Each doc's cluster id converges to "
    "the smallest doc_id reachable through near-dup edges; survivors = "
    "cluster minima. Iterations are bounded by the graph diameter "
    "(driver loop over DataFrame ops — each pass is one shuffle; "
    "O(log n) passes in practice). This is the canonical 'keep one per "
    "duplicate cluster' pass after any pairwise dedup at 100 TB.",
)
def dd06_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dd02_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # undirected edge list + self-loops so singletons keep their own label
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(10):  # diameter bound; converges in ~log(n) passes
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("kept_doc_id"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("cluster_id")
    )
