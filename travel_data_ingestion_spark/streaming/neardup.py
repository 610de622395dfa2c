"""Streaming near-dup detection — the continuous twin of dd03.

Exact streaming dedup (``streaming/dedup.py``) drops byte-identical
re-deliveries; a crawler stream also needs NEAR-duplicate detection
(boilerplate re-crawls, templated pages). Spark's stateful operators
can't hold a MinHash index in watermark state — the "state" is the
whole corpus seen so far, keyed by LSH bucket, and a new doc must probe
buckets, not keys. So the stream composes with the incremental index
instead: ``foreachBatch`` feeds each micro-batch through
``dedup_index.MinHashIndex.update``, which

- computes signatures for the batch only (O(batch), never O(corpus)),
- equi-joins the batch's band rows against the persisted bucket table,
- appends the batch to the index and the new pairs to the pairs table.

Failure semantics: ``foreachBatch`` re-runs an epoch after a crash, and
the index's doc-ledger anti-join makes a replay a no-op (0 new docs,
0 new pairs appended) — exactly-once for both the index and the pairs
output without any extra bookkeeping.

Batch twin: queries/llm_dedup.dd03_minhash_lsh_pairs (oracle-checked);
the pairs a stream accumulates match the one-shot batch run over the
same corpus (tests/test_dedup_index.py invariant + the cross-batch
streaming test in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from travel_data_ingestion_spark.dedup_index import EmbeddingIndex, MinHashIndex


def neardup_stream(
    stream: DataFrame, index_path: str, pairs_path: str
) -> DataStreamWriter:
    """Wire a (doc_id, text, ...) stream into an incremental near-dup
    index; returns the ``DataStreamWriter`` ready to ``.start()``.

    New near-dup pairs (doc_a, doc_b, jaccard) append to ``pairs_path``
    as each micro-batch lands.
    """
    idx = MinHashIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = idx.update(batch_df.sparkSession, batch_df.select("doc_id", "text"))
        pairs.write.mode("append").parquet(pairs_path)

    return stream.writeStream.foreachBatch(process).outputMode("update")


def embedding_neardup_stream(
    stream: DataFrame, index_path: str, pairs_path: str
) -> DataStreamWriter:
    """Same wiring for a (vec_id, e: array<double>, ...) embedding
    stream over ``EmbeddingIndex``: new cosine near-dup pairs
    (vec_a, vec_b, cos_sim) append to ``pairs_path`` per micro-batch."""
    idx = EmbeddingIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = idx.update(batch_df.sparkSession, batch_df.select("vec_id", "e"))
        pairs.write.mode("append").parquet(pairs_path)

    return stream.writeStream.foreachBatch(process).outputMode("update")


def clustered_neardup_stream(
    stream: DataFrame, index_path: str, cluster_path: str
) -> DataStreamWriter:
    """Continuous near-dup CLUSTER maintenance: each micro-batch updates
    the MinHash index, then feeds its new pairs + docs into the
    incremental ``ClusterIndex``, so ``ClusterIndex.clusters()`` serves
    the current dd06-equivalent answer at any point in the stream —
    without ever re-running connected components over the corpus.

    Replay of a crashed epoch is a no-op at BOTH layers: the MinHash
    doc-ledger yields 0 new pairs, and the cluster index's assign
    anti-join skips already-indexed docs.
    """
    from travel_data_ingestion_spark.dedup_index import ClusterIndex

    idx = MinHashIndex(index_path)
    cc = ClusterIndex(cluster_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        # one materialization: the pairs feed the cluster contraction
        # (driver collect) AND nothing else — cache instead of recompute
        pairs = idx.update(batch_df.sparkSession, batch).cache()
        try:
            cc.update(batch_df.sparkSession, batch.select("doc_id"), pairs)
        finally:
            pairs.unpersist()

    return stream.writeStream.foreachBatch(process).outputMode("update")
