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
- appends the batch to the index and returns the new pairs.

Failure semantics (exactly-once, crash-point-proof): ``foreachBatch``
re-runs an epoch after a crash. Index appends are exactly-once by the
doc-ledger anti-join; pairs are exactly-once because (a) the index is
updated with ``batch_id=epoch_id``, so a REPLAYED epoch recomputes the
same pairs it produced the first time (its own docs are excluded from
the "seen" set — see dedup_index.MinHashIndex.update), and (b) pairs
are written to an ``epoch_id=<N>`` partition with dynamic partition
overwrite, so the replay overwrites its own partition instead of
appending duplicates. A crash between the index commit and the pairs
write therefore loses nothing; a crash after the pairs write but before
the checkpoint commit duplicates nothing.

Batch twin: queries/llm_dedup.dd03_minhash_lsh_pairs (oracle-checked);
the pairs a stream accumulates match the one-shot batch run over the
same corpus (tests/test_dedup_index.py invariant + the cross-batch
streaming test in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from travel_data_ingestion_spark.dedup_index import EmbeddingIndex, MinHashIndex


def _write_pairs_idempotent(pairs: DataFrame, epoch_id: int, pairs_path: str) -> None:
    """Land an epoch's pairs exactly once across replays: write into the
    epoch's own partition with dynamic overwrite — the replayed epoch
    (which recomputes identical pairs under ``batch_id`` semantics)
    replaces its partition instead of appending a duplicate copy."""
    (
        pairs.withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(pairs_path)
    )


def neardup_stream(
    stream: DataFrame, index_path: str, pairs_path: str
) -> DataStreamWriter:
    """Wire a (doc_id, text, ...) stream into an incremental near-dup
    index; returns the ``DataStreamWriter`` ready to ``.start()``.

    New near-dup pairs (doc_a, doc_b, jaccard) land under ``pairs_path``
    partitioned by epoch as each micro-batch commits.
    """
    idx = MinHashIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = idx.update(
            batch_df.sparkSession,
            batch_df.select("doc_id", "text"),
            batch_id=epoch_id,
        )
        _write_pairs_idempotent(pairs, epoch_id, pairs_path)

    return stream.writeStream.foreachBatch(process).outputMode("update")


def embedding_neardup_stream(
    stream: DataFrame, index_path: str, pairs_path: str
) -> DataStreamWriter:
    """Same wiring for a (vec_id, e: array<double>, ...) embedding
    stream over ``EmbeddingIndex``: new cosine near-dup pairs
    (vec_a, vec_b, cos_sim) land per epoch partition."""
    idx = EmbeddingIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = idx.update(
            batch_df.sparkSession,
            batch_df.select("vec_id", "e"),
            batch_id=epoch_id,
        )
        _write_pairs_idempotent(pairs, epoch_id, pairs_path)

    return stream.writeStream.foreachBatch(process).outputMode("update")


def docfreq_stream(stream: DataFrame, index_path: str) -> DataStreamWriter:
    """Continuous corpus document-frequency maintenance: each
    micro-batch counts its fresh docs into ``text_index.DocFreqIndex``,
    so ``DocFreqIndex.df()`` serves the current corpus-wide shingle DF
    (the table behind TF-IDF / boilerplate / decontamination) at any
    point in the stream without re-counting the corpus.

    Exactly-once across crash replays: the index commits each epoch's
    increments as a fully-replaced ``batch_id=<epoch>`` partition
    BEFORE ledgering the docs, so a replayed epoch either no-ops (docs
    ledgered) or rewrites its own partition bit-identically (crash
    between the two writes) — see text_index's crash-window analysis.
    """
    from travel_data_ingestion_spark.text_index import DocFreqIndex

    idx = DocFreqIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        idx.update(
            batch_df.sparkSession,
            batch_df.select("doc_id", "text"),
            batch_id=epoch_id,
        )

    return stream.writeStream.foreachBatch(process).outputMode("update")


def clustered_neardup_stream(
    stream: DataFrame, index_path: str, cluster_path: str
) -> DataStreamWriter:
    """Continuous near-dup CLUSTER maintenance: each micro-batch updates
    the MinHash index, then feeds its new pairs + docs into the
    incremental ``ClusterIndex``, so ``ClusterIndex.clusters()`` serves
    the current dd06-equivalent answer at any point in the stream —
    without ever re-running connected components over the corpus.

    Replay of a crashed epoch is SELF-HEALING at both layers: the
    MinHash update re-emits the epoch's own pairs (``batch_id``
    semantics), the cluster index's assign anti-join skips
    already-indexed docs, and re-contracting the replayed pairs
    re-derives any merge the crash kept out of the remap log.
    """
    from travel_data_ingestion_spark.dedup_index import ClusterIndex

    idx = MinHashIndex(index_path)
    cc = ClusterIndex(cluster_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        # one materialization: the pairs feed the cluster contraction
        # (driver collect) AND nothing else — cache instead of recompute
        pairs = idx.update(
            batch_df.sparkSession, batch, batch_id=epoch_id
        ).cache()
        try:
            cc.update(batch_df.sparkSession, batch.select("doc_id"), pairs)
        finally:
            pairs.unpersist()

    return stream.writeStream.foreachBatch(process).outputMode("update")


def media_neardup_stream(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    signature_fn=None,
) -> DataStreamWriter:
    """Wire a (media_id, payload, ...) stream into the incremental
    perceptual-hash index: each micro-batch decodes + hashes ONLY its
    own payloads (PhashIndex stores signatures forever — decode is the
    expensive step), joins new signatures against the whole index via
    the pigeonhole blocking, and lands the epoch's new pairs into an
    epoch-partitioned parquet with dynamic overwrite — the same
    exactly-once-under-replay contract as neardup_stream, extended to
    media. ``signature_fn`` picks the modality kernel (image pHash by
    default; pass audio_phash_signatures for an audio stream)."""
    from travel_data_ingestion_spark.dedup_index import PhashIndex

    idx = PhashIndex(index_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = idx.update(
            batch_df.sparkSession,
            batch_df.select("media_id", "payload"),
            batch_id=epoch_id,
            signature_fn=signature_fn,
        )
        _write_pairs_idempotent(pairs, epoch_id, pairs_path)

    return stream.writeStream.foreachBatch(process).outputMode("update")
