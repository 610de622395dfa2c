"""BPE merge training — learning a tokenizer from the corpus.

t07 counts tokens under a FIXED BPE-style regex; a training-data
pipeline also needs the other direction: learn the merge table itself
from the corpus (the classic byte-pair-encoding trainer of Sennrich et
al. 2016). The algorithm is inherently iterative — k rounds of "count
adjacent symbol pairs, merge the most frequent everywhere" — and this
module implements it Spark-shaped:

- the unit of distribution is the DISTINCT-WORD table (word, count,
  symbol string), not the corpus: pair statistics are identical when
  weighted by word count, and the word table is orders of magnitude
  smaller than 100 TB of text (a few hundred million rows at crawl
  scale vs trillions of tokens);
- each round is ONE distributed aggregation (explode adjacent pairs,
  weighted count, global top-1) plus a map-only merge application;
  the only driver traffic is the single winning pair per round — a
  k-row control plane, the same bounded-iteration shape as dd06's
  connected-components loop;
- the evolving word table is re-persisted each round (and the
  previous round unpersisted) so round i+1 scans a materialized
  table instead of recomputing i rounds of lineage.

Exact semantics (pinned so the DuckDB oracle generator
``queries.llm_text._bpe_oracle_sql`` cannot drift — both sides are
the same algorithm over the same representation):

- words: lowercased ``[a-z]+`` runs of ``text``, words longer than
  ``max_word_chars`` (default 16) dropped — the standard trainer
  hygiene cap (crawl-scale "words" beyond that are junk: hashes,
  URL fragments, DNA strings);
- initial symbols: the word's characters joined by two spaces (no
  end-of-word marker — documented simplification; adding one is a
  representation change, not an algorithm change);
- pair selection: maximum total count, ties broken by ascending pair
  string — fully deterministic;
- symbol strings join symbols with TWO spaces and merge application
  pads with one flanking space and runs ONE literal replace:
  ``" L  R "`` -> ``" LR "``. The double separator is load-bearing:
  a match consumes only ONE of the two spaces on each side, so the
  neighbouring symbols keep their own boundaries and the replace
  scan can match again IMMEDIATELY after a merge — which makes a
  single left-to-right non-overlapping replace pass exactly the
  textbook BPE merge application (hypothesis-pinned against a
  reference scan, including the self-overlapping ``a a a a a`` +
  ``(a,a)`` case where single-space encodings skip the symbol after
  each merge and diverge). Spark's ``replace`` and DuckDB's
  ``replace`` share the scan semantics, so the form is
  engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORD_PAT = "[a-z]+"


def word_symbol_table(docs: DataFrame, max_word_chars: int = 16) -> DataFrame:
    """documents(text) -> (word, cnt, symbols): the distinct-word table
    BPE trains on, with the initial per-character symbol string."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_WORD_PAT), 0)
        ).alias("word")
    ).filter(F.length("word") <= max_word_chars)
    sym = F.expr(
        "array_join(transform(sequence(1, length(word)),"
        " i -> substr(word, i, 1)), '  ')"
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("symbols", sym)
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, pc): adjacent symbol pairs weighted by word count."""
    pairs = F.expr(
        "transform(sequence(1, size(split(symbols, '  ')) - 1),"
        " j -> concat(element_at(split(symbols, '  '), j), ' ',"
        "             element_at(split(symbols, '  '), j + 1)))"
    )
    return (
        words.filter(F.size(F.split("symbols", "  ")) >= 2)
        .select("cnt", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pc"))
    )


def bpe_train_merges(
    docs: DataFrame, k: int, max_word_chars: int = 16
) -> DataFrame:
    """Learn the first ``k`` BPE merges from documents(text); returns
    (merge_rank, left_sym, right_sym, pair_count) — the merge table a
    tokenizer applies in rank order. Distributed per round: one pair
    aggregation over the word table + a map-only merge application;
    driver traffic is one row per round (the winner)."""
    spark = docs.sparkSession
    words = word_symbol_table(docs, max_word_chars).persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, k + 1):
            top = (
                _pair_counts(words)
                .orderBy(F.desc("pc"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break  # every word is a single symbol already
            pair, pc = top[0]["pair"], int(top[0]["pc"])
            left, right = pair.split(" ", 1)
            merges.append((rank, left, right, pc))
            col = F.replace(
                F.concat(F.lit(" "), F.col("symbols"), F.lit(" ")),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            )
            nxt = words.withColumn("symbols", F.trim(col)).persist()
            nxt.count()  # materialize before dropping the parent
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              max_word_chars: int = 16) -> DataFrame:
    """Tokenize with a LEARNED merge table: apply ``merges`` in rank
    order to every word and count the resulting subword tokens per
    document — the inference side of ``bpe_train_merges`` (and the
    learned-vocabulary upgrade of t07's fixed-regex counting).

    ``merges`` is driver-known (a tokenizer's merge table is a small
    artifact by definition — 32k–100k rows in production — and k
    literal patterns compile into the plan), so the whole operator is
    MAP-ONLY: per word, the same single-pass double-separator literal
    replace the trainer uses, applied merge-by-merge in rank order;
    then one per-doc aggregation of subword counts. Words over the trainer's
    length cap count as one opaque token each (they were never merge
    candidates)."""
    words = F.regexp_extract_all(F.lower("text"), F.lit(_WORD_PAT), 0)

    def tokens_of(word_col):
        sym = F.concat(
            F.lit(" "),
            F.expr(
                "array_join(transform(sequence(1, length(w)),"
                " i -> substr(w, i, 1)), '  ')"
            ),
            F.lit(" "),
        )
        for left, right in merges:
            sym = F.replace(
                sym, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        return F.when(
            F.length(word_col) <= max_word_chars,
            F.size(F.split(F.trim(sym), "  ")),
        ).otherwise(F.lit(1))

    exploded = (
        docs.select("doc_id", F.explode(words).alias("w"))
    )
    return (
        exploded.select("doc_id", tokens_of(F.col("w")).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").cast("long").alias("n_subwords"),
        )
    )
