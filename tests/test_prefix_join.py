"""dd02 prefix-filtered Jaccard join: losslessness + skew resistance.

The AllPairs/PPJoin prefix filter (llm_dedup._prefix_candidates) must
(a) find exactly the pairs the brute-force all-pairs definition finds —
the driver's DuckDB oracle checks this on the real tables; here we check
it on adversarial random corpora with planted near-duplicates — and
(b) generate candidates sub-quadratically when a hot stop-shingle is
shared by every document (the 100 TB skew case a naive shingle
self-join cannot survive).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries.llm_dedup import (
    _JACCARD_T,
    _jaccard_pairs_exact,
    _prefix_candidates,
    _shingles,
)


def _shingle_df(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.filter(F.size(toks) >= 3).select(
        "doc_id", _shingles(3).alias("shingles")
    )


def _py_shingles(text: str) -> frozenset:
    toks = text.strip().split()
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _py_bruteforce(texts):
    """Reference result computed independently of Spark and DuckDB."""
    sets = {i: _py_shingles(t) for i, t in enumerate(texts) if len(t.split()) >= 3}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= _JACCARD_T:
            out.append((a, b, round(inter / union, 6)))
    return sorted(out)


def test_hot_shingle_candidates_bounded(spark):
    """A shingle shared by all 60 docs must not create ~60^2/2 candidates."""
    texts = [
        "common hot phrase " + " ".join(f"u{i}w{j}" for j in range(10))
        for i in range(60)
    ]
    sh = _shingle_df(spark, texts)
    n_cand = _prefix_candidates(sh).count()
    # naive shingle self-join would emit 60*59/2 = 1770 candidate pairs;
    # the hot shingle sorts last in every doc's rarity order and falls
    # outside every prefix, and all other shingles have df=1.
    assert n_cand == 0
    assert _jaccard_pairs_exact(sh).count() == 0
    assert _py_bruteforce(texts) == []


def test_prefix_join_matches_bruteforce_on_random_corpora(spark):
    rng = random.Random(20260813)
    vocab = [f"tok{k}" for k in range(12)]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18)))
            for _ in range(24)
        ]
        # plant near-duplicates: copies with 0-2 perturbed tokens
        for src in rng.sample(range(len(texts)), 4):
            toks = texts[src].split()
            for _ in range(rng.randint(0, 2)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            texts.append(" ".join(toks))
        expected = _py_bruteforce(texts)
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in _jaccard_pairs_exact(_shingle_df(spark, texts)).collect()
        )
        assert got == expected, f"trial {trial}: {got} != {expected}"
        assert expected, f"trial {trial} vacuous — no pair above threshold"


def test_lsh_precision_exact_and_recall_floor(spark):
    """dd03's LSH candidates pass exact Jaccard verification, so every
    emitted pair must be in dd02's exact output (perfect precision by
    construction); banding recall over the real corpus must clear 0.9.
    Pins the xor-constant permutation family (one md5 per shingle fanned
    by fixed 60-bit xor constants — see minhash_band_rows; the
    h1 + i*h2 double-hashing family was rejected because h2 dominates at
    large i and collapses banding recall) against a silent quality
    regression."""
    from tests.conftest import SF_DIR
    from travel_data_ingestion_spark.queries.llm_dedup import (
        dd02_ngram_jaccard_pairs,
        dd03_minhash_lsh_pairs,
    )

    exact = {(r.doc_a, r.doc_b) for r in dd02_ngram_jaccard_pairs(spark, SF_DIR).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in dd03_minhash_lsh_pairs(spark, SF_DIR).collect()}
    assert exact, "corpus has no true near-dup pairs; recall check vacuous"
    assert lsh <= exact, f"false positives escaped verification: {sorted(lsh - exact)[:5]}"
    assert len(lsh) / len(exact) >= 0.9, (len(lsh), len(exact))
