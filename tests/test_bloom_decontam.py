"""cu08 Bloom decontamination: one-sided error, pinned.

A Bloom filter admits false positives, never false negatives — so every
doc cu03's exact shingle-join flags at the 0.2 threshold MUST also be
flagged by cu08 (a bloom-hit count is >= the exact hit count for every
doc), and the FP margin should stay small at the chosen m/k (8 KB / 3
hashes vs ~1-5k benchmark shingles at test SFs).
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries.llm_curation import (
    cu03_decontaminate,
    cu08_bloom_decontam,
)


def test_bloom_flags_superset_of_exact(spark):
    exact = {r.doc_id: r.n_hit for r in cu03_decontaminate(spark, SF_DIR).collect()}
    bloom = {r.doc_id: r.n_hits for r in cu08_bloom_decontam(spark, SF_DIR).collect()}

    assert exact, "fixture vacuous: exact decontamination flagged nothing"
    # no false negatives: every exactly-flagged doc is bloom-flagged,
    # with at least as many hits
    missing = set(exact) - set(bloom)
    assert not missing, f"bloom dropped exactly-contaminated docs: {sorted(missing)[:5]}"
    for d, n in exact.items():
        assert bloom[d] >= n, (d, bloom[d], n)

    # false-positive margin: the bloom sweep should not flag wildly more
    # docs than the exact one at this m/k and corpus size
    assert len(bloom) <= 3 * len(exact), (len(bloom), len(exact))
