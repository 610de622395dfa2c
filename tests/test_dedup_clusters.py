"""Semantic check for dd06: the iterative min-label propagation must
produce exactly the connected components of the (oracle-trusted) dd03
LSH pair graph — verified against a driver-side union-find."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries import all_queries


def _union_find_clusters(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    clusters = {}
    for x in list(parent):
        clusters.setdefault(find(x), set()).add(x)
    return {root: members for root, members in clusters.items() if len(members) > 1}


@pytest.mark.slow
def test_clusters_match_union_find(spark):
    specs = all_queries()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in specs["dd03_minhash_lsh_pairs"].fn(spark, SF_DIR).collect()
    ]
    expected = _union_find_clusters(pairs)
    got = {
        r.cluster_id: r
        for r in specs["dd06_dedup_clusters"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for root, members in expected.items():
        assert got[root].cluster_size == len(members)
        assert got[root].kept_doc_id == min(members)


def test_leakage_safe_split_never_straddles_near_dups(spark):
    """cu09's contract: two docs connected by ANY near-dup edge share a
    cluster representative, hence a split — a training doc's near-dup
    can never appear in val/test. Also sanity-check the hash quota
    roughly lands at 80/10/10 and every doc is assigned exactly once."""
    specs = all_queries()
    split_of = {
        r.doc_id: (r.split, r.cluster_rep)
        for r in specs["cu09_leakage_safe_split"].fn(spark, SF_DIR).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in specs["dd03_minhash_lsh_pairs"].fn(spark, SF_DIR).collect()
    ]
    assert pairs, "no near-dup pairs; leakage check vacuous"
    for a, b in pairs:
        assert split_of[a][0] == split_of[b][0], (a, b, split_of[a], split_of[b])
        assert split_of[a][1] == split_of[b][1]

    n = len(split_of)
    from travel_data_ingestion_spark.queries import load_table

    assert n == load_table(spark, SF_DIR, "documents").count()  # total, once each
    frac_train = sum(1 for s, _ in split_of.values() if s == "train") / n
    assert 0.7 <= frac_train <= 0.9, frac_train
    assert {s for s, _ in split_of.values()} == {"train", "val", "test"}


def test_propagate_min_labels_matches_union_find_on_random_graphs(spark):
    """The graph-generic propagation (mm04's path) must equal a Python
    union-find on arbitrary graph shapes — random sparse graphs plus a
    worst-case chain and a star, which stress the iteration bound and
    the min-label choice."""
    import random

    from travel_data_ingestion_spark.queries.llm_dedup import propagate_min_labels

    cases = []
    for seed in range(3):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        edges = {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(1, n * 2))
        }
        cases.append(edges)
    cases.append({(i, i + 1) for i in range(20)})        # chain (max diameter)
    cases.append({(0, i) for i in range(1, 15)})          # star
    cases.append({(0, 1), (2, 3), (4, 5), (1, 2)})        # partial merges

    for edges in cases:
        pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
        df = propagate_min_labels(pairs, "doc_a", "doc_b")
        labels = {r.node: r.label for r in df.collect()}
        df.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in {v for e in edges for v in e}}
        assert labels == expected, sorted(edges)
