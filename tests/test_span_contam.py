"""cu11 span-level contamination: island-merge semantics, pinned.

Planted fixture for ``merge_hit_spans``: overlapping and adjacent hit
shingles must merge into one span; a gap of >= 2 tokens between covered
ranges must split spans. Plus a cross-check that cu11's per-doc shingle
totals agree with cu03's exact hit counts (same benchmark split, same
3-gram join — cu11 only adds WHERE in the doc each hit lands).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries.llm_curation import (
    cu03_decontaminate,
    cu11_span_contamination,
    merge_hit_spans,
)


def test_merge_hit_spans_islands(spark):
    # n=3: a hit at pos p covers tokens [p, p+2].
    # doc 1: hits at 0,1,2 overlap -> one span [0,4];
    #        hit at 6 is adjacent to end 4+1=5? no: 6 > 4+1 -> new span [6,8];
    #        hit at 9 starts exactly at 8+1 -> merges -> [6,11].
    # doc 2: single hit -> [5,7].
    hits = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2), (1, 6), (1, 9), (2, 5)],
        "doc_id int, pos int",
    )
    rows = {
        (r.doc_id, r.span_idx): (r.span_start, r.span_end, r.span_tokens, r.n_hit_shingles)
        for r in merge_hit_spans(hits, 3).collect()
    }
    assert rows == {
        (1, 1): (0, 4, 5, 3),
        (1, 2): (6, 11, 6, 2),
        (2, 1): (5, 7, 3, 1),
    }


def test_span_totals_match_exact_decontam(spark):
    spans = cu11_span_contamination(spark, SF_DIR).collect()
    assert spans, "fixture vacuous: no contaminated spans at test SF"
    per_doc: dict[int, int] = {}
    for r in spans:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_hit_shingles
        assert r.span_end - r.span_start + 1 == r.span_tokens
        assert r.span_tokens >= 3  # a single 3-gram hit covers 3 tokens

    # cu03 reports docs over the 0.2 ratio with n_hit counted over the
    # doc's DISTINCT shingles; cu11 counts every hit POSITION. So every
    # cu03-flagged doc must appear with at least that many positional
    # hits (equality unless the doc repeats a contaminated shingle).
    exact = {r.doc_id: r.n_hit for r in cu03_decontaminate(spark, SF_DIR).collect()}
    assert exact, "fixture vacuous: cu03 flagged nothing"
    for d, n in exact.items():
        assert per_doc.get(d, 0) >= n, (d, per_doc.get(d), n)


def test_excision_consistent_with_spans(spark):
    """cu13's token accounting must agree with cu11's spans (removed ==
    sum of span widths, spans disjoint so no double-count), and its
    clean_md5 must equal a straight Python excision of the raw text."""
    import hashlib

    from travel_data_ingestion_spark.queries import load_table
    from travel_data_ingestion_spark.queries.llm_curation import cu13_span_excision

    spans: dict[int, list[tuple[int, int]]] = {}
    for r in cu11_span_contamination(spark, SF_DIR).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    out = {r.doc_id: r for r in cu13_span_excision(spark, SF_DIR).collect()}
    assert set(out) == set(spans)

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin(list(out)))
        .collect()
    }
    for d, r in out.items():
        widths = sum(e - s + 1 for s, e in spans[d])
        assert r.n_spans == len(spans[d])
        assert r.n_tokens_removed == widths, (d, r.n_tokens_removed, widths)
        # ASCII whitespace class, NOT \s: Python re is Unicode-aware
        # while Java/RE2 \s is effectively ASCII — a \xa0 in a fixture
        # would silently diverge this re-tokenization from both engines.
        toks = re.split(r"[ \t\n\x0b\f\r]+", texts[d].strip())
        assert r.n_tokens_before == len(toks)
        covered = {i for s, e in spans[d] for i in range(s, e + 1)}
        clean = " ".join(t for i, t in enumerate(toks) if i not in covered)
        # fully-excised doc -> NULL (oracle's array_to_string([]) is
        # NULL), otherwise md5 of the kept sequence
        expected = hashlib.md5(clean.encode()).hexdigest() if clean else None
        assert r.clean_md5 == expected, d


@pytest.mark.parametrize("n", [2, 4])
def test_span_helpers_lockstep_with_generated_oracle(spark, ddb, n):
    """_benchmark_hits/merge_hit_spans with n != 3 must equal the
    _span_ctes(n)-generated DuckDB SQL — the two sides are generated
    from the same parameter, so changing n can't silently diverge the
    helpers from the oracle (the registered cu11/cu13 oracles are the
    n=3 instance of the same generator)."""
    from travel_data_ingestion_spark.queries.llm_curation import (
        _benchmark_hits,
        _span_ctes,
    )

    got = {
        (r.doc_id, r.span_idx): (
            r.span_start,
            r.span_end,
            r.span_tokens,
            r.n_hit_shingles,
        )
        for r in merge_hit_spans(_benchmark_hits(spark, SF_DIR, n), n).collect()
    }
    want = {
        (d, i): (s, e, t, h)
        for d, i, s, e, t, h in ddb.execute(
            f"WITH {_span_ctes(n)} SELECT doc_id, span_idx, span_start, "
            "span_end, span_tokens, n_hit_shingles FROM spans"
        ).fetchall()
    }
    assert got == want


def test_crossdoc_span_dedup_planted(spark, tmp_path):
    """t12's kernel on a planted corpus: a 6-token run shared verbatim by
    two docs becomes ONE merged span in each (two overlapping 5-gram
    hits); unique text contributes nothing; a doc sharing with BOTH
    others still reports per-doc spans."""
    from travel_data_ingestion_spark.queries.llm_curation import (
        merge_hit_spans,
        positional_shingles,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (1, f"{shared} unique one tail here"),
        (2, f"lead in words {shared}"),
        (3, "entirely different text with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 5
    pos_sh = positional_shingles(docs, n)
    dupg = (
        pos_sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("shingle")
    )
    spans = merge_hit_spans(pos_sh.join(dupg, "shingle").select("doc_id", "pos"), n)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in spans.collect()
    }
    # doc 1: shared run at tokens [0,5] -> hits at pos 0 and 1 -> one span
    # doc 2: shared run at tokens [3,8] -> hits at pos 3 and 4 -> one span
    assert got == {(1, 0, 5, 6), (2, 3, 8, 6)}


def test_attribution_splits_merged_islands(spark):
    """The semantic cu11 cannot express: one contiguous hit region
    quoting TWO different benchmark docs reports two attributed spans
    keyed by benchmark_id where the unattributed merge yields one
    island. Planted: positions 0-1 hit benchmark 100, positions 2-3
    hit benchmark 200 — adjacent, so cu11-style merging over plain
    (doc_id, pos) gives one span [0,5], while attribution keeps
    [0,3]@100 and [2,5]@200 apart."""
    attributed = spark.createDataFrame(
        [(1, 100, 0), (1, 100, 1), (1, 200, 2), (1, 200, 3)],
        "doc_id int, benchmark_id int, pos int",
    )
    rows = {
        (r.doc_id, r.benchmark_id, r.span_idx): (r.span_start, r.span_end)
        for r in merge_hit_spans(
            attributed, 3, keys=("doc_id", "benchmark_id")
        ).collect()
    }
    assert rows == {(1, 100, 1): (0, 3), (1, 200, 1): (2, 5)}
    merged = {
        (r.doc_id, r.span_idx): (r.span_start, r.span_end)
        for r in merge_hit_spans(
            attributed.select("doc_id", "pos").distinct(), 3
        ).collect()
    }
    assert merged == {(1, 1): (0, 5)}


@pytest.mark.parametrize("n", [2, 4])
def test_attribution_lockstep_with_generated_oracle(spark, ddb, n):
    """cu16's helpers with n != 3 must equal the _span_attr_ctes(n)-
    generated DuckDB SQL — same same-parameter-generation guarantee as
    the cu11/cu13 lockstep test; the registered cu16 oracle is the
    n=3 instance."""
    from travel_data_ingestion_spark.queries.llm_curation import (
        _benchmark_hits_attributed,
        _span_attr_ctes,
    )

    got = {
        (r.doc_id, r.benchmark_id, r.span_idx): (
            r.span_start, r.span_end, r.span_tokens, r.n_hit_shingles,
        )
        for r in merge_hit_spans(
            _benchmark_hits_attributed(spark, SF_DIR, n), n,
            keys=("doc_id", "benchmark_id"),
        ).collect()
    }
    want = {
        (d, b, i): (s, e, t, h)
        for d, b, i, s, e, t, h in ddb.execute(
            f"WITH {_span_attr_ctes(n)} SELECT doc_id, benchmark_id, "
            "span_idx, span_start, span_end, span_tokens, "
            "n_hit_shingles FROM attr_spans"
        ).fetchall()
    }
    assert got == want


def test_attribution_unions_to_cu11_islands(spark):
    """Consistency across the family at the graded n=3: the union of a
    doc's attributed hit positions IS the doc's unattributed hit set,
    so cu11's islands must equal re-merging cu16's underlying
    positions with attribution dropped."""
    from travel_data_ingestion_spark.queries.llm_curation import (
        _benchmark_hits,
        _benchmark_hits_attributed,
    )

    plain = {(r.doc_id, r.pos)
             for r in _benchmark_hits(spark, SF_DIR, 3).collect()}
    attr = {(r.doc_id, r.pos)
            for r in _benchmark_hits_attributed(spark, SF_DIR, 3)
            .select("doc_id", "pos").distinct().collect()}
    assert plain == attr and plain, "attribution changed the hit set"
