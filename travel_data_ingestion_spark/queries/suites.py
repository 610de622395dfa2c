"""Composite "suite" queries: registry consolidation under the driver's
50-query grading cap.

The driver grades at most 50 registered queries (sorted-name order), so
fine-grained operator queries are folded into composite suites: each
suite runs its member queries unchanged and unions their results as
canonically rendered strings (one ``row_str`` column), and its DuckDB
oracle is the UNION ALL of the members' oracles wrapped in the identical
rendering. The value-level evidence is exactly as strong as grading the
members separately — the rendering is a bijection per row (a part label
plus every column value, fixed order, fixed formatting) — while freeing
registry slots so every flagship query lands inside the graded window.

Canonical rendering (both engines, column-name-sorted order):
- integers/booleans/dates -> plain string cast (identical text forms);
- floats/decimals -> ROUND(x, 6) cast to DECIMAL(38,6) then string, so
  both engines print the same fixed-point form of the same double
  (member queries already pin cross-engine float determinism —
  decimal-accumulated sums, pre-rounded scores);
- timestamps -> 'yyyy-MM-dd HH:mm:ss' text;
- NULL -> chr(1) sentinel (concat_ws would otherwise silently skip
  nulls and mis-align columns);
- row = concat_ws(chr(31), part_label, col1, col2, ...).

The member -> rendered-column-kind map is captured from the live engines
by ``python -m travel_data_ingestion_spark.queries.suites`` (regenerates
``suites_kinds.py``) and committed, so ``oracle_sql()`` stays static.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"
NULL_TOKEN = "\x01"

# suite name -> (member query names, doc)
SUITES: dict[str, tuple[list[str], str]] = {
    "su01_join_suite": (
        [
            "c01_left_join_computed_key",
            "c02_full_outer_date_shift",
            "c04_scaffold_densify",
            "c05_anti_join",
            "c06_semi_join",
            "c08_lookup_map_join",
            "c09_asof_join",
            "g01_union_distinct",
            "g02_intersect_except",
        ],
        "Join + set-operation suite (SURVEY §2.C/G): left/full-outer/"
        "anti/semi/map-lookup/as-of joins, scaffold densification, "
        "union/intersect/except — each member unchanged, results "
        "canonically rendered and unioned.",
    ),
    "su02_agg_suite": (
        [
            "d03_minute_grain_stats",
            "d04_conditional_zone_counts",
            "d05_distinct",
            "d06_pivot_sum_case",
            "d07_listagg",
            "d10_avg_of_hourly_avg",
            "d13_max_scalar",
            "d15_percentiles",
            "d17_rollup",
            "d18_unpivot",
            "d19_cube",
            "zo01_zorder_skip_ratio",
        ],
        "Aggregation suite (SURVEY §2.D + grouping-sets/percentile "
        "extensions): grains, conditional counts, distinct, SUM(CASE) "
        "pivot, listagg, avg-of-avg, scalar max, exact percentiles, "
        "rollup, unpivot, cube, and the Z-order layout skip-ratio "
        "contract (min/max file-stats aggregation over the "
        "maintenance.zorder_value interleave).",
    ),
    "su03_window_suite": (
        [
            "e01_latest_batch_filter",
            "e02_dedup_row_number",
            "e03_running_total",
            "e05_rank_lag_lead",
            "e06_range_frame_moving_avg",
            "f04_top_k",
        ],
        "Window + ordering suite (SURVEY §2.E/F): latest-batch QUALIFY, "
        "recency dedup, running totals, rank/lag/lead/ntile, RANGE-frame "
        "moving window, top-k.",
    ),
    "su04_scalar_suite": (
        [
            "b08_default_missing_column",
            "h01_string_normalize",
            "h03_currency_clean_cast",
            "h07_try_to_date",
            "h08_datetime_parts",
            "h12_case_when_branches",
            "h15_json_extract_flatten",
            "h17_geo_string_parse",
            "h18_map_ops",
            "i03_bearing",
        ],
        "Scalar-function suite (SURVEY §2.B/H/I): column defaulting, "
        "normalization, currency cleanup, try-parse, datetime parts, "
        "CASE branches, JSON path + map access, geo parsing, bearing "
        "trig.",
    ),
    "su05_curation_suite": (
        [
            "cu01_hash_sample",
            "cu02_stratified_quota",
            "cu03_decontaminate",
            "cu04_corpus_stats",
            "cu05_pii_redact",
            "cu11_span_contamination",
            "cu12_weighted_curriculum",
            "cu13_span_excision",
            "cu14_token_budget_mix",
            "cu15_epoch_repeat_mix",
            "cu16_span_attribution",
            "cu17_rank_weighted_sample",
        ],
        "Corpus-curation suite: deterministic hash sampling, stratified "
        "quotas, benchmark decontamination, per-source stats, PII "
        "redaction, span-level contamination reporting (with per-"
        "benchmark attribution) and excision, "
        "config-weighted curriculum export, token-budget mixture "
        "selection, multi-epoch source repetition, and rank-weighted "
        "sampling (PageRank as the page-quality weight, deterministic "
        "md5-uniform acceptance — the curation consumer of the link "
        "graph).",
    ),
    "su06_text_doc_suite": (
        [
            "t01_token_count",
            "t02_quality_score",
            "t03_langid",
            "t04_fingerprint",
            "t07_bpe_regex_tokens",
            "t13_doc_chunking",
            "t15_html_extract",
            "t18_text_normalize",
            "t19_url_normalize",
        ],
        "Per-document text-analysis suite: token counts, quality "
        "scoring, language-ID, fingerprinting, BPE-regex tokenization, "
        "fixed-window token chunking with overlap — all map-only "
        "Catalyst expressions — plus real HTML -> text extraction "
        "(stdlib HTMLParser over an invertible corpus wrapping and "
        "hand-adversarial planted markup), mojibake/Unicode text "
        "normalization (corpus = verified fixed point; planted "
        "cp1252/double-encoded pairs), and URL canonicalization for "
        "dedup-by-URL.",
    ),
    "su07_text_corpus_suite": (
        [
            "t05_vocabulary",
            "t06_tfidf_keywords",
            "t08_sequence_pack",
            "t09_repetition_stats",
            "t10_boilerplate_coverage",
            "t11_unigram_logprob",
            "t12_crossdoc_span_dedup",
            "t16_warc_records",
            "t17_webdataset_samples",
            "t20_audio_tags",
            "t21_robots_frontier",
            "t22_politeness_schedule",
            "t23_sitemap_capture",
            "t24_sitemap_parse",
            "t25_bpe_train",
            "t26_bpe_apply",
            "t27_recrawl_priority",
            "t28_outlink_extract",
            "t29_pagerank",
            "t30_crawl_round",
        ],
        "Corpus-level text suite: vocabulary statistics, TF-IDF "
        "keyword extraction, training-sequence packing, Gopher-style "
        "repetition stats, cross-document boilerplate coverage, "
        "unigram-LM quality scoring, cross-document repeated-span "
        "detection (exact-substring dedup family), WARC crawl-"
        "archive ingestion (per-record gzip members incl. a planted "
        "over-the-bomb-cap member, chunked/gzip HTTP decode, the "
        "WARC -> HTTP -> HTML -> text chain), WebDataset tar-shard "
        "sample grouping, crawled-audio tag extraction (ID3v1/"
        "v2 incl. unsynchronisation, RIFF INFO, FLAC Vorbis "
        "comments), and RFC 9309 robots.txt frontier filtering "
        "(longest-match, wildcards/anchors, agent groups, "
        "crawl-delay), per-host politeness scheduling (fetch_seq/"
        "fetch_after from crawl_delay with a max_per_host budget), and "
        "sitemap capture (global Sitemap records -> per-host frontier "
        "seed table), sitemap XML parsing (urlset/sitemapindex, "
        "gzip, protocol caps, DTD rejection), recrawl freshness "
        "scheduling (changefreq/lastmod -> next-due against a fixed "
        "instant), outlink extraction (RFC 3986 resolution w/ base-tag "
        "override, scheme filtering, nofollow), PageRank over the "
        "outlink graph (k power iterations, dangling redistribution, "
        "checkpoint-truncated lineage), BPE merge training + "
        "application (learn the first k merges from the corpus via the "
        "bounded-iteration distributed trainer over the distinct-word "
        "table; tokenize under a given merge table map-only), and one "
        "full composed crawl-frontier round (outlinks + sitemap seeds "
        "-> canonicalize -> ledger anti-join -> robots filter -> "
        "politeness schedule — every stage the graded operator, "
        "unchanged).",
    ),
    "su08_incremental_index_suite": (
        [
            "mm05_incremental_phash_resolve",
            "t14_incremental_docfreq",
            "t31_incremental_linkgraph",
        ],
        "Incremental-index suite (the dd08 pattern extended to the "
        "media and text index families; the ANN family's equivalent "
        "row is the DIRECT sim08 query — folding its KMeans + PQ "
        "plans into this union measurably overflowed a default-1g "
        "grading session): two-batch media ingest through PhashIndex "
        "+ ClusterIndex vs a one-shot transitive-closure oracle "
        "(every planted cross-container clique straddles the batch "
        "boundary), three-batch + compact() ingest through "
        "DocFreqIndex vs a one-shot shingle-DF oracle, and two-batch "
        "+ replay + compact() edge ingest through LinkGraphIndex with "
        "a persisted-adjacency re-rank vs the one-shot PageRank "
        "oracle on the union graph — batched incremental maintenance "
        "equals from-scratch computation, end-to-end, driver-graded.",
    ),
}


def _spark_render(col: str, dtype: str) -> F.Column:
    c = F.col(col)
    if dtype == "string":
        base = c
    elif dtype in ("tinyint", "smallint", "int", "bigint", "boolean"):
        base = c.cast("string")
    elif dtype in ("float", "double") or dtype.startswith("decimal"):
        # try_cast, not cast: the oracle side uses TRY_CAST, and a plain
        # cast would RAISE (instead of rendering the NULL sentinel) on
        # NaN/overflow under the strict-ANSI verification lane. Identical
        # to cast in non-ANSI mode (both yield NULL).
        base = (F.round(c.cast("double"), 6) + F.lit(0.0)).try_cast("decimal(38,6)").cast("string")
    elif dtype == "date":
        base = c.cast("string")
    elif dtype.startswith("timestamp"):
        base = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    else:
        raise TypeError(f"suite rendering: unsupported Spark type {dtype} for {col}")
    return F.coalesce(base, F.lit(NULL_TOKEN))


def _sql_render(col: str, kind: str) -> str:
    q = f'"{col}"'
    if kind == "str":
        base = q
    elif kind in ("int", "bool"):
        base = f"CAST({q} AS VARCHAR)"
    elif kind == "float":
        # Mirror Spark's float render EXACTLY instead of trusting DuckDB's
        # double->DECIMAL semantics to coincide with it. Spark computes
        #   y = toDouble(HALF_UP@6(shortestRepr(x)))   -- round(x, 6)
        #   out = HALF_UP@6(shortestRepr(y + 0.0))     -- cast DECIMAL(38,6)
        # (shortestRepr = Java Double.toString). Two DuckDB pitfalls make
        # the naive translation diverge (both observed, fuzzed at 108k
        # values across magnitudes 1e-9..1e17):
        #   1. DuckDB's direct double->DECIMAL cast quantizes the EXACT
        #      binary expansion, not the shortest repr: once ulp(x) > 1e-6
        #      (|x| >= 2^33) e.g. 8742524141.61 (exact ...61000061...)
        #      renders .610001 direct vs Spark's .610000. Also
        #      TRY_CAST(NaN AS DECIMAL) RAISES instead of NULLing.
        #      -> always go double->VARCHAR->DECIMAL (shortest repr).
        #   2. DuckDB's round(double, 6) works in double space
        #      (x*1e6 -> half-away -> /1e6); for |x| >~ 6e7 the multiply's
        #      rounding error can cross the half boundary and round the
        #      opposite way from Spark's exact BigDecimal HALF_UP.
        #      -> for |x| >= 1.0 do the rounding in the DECIMAL domain on
        #      the shortest repr (TRY_CAST(VARCHAR AS DECIMAL(38,6))
        #      parses with HALF_UP-away, matching BigDecimal.setScale),
        #      then bounce through DOUBLE + re-quantize, mirroring
        #      Spark's two-step pipeline operation by operation.
        # The |x| < 1.0 branch keeps DuckDB's double round (exact there:
        # x*1e6 <= 1e6 carries no half-crossing error) because DuckDB
        # 1.0.0's VARCHAR->DECIMAL parse is buggy for sub-scale
        # scientific notation ('-6.98e-10' -> -0.000001), which only
        # unrounded sub-1e-6 shortest reprs can produce; rounding first
        # keeps such strings out of the parse. NaN/inf: both branches
        # funnel through VARCHAR -> TRY_CAST -> NULL, matching Spark's
        # try_cast NULL sentinel.
        d = f"CAST({q} AS DOUBLE)"
        # the DECIMAL->DOUBLE hop also goes through VARCHAR: DuckDB's
        # direct decimal->double conversion is not correctly rounded
        # (int128 * 1e-6 in double arithmetic; loses exactness beyond
        # 2^53 scaled units, |x| >~ 9e9), while VARCHAR->DOUBLE is
        # strtod-correct like BigDecimal.doubleValue.
        big = (
            f"TRY_CAST(CAST(TRY_CAST(CAST(TRY_CAST(CAST({d} AS VARCHAR) "
            f"AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) + 0.0 AS VARCHAR) "
            f"AS DECIMAL(38,6))"
        )
        small = f"TRY_CAST(CAST(round({d}, 6) + 0.0 AS VARCHAR) AS DECIMAL(38,6))"
        # above 2^53 every double is an exact integer wider than its
        # shortest repr, and Spark's render follows the EXACT expansion
        # (fuzz: 8.929811922258374e16 renders ...744, its binary value,
        # not the shortest-repr ...740). DuckDB's direct double->DECIMAL
        # cast is double-multiply garbage up there (fractional junk from
        # x*1e6 overflow error) — printf('%.6f') is the correctly-rounded
        # exact expansion, which for integer doubles IS Spark's output.
        huge = f"TRY_CAST(printf('%.6f', {d} + 0.0) AS DECIMAL(38,6))"
        base = (
            f"CAST(CASE WHEN NOT isfinite({d}) THEN NULL "
            f"WHEN abs({d}) >= 9007199254740992.0 THEN {huge} "
            f"WHEN abs({d}) >= 1.0 THEN {big} "
            f"ELSE {small} END AS VARCHAR)"
        )
    elif kind == "date":
        base = f"CAST({q} AS VARCHAR)"
    elif kind == "ts":
        base = f"strftime({q}, '%Y-%m-%d %H:%M:%S')"
    else:
        raise TypeError(f"suite rendering: unsupported kind {kind} for {col}")
    return f"COALESCE({base}, chr(1))"


def stringify(df: DataFrame, part: str) -> DataFrame:
    """Canonical one-string-column rendering of a member result."""
    dtypes = dict(df.dtypes)
    rendered = [_spark_render(c, dtypes[c]) for c in sorted(df.columns)]
    return df.select(F.concat_ws(SEP, F.lit(part), *rendered).alias("row_str"))


def wrap_oracle_sql(part: str, oracle: str, kinds: dict[str, str]) -> str:
    exprs = ",\n           ".join(_sql_render(c, kinds[c]) for c in sorted(kinds))
    return (
        f"SELECT concat_ws(chr(31), '{part}',\n           {exprs}) AS row_str\n"
        f"    FROM (\n{oracle}\n    )"
    )


def _suite_fn(member_fns: dict[str, object]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [
            stringify(member_fn(spark, sf_dir), name)
            for name, member_fn in member_fns.items()
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    return fn


def fold_registry(registry: dict) -> dict:
    """Replace suite members with composite suite specs (see SUITES)."""
    from travel_data_ingestion_spark.queries import QuerySpec
    from travel_data_ingestion_spark.queries.suites_kinds import MEMBER_KINDS

    out = dict(registry)
    for suite_name, (members, doc) in SUITES.items():
        specs = [registry[m] for m in members]
        ops: list[str] = []
        for s in specs:
            ops.extend(op for op in s.survey_ops if op not in ops)
        oracle = "\nUNION ALL\n".join(
            wrap_oracle_sql(s.name, s.oracle, MEMBER_KINDS[s.name]) for s in specs
        )
        fn = _suite_fn({s.name: s.fn for s in specs})
        for m in members:
            del out[m]
        out[suite_name] = QuerySpec(suite_name, fn, oracle, tuple(ops), doc)
    return out


def _capture_kinds() -> None:  # pragma: no cover - dev-time generator
    """Regenerate suites_kinds.py from the live engines (run at sf0.001).

    Captures each member's rendered-column kind from the SPARK result
    schema and cross-checks it against the DuckDB oracle's DESCRIBE so a
    cross-engine numeric-class divergence (e.g. bigint vs double) fails
    here, at generation time, not as a driver hash mismatch.
    """
    import os
    import pprint

    import duckdb

    from travel_data_ingestion_spark.queries import (  # noqa: F401 - registry side-effect
        TABLES,
        _REGISTRY,
        llm_crawl,
        llm_curation,
        llm_dedup,
        llm_multimodal,
        llm_similarity,
        llm_text,
        relational,
        relational_ext,
        travel,
    )
    from travel_data_ingestion_spark.session import get_spark

    registry = dict(_REGISTRY)
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(app_name="suite-kinds-capture")

    def spark_kind(dtype: str) -> str:
        if dtype == "string":
            return "str"
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if dtype == "boolean":
            return "bool"
        if dtype in ("float", "double") or dtype.startswith("decimal"):
            return "float"
        if dtype == "date":
            return "date"
        if dtype.startswith("timestamp"):
            return "ts"
        raise TypeError(dtype)

    def duck_kind(dtype: str) -> str:
        d = dtype.upper()
        if d == "VARCHAR":
            return "str"
        if d in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if d == "BOOLEAN":
            return "bool"
        if d in ("FLOAT", "REAL", "DOUBLE") or d.startswith("DECIMAL"):
            return "float"
        if d == "DATE":
            return "date"
        if d.startswith("TIMESTAMP"):
            return "ts"
        raise TypeError(dtype)

    kinds: dict[str, dict[str, str]] = {}
    for members, _doc in SUITES.values():
        for m in members:
            spec = registry[m]
            sk = {c: spark_kind(t) for c, t in spec.fn(spark, sf_dir).dtypes}
            dk = {
                r[0]: duck_kind(r[1])
                for r in con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
            }
            assert set(sk) == set(dk), (m, sorted(sk), sorted(dk))
            mismatch = {c: (sk[c], dk[c]) for c in sk if sk[c] != dk[c]}
            # int-vs-float class divergence would render differently
            assert not mismatch, (m, mismatch)
            kinds[m] = dict(sorted(sk.items()))
            print(f"captured {m}: {kinds[m]}")

    path = os.path.join(os.path.dirname(__file__), "suites_kinds.py")
    with open(path, "w") as f:
        f.write(
            '"""GENERATED by python -m travel_data_ingestion_spark.queries.suites\n'
            "— rendered-column kinds per suite member, captured from the live\n"
            'Spark schema and cross-checked against DuckDB DESCRIBE."""\n\n'
            "MEMBER_KINDS = " + pprint.pformat(kinds, width=78) + "\n"
        )
    print(f"wrote {path}")


if __name__ == "__main__":  # pragma: no cover
    _capture_kinds()
