"""llm/frontier.py crawl_round: the composed frontier loop's knobs and
stage-drop semantics beyond the graded su07 member (which value-grades
the full fixture end-to-end)."""

from __future__ import annotations


def _fixture(spark):
    from travel_data_ingestion_spark.queries.llm_crawl import (
        _CRAWL_ROUND_LEDGER,
        _CRAWL_ROUND_PAGES,
        _CRAWL_ROUND_SITEMAP,
        _ROBOTS_A,
    )

    pages = spark.createDataFrame(
        _CRAWL_ROUND_PAGES, "doc_id long, url string, html string")
    robots = spark.createDataFrame(
        [("a.com", _ROBOTS_A)], "host string, robots_txt string")
    ledger = spark.createDataFrame(
        [(u,) for u in _CRAWL_ROUND_LEDGER], "canonical string")
    sitemap = spark.createDataFrame(
        _CRAWL_ROUND_SITEMAP,
        "host string, sitemap_url string, kind string, loc string, "
        "lastmod string, changefreq string, priority double")
    return pages, robots, ledger, sitemap


def test_crawl_round_without_sitemap_seeds(spark):
    """sitemap_entries_df is optional: omitting it drops exactly the
    sitemap-seeded URL from the schedule, nothing else."""
    from travel_data_ingestion_spark.llm.frontier import crawl_round

    pages, robots, ledger, _ = _fixture(spark)
    urls = {r.url for r in crawl_round(
        pages, robots, ledger, agent="DataBot/2.0").collect()}
    assert "https://a.com/sm/page" not in urls
    assert urls == {
        "https://a.com/open/page?a=1&b=2",
        "https://a.com/private/public/ok",
        "https://b2.com/new",
        "https://b2.com/one",
    }


def test_crawl_round_max_per_host_budget(spark):
    """max_per_host caps each host's scheduled batch after ordering —
    the crawl-budget knob composes through the whole round."""
    from travel_data_ingestion_spark.llm.frontier import crawl_round

    pages, robots, ledger, sitemap = _fixture(spark)
    rows = crawl_round(
        pages, robots, ledger, agent="DataBot/2.0",
        sitemap_entries_df=sitemap, max_per_host=1,
    ).collect()
    assert {(r.host, r.url, r.fetch_seq) for r in rows} == {
        ("a.com", "https://a.com/open/page?a=1&b=2", 0),
        ("b2.com", "https://b2.com/new", 0),
    }


def test_crawl_round_empty_pages_yields_sitemap_only(spark):
    """A round with no fetched pages still schedules sitemap seeds —
    the bootstrap round of a real crawl."""
    from travel_data_ingestion_spark.llm.frontier import crawl_round

    _, robots, ledger, sitemap = _fixture(spark)
    empty = spark.createDataFrame(
        [], "doc_id long, url string, html string")
    rows = crawl_round(
        empty, robots, ledger, agent="DataBot/2.0",
        sitemap_entries_df=sitemap,
    ).collect()
    assert {(r.url, r.fetch_seq, r.fetch_after) for r in rows} == {
        ("https://a.com/sm/page", 0, 0.0),
    }
