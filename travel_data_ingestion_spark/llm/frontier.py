"""One full crawl-frontier round — the composition a real crawler runs.

Every stage of the crawl family grades in isolation (t21 robots filter,
t22 politeness schedule, t23/t24 sitemap capture/parse, t27 freshness,
t28 outlink extraction, t19 URL canonicalization); this module wires
them into the loop a production crawler actually executes per round:

    fetched pages --t28--> outlinks (nofollow dropped: not discovery)
        UNION sitemap 'url' seeds (t24's parse output)
    --t19--> canonical URLs (+ host), junk/non-http dropped
    --distinct--> one candidate per canonical this round
    --anti-join fetch ledger--> only never-fetched URLs survive
        (the ingestion family's exactly-once shape, A-07/c05)
    --t21--> robots-allowed survivors with per-host crawl_delay
    --t22--> (host, url, fetch_seq, fetch_after): the next round's
             scheduled frontier

100 TB shape, stage by stage: outlink extraction and canonicalization
are Arrow-batched maps (no shuffle); the distinct and the ledger
anti-join shuffle on the canonical-URL key — uniform by construction
(canonical strings), the same key class as dd01's exact dedup; the
robots join is UNHINTED (AQE broadcasts small robots tables, demotes
to a host-keyed shuffle at scale — robots.py:302 doctrine) and the
politeness window reuses that same host partitioning. Nothing touches
the driver; every stage is the graded operator, unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_urls(links_df: DataFrame, url_col: str = "link"
                      ) -> DataFrame:
    """(.., <url_col>) -> (canonical, host): t19's canonicalization
    plus the host the robots/politeness stages key on, in ONE
    Arrow-batched map (the host of a canonical URL is already
    lowercased/deported, so it's a cheap split, not a second
    normalization). Rows whose URL is junk or non-http(s) are dropped
    — they can never be fetched."""
    from collections.abc import Iterator
    from urllib.parse import urlsplit

    import pandas as pd
    from pyspark.sql import types as T

    from travel_data_ingestion_spark.llm.urlnorm import normalize_url

    schema = T.StructType([
        T.StructField("canonical", T.StringType()),
        T.StructField("host", T.StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            canon, hosts = [], []
            for u in pdf[url_col]:
                c = normalize_url(u if isinstance(u, str) else None)
                if c is None:
                    continue
                canon.append(c)
                hosts.append(urlsplit(c).hostname)
            yield pd.DataFrame({"canonical": canon, "host": hosts})

    return links_df.select(url_col).mapInPandas(batches, schema=schema)


def crawl_round(
    pages_df: DataFrame,
    robots_df: DataFrame,
    ledger_df: DataFrame,
    agent: str = "*",
    sitemap_entries_df: DataFrame | None = None,
    default_delay: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """One frontier round: (fetched pages, robots corpus, fetch
    ledger[, parsed sitemap entries]) -> the next scheduled frontier
    (host, url, fetch_seq, fetch_after).

    - ``pages_df``: (doc_id, url, html) — this round's fetched pages;
    - ``robots_df``: (host, robots_txt) — the robots corpus;
    - ``ledger_df``: (canonical) — every canonical URL ever fetched
      (the exactly-once ledger; candidates already in it are
      anti-joined away, so a URL is scheduled at most once across
      rounds no matter how many pages link to it);
    - ``sitemap_entries_df``: optional ``parse_sitemaps`` output;
      its ``kind='url'`` rows seed the frontier alongside discovered
      outlinks (``kind='sitemap'`` rows are child sitemaps the fetch
      side recurses on — not page URLs, excluded here).

    rel=nofollow outlinks are dropped — nofollow is precisely the
    publisher's "do not treat this as discovery" signal."""
    from travel_data_ingestion_spark.llm.html_text import html_outlinks
    from travel_data_ingestion_spark.llm.robots import (
        filter_frontier,
        schedule_frontier,
    )

    discovered = (
        html_outlinks(pages_df)
        .filter(~F.col("nofollow"))
        .select(F.col("link"))
    )
    if sitemap_entries_df is not None:
        seeds = (
            sitemap_entries_df.filter(F.col("kind") == "url")
            .select(F.col("loc").alias("link"))
        )
        discovered = discovered.unionByName(seeds)

    candidates = canonicalize_urls(discovered, "link").distinct()

    fresh = candidates.join(
        ledger_df.select(F.col("canonical")),
        "canonical",
        "left_anti",
    )

    filtered = filter_frontier(
        fresh.select("host", F.col("canonical").alias("url")),
        robots_df,
        agent=agent,
    )
    return schedule_frontier(
        filtered, default_delay=default_delay, max_per_host=max_per_host
    )
