"""robots.txt evaluation — crawl-frontier filtering.

A crawl pipeline joins its URL frontier against each host's robots.txt
before fetching (and a *training-data* pipeline increasingly re-checks
robots post-hoc for opt-out compliance). stdlib
``urllib.robotparser`` implements the ORIGINAL 1994 spec semantics:
user-agent groups with FIRST-match rule ordering (an ``Allow`` only
wins over a ``Disallow`` when it appears first) — NOT RFC 9309
longest-match; files written for old parsers order Allow lines first
for exactly this reason, and this module documents rather than hides
the distinction. Batch-shaped wrappers:

- ``robots_rules(content)`` parses one robots.txt body (text) into a
  reusable matcher — total, never raises (a malformed file means
  "allow", matching crawler behavior);
- ``filter_frontier(df, agent)`` joins a frontier of (host, url) rows
  against a (host, robots_txt) table and emits an ``allowed`` flag per
  URL, Arrow-batched per host group.

At 100 TB the robots table is tiny (one row per host — millions of
rows, kilobytes each) next to the frontier (billions of URLs), so the
join broadcasts the robots side; evaluation itself is map-only.
"""

from __future__ import annotations

import io
import urllib.robotparser


def robots_rules(content: str | None):
    """Parse a robots.txt body into a RobotFileParser; None/garbage
    yields an allow-everything matcher (crawler convention for
    unreadable robots)."""
    rp = urllib.robotparser.RobotFileParser()
    if not content:
        rp.parse([])
        return rp
    try:
        rp.parse(io.StringIO(content).read().splitlines())
    except Exception:
        rp.parse([])
    return rp


def is_allowed(content: str | None, agent: str, url: str) -> bool:
    """One-shot convenience: may this agent fetch this url under this
    robots.txt? Total."""
    try:
        return bool(robots_rules(content).can_fetch(agent, url))
    except Exception:
        return True


def filter_frontier(frontier_df, robots_df, agent: str = "*"):
    """frontier (host, url) x robots (host, robots_txt) -> (host, url,
    allowed). The robots side is broadcast (one small row per host);
    evaluation is an Arrow-batched map over the joined rows with a
    per-batch parser cache, so each host's rules parse once per batch
    rather than once per URL."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    joined = frontier_df.join(
        F.broadcast(robots_df.select("host", "robots_txt")), "host", "left"
    ).select("host", "url", "robots_txt")
    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("allowed", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in it:
            allowed = []
            for host, url, txt in zip(pdf["host"], pdf["url"],
                                      pdf["robots_txt"]):
                key = host
                rp = cache.get(key)
                if rp is None:
                    rp = robots_rules(txt if isinstance(txt, str) else None)
                    cache[key] = rp
                try:
                    allowed.append(bool(rp.can_fetch(agent, url)))
                except Exception:
                    allowed.append(True)
            yield pd.DataFrame(
                {"host": pdf["host"], "url": pdf["url"], "allowed": allowed}
            )

    return joined.mapInPandas(batches, schema=schema)
