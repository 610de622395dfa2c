"""robots.txt frontier filtering (stdlib robotparser, batch-shaped)."""

from __future__ import annotations

import random

from travel_data_ingestion_spark.llm.robots import is_allowed, robots_rules

_ROBOTS = """
User-agent: *
Allow: /private/public-bit/
Disallow: /private/
Crawl-delay: 2

User-agent: SpecialBot
Disallow: /
"""


def test_group_and_path_matching():
    assert is_allowed(_ROBOTS, "GenericBot", "http://h/open/page")
    assert not is_allowed(_ROBOTS, "GenericBot", "http://h/private/x")
    # stdlib robotparser is FIRST-match (original 1994 spec), so the
    # Allow must precede the Disallow to carve out the public bit —
    # the module docstring documents this vs RFC 9309 longest-match
    assert is_allowed(_ROBOTS, "GenericBot", "http://h/private/public-bit/y")
    # specific user-agent group overrides *
    assert not is_allowed(_ROBOTS, "SpecialBot", "http://h/open/page")


def test_missing_or_garbage_robots_allows():
    assert is_allowed(None, "Bot", "http://h/anything")
    assert is_allowed("", "Bot", "http://h/anything")
    assert is_allowed("\x00\xff not robots at all <<<", "Bot", "http://h/x")
    rng = random.Random(8)
    for n in (1, 50, 500):
        blob = "".join(chr(rng.randrange(1, 1000)) for _ in range(n))
        robots_rules(blob)  # total
        is_allowed(blob, "Bot", "http://h/p")


def test_filter_frontier_broadcasts_and_flags(spark):
    from travel_data_ingestion_spark.llm.robots import filter_frontier

    frontier = spark.createDataFrame(
        [
            ("a.com", "http://a.com/open"),
            ("a.com", "http://a.com/private/x"),
            ("a.com", "http://a.com/private/public-bit/y"),
            ("b.com", "http://b.com/anything"),  # no robots row: allow
        ],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", _ROBOTS)], "host string, robots_txt string"
    )
    out = filter_frontier(frontier, robots, agent="GenericBot")
    # plan: robots side broadcast, no shuffle of the frontier
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    got = {r.url: r.allowed for r in out.collect()}
    assert got == {
        "http://a.com/open": True,
        "http://a.com/private/x": False,
        "http://a.com/private/public-bit/y": True,
        "http://b.com/anything": True,
    }
