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


def test_filter_frontier_join_policy_and_flags(spark):
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
    # join policy: UNHINTED — at 100 TB the robots table is millions
    # of kilobyte rows (tens of GB, past the 8 GB broadcast cap), so a
    # forced broadcast hint aborts at design scale; AQE broadcasts
    # while genuinely small and demotes to a host-keyed shuffle when
    # not. At THIS scale the stats-based planner still picks a
    # broadcast on its own — the size-aware behavior we want.
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    rows = out.collect()
    # after execution AQE has re-planned with true sizes: the tiny
    # robots side is broadcast AT RUNTIME (no hint needed) — the
    # size-aware demotion behavior the unhinted join buys us
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final
    got = {r.url: r.allowed for r in rows}
    assert got == {
        "http://a.com/open": True,
        "http://a.com/private/x": False,
        "http://a.com/private/public-bit/y": True,
        "http://b.com/anything": True,
    }
    # the scheduler column: _ROBOTS declares Crawl-delay: 2 in the *
    # group; a host with no robots row has no delay
    delays = {r.host: r.crawl_delay for r in rows}
    assert delays["a.com"] == 2.0
    assert delays["b.com"] is None


# ---------------------------------------------------------------------------
# RFC 9309 longest-match semantics (the round-13 default)


def test_rfc9309_longest_match_precedence_table():
    # hand-written from the RFC 9309 §2.2.2 rules: most-octets rule
    # wins; equally specific -> least restrictive (allow)
    cases = [
        # (allow pattern, disallow pattern, path, expected_allowed)
        ("/p", "/", "/page", True),               # /p (2) > / (1)
        ("/folder/", "/folder", "/folder/page", True),   # 8 > 7
        ("/page", "/*.htm", "/page.htm", False),  # 6 > 5
        ("/page", "/*.ph", "/page.php5", True),   # 5 == 5 tie -> allow
        ("/$", "/", "/", True),                   # /$ (2) > / (1)
        ("/$", "/", "/page.htm", False),          # /$ only matches "/"
    ]
    for ap, dp, path, want in cases:
        txt = f"User-agent: *\nAllow: {ap}\nDisallow: {dp}\n"
        got = is_allowed(txt, "AnyBot", f"http://h{path}")
        assert got is want, (ap, dp, path)
        # rule ORDER must not matter under RFC 9309 (unlike 1994)
        txt = f"User-agent: *\nDisallow: {dp}\nAllow: {ap}\n"
        assert is_allowed(txt, "AnyBot", f"http://h{path}") is want


def test_rfc9309_group_selection_and_merging():
    txt = (
        "User-agent: FooBot\n"
        "Disallow: /foo/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "\n"
        "User-agent: FooBot\n"   # second group for same agent: merges
        "Disallow: /bar/\n"
    )
    # exact token match (case-insensitive, product token before '/')
    assert not is_allowed(txt, "foobot/2.1", "http://h/foo/x")
    assert not is_allowed(txt, "FooBot", "http://h/bar/x")
    assert is_allowed(txt, "FooBot", "http://h/ok")  # NOT the * group
    # unmatched agent falls to *
    assert not is_allowed(txt, "OtherBot", "http://h/ok")
    # consecutive user-agent lines share one group
    txt2 = "User-agent: A\nUser-agent: B\nDisallow: /x/\n"
    assert not is_allowed(txt2, "B", "http://h/x/1")
    assert is_allowed(txt2, "C", "http://h/x/1")  # no * group at all


def test_rfc9309_wildcards_and_anchors():
    txt = (
        "User-agent: *\n"
        "Disallow: /*/private$\n"
        "Disallow: /tmp*\n"
        "Allow: /tmp/keep\n"
    )
    assert not is_allowed(txt, "B", "http://h/a/private")
    assert is_allowed(txt, "B", "http://h/a/private/sub")  # $ anchored
    assert not is_allowed(txt, "B", "http://h/tmpfile")
    assert not is_allowed(txt, "B", "http://h/tmp/other")
    assert is_allowed(txt, "B", "http://h/tmp/keep")  # 9 > 5
    # query strings participate in the path match
    txt3 = "User-agent: *\nDisallow: /*?session=\n"
    assert not is_allowed(txt3, "B", "http://h/p?session=1")
    assert is_allowed(txt3, "B", "http://h/p?other=1")


def test_rfc9309_defaults_and_robots_txt_itself():
    txt = "User-agent: *\nDisallow: /\n"
    assert is_allowed(txt, "B", "http://h/robots.txt")
    assert not is_allowed(txt, "B", "http://h/")
    # empty Disallow: value = no rule = allow everything
    assert is_allowed("User-agent: *\nDisallow:\n", "B", "http://h/x")
    # the 1994 fallback is still selectable and first-match
    first_match = (
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
    )
    assert is_allowed(first_match, "B", "http://h/private/pub/x",
                      rfc9309=True)        # longest-match: allow wins
    assert not is_allowed(first_match, "B", "http://h/private/pub/x",
                          rfc9309=False)   # 1994 first-match: disallow


def test_rfc9309_totality():
    import random as _r

    rng = _r.Random(4)
    for n in (1, 80, 800):
        blob = "".join(chr(rng.randrange(1, 1000)) for _ in range(n))
        is_allowed(blob, "Bot", "http://h/p")
        is_allowed("User-agent: *\nDisallow: " + blob, "Bot", "http://h/p")


# ---------------------------------------------------------------------------
# round-14 ADVICE fixes: ReDoS, percent-encoding, per-agent memoization


def test_wildcard_matching_is_linear_time_not_redos():
    # hostile robots.txt + hostile URL (both untrusted crawled content):
    # a '.*'-joined backtracking regex hangs on this for >10s; the
    # linear greedy matcher must answer in well under a second
    import time as _t

    txt = "User-agent: *\nDisallow: /" + "*a" * 24 + "*ab\n"
    path = "/" + "a" * 5000  # no 'ab' tail -> no match -> worst case
    t0 = _t.monotonic()
    assert is_allowed(txt, "B", "http://h" + path)
    assert is_allowed(txt, "B", "http://h/" + "a" * 5000 + "ab") is False
    assert _t.monotonic() - t0 < 1.0


def test_wildcard_semantics_survive_linear_rewrite():
    # anchored + middle segments; overlapping placements
    txt = "User-agent: *\nDisallow: /a*bc*cd$\n"
    assert not is_allowed(txt, "B", "http://h/a-bc-cd")
    assert not is_allowed(txt, "B", "http://h/abccd")      # bc then cd overlap-free
    assert is_allowed(txt, "B", "http://h/a-bccd-x")       # not end-anchored
    assert is_allowed(txt, "B", "http://h/a-cd")           # missing 'bc'
    # '**' runs and trailing '*'
    txt2 = "User-agent: *\nDisallow: /x**y*\n"
    assert not is_allowed(txt2, "B", "http://h/x123y456")
    assert is_allowed(txt2, "B", "http://h/x123z")
    # single-segment '$' pattern is exact-match only
    txt3 = "User-agent: *\nDisallow: /x$\n"
    assert not is_allowed(txt3, "B", "http://h/x")
    assert is_allowed(txt3, "B", "http://h/xy")
    assert is_allowed(txt3, "B", "http://h/y/x")  # startswith, not contains


def test_percent_encoding_normalization():
    # RFC 9309 §2.2.2: compare percent-encoded octets consistently —
    # a raw-UTF8 rule must match the percent-encoded wire path and
    # vice versa (stdlib robotparser quotes the path the same way)
    txt_raw = "User-agent: *\nDisallow: /café\n"
    txt_pct = "User-agent: *\nDisallow: /caf%C3%A9\n"
    for txt in (txt_raw, txt_pct):
        assert not is_allowed(txt, "B", "http://h/caf%C3%A9/menu")
        assert not is_allowed(txt, "B", "http://h/café/menu")
        assert is_allowed(txt, "B", "http://h/cafe/menu")
    # ASCII paths are untouched by normalization (reserved chars stay)
    txt3 = "User-agent: *\nDisallow: /*?session=\n"
    assert not is_allowed(txt3, "B", "http://h/p?session=1")


def test_rules_for_is_memoized_per_agent():
    from travel_data_ingestion_spark.llm.robots import Rfc9309Rules

    r = Rfc9309Rules(_ROBOTS)
    first = r._rules_for("GenericBot/1.0")
    again = r._rules_for("genericbot")  # same normalized token
    assert first is again  # same list object -> no per-call rebuild
    assert r._rules_for("SpecialBot") is r._rules_for("specialbot/9")


def test_robots_size_cap_and_global_records():
    from travel_data_ingestion_spark.llm.robots import (
        _MAX_ROBOTS_CHARS,
        Rfc9309Rules,
    )

    # RFC 9309 §2.5: at least 500 KiB parsed, the rest may be ignored
    # — rules inside the window bind, rules beyond it are dropped, and
    # parse work on a hostile 100 MB robots.txt stays bounded
    head = "User-agent: *\nDisallow: /blocked\n"
    filler = "# pad\n" * ((_MAX_ROBOTS_CHARS - len(head)) // 6 + 1)
    tail = "User-agent: *\nDisallow: /late\n"
    r = Rfc9309Rules(head + filler + tail)
    assert not r.can_fetch("B", "http://h/blocked/x")
    assert r.can_fetch("B", "http://h/late/x")  # beyond the cap

    # a rule STRADDLING the cap must be dropped whole, never parsed as
    # the shorter pattern the file never declared: position the cap
    # mid-way through 'Disallow: /private' and check '/pri...' does
    # NOT become blocked by the truncated prefix
    head2 = "User-agent: *\nDisallow: /blocked\n"
    straddle = "Disallow: /private\n"
    pad_len = _MAX_ROBOTS_CHARS - len(head2) - len("Disallow: /pri")
    pad = "#" + "x" * (pad_len - 2) + "\n"
    assert len(head2 + pad) + len("Disallow: /pri") == _MAX_ROBOTS_CHARS
    r2 = Rfc9309Rules(head2 + pad + straddle + "Disallow: /after\n")
    assert not r2.can_fetch("B", "http://h/blocked/x")  # inside cap
    assert r2.can_fetch("B", "http://h/pri")      # truncated rule gone
    assert r2.can_fetch("B", "http://h/private")  # straddler dropped

    # sitemaps are global; crawl-delay is group-scoped, exact beats *,
    # merged groups take the most conservative value
    txt = (
        "Sitemap: https://h/s1.xml\n"
        "User-agent: *\nCrawl-delay: 1\nDisallow: /x\n"
        "Sitemap: https://h/s2.xml\n"
        "User-agent: FooBot\nCrawl-delay: 2.5\n"
        "User-agent: FooBot\nCrawl-delay: 10\n"
        "User-agent: BadBot\nCrawl-delay: nonsense\n"
    )
    r2 = Rfc9309Rules(txt)
    assert r2.sitemaps == ["https://h/s1.xml", "https://h/s2.xml"]
    assert r2.crawl_delay("FooBot/9.1") == 10.0
    assert r2.crawl_delay("OtherBot") == 1.0
    # unparseable delay in an agent's OWN group: no value, and no
    # inheritance from the * group (same selection rule as the rules)
    assert r2.crawl_delay("BadBot") is None
    # a crawl-delay line must not terminate its group's rules
    assert not r2.can_fetch("OtherBot", "http://h/x/page")


def test_linear_matcher_equals_regex_dual_fuzz():
    # semantic pin for the ReDoS rewrite: on small inputs (where a
    # backtracking regex is safe) the linear greedy matcher must agree
    # with an independent regex rendering of the same RFC 9309 pattern
    # language — '*' spans anything, '$' end-anchors, otherwise prefix
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from travel_data_ingestion_spark.llm.robots import Rfc9309Rules

    alphabet = "ab/*"

    def regex_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = ".*".join(_re.escape(p) for p in body.split("*"))
        m = _re.compile(rx + ("$" if anchored else "")).match(path)
        return m is not None

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet=alphabet, min_size=1, max_size=8),
        st.booleans(),
        st.text(alphabet="ab/", min_size=0, max_size=12),
    )
    def check(body, anchored, path):
        pattern = body + ("$" if anchored else "")
        try:
            matcher, _ = Rfc9309Rules._compile(pattern)
        except Exception:
            return
        got = (path.startswith(matcher) if isinstance(matcher, str)
               else bool(matcher(path)))
        assert got == regex_match(pattern, path), (pattern, path)

    check()


def test_crawl_delay_rejects_non_finite_and_clamps():
    """A hostile robots.txt must never propagate inf/NaN (or an absurd
    finite value) into the scheduler's crawl_delay column: 'inf' and
    the overflow literal '1e309' both parse as float but are rejected;
    finite values clamp to the one-day ceiling."""
    from travel_data_ingestion_spark.llm.robots import (
        _MAX_CRAWL_DELAY,
        Rfc9309Rules,
    )

    for bad in ("inf", "Infinity", "1e309", "nan", "-inf", "-1"):
        r = Rfc9309Rules(f"User-agent: *\nCrawl-delay: {bad}\nDisallow: /x\n")
        assert r.crawl_delay("B") is None, bad
    r = Rfc9309Rules("User-agent: *\nCrawl-delay: 1e6\n")
    assert r.crawl_delay("B") == _MAX_CRAWL_DELAY
    r = Rfc9309Rules("User-agent: *\nCrawl-delay: 2.5\n")
    assert r.crawl_delay("B") == 2.5


def test_lc_mem_mb_parses_only_local_cluster_masters():
    """SPARK_LC_SPILL_MASTER=local[8] used to yield the nonsense
    executor memory 'local[8m' via naive rsplit; the parser must read
    the MB only from local-cluster[n,c,mem] shapes and fall back to
    the caller's default otherwise."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.lc_check import _lc_mem_mb

    assert _lc_mem_mb("local-cluster[2,4,1200]", 999) == 1200
    assert _lc_mem_mb("local-cluster[ 3 , 4 , 3072 ]", 999) == 3072
    assert _lc_mem_mb("local[8]", 999) == 999
    assert _lc_mem_mb("spark://host:7077", 999) == 999
    assert _lc_mem_mb("local-cluster[2,4]", 999) == 999


def test_schedule_frontier_orders_caps_and_defaults(spark):
    """Politeness semantics pinned: per-host serialization in url
    order, fetch_after = seq * crawl_delay, default delay for hosts
    declaring none, max_per_host budget drop, disallowed rows never
    scheduled — and the plan stays native (no Python eval nodes for
    the window/scheduling stage)."""
    from travel_data_ingestion_spark.llm.robots import schedule_frontier

    filtered = spark.createDataFrame(
        [
            ("a.com", "http://a.com/c", True, 2.0),
            ("a.com", "http://a.com/a", True, 2.0),
            ("a.com", "http://a.com/b", True, 2.0),
            ("a.com", "http://a.com/x", False, 2.0),   # disallowed
            ("b.com", "http://b.com/only", True, None),  # no delay
        ],
        "host string, url string, allowed boolean, crawl_delay double",
    )
    out = schedule_frontier(filtered, default_delay=0.5, max_per_host=2)
    rows = {(r.host, r.url): (r.fetch_seq, r.fetch_after)
            for r in out.collect()}
    assert rows == {
        ("a.com", "http://a.com/a"): (0, 0.0),
        ("a.com", "http://a.com/b"): (1, 2.0),   # /c dropped by cap
        ("b.com", "http://b.com/only"): (0, 0.0),
    }
    # default delay applies when a host never declares one
    out2 = schedule_frontier(
        filtered.filter("host = 'b.com'")
        .union(spark.createDataFrame(
            [("b.com", "http://b.com/z", True, None)],
            "host string, url string, allowed boolean, crawl_delay double",
        )),
        default_delay=0.5,
    )
    got = {r.url: r.fetch_after for r in out2.collect()}
    assert got == {"http://b.com/only": 0.0, "http://b.com/z": 0.5}


def test_sitemap_urls_global_scope_dedup_and_nulls(spark):
    from travel_data_ingestion_spark.llm.robots import sitemap_urls

    robots = spark.createDataFrame(
        [
            ("a.com",
             "Sitemap: https://a.com/s1.xml\n"
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: https://a.com/s2.xml\n"      # mid-group: global
             "Sitemap: https://a.com/s1.xml\n"),    # dup -> one row
            ("b.com", "User-agent: *\nDisallow:\n"),
            ("c.com", None),
        ],
        "host string, robots_txt string",
    )
    rows = sorted((r.host, r.sitemap_url) for r in sitemap_urls(robots).collect())
    assert rows == [
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
    ]
