"""robots.txt evaluation — crawl-frontier filtering.

A crawl pipeline joins its URL frontier against each host's robots.txt
before fetching (and a *training-data* pipeline increasingly re-checks
robots post-hoc for opt-out compliance). The DEFAULT matcher here
implements RFC 9309 (what real crawlers follow):

- group selection by exact product-token match (case-insensitive),
  falling back to the ``*`` groups; multiple groups for the same
  agent merge;
- per-URL rule selection by LONGEST MATCHING RULE (most octets in the
  rule pattern), ties broken toward ``Allow`` (least restrictive);
- ``*`` wildcards anywhere in a path pattern and ``$`` as an
  end-anchor (the optional matching RFC 9309 §2.2.3 describes and
  every major crawler implements);
- no matching rule, empty/unreadable robots.txt -> allowed;
  ``/robots.txt`` itself is always allowed.

``rfc9309=False`` falls back to stdlib ``urllib.robotparser``, which
implements the ORIGINAL 1994 spec semantics: FIRST-match rule
ordering (an ``Allow`` only wins over a ``Disallow`` when it appears
first). Files written for old parsers order Allow lines first for
exactly this reason; the two semantics agree on such files.

Batch-shaped wrappers:

- ``robots_rules(content)`` parses one robots.txt body (text) into a
  reusable matcher — total, never raises (a malformed file means
  "allow", matching crawler behavior);
- ``filter_frontier(df, agent)`` joins a frontier of (host, url) rows
  against a (host, robots_txt) table and emits an ``allowed`` flag per
  URL, Arrow-batched per host group.

At 100 TB the robots table is small per-row (one row per host,
kilobytes each) next to the frontier (billions of URLs) — but with
millions of hosts it totals tens of GB, past Spark's 8 GB broadcast
cap, so the join is deliberately UNHINTED: AQE broadcasts while the
robots table is actually small and demotes to a host-keyed shuffle
join when it isn't (the same host-keyed shuffle a per-host politeness
scheduler needs anyway). Evaluation itself is map-only.
"""

from __future__ import annotations

import io
import math
import urllib.robotparser
from urllib.parse import quote, unquote, urlsplit

# ceiling for the de-facto Crawl-delay extension: a robots.txt asking
# for more than a day between fetches is hostile or broken, and a
# non-finite value must never reach the scheduler column
_MAX_CRAWL_DELAY = 86400.0

# every printable ASCII char except '%' stays literal, so ASCII rule
# patterns and paths are untouched by normalization; only non-ASCII /
# control / space octets (and bare '%') get one consistent encoding
_PCT_SAFE = "".join(chr(c) for c in range(0x21, 0x7F) if chr(c) != "%")


def _pctnorm(s: str) -> str:
    """Map a rule pattern segment or URL path to one consistent
    percent-encoding (RFC 9309 §2.2.2 compares percent-encoded octets;
    stdlib robotparser uses the same unquote-then-requote trick), so
    ``Disallow: /café`` matches the wire path ``/caf%C3%A9`` and vice
    versa. Known conflation (shared with stdlib robotparser, deviating
    from strict RFC 9309 octet-wise comparison): unquote-then-requote
    collapses double-encoded paths onto once-encoded ones, so
    ``/a%2520`` and ``/a%20`` normalize identically and compare equal
    under rule matching. Total."""
    try:
        return quote(unquote(s), safe=_PCT_SAFE)
    except Exception:
        return s


# RFC 9309 §2.5: parsers must handle at least 500 KiB and MAY ignore
# the rest — a hard cap here also bounds parse work on hostile giant
# robots.txt (the same untrusted-input budget as the rule matcher)
_MAX_ROBOTS_CHARS = 500 * 1024


class Rfc9309Rules:
    """One parsed robots.txt under RFC 9309 semantics. Total: any
    parse trouble degrades toward allow."""

    __slots__ = ("groups", "sitemaps", "_delays", "_agent_rules")

    def __init__(self, content: str | None):
        # groups: list of (set[agent_token_lower], [(allow, pattern)])
        self.groups: list = []
        # sitemap lines are global (not group-scoped) per the spec
        self.sitemaps: list[str] = []
        # (agents, delay_seconds) per group that declared one
        self._delays: list = []
        # memoized merged rule list per normalized agent token — the
        # frontier hot loop calls can_fetch once per URL and must not
        # rebuild the group scan each time
        self._agent_rules: dict = {}
        if not content:
            return
        if len(content) > _MAX_ROBOTS_CHARS:
            # truncate at the last newline inside the cap: a rule
            # straddling the boundary must be DROPPED, not parsed as a
            # shorter pattern the file never declared ('Disallow:
            # /private' sliced to 'Disallow: /pri' silently blocks
            # unintended paths)
            content = content[:_MAX_ROBOTS_CHARS].rsplit("\n", 1)[0]
        agents: set[str] = set()
        rules: list = []
        open_group = False  # collecting consecutive user-agent lines
        for raw in content.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if not open_group and agents:
                    self.groups.append((agents, rules))
                    agents, rules = set(), []
                agents.add(val.split("/", 1)[0].strip().lower())
                open_group = True
            elif key in ("allow", "disallow"):
                open_group = False
                if agents and val:
                    try:
                        matcher, plen = self._compile(val)
                    except Exception:
                        continue
                    rules.append((key == "allow", matcher, plen))
                # empty value = no rule (the classic "Disallow:" allow-all)
            elif key == "sitemap":
                # global record, not group-terminating
                if val:
                    self.sitemaps.append(val)
            elif key == "crawl-delay":
                # de-facto extension (Bing/Yandex honor it); scoped to
                # the current group, not group-terminating
                open_group = False
                if agents:
                    try:
                        d = float(val)
                    except ValueError:
                        continue
                    # hostile values ('inf', '1e309') parse as float
                    # and would propagate infinity into the
                    # scheduler's crawl_delay column; clamp to a day
                    if math.isfinite(d) and d >= 0:
                        self._delays.append((agents, min(d, _MAX_CRAWL_DELAY)))
            else:
                # unknown keys: not group-terminating
                continue
        if agents:
            self.groups.append((agents, rules))

    @staticmethod
    def _compile(pattern: str):
        """(matcher, priority): plain patterns match by startswith (the
        overwhelmingly common case); wildcard/anchored patterns get a
        LINEAR-TIME greedy segment matcher built once at parse time —
        never a backtracking regex (robots.txt is untrusted crawled
        content; a '.*'-joined regex is a ReDoS on hostile patterns
        like '/*a*a*...*ab', as Google's reference robots.cc also
        avoids). Priority is the pattern's octet count (RFC 9309 'most
        octets' rule, wildcard/anchor characters included), measured on
        the percent-normalized form so '/café' and '/caf%C3%A9' rank
        identically."""
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        # normalize each literal segment; '*' separators and the '$'
        # anchor are structural, never percent-encoded
        parts = [_pctnorm(p) for p in body.split("*")]
        plen = sum(len(p) for p in parts) + (len(parts) - 1) + anchored
        if len(parts) == 1 and not anchored:
            return parts[0], plen  # startswith fast path
        first, rest = parts[0], parts[1:]
        if anchored:
            if not rest:
                return (lambda path, _p=first: path == _p), plen

            def match(path, _first=first, _mids=rest[:-1], _last=rest[-1]):
                # greedy leftmost placement of middle segments gives
                # the minimal end offset, so the end-anchored last
                # segment fits iff any placement fits — O(len(path))
                if not path.startswith(_first):
                    return False
                i = len(_first)
                for seg in _mids:
                    j = path.find(seg, i)
                    if j < 0:
                        return False
                    i = j + len(seg)
                return len(path) - len(_last) >= i and path.endswith(_last)

            return match, plen

        def match(path, _first=first, _rest=rest):
            if not path.startswith(_first):
                return False
            i = len(_first)
            for seg in _rest:
                if not seg:  # '**' runs / trailing '*': match anything
                    continue
                j = path.find(seg, i)
                if j < 0:
                    return False
                i = j + len(seg)
            return True

        return match, plen

    def _rules_for(self, agent: str):
        token = agent.split("/", 1)[0].strip().lower()
        cached = self._agent_rules.get(token)
        if cached is not None:
            return cached
        exact = [r for agents, rules in self.groups if token in agents
                 for r in rules]
        if not exact and not any(
            token in agents for agents, _ in self.groups
        ):
            exact = [r for agents, rules in self.groups if "*" in agents
                     for r in rules]
        self._agent_rules[token] = exact
        return exact

    def crawl_delay(self, agent: str) -> float | None:
        """Seconds between fetches this host asks of this agent (the
        de-facto Crawl-delay extension), or None. Exact-token groups
        win over ``*``; merged groups take the most conservative
        (largest) declared delay."""
        token = agent.split("/", 1)[0].strip().lower()
        exact = [d for agents, d in self._delays if token in agents]
        if exact:
            return max(exact)
        # an agent with its OWN group (even delay-less) never inherits
        # the * group's delay — same selection rule as _rules_for
        if any(token in agents for agents, _ in self.groups):
            return None
        star = [d for agents, d in self._delays if "*" in agents]
        return max(star) if star else None

    def can_fetch(self, agent: str, url: str) -> bool:
        try:
            parts = urlsplit(url)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        except ValueError:
            return True
        if path == "/robots.txt":
            return True
        path = _pctnorm(path)
        best_len = -1
        best_allow = True
        for allow, matcher, plen in self._rules_for(agent):
            hit = (path.startswith(matcher) if isinstance(matcher, str)
                   else matcher(path))
            if hit:
                # most octets wins; tie -> least restrictive (allow)
                if plen > best_len or (
                    plen == best_len and allow and not best_allow
                ):
                    best_len = plen
                    best_allow = allow
        return best_allow


def robots_rules(content: str | None, rfc9309: bool = True):
    """Parse a robots.txt body into a matcher with ``can_fetch(agent,
    url)``; None/garbage yields an allow-everything matcher (crawler
    convention for unreadable robots). Default semantics are RFC 9309
    longest-match; ``rfc9309=False`` selects stdlib first-match-1994."""
    if rfc9309:
        try:
            return Rfc9309Rules(content)
        except Exception:
            return Rfc9309Rules(None)
    rp = urllib.robotparser.RobotFileParser()
    if not content:
        rp.parse([])
        return rp
    try:
        rp.parse(io.StringIO(content).read().splitlines())
    except Exception:
        rp.parse([])
    return rp


def is_allowed(content: str | None, agent: str, url: str,
               rfc9309: bool = True) -> bool:
    """One-shot convenience: may this agent fetch this url under this
    robots.txt? Total."""
    try:
        return bool(robots_rules(content, rfc9309).can_fetch(agent, url))
    except Exception:
        return True


def filter_frontier(frontier_df, robots_df, agent: str = "*",
                    rfc9309: bool = True):
    """frontier (host, url) x robots (host, robots_txt) -> (host, url,
    allowed, crawl_delay). Semantics per ``robots_rules(rfc9309=...)``;
    ``crawl_delay`` is the per-host seconds the scheduler should wait
    between fetches for this agent (RFC 9309 default engine only —
    NULL under the stdlib fallback and for hosts that declare none).
    The robots-side join is deliberately UNHINTED: one row per host
    sounds small, but at design scale "millions of kilobyte rows" is
    tens of GB — past Spark's 8 GB broadcast hard cap — so a forced
    broadcast would abort the job exactly when it matters. AQE
    broadcasts while the robots table is genuinely under the
    threshold and demotes to a host-keyed shuffle join when it isn't.
    Evaluation is an Arrow-batched map over the joined rows with a
    per-batch parser cache, so each host's rules parse once per batch
    rather than once per URL."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    joined = frontier_df.join(
        robots_df.select("host", "robots_txt"), "host", "left"
    ).select("host", "url", "robots_txt")
    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("allowed", T.BooleanType()),
            T.StructField("crawl_delay", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in it:
            allowed = []
            delays = []
            for host, url, txt in zip(pdf["host"], pdf["url"],
                                      pdf["robots_txt"]):
                key = host
                rp = cache.get(key)
                if rp is None:
                    rp = robots_rules(txt if isinstance(txt, str) else None,
                                      rfc9309)
                    cache[key] = rp
                try:
                    allowed.append(bool(rp.can_fetch(agent, url)))
                except Exception:
                    allowed.append(True)
                try:
                    delays.append(rp.crawl_delay(agent)
                                  if isinstance(rp, Rfc9309Rules) else None)
                except Exception:
                    delays.append(None)
            yield pd.DataFrame(
                {"host": pdf["host"], "url": pdf["url"],
                 "allowed": allowed,
                 "crawl_delay": pd.array(delays, dtype="float64")}
            )

    return joined.mapInPandas(batches, schema=schema)


def sitemap_urls(robots_df):
    """robots (host, robots_txt) -> (host, sitemap_url): the per-host
    sitemap URLs declared in robots.txt (RFC 9309 treats ``Sitemap:``
    lines as global records, not group-scoped — the standard frontier
    seed for a crawl). One output row per distinct sitemap URL per
    host, in first-declaration order deduplicated within the host's
    row, so the whole operator is an Arrow-batched map over the robots
    table — no join, no shuffle, any corpus size."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("sitemap_url", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts = []
            urls = []
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                try:
                    maps = Rfc9309Rules(
                        txt if isinstance(txt, str) else None
                    ).sitemaps
                except Exception:
                    maps = []
                seen = set()
                for u in maps:
                    if u not in seen:
                        seen.add(u)
                        hosts.append(host)
                        urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return robots_df.select("host", "robots_txt").mapInPandas(
        batches, schema=schema
    )


def schedule_frontier(filtered_df, default_delay: float = 1.0,
                      max_per_host: int | None = None):
    """Politeness scheduler over a ``filter_frontier`` output: (host,
    url, allowed, crawl_delay) -> (host, url, fetch_seq, fetch_after).

    Only ``allowed`` URLs are scheduled. Politeness is PER-HOST
    serialization — one fetch at a time per host, ``crawl_delay``
    seconds apart — so the operator is a window partitioned by host:
    ``fetch_seq`` numbers the host's URLs in deterministic (url) order
    and ``fetch_after = fetch_seq * delay`` is the earliest offset
    (seconds from the host's first fetch) the scheduler may issue it;
    hosts that declare no Crawl-delay get ``default_delay``.
    ``max_per_host`` caps each host's batch (the standard crawl-budget
    knob) — rows with ``fetch_seq >= max_per_host`` are dropped.

    100 TB shape: the host-keyed window shuffle is the SAME partition-
    ing the unhinted robots join in ``filter_frontier`` demotes to at
    scale, so AQE reuses one exchange for both. Per-host window size is
    the host's frontier share; a mega-host's URLs must serialize onto
    one partition because per-host ordering is the semantics, and
    ``max_per_host`` bounds the per-partition sort in practice (budget
    capping is how real crawlers bound exactly this). All expressions
    are native Catalyst — no Python in the plan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("host").orderBy("url")
    out = (
        filtered_df.filter(F.col("allowed"))
        .withColumn("fetch_seq", (F.row_number().over(w) - 1).cast("long"))
    )
    if max_per_host is not None:
        out = out.filter(F.col("fetch_seq") < max_per_host)
    delay = F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
    return out.select(
        "host",
        "url",
        "fetch_seq",
        (F.col("fetch_seq") * delay).cast("double").alias("fetch_after"),
    )
