"""Sitemap XML parsing — crawl-frontier seeding.

``sitemap_urls`` (llm/robots.py) surfaces each host's declared sitemap
URLs; this module parses the fetched documents themselves into the URL
table a crawler seeds its frontier from, per the sitemaps.org protocol:

- ``<urlset>`` documents: one row per ``<url>`` with ``loc`` (required
  — entries without it are dropped), optional ``lastmod`` /
  ``changefreq`` / ``priority``;
- ``<sitemapindex>`` documents: one row per child ``<sitemap>``
  (``kind='sitemap'`` vs ``'url'`` — the caller recurses on those);
- gzip members (``sitemap.xml.gz``) sniffed and decompressed with a
  bomb cap;
- protocol limits enforced as parse budgets on untrusted input:
  50 MB decompressed, 50,000 entries per document (the sitemaps.org
  caps), entries beyond the cap dropped;
- hostility: raw expat with DTDs REJECTED outright (any doctype means
  the document is not a protocol sitemap, and rejecting it closes the
  billion-laughs entity-expansion class without a third-party
  sanitizer), namespace/prefix-tolerant tag matching on local names,
  CDATA and split character data handled, malformed XML or a
  non-sitemap root yields zero rows — total, never raises.

Spark shape: ``parse_sitemaps(df)`` is an Arrow-batched ``mapInPandas``
over (host, sitemap_url, content) — payload bytes cross to Python once
and never return to the JVM; map-only at any corpus size.
"""

from __future__ import annotations

import math
import zlib

# sitemaps.org limits: a sitemap file must be <= 50 MB uncompressed
# and hold <= 50,000 entries; both double as hostile-input budgets
_MAX_BYTES = 50 * 1024 * 1024
_MAX_ENTRIES = 50_000

# element local-names we capture inside a <url>/<sitemap> entry
_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _gunzip_capped(data: bytes) -> bytes | None:
    """Decompress a gzip member with the output capped at _MAX_BYTES
    (+1 to detect overflow). None = over cap or corrupt."""
    try:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data, _MAX_BYTES + 1)
        # incomplete member = hostile or truncated-in-flight, both
        # rejected: eof False covers a stream cut mid-member as well as
        # a decompression stopped by the cap (unconsumed_tail set)
        if len(out) > _MAX_BYTES or not d.eof:
            return None
        return out
    except Exception:
        return None


class _Abort(Exception):
    """Internal parse stop: doctype seen or entry budget exhausted."""


def parse_sitemap_bytes(data) -> list[dict]:
    """One sitemap document (bytes; gzip auto-sniffed) -> entry dicts
    ``{kind, loc, lastmod, changefreq, priority}``. Total: anything
    that is not a well-formed protocol sitemap yields ``[]``."""
    import xml.parsers.expat

    if not isinstance(data, (bytes, bytearray)):
        return []
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_capped(data)
        if data is None:
            return []
    if len(data) > _MAX_BYTES:
        return []

    rows: list[dict] = []
    stack: list[str] = []
    state = {"root": None, "text": None}

    def local(tag: str) -> str:
        return tag.rsplit(":", 1)[-1].lower()

    def start(tag, attrs):
        t = local(tag)
        if not stack:
            if t not in ("urlset", "sitemapindex"):
                raise _Abort
            state["root"] = t
        elif len(stack) == 1 and t in ("url", "sitemap"):
            state["entry"] = {}
        elif len(stack) == 2 and t in _FIELDS:
            state["text"] = []
        stack.append(t)

    def chardata(s):
        if state["text"] is not None:
            state["text"].append(s)

    def end(tag):
        t = local(tag)
        while stack and stack[-1] != t:  # tolerate mis-nesting
            stack.pop()
        if stack:
            stack.pop()
        if len(stack) == 2 and state["text"] is not None:
            entry = state.get("entry")
            if entry is not None and t in _FIELDS and t not in entry:
                entry[t] = "".join(state["text"]).strip()
            state["text"] = None
        elif len(stack) == 1 and t in ("url", "sitemap"):
            entry = state.pop("entry", None)
            if entry and entry.get("loc"):
                prio = None
                if t == "url" and entry.get("priority"):
                    try:
                        p = float(entry["priority"])
                        # spec range [0.0, 1.0]; reject junk
                        if math.isfinite(p) and 0.0 <= p <= 1.0:
                            prio = p
                    except ValueError:
                        pass
                rows.append({
                    "kind": "url" if t == "url" else "sitemap",
                    "loc": entry["loc"],
                    "lastmod": entry.get("lastmod") or None,
                    "changefreq": (entry.get("changefreq") or None)
                    if t == "url" else None,
                    "priority": prio,
                })
                if len(rows) >= _MAX_ENTRIES:
                    raise _Abort  # budget: keep what we have

    def doctype(*_a, **_k):
        # a protocol sitemap has no DTD; any doctype is hostile or
        # foreign — reject the whole document (closes entity bombs)
        rows.clear()
        raise _Abort

    p = xml.parsers.expat.ParserCreate()
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chardata
    p.StartDoctypeDeclHandler = doctype
    p.buffer_text = True
    try:
        p.Parse(data, True)
    except _Abort:
        pass  # rows holds whatever legitimately parsed before the stop
    except Exception:
        return []
    return rows


def parse_sitemaps(sitemap_df):
    """(host, sitemap_url, content binary) -> (host, sitemap_url, kind,
    loc, lastmod, changefreq, priority): every entry of every fetched
    sitemap document, ``kind='sitemap'`` rows being child sitemaps a
    crawler recurses on. Arrow-batched map — no join, no shuffle."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("sitemap_url", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("changefreq", T.StringType()),
        T.StructField("priority", T.DoubleType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("host", "sitemap_url", "kind", "loc",
                                   "lastmod", "changefreq")}
            prios: list = []
            for host, sm_url, content in zip(
                pdf["host"], pdf["sitemap_url"], pdf["content"]
            ):
                for e in parse_sitemap_bytes(content):
                    out["host"].append(host)
                    out["sitemap_url"].append(sm_url)
                    out["kind"].append(e["kind"])
                    out["loc"].append(e["loc"])
                    out["lastmod"].append(e["lastmod"])
                    out["changefreq"].append(e["changefreq"])
                    prios.append(e["priority"])
            yield pd.DataFrame(
                {**out, "priority": pd.array(prios, dtype="float64")}
            )

    return sitemap_df.select("host", "sitemap_url", "content").mapInPandas(
        batches, schema=schema
    )


# changefreq -> seconds (sitemaps.org enumerated values); 'always' is
# "changes on every access" -> zero interval, 'never' -> NULL (archive
# URLs are excluded from freshness scheduling, not fetched constantly)
_CHANGEFREQ_SEC = {
    "always": 0,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,   # 30 days, the crawler convention
    "yearly": 31536000,   # 365 days
}


def recrawl_priority(entries_df, now: str):
    """Freshness scheduling over parsed sitemap entries (the consumer
    of ``parse_sitemaps``): (host, loc, lastmod, changefreq) ->
    (host, loc, interval_sec, next_due, overdue, staleness_sec).

    - ``interval_sec``: the sitemaps.org changefreq enum mapped to
      seconds ('always'=0, 'never'/unknown/absent -> NULL — no
      freshness contract, excluded from due computation);
    - ``next_due = lastmod + interval_sec`` (lastmod parsed with
      try-semantics over the W3C datetime wire formats the protocol
      allows: date-only, the legacy space-separated timestamp, and
      'T'-separated second- or minute-precision with an optional
      ``+hh:mm``/``Z`` offset — offsets convert to the session's UTC;
      fractional seconds are truncated out by a leading normalizer;
      garbage -> NULL);
    - ``overdue`` / ``staleness_sec``: against the caller-supplied
      ``now`` (a literal, never the wall clock — replay-deterministic
      and oracle-comparable).

    Native expressions only: a small CASE chain and timestamp
    arithmetic, map-only at any corpus size."""
    from pyspark.sql import functions as F

    interval = F.lit(None).cast("long")
    for name, sec in _CHANGEFREQ_SEC.items():
        interval = F.when(
            F.lower(F.col("changefreq")) == name, F.lit(sec)
        ).otherwise(interval)
    # W3C/sitemaps.org lastmod wire formats, most-specific first. The
    # 'T'-separated forms carry an optional offset; XXX matches both
    # '+hh:mm' and 'Z' and converts into the session's UTC (the DuckDB
    # oracle mirrors Z via replace(...,'Z','+00:00') since %z takes
    # numeric offsets only — same instant either way). Fractional
    # seconds (W3C allows .s+) are stripped up front so one
    # seconds-precision pattern covers them; the regexp only rewrites
    # strings already shaped like a T-timestamp with a fraction, so
    # garbage stays garbage.
    lm = F.regexp_replace(
        F.col("lastmod"),
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})\.\d+", r"$1"
    )
    lastmod_ts = F.coalesce(
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd'T'HH:mm")),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd")),
    )
    now_ts = F.to_timestamp(F.lit(now))
    next_due = F.timestamp_seconds(
        F.unix_timestamp(lastmod_ts) + F.col("interval_sec")
    )
    return (
        entries_df.select(
            "host", "loc", "lastmod", "changefreq",
            interval.alias("interval_sec"),
        )
        .withColumn("next_due", next_due)
        .withColumn(
            "staleness_sec",
            F.when(
                F.col("next_due").isNotNull(),
                F.unix_timestamp(now_ts) - F.unix_timestamp("next_due"),
            ),
        )
        .withColumn(
            "overdue",
            F.when(F.col("next_due").isNotNull(),
                   F.col("staleness_sec") >= 0),
        )
        .select("host", "loc", "interval_sec",
                F.date_format("next_due", "yyyy-MM-dd HH:mm:ss")
                .alias("next_due"),
                "overdue", "staleness_sec")
    )
