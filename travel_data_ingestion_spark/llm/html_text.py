"""HTML -> text extraction for crawl-scale training-data pipelines.

Pure stdlib (``html.parser.HTMLParser``): no external deps, total on
malformed markup (real crawls are full of unclosed tags and soup).
Semantics the tests pin:

- ``script``/``style``/``noscript``/``template``/``iframe``/``svg``
  subtrees contribute NOTHING (their text is code, not prose) but ARE
  word boundaries — ``a<script>..</script>b`` must not read "ab";
- character/entity references decode (``convert_charrefs``);
- comments and attribute values are dropped; ``alt`` text is not
  promoted (deliberate: alt-text mining is a different operator);
- the first ``<title>`` becomes the title and stays OUT of the body;
- block-level boundaries (p/div/li/h*/tr/br/...) become whitespace, so
  "<p>a</p><p>b</p>" reads "a b", never "ab";
- the returned body text is single-space collapsed (the canonical form
  the dedup/quality operators downstream expect — and the form a SQL
  oracle can reproduce with one regexp_replace);
- ``n_links`` counts anchor tags carrying an href.

At 100 TB: extraction is map-only (Arrow-batched over the html column
in queries/llm_text.py); raw HTML crosses to Python once and only the
extracted fields return.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP = frozenset(
    ("script", "style", "noscript", "template", "iframe", "svg", "math")
)
_BLOCK = frozenset(
    ("p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2",
     "h3", "h4", "h5", "h6", "tr", "td", "th", "table", "thead", "tbody",
     "section", "article", "header", "footer", "nav", "aside",
     "blockquote", "pre", "hr", "form", "figure", "figcaption", "main")
)

_WS = re.compile(r"\s+")


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.drop_depth = 0
        self.in_title = False
        self.title_done = False
        self.n_links = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            # a dropped subtree is a word boundary: "a<script>..</script>b"
            # must not read "ab"
            self.chunks.append(" ")
            self.drop_depth += 1
            return
        # a <title> inside a dropped subtree (e.g. inline <svg><title>)
        # is NOT the document title — ignore it entirely
        if tag == "title" and not self.title_done and not self.drop_depth:
            self.in_title = True
        if tag == "a" and any(k == "href" for k, _v in attrs):
            self.n_links += 1
        if tag in _BLOCK:
            self.chunks.append(" ")

    def handle_startendtag(self, tag, attrs):
        # a self-closed tag opens AND closes: without the end half, a
        # self-closed drop tag (<svg/>, <iframe src=x/>) would leave
        # drop_depth elevated and silently swallow the rest of the doc
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _DROP:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        # only a </title> that closes an ACTIVE document title finishes
        # it — a stray end tag or one inside a dropped subtree must not
        # suppress the real title that follows
        if tag == "title" and self.in_title:
            self.in_title = False
            self.title_done = True
        if tag in _BLOCK:
            self.chunks.append(" ")

    def handle_data(self, data):
        if self.drop_depth:
            return
        if self.in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def extract_html(html: str):
    """(title, text, n_links) from an HTML string; total — malformed
    markup yields best-effort text, never an exception."""
    try:
        p = _Extractor()
        p.feed(html)
        p.close()
        title = _WS.sub(" ", "".join(p.title_chunks)).strip()
        text = _WS.sub(" ", "".join(p.chunks)).strip()
        return title, text, p.n_links
    except Exception:  # HTMLParser can raise on pathological input
        return "", "", 0


def html_extract(df, html_col: str = "html"):
    """Arrow-batched HTML->text over a DataFrame with (doc_id, html):
    returns (doc_id, title, text, n_links). Map-only — the raw HTML
    crosses to Python once per batch; only extracted fields return."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("title", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_links", T.IntegerType()),
        ]
    )
    cols = df.select("doc_id", html_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [extract_html(h) for h in pdf[html_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "title": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "n_links": pd.array([r[2] for r in rows],
                                        dtype="int32"),
                }
            )

    return cols.mapInPandas(batches, schema=schema)


# -- outlink extraction: the crawl DISCOVERY side ----------------------------

# frontier-fetchable schemes after resolution; everything else
# (javascript:, mailto:, tel:, data:, about:, ftp:) is not a crawl URL
_FETCHABLE = ("http", "https")

# hostile-input budget: links per document
_MAX_OUTLINKS = 10_000


class _LinkExtractor(HTMLParser):
    """Collect <a href> targets with the document's effective base URL
    (the FIRST <base href> in the document wins, per HTML spec) and
    the rel=nofollow flag; links inside dropped subtrees (svg/template
    /noscript/...) are presentation or fallback, not discovery."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.base: str | None = None
        self.links: list[tuple[str, bool]] = []
        self.drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        d = dict(attrs)
        if tag == "base" and self.base is None and d.get("href"):
            self.base = d["href"].strip()
        elif tag == "a" and d.get("href") is not None:
            if len(self.links) < _MAX_OUTLINKS:
                rel = (d.get("rel") or "").lower().split()
                self.links.append((d["href"].strip(), "nofollow" in rel))

    def handle_startendtag(self, tag, attrs):
        # self-closed drop tags (<svg/>) must not leave drop_depth
        # elevated — that would drop every later <a href> in the page
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _DROP:
            self.drop_depth = max(0, self.drop_depth - 1)


def extract_outlinks(html: str, page_url: str) -> list[tuple[str, bool]]:
    """(link, nofollow) pairs from one HTML document: hrefs resolved
    against the page URL (or the document's first ``<base href>`` when
    present, per spec), fragments stripped (frontier convention),
    non-fetchable schemes dropped, per-document order-preserving
    dedup (first rel flag wins). Total — malformed markup yields
    best-effort links, never an exception."""
    from urllib.parse import urldefrag, urljoin, urlsplit

    try:
        p = _LinkExtractor()
        p.feed(html)
        p.close()
    except Exception:
        return []
    base = urljoin(page_url, p.base) if p.base else page_url
    out: list[tuple[str, bool]] = []
    seen: set[str] = set()
    for href, nofollow in p.links:
        try:
            url = urldefrag(urljoin(base, href))[0]
            if urlsplit(url).scheme not in _FETCHABLE or not url:
                continue
        except ValueError:
            continue
        if url not in seen:
            seen.add(url)
            out.append((url, nofollow))
    return out


def html_outlinks(df, url_col: str = "url", html_col: str = "html"):
    """Arrow-batched discovery over (doc_id, url, html): one row per
    extracted outlink — (doc_id, url, link, nofollow), the frontier
    feed. Map-only; raw HTML crosses to Python once per batch and
    never returns to the JVM."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("link", T.StringType()),
            T.StructField("nofollow", T.BooleanType()),
        ]
    )
    cols = df.select("doc_id", url_col, html_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, urls, links, nofs = [], [], [], []
            for doc_id, page_url, html in zip(
                pdf["doc_id"], pdf[url_col], pdf[html_col]
            ):
                if not isinstance(html, str):
                    continue
                for link, nof in extract_outlinks(
                    html, page_url if isinstance(page_url, str) else ""
                ):
                    ids.append(doc_id)
                    urls.append(page_url)
                    links.append(link)
                    nofs.append(nof)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "url": urls,
                    "link": links,
                    "nofollow": pd.array(nofs, dtype="boolean"),
                }
            )

    return cols.mapInPandas(batches, schema=schema)
