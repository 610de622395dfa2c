"""URL canonicalization — dedup-by-URL for crawl pipelines.

Two captures of the same page rarely share URL bytes: hosts differ by
case, default ports appear and disappear, paths carry dot segments and
over-escaped characters, query params arrive in any order padded with
click-tracking noise, fragments are client-side. ``normalize_url``
maps all of those to one canonical form (stdlib ``urllib.parse``):

- scheme and host lowercased; trailing host dot dropped;
- default ports stripped (http:80, https:443);
- dot segments resolved; empty path becomes ``/``; percent-escapes of
  UNRESERVED characters decoded, all other escapes uppercased;
- query pairs: tracking params dropped (``utm_*``, fbclid, gclid,
  msclkid, igshid, mc_eid), remainder sorted by (key, value) and
  re-encoded minimally; ``?`` with nothing left disappears;
- fragments dropped.

Non-http(s) or unparseable inputs return None (callers keep the raw
URL alongside; the canonical column is for grouping). IDN hosts are
kept as given (no punycode conversion — documented scope).
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit

_TRACKING = re.compile(
    r"^(utm_\w+|fbclid|gclid|msclkid|igshid|mc_eid|yclid|_hs\w+)$",
    re.IGNORECASE,
)
# characters that stay percent-UNescaped in the canonical form
_SAFE_PATH = "/-._~!$&'()*+,;=:@"


def _canon_path(path: str) -> str:
    # resolve dot segments per RFC 3986 5.2.4 (keep trailing slash)
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    lead = "/"
    tail = "/" if path.endswith(("/", "/.", "/..")) and out else ""
    # decode then re-encode: unreserved chars come out of escapes,
    # everything else goes back uppercase-escaped
    segs = [quote(unquote(s), safe=_SAFE_PATH.replace("/", "")) for s in out]
    return lead + "/".join(segs) + tail if segs else "/"


def normalize_url(url: str | None) -> str | None:
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    try:
        # .port raises ValueError on out-of-range or non-numeric ports
        # ('http://h:99999/x', 'http://h:abc/x') — unparseable → None
        port = parts.port
    except ValueError:
        return None
    if port in (None, 80 if scheme == "http" else 443):
        netloc = host
    else:
        netloc = f"{host}:{port}"
    path = _canon_path(parts.path)
    pairs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not _TRACKING.match(k)
    ]
    query = urlencode(sorted(pairs)) if pairs else ""
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")
