"""WARC (ISO 28500 / WARC/1.0-1.1) reader — the crawl-archive format.

Common Crawl and every serious web archive ship as ``.warc.gz``: a
concatenation of PER-RECORD gzip members (so archives are seekable),
each member one WARC record — a version line, CRLF-terminated named
headers, ``Content-Length`` octets of block, then CRLF CRLF. For
``response`` records the block is a raw captured HTTP/1.x message, so
reading one usefully also means parsing the status line + headers and
undoing ``Transfer-Encoding: chunked`` and ``Content-Encoding:
gzip/deflate/br`` (crawlers store the wire bytes; brotli decodes
through the system libbrotlidec — llm/brotli_dec.py).

Everything here is stdlib (zlib) and total: hostile bytes, truncated
members, lying Content-Lengths, and decompression bombs (per-record
output cap) all yield the records that parsed cleanly, never an
exception. Plain (uncompressed) ``.warc`` concatenations parse too.

At 100 TB this is the ingest edge: one WARC file is one binary payload
(Common Crawl segments are ~1 GB), ``queries/llm_text.warc_records``
explodes it map-only into typed record rows, and only the extracted
fields (URI, status, content type, text) return to the JVM.
"""

from __future__ import annotations

import zlib

MAX_RECORD_BYTES = 1 << 26  # 64 MiB per decompressed record: bomb cap


def _gzip_members(payload: bytes):
    """Yield decompressed gzip members from a multi-member stream;
    stops at the first corrupt member. Non-gzip input yields itself."""
    if payload[:2] != b"\x1f\x8b":
        yield payload
        return
    pos = 0
    n = len(payload)
    while pos < n and payload[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(payload[pos:], MAX_RECORD_BYTES)
            # nonempty unconsumed_tail means output hit the cap mid-member.
            # A bomb-capped member must not drop the REST of the archive:
            # keep draining (discarding output) until the member boundary
            # so unused_data can locate the next member, then skip it.
            oversized = bool(d.unconsumed_tail)
            while not d.eof and d.unconsumed_tail:
                d.decompress(d.unconsumed_tail, MAX_RECORD_BYTES)
        except zlib.error:
            return
        if not d.eof:
            return  # genuinely truncated member: input exhausted mid-stream
        if not oversized:
            yield out
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_headers(block: bytes):
    """(first_line, {lower_name: value}, body_offset) of an RFC-822ish
    header block terminated by an empty line."""
    end = block.find(b"\r\n\r\n")
    sep = 4
    if end < 0:
        end = block.find(b"\n\n")
        sep = 2
        if end < 0:
            return None
    head = block[:end].decode("latin1")
    lines = head.replace("\r\n", "\n").split("\n")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        headers[k.strip().lower()] = v.strip()
    return lines[0], headers, end + sep


def _dechunk(body: bytes) -> bytes | None:
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)
        out += body[pos : pos + size]
        if len(out) > MAX_RECORD_BYTES:
            return None
        pos += size + 2  # chunk CRLF
    return bytes(out)


def _parse_http(block: bytes):
    """(status, content_type, body_bytes) from a raw HTTP/1.x response;
    None for non-HTTP blocks. Undoes chunked transfer coding and
    gzip/deflate/brotli content coding."""
    if not block[:5] == b"HTTP/":
        return None
    parsed = _parse_headers(block)
    if parsed is None:
        return None
    status_line, headers, off = parsed
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None
    body = block[off:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        de = _dechunk(body)
        if de is None:
            return None
        body = de
    enc = headers.get("content-encoding", "").lower()
    if enc == "br":
        # brotli — the dominant CDN coding on the modern web; decoded
        # through the system libbrotlidec (llm/brotli_dec.py), same
        # bomb cap; None (incl. library-absent) drops the record
        from travel_data_ingestion_spark.llm.brotli_dec import (
            brotli_decompress,
        )

        body = brotli_decompress(body, MAX_RECORD_BYTES)
        if body is None:
            return None
    elif enc == "zstd":
        # RFC 8878 content coding, via the system libzstd
        from travel_data_ingestion_spark.llm.zstd_dec import zstd_decompress

        body = zstd_decompress(body, MAX_RECORD_BYTES)
        if body is None:
            return None
    elif enc in ("gzip", "x-gzip", "deflate"):
        coded = body

        def _inflate(wbits: int):
            d = zlib.decompressobj(wbits=wbits)
            out = d.decompress(coded, MAX_RECORD_BYTES)
            # not at stream end = truncated OR over the bomb cap
            return out if d.eof and not d.unconsumed_tail else None

        try:
            body = _inflate(47 if enc != "deflate" else 15)
        except zlib.error:
            body = None
        if body is None and enc == "deflate":
            try:  # raw-deflate servers exist; crawlers store them
                body = _inflate(-15)
            except zlib.error:
                body = None
        if body is None:
            return None
    ctype = headers.get("content-type", "")
    return status, ctype, body


def parse_warc(payload: bytes):
    """Parse a .warc / .warc.gz payload into record dicts:
    ``{rec_type, target_uri, warc_date, content_type (record-level),
    http_status, http_content_type, body}`` — the http_* / body fields
    populated for response records (body fully transfer/content-
    decoded). Records that fail to parse are skipped; never raises."""
    out = []
    try:
        for member in _gzip_members(payload):
            pos = 0
            n = len(member)
            # a plain .warc concatenates records inside one member
            while pos < n:
                if member[pos : pos + 5] != b"WARC/":
                    break
                parsed = _parse_headers(member[pos:])
                if parsed is None:
                    break
                _version, headers, off = parsed
                try:
                    length = int(headers.get("content-length", ""))
                except ValueError:
                    break
                if length < 0 or length > MAX_RECORD_BYTES:
                    break
                block = member[pos + off : pos + off + length]
                if len(block) < length:
                    break  # truncated record
                rec = {
                    "rec_type": headers.get("warc-type", ""),
                    "target_uri": headers.get("warc-target-uri"),
                    "warc_date": headers.get("warc-date"),
                    "content_type": headers.get("content-type", ""),
                    "http_status": None,
                    "http_content_type": None,
                    "body": None,
                }
                if rec["rec_type"] == "response" and "http" in rec[
                    "content_type"
                ].lower():
                    http = _parse_http(block)
                    if http is not None:
                        rec["http_status"] = http[0]
                        rec["http_content_type"] = http[1]
                        rec["body"] = http[2]
                elif rec["rec_type"] == "resource":
                    rec["body"] = block
                out.append(rec)
                pos += off + length
                # trailing CRLF CRLF between records
                while member[pos : pos + 2] in (b"\r\n",) or member[
                    pos : pos + 1
                ] == b"\n":
                    pos += 2 if member[pos : pos + 2] == b"\r\n" else 1
        return out
    except (ValueError, IndexError, OverflowError, MemoryError):
        return out


def warc_records(df, payload_col: str = "payload", head_chars: int = 60):
    """Explode WARC payloads into typed record rows, Arrow-batched:
    (warc_id, ordinal, rec_type, target_uri, http_status,
    http_content_type, n_body_bytes, text_head). text_head is the
    extracted HTML text (llm/html_text.extract_html) for text/html
    bodies and the collapsed plain text for text/plain — truncated to
    head_chars; NULL for undecoded media bodies. Map-only: archive
    bytes cross to Python once, only typed rows return — the shape
    that makes one 1 GB Common Crawl segment one task at 100 TB."""
    import re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from travel_data_ingestion_spark.llm.html_text import extract_html

    schema = T.StructType(
        [
            T.StructField("warc_id", T.LongType()),
            T.StructField("ordinal", T.IntegerType()),
            T.StructField("rec_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("http_content_type", T.StringType()),
            T.StructField("n_body_bytes", T.LongType()),
            T.StructField("text_head", T.StringType()),
        ]
    )
    cols = df.select("warc_id", payload_col)
    ws = re.compile(r"\s+")
    cs_re = re.compile(r"charset=[\"']?([A-Za-z0-9_.:-]+)")

    def _decode(body: bytes, ctype: str) -> str:
        """Body text per the declared charset (Content-Type parameter;
        crawls are NOT all UTF-8 — latin-1/cp1252/shift-jis pages are
        routine), defaulting to UTF-8 with replacement."""
        m = cs_re.search(ctype)
        if m:
            try:
                return body.decode(m.group(1), "replace")
            except LookupError:
                pass  # unknown/garbage charset label
        return body.decode("utf-8", "replace")

    def _head(rec) -> str | None:
        body = rec["body"]
        if body is None:
            return None
        ctype = (rec["http_content_type"] or rec["content_type"] or "").lower()
        if "text/html" in ctype:
            return extract_html(_decode(body, ctype))[1][:head_chars]
        if "text/plain" in ctype or "warc-fields" in ctype:
            return ws.sub(" ", _decode(body, ctype)).strip()[:head_chars]
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in schema.fields}
            for wid, payload in zip(pdf["warc_id"], pdf[payload_col]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    out["warc_id"].append(wid)
                    out["ordinal"].append(i)
                    out["rec_type"].append(rec["rec_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["http_status"].append(rec["http_status"])
                    out["http_content_type"].append(rec["http_content_type"])
                    body = rec["body"]
                    out["n_body_bytes"].append(
                        len(body) if body is not None else None
                    )
                    out["text_head"].append(_head(rec))
            yield pd.DataFrame(
                {
                    "warc_id": pd.array(out["warc_id"], dtype="int64"),
                    "ordinal": pd.array(out["ordinal"], dtype="int32"),
                    "rec_type": out["rec_type"],
                    "target_uri": out["target_uri"],
                    "http_status": pd.array(out["http_status"], dtype="Int32"),
                    "http_content_type": out["http_content_type"],
                    "n_body_bytes": pd.array(out["n_body_bytes"], dtype="Int64"),
                    "text_head": out["text_head"],
                }
            )

    return cols.mapInPandas(batches, schema=schema)
