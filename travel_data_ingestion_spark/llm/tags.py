"""Audio tag extraction — ID3v1/v2 and Vorbis comments, stdlib only.

The metadata a crawl pipeline actually joins on (title/artist/album/
date/genre), across the containers this engine reads:

- **ID3v2.2/2.3/2.4** leading tags on mp3 payloads: syncsafe tag size,
  per-version frame layouts (3-byte v2.2 ids, plain v2.3 sizes,
  syncsafe v2.4 sizes), text-frame encodings 0-3 (latin-1, UTF-16 w/
  BOM, UTF-16BE, UTF-8), and the ID3v1 128-byte trailer as fallback;
- **Vorbis comments** wherever they live: the ``\\x03vorbis`` packet of
  an Ogg-Vorbis stream, and the VORBIS_COMMENT metadata block (type 4)
  of native FLAC and Ogg-FLAC (whose header packets are native
  metadata blocks);
- RIFF/WAVE **LIST INFO** chunks (INAM/IART/IPRD/ICRD/IGNR).

Returned keys are normalized to ``title/artist/album/date/genre``;
everything is total (malformed tags yield what parsed, never raise).
Like the other metadata probes this costs a header read, not a decode.
"""

from __future__ import annotations

_ID3_V23_MAP = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TYER": "date", "TDRC": "date", "TCON": "genre",
}
_ID3_V22_MAP = {
    "TT2": "title", "TP1": "artist", "TAL": "album",
    "TYE": "date", "TCO": "genre",
}
_VC_MAP = {
    "title": "title", "artist": "artist", "album": "album",
    "date": "date", "genre": "genre",
}
_RIFF_MAP = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album",
    b"ICRD": "date", b"IGNR": "genre",
}


def _text(data: bytes) -> str:
    """Decode an ID3v2 text frame body (leading encoding byte)."""
    if not data:
        return ""
    enc = data[0]
    body = data[1:]
    try:
        if enc == 0:
            s = body.decode("latin1")
        elif enc == 1:
            s = body.decode("utf-16")  # BOM-led
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            return ""
    except (UnicodeDecodeError, LookupError):
        return ""
    return s.split("\x00")[0].strip()


def _syncsafe(b: bytes) -> int:
    v = 0
    for byte in b:
        v = (v << 7) | (byte & 0x7F)
    return v


def _id3v2(payload: bytes) -> dict:
    out: dict[str, str] = {}
    if payload[:3] != b"ID3" or len(payload) < 10:
        return out
    ver = payload[3]
    unsync = bool(payload[5] & 0x80)
    size = _syncsafe(payload[6:10])
    body = payload[10 : min(10 + size, len(payload))]
    if unsync and ver <= 3:
        # v2.2/v2.3 unsynchronisation is applied to the WHOLE tag body
        # as the last write step: undo the 0xFF 0x00 byte stuffing first
        # or frame sizes/text decode are garbled
        body = body.replace(b"\xff\x00", b"\xff")
    end = len(body)
    pos = 0
    if payload[5] & 0x40 and ver >= 3:  # extended header
        if ver == 4:
            pos += _syncsafe(body[0:4])
        else:
            pos += int.from_bytes(body[0:4], "big") + 4
    while pos + 6 <= end:
        frame_unsync = False
        if ver == 2:
            fid = body[pos : pos + 3].decode("latin1", "replace")
            fsz = int.from_bytes(body[pos + 3 : pos + 6], "big")
            hdr = 6
            key = _ID3_V22_MAP.get(fid)
        else:
            if pos + 10 > end:
                break
            fid = body[pos : pos + 4].decode("latin1", "replace")
            raw = body[pos + 4 : pos + 8]
            fsz = _syncsafe(raw) if ver >= 4 else int.from_bytes(raw, "big")
            hdr = 10
            # v2.4 unsynchronisation is per-frame (format flag 0x02);
            # the tag-level flag means every frame has it set
            frame_unsync = ver >= 4 and bool((body[pos + 9] & 0x02) or unsync)
            key = _ID3_V23_MAP.get(fid)
        if not fid.strip("\x00 ") or fsz <= 0 or pos + hdr + fsz > end:
            break
        if key and key not in out:
            data = body[pos + hdr : pos + hdr + fsz]
            if frame_unsync:
                data = data.replace(b"\xff\x00", b"\xff")
            val = _text(data)
            if val:
                out[key] = val
        pos += hdr + fsz
    return out


def _id3v1(payload: bytes) -> dict:
    n = len(payload)
    if n < 128 or payload[n - 128 : n - 125] != b"TAG":
        return {}
    t = payload[n - 128 :]

    def f(a, b):
        return t[a:b].split(b"\x00")[0].decode("latin1", "replace").strip()

    out = {}
    for key, val in (("title", f(3, 33)), ("artist", f(33, 63)),
                     ("album", f(63, 93)), ("date", f(93, 97))):
        if val:
            out[key] = val
    return out


def _vorbis_comment_body(body: bytes) -> dict:
    """Parse the comment payload shared by Vorbis packets and FLAC
    VORBIS_COMMENT blocks: vendor_len/vendor, count, len/'K=V'..."""
    out: dict[str, str] = {}
    try:
        vlen = int.from_bytes(body[0:4], "little")
        pos = 4 + vlen
        count = int.from_bytes(body[pos : pos + 4], "little")
        pos += 4
        for _ in range(min(count, 256)):
            ln = int.from_bytes(body[pos : pos + 4], "little")
            pos += 4
            item = body[pos : pos + ln]
            if len(item) < ln:
                break
            pos += ln
            if b"=" not in item:
                continue
            k, v = item.split(b"=", 1)
            key = _VC_MAP.get(k.decode("latin1").lower())
            if key and key not in out:
                val = v.decode("utf-8", "replace").strip()
                if val:
                    out[key] = val
    except (IndexError, ValueError, OverflowError):
        pass
    return out


def _flac_blocks(stream: bytes, at: int) -> dict:
    """Walk native FLAC metadata blocks from ``at`` for VORBIS_COMMENT."""
    pos = at
    while pos + 4 <= len(stream):
        hdr = stream[pos]
        size = int.from_bytes(stream[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 4:
            return _vorbis_comment_body(stream[pos + 4 : pos + 4 + size])
        pos += 4 + size
        if hdr & 0x80:
            break
    return {}


def _riff_info(payload: bytes) -> dict:
    out: dict[str, str] = {}
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"LIST" and payload[pos + 8 : pos + 12] == b"INFO":
            at = pos + 12
            end = min(pos + 8 + size, n)
            while at + 8 <= end:
                sub = payload[at : at + 4]
                ssz = int.from_bytes(payload[at + 4 : at + 8], "little")
                key = _RIFF_MAP.get(sub)
                if key and key not in out:
                    val = (
                        payload[at + 8 : at + 8 + ssz]
                        .split(b"\x00")[0]
                        .decode("latin1", "replace")
                        .strip()
                    )
                    if val:
                        out[key] = val
                at += 8 + ssz + (ssz & 1)
        pos += 8 + size + (size & 1)
    return out


def audio_tags(payload: bytes) -> dict:
    """title/artist/album/date/genre from whatever tag container the
    payload carries; {} when none. Never raises."""
    try:
        if payload[:3] == b"ID3":
            out = _id3v2(payload)
            return out or _id3v1(payload)
        if payload[:2] == b"\xff\xfb" or payload[:2] == b"\xff\xf3" or (
            len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
        ):
            return _id3v1(payload)
        if payload[:4] == b"fLaC":
            return _flac_blocks(payload, 4)
        if payload[:4] == b"OggS":
            from travel_data_ingestion_spark.llm.ogg import _identify, demux

            for _serial, (pkts, _g0, _g1) in demux(
                payload, max_bytes=1 << 24
            ).items():
                if not pkts:
                    continue
                codec = _identify(pkts[0])
                if codec == "vorbis":
                    for p in pkts[1:4]:
                        if p[:7] == b"\x03vorbis":
                            return _vorbis_comment_body(p[7:])
                elif codec == "flac":
                    # header packets after the first are native blocks
                    for p in pkts[1:8]:
                        if p[:1] != b"\xff" and len(p) >= 4:
                            got = _flac_blocks(p, 0)
                            if got:
                                return got
                elif codec == "opus":
                    for p in pkts[1:4]:
                        if p[:8] == b"OpusTags":
                            return _vorbis_comment_body(p[8:])
            return {}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _riff_info(payload)
        return {}
    except (IndexError, ValueError, OverflowError):
        return {}


def tag_container(payload: bytes) -> str | None:
    """Which tag home the payload leads with (id3v2 / mp3-id3v1 /
    flac / ogg / wav), or None — a sniff, not a decode."""
    try:
        if payload[:3] == b"ID3":
            return "id3v2"
        if payload[:2] in (b"\xff\xfb", b"\xff\xf3") or (
            len(payload) > 1
            and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
        ):
            return "mp3"
        if payload[:4] == b"fLaC":
            return "flac"
        if payload[:4] == b"OggS":
            return "ogg"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "wav"
        return None
    except IndexError:
        return None


def audio_tag_rows(df, payload_col: str = "payload"):
    """(media_id, payload) -> (media_id, container, title, artist,
    album, date_tag, genre): Arrow-batched tag extraction. Payload
    bytes cross to Python once per row and never return to the JVM —
    only the small normalized tag row does, so a 100 TB media corpus
    stays map-only with no payload shuffle (the mm01/warc_records
    shape)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("artist", T.StringType()),
            T.StructField("album", T.StringType()),
            T.StructField("date_tag", T.StringType()),
            T.StructField("genre", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in schema.fields}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                tags = audio_tags(raw)
                out["media_id"].append(mid)
                out["container"].append(tag_container(raw))
                out["title"].append(tags.get("title"))
                out["artist"].append(tags.get("artist"))
                out["album"].append(tags.get("album"))
                out["date_tag"].append(tags.get("date"))
                out["genre"].append(tags.get("genre"))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=schema)
