"""EXIF orientation — the metadata that makes phone photos upright.

Tag 0x0112 in IFD0 encodes how the sensor was held: 1 = upright,
3 = 180°, 6/8 = 90° turns, 2/4/5/7 = mirrored variants. A crawl
pipeline that ignores it dedups sideways photos away from their
upright copies; one that applies it normalizes them.

``exif_orientation`` reads the tag from every container this engine
meets it in:

- JPEG: APP1 segment tagged ``Exif\\0\\0`` (a TIFF structure inside);
- TIFF: the primary IFD directly;
- PNG: the standardized ``eXIf`` chunk (PNG 1.5+), same TIFF body;
- WebP: the extended-format ``EXIF`` chunk.

``apply_orientation`` maps (w, h, rgb_bytes) to the upright rendering
with numpy rot90/flip — exposed as an OPT-IN helper, deliberately NOT
wired into decode_image/phash by default: the planted-clique oracles
pin hashes of decoded payloads as stored, and changing that silently
would re-grade every media row. A pipeline that wants
orientation-invariant dedup composes the two functions.

Total: anything malformed returns None (probe) / the input (apply).
"""

from __future__ import annotations

import struct


def _tiff_orientation(tiff: bytes) -> int | None:
    if len(tiff) < 14:
        return None
    if tiff[:4] == b"II*\x00":
        endian = "<"
    elif tiff[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(endian + "I", tiff[4:8])
    if ifd_off + 2 > len(tiff):
        return None
    (n_entries,) = struct.unpack(endian + "H", tiff[ifd_off : ifd_off + 2])
    at = ifd_off + 2
    for _ in range(min(n_entries, 512)):
        if at + 12 > len(tiff):
            return None
        tag, typ, _count = struct.unpack(endian + "HHI", tiff[at : at + 8])
        if tag == 0x0112 and typ == 3:  # SHORT
            (val,) = struct.unpack(endian + "H", tiff[at + 8 : at + 10])
            return val if 1 <= val <= 8 else None
        at += 12
    return None


def exif_orientation(payload: bytes) -> int | None:
    """Orientation 1-8 from a JPEG/TIFF/PNG/WebP payload, or None when
    absent/malformed. Never raises."""
    try:
        if payload[:2] == b"\xff\xd8":  # JPEG: walk to APP1
            pos = 2
            n = len(payload)
            while pos + 4 <= n and payload[pos] == 0xFF:
                marker = payload[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                (seg,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
                if marker == 0xE1 and payload[
                    pos + 4 : pos + 10
                ] == b"Exif\x00\x00":
                    return _tiff_orientation(
                        payload[pos + 10 : pos + 2 + seg]
                    )
                if marker == 0xDA:  # entropy data: metadata is before it
                    return None
                pos += 2 + seg
            return None
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            return _tiff_orientation(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            pos = 8
            n = len(payload)
            while pos + 8 <= n:
                (length,) = struct.unpack(">I", payload[pos : pos + 4])
                ctype = payload[pos + 4 : pos + 8]
                if ctype == b"eXIf":
                    return _tiff_orientation(
                        payload[pos + 8 : pos + 8 + length]
                    )
                if ctype in (b"IDAT", b"IEND"):
                    return None  # eXIf precedes image data
                pos += 12 + length
            return None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            pos = 12
            n = len(payload)
            while pos + 8 <= n:
                fourcc = payload[pos : pos + 4]
                (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
                if fourcc == b"EXIF":
                    body = payload[pos + 8 : pos + 8 + length]
                    if body[:6] == b"Exif\x00\x00":  # some muxers prefix
                        body = body[6:]
                    return _tiff_orientation(body)
                pos += 8 + length + (length & 1)
            return None
        return None
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def apply_orientation(w: int, h: int, rgb: bytes, orientation):
    """Upright (w, h, rgb_bytes) for an EXIF orientation; identity for
    1/None/invalid. Orientations per the EXIF spec:
    2 mirror-H, 3 rot180, 4 mirror-V, 5 transpose, 6 rot90 CW,
    7 transverse, 8 rot90 CCW."""
    if orientation in (None, 1) or not 2 <= int(orientation) <= 8:
        return w, h, rgb
    import numpy as np

    a = np.frombuffer(rgb, np.uint8)
    if a.size != w * h * 3:
        return w, h, rgb
    a = a.reshape(h, w, 3)
    o = int(orientation)
    if o == 2:
        a = a[:, ::-1]
    elif o == 3:
        a = a[::-1, ::-1]
    elif o == 4:
        a = a[::-1, :]
    elif o == 5:
        a = np.transpose(a, (1, 0, 2))
    elif o == 6:
        a = np.rot90(a, k=-1, axes=(0, 1))
    elif o == 7:
        a = np.rot90(a[:, ::-1], k=-1, axes=(0, 1))
    elif o == 8:
        a = np.rot90(a, k=1, axes=(0, 1))
    oh, ow = a.shape[:2]
    return ow, oh, np.ascontiguousarray(a).tobytes()
