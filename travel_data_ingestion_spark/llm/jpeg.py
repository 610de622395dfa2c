"""Baseline JPEG decode with stdlib + numpy only — no codec library.

Honest scope (everything else returns None -> the documented opaque
stub path in llm/multimodal): baseline sequential DCT with Huffman
coding (SOF0/SOF1), 8-bit samples, 1 or 3 components, sampling factors
1-2 (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 and grayscale), 8- and 16-bit
quantization tables, restart markers, 0xFF byte stuffing. Progressive
(SOF2), arithmetic-coded, lossless, hierarchical, 12-bit, and CMYK
streams are gated, not guessed at.

Implemented from ITU-T T.81 (Annex F decode procedures); the test
suite cross-checks against an independent forward encoder written from
the same spec plus real-world files from other encoders
(tests/test_jpeg.py). Reference parity note: the reference pipeline
has no media path at all (SURVEY §2 K-ops are tabular); this module
belongs to the LLM-pipeline extension surface, where crawl payloads
are overwhelmingly JPEG.

Untrusted-input hardening: decoded output is capped at
multimodal.MAX_DECODE_BYTES before any allocation, and the entropy bit
reader caps synthetic past-the-end fill so a truncated scan or a
dims bomb (tiny payload, huge claimed MCU grid) terminates in
microseconds instead of freewheeling over millions of empty blocks.

Performance: this is a pure-Python per-payload kernel, run inside the
Arrow-batched mapInPandas image operators — the honest slow path. At
real crawl scale you would bind a native codec here; every caller goes
through decode_image, so swapping the implementation lights up the
whole pipeline unchanged.
"""

from __future__ import annotations

import struct

_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# frame markers this decoder honestly cannot cover: progressive,
# arithmetic, lossless, differential/hierarchical
_SOF_UNSUPPORTED = frozenset(
    (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)

_IDCT_M = None  # orthonormal 8x8 DCT-II basis, built on first use


def _idct_matrix():
    import numpy as np

    n = 8
    k = np.arange(n).reshape(-1, 1)
    x = np.arange(n).reshape(1, -1)
    m = np.cos((2 * x + 1) * k * np.pi / (2 * n))
    m[0] *= np.sqrt(1 / n)
    m[1:] *= np.sqrt(2 / n)
    return m  # spatial = m.T @ coef @ m


class _HuffLUT:
    """Flat 16-bit peek table built from a DHT segment's canonical
    (counts, symbols): the next 16 bits of the stream index straight to
    (symbol, code length) — one array lookup per decoded symbol instead
    of a bit-by-bit tree walk (the classic fast-path structure, cf.
    libjpeg's jdhuff lookahead)."""

    __slots__ = ("sym", "size")

    def __init__(self, counts: bytes, symbols: bytes):
        import numpy as np

        self.sym = np.full(1 << 16, -1, dtype=np.int16)
        self.size = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                lo = code << (16 - length)
                self.sym[lo : lo + (1 << (16 - length))] = symbols[k]
                self.size[lo : lo + (1 << (16 - length))] = length
                k += 1
                code += 1
            if code > (1 << length):
                raise ValueError("over-subscribed huffman table")
            code <<= 1


class _BitReader:
    """MSB-first bit reader over destuffed entropy-coded bytes. Reads
    past the end deliver zero bits (a valid stream consumes at most a
    few padding bits there), but synthetic fill is CAPPED: a truncated
    scan or a dims bomb would otherwise freewheel on zero bits (which
    decode as endless empty blocks under the typical tables) for every
    remaining MCU."""

    __slots__ = ("data", "pos", "buf", "nbits", "synthetic")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0
        self.synthetic = 0

    def _fill(self) -> None:
        while self.nbits <= 48:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.synthetic += 1
                if self.synthetic > 16:
                    raise ValueError("entropy data exhausted")
                self.buf <<= 8
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1
        return v


def _decode_huff(br: _BitReader, lut: _HuffLUT) -> int:
    key = br.peek16()
    s = int(lut.sym[key])
    if s < 0:
        raise ValueError("bad huffman code")
    br.nbits -= int(lut.size[key])
    br.buf &= (1 << br.nbits) - 1
    return s


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1 EXTEND: a t-bit magnitude to its signed value
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to (width, height, rgb_bytes); None for
    anything outside the documented scope or malformed (totality: never
    raises on hostile bytes — property-tested)."""
    try:
        return _decode_jpeg(payload)
    except (ValueError, IndexError, struct.error, ZeroDivisionError, OverflowError):
        return None


def _decode_jpeg(payload: bytes):
    import numpy as np

    from travel_data_ingestion_spark.llm.multimodal import MAX_DECODE_BYTES

    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, object] = {}
    huff_dc: dict[int, _HuffLUT] = {}
    huff_ac: dict[int, _HuffLUT] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless markers
        if marker == 0xD9:
            return None  # EOI before any scan decoded
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            return None
        pos += seglen
        if marker == 0xDB:  # DQT: one or more tables, 8- or 16-bit
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                b += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, b).astype(np.int32)
                    b += 64
                elif pq == 1:
                    tbl = np.frombuffer(body, np.dtype(">u2"), 64, b).astype(np.int32)
                    b += 128
                else:
                    return None
                z = np.zeros(64, np.int32)
                z[list(_ZIGZAG)] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT: one or more tables
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 15
                counts = body[b + 1 : b + 17]
                total = sum(counts)
                symbols = body[b + 17 : b + 17 + total]
                if len(symbols) < total or tc > 1:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffLUT(counts, symbols)
                b += 17 + total
        elif marker in (0xC0, 0xC1):  # SOF0/1: both baseline huffman
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8 or nc not in (1, 3) or not w or not h:
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    return None
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = (w, h, comps)
        elif marker in _SOF_UNSUPPORTED:
            return None  # the honest gate
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: single-scan baseline starts here
            if frame is None:
                return None
            w, h, comps = frame
            if w * h * 3 > MAX_DECODE_BYTES:
                return None
            if body[0] != len(comps):
                return None
            sel = {}
            for i in range(len(comps)):
                sel[body[1 + 2 * i]] = (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
            for c in comps:
                if c["id"] not in sel:
                    return None
                c["td"], c["ta"] = sel[c["id"]]
            return _decode_scan(
                payload, pos, frame, qt, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / anything else with a length: skipped
    return None


def _decode_scan(payload, pos, frame, qt, huff_dc, huff_ac, restart_interval):
    import numpy as np

    global _IDCT_M
    if _IDCT_M is None:
        _IDCT_M = _idct_matrix()
    w, h, comps = frame
    for c in comps:
        if c["tq"] not in qt or c["td"] not in huff_dc or c["ta"] not in huff_ac:
            raise ValueError("missing table")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # destuff entropy-coded data, splitting at restart markers
    segs = []
    cur = bytearray()
    i, n = pos, len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the (single, baseline) scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    zz = list(_ZIGZAG)
    seg_idx = 0
    br = _BitReader(segs[0])
    pred = [0] * len(comps)
    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                br = _BitReader(segs[seg_idx])
                pred = [0] * len(comps)
            count += 1
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                dc_lut, ac_lut = huff_dc[c["td"]], huff_ac[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(br, dc_lut)
                        pred[ci] += _extend(br.receive(t), t)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef
                        spat = _IDCT_M.T @ (block.reshape(8, 8) * q) @ _IDCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spat
    # upsample subsampled chroma to full resolution (pixel replication)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.clip(
            np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=2,
            ).round(),
            0,
            255,
        ).astype(np.uint8)
    return w, h, np.ascontiguousarray(rgb).tobytes()
