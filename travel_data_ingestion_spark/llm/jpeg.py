"""JPEG decode with stdlib + numpy only — no codec library.

Honest scope (everything else returns None -> the documented opaque
stub path in llm/multimodal): Huffman-coded DCT JPEG, sequential
baseline (SOF0/SOF1) AND progressive (SOF2 — spectral selection and
successive approximation, DC and AC refinement scans), 8-bit samples,
1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 /
4:4:0 and grayscale), 8- and 16-bit quantization tables, restart
markers, 0xFF byte stuffing, tables redefined between scans.
Arithmetic-coded, lossless, hierarchical, 12-bit, and CMYK streams are
gated, not guessed at.

Implemented from ITU-T T.81 (Annex F sequential / Annex G progressive
procedures — the AC refinement loop is the G.1.2.3 algorithm also used
by libjpeg's decode_mcu_AC_refine). Both modes decode through ONE
path: every scan accumulates into per-component quantized-coefficient
buffers, then dequantize + vectorized IDCT + upsample + YCbCr->RGB run
once at the end — a baseline image is simply a single scan covering
the whole band. The test suite cross-checks against an independent
forward encoder written from the same spec (progressive re-encodings
of identical coefficients must decode BIT-IDENTICALLY to the baseline
encoding) plus real-world files from other encoders
(tests/test_jpeg.py). Reference parity note: the reference pipeline
has no media path at all (SURVEY §2 K-ops are tabular); this module
belongs to the LLM-pipeline extension surface, where crawl payloads
are overwhelmingly JPEG.

Untrusted-input hardening: decoded output AND the coefficient buffers
are capped via multimodal.MAX_DECODE_BYTES before any allocation, and
the entropy bit reader caps synthetic past-the-end fill so a truncated
scan or a dims bomb (tiny payload, huge claimed MCU grid) terminates
in microseconds instead of freewheeling over millions of empty blocks.

Performance: entropy decoding is pure Python per block (flat
16-bit-peek Huffman LUTs, one lookup per symbol); the IDCT runs as one
einsum over all blocks of a component. This is the honest slow path,
run inside the Arrow-batched mapInPandas image operators; at real
crawl scale you would bind a native codec at the decode_image
boundary and the whole pipeline lights up unchanged.
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

# frame markers this decoder honestly cannot cover: arithmetic coding,
# lossless, differential/hierarchical
_SOF_UNSUPPORTED = frozenset((0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF))

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
    """Decode a baseline or progressive JPEG to (width, height,
    rgb_bytes); None for anything outside the documented scope or
    malformed (totality: never raises on hostile bytes —
    property-tested)."""
    try:
        return _decode_jpeg(payload)
    except (ValueError, IndexError, struct.error, ZeroDivisionError, OverflowError):
        return None


def _extract_scan_data(payload: bytes, pos: int):
    """Destuff one scan's entropy-coded data starting at ``pos``:
    returns (segments split at restart markers, offset of the
    terminating marker or end-of-payload)."""
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
            break
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


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
    coefs = None
    geom = None
    restart_interval = 0
    decoded_any_scan = False
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless markers
        if marker == 0xD9:
            break  # EOI
        if pos + 2 > n:
            return None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            if frame is not None:
                return None  # multi-frame: out of scope
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            # cap BOTH the RGB output and the coefficient buffers
            coef_bytes = sum(
                mcuy * c["v"] * mcux * c["h"] * 64 * 4 for c in comps
            )
            if w * h * 3 > MAX_DECODE_BYTES or coef_bytes > MAX_DECODE_BYTES:
                return None
            frame = (w, h, comps)
            geom = (hmax, vmax, mcux, mcuy)
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in _SOF_UNSUPPORTED:
            return None  # the honest gate
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            w, h, comps = frame
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            sel = []
            by_id = {c["id"]: ci for ci, c in enumerate(comps)}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in by_id:
                    return None
                sel.append((by_id[cs], tt >> 4, tt & 15))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 15
            if ss > se or se > 63 or al > 13:
                return None
            if ss > 0 and ns != 1:
                return None  # AC scans are single-component (T.81 G.1)
            segs, pos = _extract_scan_data(payload, pos)
            _scan_into(
                coefs,
                frame,
                geom,
                sel,
                ss,
                se,
                ah,
                al,
                segs,
                restart_interval,
                huff_dc,
                huff_ac,
            )
            decoded_any_scan = True
        # APPn / COM / DNL / anything else with a length: skipped
    if frame is None or not decoded_any_scan:
        return None
    return _reconstruct(frame, geom, coefs, qt)


def _scan_into(
    coefs, frame, geom, sel, ss, se, ah, al, segs, restart_interval, huff_dc, huff_ac
):
    """Accumulate one scan into the coefficient buffers. Handles all
    four progressive scan kinds (DC/AC x first/refinement) plus the
    baseline whole-band scan (ss=0, se=63, ah=0) through the same
    code."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = geom
    # resolve tables at scan time (they may be redefined between scans)
    dc_luts = {}
    ac_luts = {}
    for ci, td, ta in sel:
        if ss == 0 and ah == 0:
            if td not in huff_dc:
                raise ValueError("missing DC table")
            dc_luts[ci] = huff_dc[td]
        if se > 0:
            if ta not in huff_ac:
                raise ValueError("missing AC table")
            ac_luts[ci] = huff_ac[ta]
    # unit list: interleaved scans iterate MCUs (each with every
    # component's vs x hs blocks); single-component scans iterate that
    # component's OWN block grid (T.81 A.2.2: non-interleaved dims)
    if len(sel) > 1:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci, _td, _ta in sel:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append((ci, my * c["v"] + by, mx * c["h"] + bx))
                units.append(blocks)
    else:
        ci = sel[0][0]
        c = comps[ci]
        cw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        chh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        units = [[(ci, by, bx)] for by in range(chh) for bx in range(cw)]
    seg_idx = 0
    br = _BitReader(segs[0])
    pred = {ci: 0 for ci, _td, _ta in sel}
    state = {"eobrun": 0}
    p1 = 1 << al
    for u, blocks in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            pred = {k: 0 for k in pred}
            state["eobrun"] = 0
        for ci, by, bx in blocks:
            block = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:  # DC first (or baseline)
                    t = _decode_huff(br, dc_luts[ci])
                    pred[ci] += _extend(br.receive(t), t)
                    block[0] = pred[ci] << al
                else:  # DC refinement: one raw bit
                    if br.receive(1):
                        block[0] = int(block[0]) | p1
            if se > 0:
                k0 = max(ss, 1)
                if ah == 0:
                    _ac_first(br, ac_luts[ci], block, k0, se, al, state)
                else:
                    _ac_refine(br, ac_luts[ci], block, k0, se, al, state)


def _ac_first(br, lut, block, k0, se, al, state):
    """AC band, first pass (T.81 G.1.2.2; baseline is the se=63, al=0
    case where encoders only ever emit the degenerate r=0 EOB)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = k0
    while k <= se:
        rs = _decode_huff(br, lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            state["eobrun"] = (1 << r) - 1 + (br.receive(r) if r else 0)
            return
        k += r
        if k > se:
            raise ValueError("AC index past band end")
        block[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, lut, block, k0, se, al, state):
    """AC band, refinement pass — the G.1.2.3 correction-bit algorithm
    (structure as in libjpeg's decode_mcu_AC_refine): newly-nonzero
    coefficients arrive as +-1<<al; every already-nonzero coefficient
    crossed on the way reads one correction bit."""
    p1 = 1 << al
    k = k0
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(br, lut)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn COUNTS this block: the remainder-of-band
                    # correction pass below consumes one run unit (the
                    # libjpeg decode_mcu_AC_refine accounting — the
                    # run-1 shortcut _ac_first uses would skip one
                    # block too few here and desync the stream)
                    state["eobrun"] = (1 << r) + (br.receive(r) if r else 0)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if br.receive(1) else -p1
            while k <= se:
                cur = int(block[k])
                if cur != 0:
                    if br.receive(1) and (cur & p1) == 0:
                        block[k] = cur + (p1 if cur >= 0 else -p1)
                else:
                    if r == 0:
                        if val:
                            block[k] = val
                        break
                    r -= 1
                k += 1
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run (newly entered or carried): the rest of the
        # band still reads correction bits for every nonzero history
        while k <= se:
            cur = int(block[k])
            if cur != 0:
                if br.receive(1) and (cur & p1) == 0:
                    block[k] = cur + (p1 if cur >= 0 else -p1)
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, geom, coefs, qt):
    """Dequantize + IDCT every component in one einsum, upsample
    subsampled chroma by replication, convert to RGB."""
    import numpy as np

    global _IDCT_M
    if _IDCT_M is None:
        _IDCT_M = _idct_matrix()
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = geom
    zz = list(_ZIGZAG)
    full = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]
        cw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        chh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        blocks_zz = coefs[ci][:chh, :cw].reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(blocks_zz)
        nat[:, zz] = blocks_zz
        nat = nat.reshape(-1, 8, 8) * q
        spat = np.einsum("ij,njk,kl->nil", _IDCT_M.T, nat, _IDCT_M) + 128.0
        plane = (
            spat.reshape(chh, cw, 8, 8).transpose(0, 2, 1, 3).reshape(chh * 8, cw * 8)
        )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
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
