"""FLAC decode with stdlib + numpy only — no codec library.

Honest scope (everything else returns None -> the documented opaque
stub path in llm/multimodal): native-FLAC containers ('fLaC' marker),
STREAMINFO + skipped metadata blocks, fixed and variable blocksize
frames, all four channel assignments (independent, left/side,
right/side, mid/side), subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32), wasted bits, and partitioned
Rice/Rice2 residuals including the escape-to-raw code. Sample sizes
8/12/16/20/24 bits. Ogg-encapsulated FLAC returns None.

Implemented from the FLAC format specification (RFC 9639 / the
xiph.org format document). FLAC is LOSSLESS, so the test suite can be
exact: an independent forward encoder (written from the same spec)
round-trips arbitrary PCM bit-identically through every subframe type,
channel assignment, and rice partitioning (tests/test_flac.py).

CRC-8 (frame header) is verified — it's cheap and catches desync;
CRC-16 (frame trailer) is skipped for speed. Decoded output is capped
via multimodal.MAX_DECODE_BYTES before allocation, and a bounded bit
reader turns truncated streams into None instead of hangs.

Performance note: like llm/jpeg.py this is a pure-Python per-payload
kernel inside the Arrow-batched audio operators — the honest slow
path; a native codec would bind at the decode_audio boundary.
"""

from __future__ import annotations

_CRC8_TABLE = None


def _crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        tbl = []
        for b in range(256):
            c = b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            tbl.append(c)
        _CRC8_TABLE = tbl
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


class _Bits:
    """MSB-first bounded bit reader: reading past the end raises (a
    truncated FLAC stream must become None, never a hang or garbage)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("flac bitstream exhausted")
        v = 0
        pos = self.bitpos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        # count zero bits up to the terminating 1
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("unbounded unary run")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

# fixed-predictor coefficients by order (spec §9.2.2)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def decode_flac(payload: bytes):
    """Decode a native FLAC payload to (sample_rate, n_channels,
    bits_per_sample, int64 samples shaped (n_frames, n_channels));
    None for anything outside the documented scope or malformed
    (totality: never raises)."""
    try:
        return _decode_flac(payload)
    except (ValueError, IndexError, ZeroDivisionError, OverflowError):
        return None


def _decode_flac(payload: bytes):
    import numpy as np

    from travel_data_ingestion_spark.llm.multimodal import MAX_DECODE_BYTES

    if payload[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) < size:
            return None
        if btype == 0:  # STREAMINFO
            if size < 34:
                return None
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)  # min framesize
            b.read(24)  # max framesize
            rate = b.read(20)
            n_ch = b.read(3) + 1
            bits = b.read(5) + 1
            total = b.read(36)
            info = (rate, n_ch, bits, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        return None
    rate, n_ch, bits, total = info
    if not rate or bits not in (8, 12, 16, 20, 24):
        return None
    # budget 16 bytes per sample: the int64 decode buffer plus the
    # float64 copy decode_audio makes — the cap bounds PEAK allocation,
    # not just the nominal output size
    if total and total * n_ch * 16 > MAX_DECODE_BYTES:
        return None
    out = []
    got = 0
    n = len(payload)
    while pos + 2 <= n:
        # frame sync: 14 bits 0b11111111111110
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            return None
        frame = _decode_frame(payload, pos, info)
        if frame is None:
            return None
        samples, pos = frame
        out.append(samples)
        got += samples.shape[0]
        if got * n_ch * 16 > MAX_DECODE_BYTES:
            return None
        if total and got >= total:
            break
        # trailing padding bytes after the last frame are tolerated
        if pos >= n or (not total and payload[pos : pos + 1] in (b"", b"\x00")):
            break
    if not out:
        return None
    samples = np.concatenate(out, axis=0)
    if total:
        samples = samples[: int(total)]
    return rate, n_ch, bits, samples


def _decode_frame(payload: bytes, pos: int, info):
    import numpy as np

    rate0, n_ch, bits0, _total = info
    b = _Bits(payload, pos * 8)
    sync = b.read(14)
    if sync != 0x3FFE:
        return None
    b.read(1)  # reserved
    b.read(1)  # blocking strategy (frame/sample number parses the same)
    bs_code = b.read(4)
    sr_code = b.read(4)
    ch_code = b.read(4)
    size_code = b.read(3)
    b.read(1)  # reserved
    # UTF-8-style coded frame/sample number
    first = b.read(8)
    if first < 0x80:
        extra = 0
    elif first >= 0xFE:
        extra = 6
    else:
        extra = 0
        probe = first
        while probe & 0x40:
            extra += 1
            probe <<= 1
        if not 1 <= extra <= 6:
            return None
    for _ in range(extra):
        if b.read(2) != 0b10:
            return None
        b.read(6)
    if bs_code == 0:
        return None
    elif bs_code == 6:
        blocksize = b.read(8) + 1
    elif bs_code == 7:
        blocksize = b.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODE[bs_code]
    if sr_code == 0:
        rate = rate0
    elif sr_code in _RATE_CODE:
        rate = _RATE_CODE[sr_code]
    elif sr_code == 12:
        rate = b.read(8) * 1000
    elif sr_code == 13:
        rate = b.read(16)
    elif sr_code == 14:
        rate = b.read(16) * 10
    else:
        return None
    if size_code == 0:
        bits = bits0
    elif size_code in _SIZE_CODE:
        bits = _SIZE_CODE[size_code]
    else:
        return None
    # CRC-8 over the header bytes read so far
    hdr_end = (b.bitpos + 7) >> 3
    if _crc8(payload[pos:hdr_end]) != payload[hdr_end]:
        return None
    b.bitpos = (hdr_end + 1) * 8
    # channel layout
    if ch_code <= 7:
        n_sub = ch_code + 1
        mode = "indep"
    elif ch_code == 8:
        n_sub, mode = 2, "left_side"
    elif ch_code == 9:
        n_sub, mode = 2, "right_side"
    elif ch_code == 10:
        n_sub, mode = 2, "mid_side"
    else:
        return None
    if mode == "indep" and n_sub != n_ch:
        return None
    subs = []
    for ci in range(n_sub):
        sbits = bits
        # side channels carry one extra bit
        if (mode == "left_side" and ci == 1) or (mode == "right_side" and ci == 0):
            sbits += 1
        elif mode == "mid_side" and ci == 1:
            sbits += 1
        subs.append(_decode_subframe(b, blocksize, sbits))
    b.align()
    b.read(16)  # frame CRC-16 (not verified: header CRC already gates)
    if mode == "indep":
        frame = np.stack(subs, axis=1)
    elif mode == "left_side":
        left, side = subs
        frame = np.stack([left, left - side], axis=1)
    elif mode == "right_side":
        side, right = subs
        frame = np.stack([right + side, right], axis=1)
    else:  # mid/side: mid2 = (mid<<1)|(side&1); left/right = (mid2±side)>>1
        mid, side = subs
        mid2 = (mid.astype(np.int64) << 1) | (side.astype(np.int64) & 1)
        left = (mid2 + side) >> 1
        right = (mid2 - side) >> 1
        frame = np.stack([left.astype(np.int64), right.astype(np.int64)], axis=1)
    return frame.astype(np.int64), (b.bitpos + 7) >> 3


def _decode_subframe(b: _Bits, blocksize: int, bits: int):
    import numpy as np

    if b.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.unary()
    eff = bits - wasted
    if eff <= 0:
        raise ValueError("wasted bits exhaust sample size")
    if stype == 0:  # CONSTANT
        v = b.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([b.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [b.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * int(out[i - 1 - j])
            out[i] = pred + resid[i - order]
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [b.read_signed(eff) for _ in range(order)]
        prec = b.read(4) + 1
        if prec == 16:
            raise ValueError("invalid lpc precision code")
        shift = b.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            out[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError("reserved subframe type")
    return out << wasted


def _decode_residual(b: _Bits, blocksize: int, order: int):
    import numpy as np

    method = b.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    porder = b.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    at = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("negative partition count")
        k = b.read(kbits)
        if k == escape:
            raw = b.read(5)
            for i in range(count):
                out[at + i] = b.read_signed(raw) if raw else 0
        else:
            for i in range(count):
                q = b.unary()
                r = b.read(k) if k else 0
                zz = (q << k) | r
                out[at + i] = (zz >> 1) ^ -(zz & 1)  # unzigzag
        at += count
    return out
