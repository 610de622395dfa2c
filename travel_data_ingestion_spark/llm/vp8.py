"""Pure-Python/numpy VP8 key-frame (intra) decoder — RFC 6386.

Decodes the lossy still-image payload of WebP (the ``'VP8 '`` chunk;
every WebP still is a VP8 key frame): the boolean arithmetic decoder
(RFC 6386 §7), key-frame headers (§9: segmentation, loop filter, token
partitions, quantizers, token probability updates), per-macroblock
intra mode parsing with the key-frame mode trees (§11), DCT/WHT
coefficient token decoding (§13) with the published default/update
probability tables (llm/vp8_tables.py), dequantization (§14.1),
inverse WHT + exact-integer inverse DCT (§14.3–14.5), the ten 4x4 and
four 16x16/8x8 intra predictors with VP8's border conventions (§12),
and the in-loop deblocking filter, both normal and simple (§15).
Inter frames are out of scope for a still-image pipeline.

Reference parity: the reference ingests image assets via its media
path (see SURVEY.md §2 multimodal rows); this decoder extends the same
``decode_image`` contract used by the planted-clique pHash dedup
(queries/llm_multimodal.py mm01–mm05) to lossy WebP — the dominant
crawl-scale WebP shape. Conformance evidence: tests/test_vp8.py
decodes SYSTEM-libwebp-encoded streams and compares Y/U/V planes
bit-exactly against libwebp's own WebPDecodeYUV (plus pinned plane
hashes so the suite stays green without the library).

Like the other stdlib decoders here, hostile input must return None or
raise ValueError inside the caller's try — never hang (bool decoder
past-the-end reads are capped) and never allocate unboundedly (pixel
count is capped by the caller via MAX_DECODE_BYTES).
"""

from __future__ import annotations

from travel_data_ingestion_spark.llm.vp8_tables import (
    AC_QLOOKUP,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    KF_UV_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

# mode numbering (§11.2): 16x16/8x8 modes and the implied sub-modes of
# a 16x16-coded neighbor used as B_PRED context
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
_MODE_TO_BMODE = (0, 2, 3, 1)  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_UV_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_BMODE_TREE = (
    0, 2,  # -B_DC_PRED (0 encodes leaf 0)
    -1, 4,  # -B_TM_PRED
    -2, 6,  # -B_VE_PRED
    8, 12,
    -3, 10,  # -B_HE_PRED
    -5, -6,  # -B_RD_PRED, -B_VR_PRED
    -4, 14,  # -B_LD_PRED
    -7, 16,  # -B_VL_PRED
    -8, -9,  # -B_HD_PRED, -B_HU_PRED
)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# DCT token tree (§13.1): 12 leaves, 11 probabilities per context.
# Leaves: EOB=-11 sentinel, literals 0..4, categories 5..10.
_EOB, _CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = 11, 5, 6, 7, 8, 9, 10
_COEF_TREE = (
    -_EOB, 2,
    0, 4,          # ZERO leaf (encoded as 0: handled by <=0 test)
    -1, 6,         # ONE
    8, 12,
    -2, 10,        # TWO
    -3, -4,        # THREE, FOUR
    14, 16,
    -_CAT1, -_CAT2,
    18, 20,
    -_CAT3, -_CAT4,
    -_CAT5, -_CAT6,
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)


class _Bool:
    """RFC 6386 §7.3 boolean decoder. Past-the-end reads feed zeros
    (an encoder's flush may drop trailing zero bytes), capped so a
    truncated stream terminates instead of freewheeling."""

    __slots__ = ("data", "pos", "end", "value", "range", "bit_count", "synthetic")

    def __init__(self, data: bytes, start: int, size: int):
        self.data = data
        self.pos = start
        self.end = min(len(data), start + size)
        self.synthetic = 0
        self.value = (self._byte() << 8) | self._byte()
        self.range = 255
        self.bit_count = 0

    def _byte(self) -> int:
        if self.pos < self.end:
            v = self.data[self.pos]
            self.pos += 1
            return v
        self.synthetic += 1
        if self.synthetic > 32:
            raise ValueError("vp8 partition exhausted")
        return 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        r = self.range
        while r < 128:
            self.value = (self.value << 1) & 0xFFFFFF
            r <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        self.range = r
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = tree[start + self.get(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.get(probs[i >> 1])]
        return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _idct4x4(blocks):
    """Exact-integer VP8 inverse DCT (§14.4) over an (n, 16) int32
    array of dequantized coefficients; returns (n, 4, 4) residuals.
    Constants 20091/35468 are the spec's cospi8sqrt2minus1 /
    sinpi8sqrt2 fixed-point multipliers; Python's >> is arithmetic,
    matching the reference code's expectations."""
    import numpy as np

    ip = blocks.astype(np.int64)
    t = np.empty_like(ip)
    # vertical pass (over columns i, stride 4)
    for i in range(4):
        c0, c1, c2, c3 = ip[:, i], ip[:, i + 4], ip[:, i + 8], ip[:, i + 12]
        a1 = c0 + c2
        b1 = c0 - c2
        tc = (c1 * 35468 >> 16) - (c3 + (c3 * 20091 >> 16))
        td = (c1 + (c1 * 20091 >> 16)) + (c3 * 35468 >> 16)
        t[:, i] = a1 + td
        t[:, i + 12] = a1 - td
        t[:, i + 4] = b1 + tc
        t[:, i + 8] = b1 - tc
    out = np.empty_like(ip)
    # horizontal pass (over rows, +4 rounding, >>3)
    for i in range(4):
        r = t[:, 4 * i : 4 * i + 4]
        c0, c1, c2, c3 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        a1 = c0 + c2
        b1 = c0 - c2
        tc = (c1 * 35468 >> 16) - (c3 + (c3 * 20091 >> 16))
        td = (c1 + (c1 * 20091 >> 16)) + (c3 * 35468 >> 16)
        out[:, 4 * i] = (a1 + td + 4) >> 3
        out[:, 4 * i + 3] = (a1 - td + 4) >> 3
        out[:, 4 * i + 1] = (b1 + tc + 4) >> 3
        out[:, 4 * i + 2] = (b1 - tc + 4) >> 3
    return out.reshape(-1, 4, 4)


def _iwht4x4(ip):
    """Inverse Walsh-Hadamard (§14.3) for the Y2 block: 16 coefficients
    in, 16 DC values out (one per Y subblock, raster order)."""
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        op[i] = a1 + b1
        op[i + 4] = c1 + d1
        op[i + 8] = a1 - b1
        op[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = op[4 * i] + op[4 * i + 3]
        b1 = op[4 * i + 1] + op[4 * i + 2]
        c1 = op[4 * i + 1] - op[4 * i + 2]
        d1 = op[4 * i] - op[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _decode_block(bd: _Bool, probs_type, first: int, ctx: int, dqf) -> list | None:
    """Decode one 4x4 coefficient block's tokens (§13): returns the
    dequantized coefficient list (natural order) or None when the block
    is entirely zero. dqf = (dc_factor, ac_factor)."""
    coeffs = None
    i = first
    skip_eob = False
    tree = bd.tree
    bands = COEFF_BANDS
    zz = ZIGZAG
    while i < 16:
        probs = probs_type[bands[i]][ctx]
        token = tree(_COEF_TREE, probs, 2 if skip_eob else 0)
        if token == _EOB:
            break
        if token == 0:
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if token <= 4:
            val = token
            ctx = 1 if token == 1 else 2
        else:
            cat = token - _CAT1
            extra = 0
            for p in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.get(p)
            val = _CAT_BASE[cat] + extra
            ctx = 2
        if bd.get(128):
            val = -val
        if coeffs is None:
            coeffs = [0] * 16
        nat = zz[i]
        coeffs[nat] = val * (dqf[0] if nat == 0 else dqf[1])
        i += 1
    return coeffs


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _predict_sub(mode: int, A, AR, L, P):
    """The ten 4x4 intra predictors (§12.3). A/AR/L are length-4 int
    lists, P the above-left pixel. Returns a 4x4 list-of-rows."""
    if mode == 0:  # B_DC
        v = (sum(A) + sum(L) + 4) >> 3
        return [[v] * 4 for _ in range(4)]
    if mode == 1:  # B_TM
        out = []
        for r in range(4):
            row = []
            base = L[r] - P
            for c in range(4):
                x = base + A[c]
                row.append(0 if x < 0 else (255 if x > 255 else x))
            out.append(row)
        return out
    if mode == 2:  # B_VE
        x = (P, A[0], A[1], A[2], A[3], AR[0])
        row = [_avg3(x[c], x[c + 1], x[c + 2]) for c in range(4)]
        return [row[:] for _ in range(4)]
    if mode == 3:  # B_HE
        x = (P, L[0], L[1], L[2], L[3], L[3])
        return [[_avg3(x[r], x[r + 1], x[r + 2])] * 4 for r in range(4)]
    if mode == 4:  # B_LD
        x = (A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3], AR[3])
        return [
            [_avg3(x[r + c], x[r + c + 1], x[r + c + 2]) for c in range(4)]
            for r in range(4)
        ]
    if mode == 5:  # B_RD
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        return [
            [_avg3(e[c - r + 3], e[c - r + 4], e[c - r + 5]) for c in range(4)]
            for r in range(4)
        ]
    if mode == 6:  # B_VR
        e = (L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        out = [[0] * 4 for _ in range(4)]
        out[0][0] = _avg2(P, A[0])
        out[0][1] = _avg2(A[0], A[1])
        out[0][2] = _avg2(A[1], A[2])
        out[0][3] = _avg2(A[2], A[3])
        out[1][0] = _avg3(L[0], P, A[0])
        out[1][1] = _avg3(P, A[0], A[1])
        out[1][2] = _avg3(A[0], A[1], A[2])
        out[1][3] = _avg3(A[1], A[2], A[3])
        out[2][0] = _avg3(L[1], L[0], P)
        out[3][0] = _avg3(L[2], L[1], L[0])
        for c in range(1, 4):
            out[2][c] = out[0][c - 1]
            out[3][c] = out[1][c - 1]
        return out
    if mode == 7:  # B_VL
        out = [[0] * 4 for _ in range(4)]
        out[0][0] = _avg2(A[0], A[1])
        out[0][1] = _avg2(A[1], A[2])
        out[0][2] = _avg2(A[2], A[3])
        out[0][3] = _avg2(A[3], AR[0])
        out[1][0] = _avg3(A[0], A[1], A[2])
        out[1][1] = _avg3(A[1], A[2], A[3])
        out[1][2] = _avg3(A[2], A[3], AR[0])
        out[1][3] = _avg3(A[3], AR[0], AR[1])
        out[2][0] = out[0][1]
        out[2][1] = out[0][2]
        out[2][2] = out[0][3]
        out[2][3] = _avg3(AR[0], AR[1], AR[2])
        out[3][0] = out[1][1]
        out[3][1] = out[1][2]
        out[3][2] = out[1][3]
        out[3][3] = _avg3(AR[1], AR[2], AR[3])
        return out
    if mode == 8:  # B_HD
        out = [[0] * 4 for _ in range(4)]
        out[0][0] = _avg2(L[0], P)
        out[0][1] = _avg3(L[0], P, A[0])
        out[0][2] = _avg3(P, A[0], A[1])
        out[0][3] = _avg3(A[0], A[1], A[2])
        out[1][0] = _avg2(L[1], L[0])
        out[1][1] = _avg3(L[1], L[0], P)
        out[2][0] = _avg2(L[2], L[1])
        out[2][1] = _avg3(L[2], L[1], L[0])
        out[3][0] = _avg2(L[3], L[2])
        out[3][1] = _avg3(L[3], L[2], L[1])
        for r in range(1, 4):
            out[r][2] = out[r - 1][0]
            out[r][3] = out[r - 1][1]
        return out
    # mode == 9: B_HU
    out = [[0] * 4 for _ in range(4)]
    out[0][0] = _avg2(L[0], L[1])
    out[0][1] = _avg3(L[0], L[1], L[2])
    out[0][2] = _avg2(L[1], L[2])
    out[0][3] = _avg3(L[1], L[2], L[3])
    out[1][0] = out[0][2]
    out[1][1] = out[0][3]
    out[1][2] = _avg2(L[2], L[3])
    out[1][3] = _avg3(L[2], L[3], L[3])
    out[2][0] = out[1][2]
    out[2][1] = out[1][3]
    out[2][2] = L[3]
    out[2][3] = L[3]
    out[3] = [L[3]] * 4
    return out


def _predict_mb(mode: int, above, left, corner, above_avail, left_avail, size):
    """16x16 / 8x8 whole-block predictors (§12.2) as a numpy array."""
    import numpy as np

    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left.reshape(-1, 1), (1, size))
    if mode == TM_PRED:
        p = left.astype(np.int32).reshape(-1, 1) + above.astype(np.int32) - corner
        return np.clip(p, 0, 255)
    # DC
    if above_avail and left_avail:
        dc = (int(above.sum()) + int(left.sum()) + size) >> (
            5 if size == 16 else 4
        )
    elif above_avail:
        dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    elif left_avail:
        dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, np.int32)


def decode_vp8_yuv(payload: bytes):
    """Decode a VP8 key-frame bitstream (the 'VP8 ' chunk body) to
    (width, height, y_plane, u_plane, v_plane) uint8 numpy arrays
    (cropped to the visible size; chroma at ceil(w/2) x ceil(h/2)), or
    None when the stream is not a decodable key frame."""
    import numpy as np

    try:
        if len(payload) < 10:
            return None
        tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
        if tag & 1:  # inter frame: out of scope for stills
            return None
        # version = (tag >> 1) & 7; show_frame = (tag >> 4) & 1
        part0_size = tag >> 5
        if payload[3:6] != b"\x9d\x01\x2a":
            return None
        w = (payload[6] | (payload[7] << 8)) & 0x3FFF
        h = (payload[8] | (payload[9] << 8)) & 0x3FFF
        if not w or not h:
            return None
        # dims bomb: a 10-byte header can declare 16383x16383 (~2.4 GB
        # of planes plus a ~1M-iteration MB loop) — cap like every
        # other decoder (multimodal.MAX_DECODE_BYTES, imported at call
        # time to keep module imports acyclic)
        from travel_data_ingestion_spark.llm.multimodal import MAX_DECODE_BYTES

        if w * h * 3 > MAX_DECODE_BYTES:
            return None
        mb_w = (w + 15) >> 4
        mb_h = (h + 15) >> 4

        bd = _Bool(payload, 10, part0_size)
        bd.literal(1)  # color space (must be 0 per spec; tolerated)
        bd.literal(1)  # clamping type

        # --- segmentation (§9.3) ---
        seg_enabled = bd.get(128)
        seg_update_map = False
        seg_abs = False
        seg_q = [0, 0, 0, 0]
        seg_lf = [0, 0, 0, 0]
        seg_tree_probs = [255, 255, 255]
        if seg_enabled:
            seg_update_map = bool(bd.get(128))
            update_data = bd.get(128)
            if update_data:
                seg_abs = bool(bd.get(128))
                for i in range(4):
                    if bd.get(128):
                        seg_q[i] = bd.signed_literal(7)
                for i in range(4):
                    if bd.get(128):
                        seg_lf[i] = bd.signed_literal(6)
            if seg_update_map:
                for i in range(3):
                    if bd.get(128):
                        seg_tree_probs[i] = bd.literal(8)

        # --- loop filter header (§9.4) ---
        filter_type = bd.get(128)  # 0 = normal, 1 = simple
        filter_level = bd.literal(6)
        sharpness = bd.literal(3)
        lf_delta_enabled = bd.get(128)
        ref_lf_delta = [0, 0, 0, 0]
        mode_lf_delta = [0, 0, 0, 0]
        if lf_delta_enabled:
            if bd.get(128):  # mode_ref_lf_delta_update
                for i in range(4):
                    if bd.get(128):
                        ref_lf_delta[i] = bd.signed_literal(6)
                for i in range(4):
                    if bd.get(128):
                        mode_lf_delta[i] = bd.signed_literal(6)

        # --- token partitions (§9.5) ---
        n_parts = 1 << bd.literal(2)
        part_base = 10 + part0_size
        sizes_end = part_base + 3 * (n_parts - 1)
        if sizes_end > len(payload):
            return None
        parts = []
        off = sizes_end
        for i in range(n_parts):
            if i < n_parts - 1:
                psz = (
                    payload[part_base + 3 * i]
                    | (payload[part_base + 3 * i + 1] << 8)
                    | (payload[part_base + 3 * i + 2] << 16)
                )
            else:
                psz = len(payload) - off
            if psz < 0 or off > len(payload):
                return None
            parts.append(_Bool(payload, off, psz))
            off += psz

        # --- quantizers (§9.6) ---
        y_ac_qi = bd.literal(7)
        deltas = []
        for _ in range(5):  # y1dc, y2dc, y2ac, uvdc, uvac
            deltas.append(bd.signed_literal(4) if bd.get(128) else 0)
        y1dc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d = deltas

        def quant_for_segment(s: int):
            if seg_enabled:
                qi = seg_q[s] if seg_abs else y_ac_qi + seg_q[s]
            else:
                qi = y_ac_qi
            qi = _clamp_q(qi)
            y1 = (DC_QLOOKUP[_clamp_q(qi + y1dc_d)], AC_QLOOKUP[qi])
            y2 = (
                DC_QLOOKUP[_clamp_q(qi + y2dc_d)] * 2,
                max(8, AC_QLOOKUP[_clamp_q(qi + y2ac_d)] * 155 // 100),
            )
            uv = (
                min(132, DC_QLOOKUP[_clamp_q(qi + uvdc_d)]),
                AC_QLOOKUP[_clamp_q(qi + uvac_d)],
            )
            return y1, y2, uv

        seg_quants = [quant_for_segment(s) for s in range(4)]

        bd.get(128)  # refresh_entropy_probs (key frame: ignored)

        # --- token probability updates (§13.4) ---
        probs = [
            [[list(COEFF_PROBS[((t * 8 + b) * 3 + c) * 11 : ((t * 8 + b) * 3 + c) * 11 + 11]) for c in range(3)] for b in range(8)]
            for t in range(4)
        ]
        u = COEFF_UPDATE_PROBS
        for t in range(4):
            for b in range(8):
                for c in range(3):
                    base = ((t * 8 + b) * 3 + c) * 11
                    row = probs[t][b][c]
                    for l in range(11):
                        if bd.get(u[base + l]):
                            row[l] = bd.literal(8)

        mb_no_skip = bd.get(128)
        prob_skip = bd.literal(8) if mb_no_skip else 0

        # --- pass 1: per-MB modes from the first partition (§11) ---
        mb_modes = []  # (ymode, uvmode, submodes|None, segment, skip_flag)
        above_sub = [[0, 0, 0, 0] for _ in range(mb_w)]
        for mb_y in range(mb_h):
            left_sub = [0, 0, 0, 0]
            for mb_x in range(mb_w):
                seg = 0
                if seg_update_map:
                    seg = bd.tree(_SEGMENT_TREE, seg_tree_probs)
                skip = bd.get(prob_skip) if mb_no_skip else 0
                ymode = bd.tree(_KF_YMODE_TREE, KF_YMODE_PROBS)
                if ymode == B_PRED:
                    sub = [0] * 16
                    for i in range(16):
                        r, c = i >> 2, i & 3
                        a = above_sub[mb_x][c] if r == 0 else sub[i - 4]
                        lft = left_sub[r] if c == 0 else sub[i - 1]
                        p = KF_BMODE_PROBS[(a * 10 + lft) * 9 : (a * 10 + lft) * 9 + 9]
                        sub[i] = bd.tree(_BMODE_TREE, p)
                    above_sub[mb_x] = sub[12:16]
                    left_sub = [sub[3], sub[7], sub[11], sub[15]]
                else:
                    bm = _MODE_TO_BMODE[ymode]
                    above_sub[mb_x] = [bm] * 4
                    left_sub = [bm] * 4
                    sub = None
                uvmode = bd.tree(_UV_TREE, KF_UV_PROBS)
                mb_modes.append((ymode, uvmode, sub, seg, skip))

        # --- pass 2: residuals + reconstruction ---
        W, H = mb_w * 16, mb_h * 16
        ybuf = np.zeros((H, W), np.uint8)
        ubuf = np.zeros((H >> 1, W >> 1), np.uint8)
        vbuf = np.zeros((H >> 1, W >> 1), np.uint8)

        # nonzero contexts: per MB column 4 Y + 2 U + 2 V + 1 Y2
        above_nz = [[0] * 9 for _ in range(mb_w)]
        # loop-filter metadata per MB
        lf_info = np.zeros((mb_h, mb_w, 2), np.int32)  # (level, inner)

        # border caches (§12.2 conventions: above = 127, left = 129)
        above_y = np.full(W + 8, 127, np.int32)
        above_u = np.full((W >> 1) + 8, 127, np.int32)
        above_v = np.full((W >> 1) + 8, 127, np.int32)

        for mb_y in range(mb_h):
            left_nz = [0] * 9
            left_y = np.full(16, 129, np.int32)
            left_u = np.full(8, 129, np.int32)
            left_v = np.full(8, 129, np.int32)
            # above-left corners for this MB row (updated as MBs complete)
            corner_y = 127 if mb_y == 0 else 129
            corner_u = 127 if mb_y == 0 else 129
            corner_v = 127 if mb_y == 0 else 129
            bt = parts[mb_y % n_parts]
            for mb_x in range(mb_w):
                idx = mb_y * mb_w + mb_x
                ymode, uvmode, sub, seg, skip = mb_modes[idx]
                has_y2 = ymode != B_PRED
                qy1, qy2, quv = seg_quants[seg]
                anz = above_nz[mb_x]

                # ---- tokens ----
                ycoeffs = [None] * 16
                ucoeffs = [None] * 4
                vcoeffs = [None] * 4
                y2 = None
                any_nz = False
                if not skip:
                    if has_y2:
                        ctx = anz[8] + left_nz[8]
                        y2 = _decode_block(bt, probs[1], 0, ctx, qy2)
                        anz[8] = left_nz[8] = 0 if y2 is None else 1
                        ytype, yfirst = 0, 1
                    else:
                        ytype, yfirst = 3, 0
                    for i in range(16):
                        r, c = i >> 2, i & 3
                        ctx = anz[c] + left_nz[r]
                        blk = _decode_block(bt, probs[ytype], yfirst, ctx, qy1)
                        ycoeffs[i] = blk
                        anz[c] = left_nz[r] = 0 if blk is None else 1
                        any_nz = any_nz or blk is not None
                    for pi, coeffs in ((0, ucoeffs), (1, vcoeffs)):
                        for i in range(4):
                            r, c = i >> 1, i & 1
                            ctx = anz[4 + 2 * pi + c] + left_nz[4 + 2 * pi + r]
                            blk = _decode_block(bt, probs[2], 0, ctx, quv)
                            coeffs[i] = blk
                            anz[4 + 2 * pi + c] = left_nz[4 + 2 * pi + r] = (
                                0 if blk is None else 1
                            )
                            any_nz = any_nz or blk is not None
                    if y2 is not None:
                        any_nz = True
                else:
                    for j in range(8):
                        anz[j] = left_nz[j] = 0
                    if has_y2:
                        anz[8] = left_nz[8] = 0

                if y2 is not None:
                    dcs = _iwht4x4(y2)
                elif has_y2:
                    dcs = [0] * 16
                else:
                    dcs = None
                if dcs is not None:
                    for i in range(16):
                        if dcs[i]:
                            if ycoeffs[i] is None:
                                ycoeffs[i] = [0] * 16
                            ycoeffs[i][0] = dcs[i]

                # ---- residuals (batched idct over present blocks) ----
                def _residuals(coeff_list):
                    present = [i for i, cfs in enumerate(coeff_list) if cfs is not None]
                    if not present:
                        return {}
                    arr = np.array([coeff_list[i] for i in present], np.int32)
                    res = _idct4x4(arr)
                    return dict(zip(present, res))

                yres = _residuals(ycoeffs)
                ures = _residuals(ucoeffs)
                vres = _residuals(vcoeffs)

                # ---- luma reconstruction ----
                x0, y0 = mb_x * 16, mb_y * 16
                above_avail = mb_y > 0
                left_avail = mb_x > 0
                av = above_y[x0 : x0 + 16]
                if ymode == B_PRED:
                    canvas = np.empty((17, 21), np.int32)
                    canvas[0, 0] = corner_y
                    canvas[0, 1:17] = av
                    if mb_x == mb_w - 1:
                        # rightmost MB: above-right replicates the above
                        # row's last pixel (127 on the first row)
                        canvas[0, 17:21] = av[15]
                    else:
                        canvas[0, 17:21] = above_y[x0 + 16 : x0 + 20]
                    canvas[1:17, 0] = left_y
                    for i in range(16):
                        r, c = i >> 2, i & 3
                        ca, cl = 1 + 4 * c, 1 + 4 * r
                        A = canvas[cl - 1, ca : ca + 4]
                        P = int(canvas[cl - 1, ca - 1])
                        L = canvas[cl : cl + 4, ca - 1]
                        if c == 3 and r > 0:
                            AR = canvas[0, 17:21]
                        else:
                            AR = canvas[cl - 1, ca + 4 : ca + 8]
                        pred = _predict_sub(
                            sub[i], [int(q) for q in A], [int(q) for q in AR],
                            [int(q) for q in L], P,
                        )
                        blk = np.array(pred, np.int32)
                        if i in yres:
                            blk = blk + yres[i]
                        np.clip(blk, 0, 255, out=blk)
                        canvas[cl : cl + 4, ca : ca + 4] = blk
                    mb_pix = canvas[1:17, 1:17]
                else:
                    pred = _predict_mb(
                        ymode, av, left_y, corner_y, above_avail, left_avail, 16
                    )
                    mb_pix = pred.copy()
                    for i, res in yres.items():
                        r, c = (i >> 2) * 4, (i & 3) * 4
                        mb_pix[r : r + 4, c : c + 4] += res
                    np.clip(mb_pix, 0, 255, out=mb_pix)
                ybuf[y0 : y0 + 16, x0 : x0 + 16] = mb_pix
                corner_y = int(av[15])
                above_y[x0 : x0 + 16] = mb_pix[15]
                left_y = mb_pix[:, 15].astype(np.int32)

                # ---- chroma reconstruction ----
                cx0, cy0 = mb_x * 8, mb_y * 8
                for buf, above_c, left_c, corner_c, res in (
                    (ubuf, above_u, left_u, corner_u, ures),
                    (vbuf, above_v, left_v, corner_v, vres),
                ):
                    avc = above_c[cx0 : cx0 + 8]
                    pred = _predict_mb(
                        uvmode, avc, left_c, corner_c, above_avail, left_avail, 8
                    )
                    pix = pred.copy()
                    for i, rr in res.items():
                        r, c = (i >> 1) * 4, (i & 1) * 4
                        pix[r : r + 4, c : c + 4] += rr
                    np.clip(pix, 0, 255, out=pix)
                    buf[cy0 : cy0 + 8, cx0 : cx0 + 8] = pix
                    if buf is ubuf:
                        corner_u = int(avc[7])
                        above_u[cx0 : cx0 + 8] = pix[7]
                        left_u = pix[:, 7].astype(np.int32)
                    else:
                        corner_v = int(avc[7])
                        above_v[cx0 : cx0 + 8] = pix[7]
                        left_v = pix[:, 7].astype(np.int32)

                # ---- loop filter level for this MB (§15.1) ----
                lvl = filter_level
                if seg_enabled:
                    lvl = seg_lf[seg] if seg_abs else filter_level + seg_lf[seg]
                if lf_delta_enabled:
                    lvl += ref_lf_delta[0]  # intra frame
                    if ymode == B_PRED:
                        lvl += mode_lf_delta[0]
                lvl = max(0, min(63, lvl))
                lf_info[mb_y, mb_x, 0] = lvl
                lf_info[mb_y, mb_x, 1] = 1 if (any_nz or ymode == B_PRED) else 0

        # --- loop filter (§15) ---
        if filter_level:
            _loop_filter(
                ybuf, ubuf, vbuf, lf_info, filter_type, sharpness, mb_w, mb_h
            )

        cw, ch = (w + 1) >> 1, (h + 1) >> 1
        return w, h, ybuf[:h, :w], ubuf[:ch, :cw], vbuf[:ch, :cw]
    except (ValueError, IndexError, OverflowError):
        return None


def _loop_filter(ybuf, ubuf, vbuf, lf_info, filter_type, sharpness, mb_w, mb_h):
    """In-loop deblocking (§15), applied MB-by-MB in raster order so
    each edge sees its neighbors' already-filtered pixels — edges are
    vectorized across the 16 (or 8) lanes with numpy int32 math."""
    import numpy as np

    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            lvl = int(lf_info[mb_y, mb_x, 0])
            if lvl == 0:
                continue
            inner = bool(lf_info[mb_y, mb_x, 1])
            interior = lvl
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                interior = min(interior, 9 - sharpness)
            interior = max(1, interior)
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_lim = (lvl + 2) * 2 + interior
            sb_lim = lvl * 2 + interior

            if filter_type:  # simple: luma only
                _simple_edges(ybuf, mb_x, mb_y, mb_lim, sb_lim, inner)
                continue

            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            if mb_x > 0:
                _normal_v(ybuf, y0, x0, 16, mb_lim, interior, hev_t, True)
                _normal_v(ubuf, cy0, cx0, 8, mb_lim, interior, hev_t, True)
                _normal_v(vbuf, cy0, cx0, 8, mb_lim, interior, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _normal_v(ybuf, y0, x0 + dx, 16, sb_lim, interior, hev_t, False)
                _normal_v(ubuf, cy0, cx0 + 4, 8, sb_lim, interior, hev_t, False)
                _normal_v(vbuf, cy0, cx0 + 4, 8, sb_lim, interior, hev_t, False)
            if mb_y > 0:
                _normal_h(ybuf, y0, x0, 16, mb_lim, interior, hev_t, True)
                _normal_h(ubuf, cy0, cx0, 8, mb_lim, interior, hev_t, True)
                _normal_h(vbuf, cy0, cx0, 8, mb_lim, interior, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _normal_h(ybuf, y0 + dy, x0, 16, sb_lim, interior, hev_t, False)
                _normal_h(ubuf, cy0 + 4, cx0, 8, sb_lim, interior, hev_t, False)
                _normal_h(vbuf, cy0 + 4, cx0, 8, sb_lim, interior, hev_t, False)


def _s(x):
    """uint8 pixel -> signed-char value space (§15.2 conventions)."""
    return x.astype("int32") - 128


def _c127(x):
    import numpy as np

    return np.clip(x, -128, 127)


def _filter_pack(P3, P2, P1, P0, Q0, Q1, Q2, Q3, edge_lim, interior, hev_t, mb_edge):
    """Shared normal-filter math over parallel lanes: returns the
    filtered (p2, p1, p0, q0, q1, q2) uint8 arrays (§15.2-15.3)."""
    import numpy as np

    a = lambda x: np.abs(x)
    mask = (
        (a(P3 - P2) <= interior)
        & (a(P2 - P1) <= interior)
        & (a(P1 - P0) <= interior)
        & (a(Q1 - Q0) <= interior)
        & (a(Q2 - Q1) <= interior)
        & (a(Q3 - Q2) <= interior)
        & (a(P0 - Q0) * 2 + (a(P1 - Q1) >> 1) <= edge_lim)
    )
    if not mask.any():  # busy edges: nothing passes, skip the tap math
        u8 = lambda x: x.astype("uint8")
        return u8(P2), u8(P1), u8(P0), u8(Q0), u8(Q1), u8(Q2)
    hev = (a(P1 - P0) > hev_t) | (a(Q1 - Q0) > hev_t)
    ps1, ps0, qs0, qs1 = _s(P1), _s(P0), _s(Q0), _s(Q1)
    ps2, qs2 = _s(P2), _s(Q2)

    # common adjustment with outer taps (used when hev, and by the
    # subblock filter's center taps)
    w_hev = _c127(_c127(ps1 - qs1) + 3 * (qs0 - ps0))
    f1 = _c127(w_hev + 4) >> 3
    f2 = _c127(w_hev + 3) >> 3

    if mb_edge:
        wq = _c127(_c127(ps1 - qs1) + 3 * (qs0 - ps0))
        a27 = _c127((27 * wq + 63) >> 7)
        a18 = _c127((18 * wq + 63) >> 7)
        a9 = _c127((9 * wq + 63) >> 7)
        use = mask & ~hev
        useh = mask & hev
        nq0 = np.where(useh, qs0 - f1, np.where(use, qs0 - a27, qs0))
        np0 = np.where(useh, ps0 + f2, np.where(use, ps0 + a27, ps0))
        nq1 = np.where(use, qs1 - a18, qs1)
        np1 = np.where(use, ps1 + a18, ps1)
        nq2 = np.where(use, qs2 - a9, qs2)
        np2 = np.where(use, ps2 + a9, ps2)
    else:
        wno = _c127(3 * (qs0 - ps0))
        f1n = _c127(wno + 4) >> 3
        f2n = _c127(wno + 3) >> 3
        use = mask & ~hev
        useh = mask & hev
        nq0 = np.where(useh, qs0 - f1, np.where(use, qs0 - f1n, qs0))
        np0 = np.where(useh, ps0 + f2, np.where(use, ps0 + f2n, ps0))
        a_in = (np.where(use, f1n, 0) + 1) >> 1
        nq1 = np.where(use, qs1 - a_in, qs1)
        np1 = np.where(use, ps1 + a_in, ps1)
        nq2, np2 = qs2, ps2

    clip = lambda x: np.clip(x + 128, 0, 255).astype("uint8")
    return clip(np2), clip(np1), clip(np0), clip(nq0), clip(nq1), clip(nq2)


def _normal_v(buf, y0, x, n, edge_lim, interior, hev_t, mb_edge):
    """Filter the vertical edge at column x over rows y0..y0+n."""
    if x < 4 or x + 4 > buf.shape[1]:
        return
    rows = buf[y0 : y0 + n, x - 4 : x + 4].astype("int32")
    P3, P2, P1, P0, Q0, Q1, Q2, Q3 = (rows[:, i] for i in range(8))
    p2, p1, p0, q0, q1, q2 = _filter_pack(
        P3, P2, P1, P0, Q0, Q1, Q2, Q3, edge_lim, interior, hev_t, mb_edge
    )
    buf[y0 : y0 + n, x - 3] = p2
    buf[y0 : y0 + n, x - 2] = p1
    buf[y0 : y0 + n, x - 1] = p0
    buf[y0 : y0 + n, x] = q0
    buf[y0 : y0 + n, x + 1] = q1
    buf[y0 : y0 + n, x + 2] = q2


def _normal_h(buf, y, x0, n, edge_lim, interior, hev_t, mb_edge):
    """Filter the horizontal edge at row y over columns x0..x0+n."""
    if y < 4 or y + 4 > buf.shape[0]:
        return
    cols = buf[y - 4 : y + 4, x0 : x0 + n].astype("int32")
    P3, P2, P1, P0, Q0, Q1, Q2, Q3 = (cols[i] for i in range(8))
    p2, p1, p0, q0, q1, q2 = _filter_pack(
        P3, P2, P1, P0, Q0, Q1, Q2, Q3, edge_lim, interior, hev_t, mb_edge
    )
    buf[y - 3, x0 : x0 + n] = p2
    buf[y - 2, x0 : x0 + n] = p1
    buf[y - 1, x0 : x0 + n] = p0
    buf[y, x0 : x0 + n] = q0
    buf[y + 1, x0 : x0 + n] = q1
    buf[y + 2, x0 : x0 + n] = q2


def _simple_edges(ybuf, mb_x, mb_y, mb_lim, sb_lim, inner):
    """Simple loop filter (§15.4): luma only, p1..q1 window, adjusts
    p0/q0 only."""
    import numpy as np

    x0, y0 = mb_x * 16, mb_y * 16

    def edge_v(x, lim):
        if x < 2 or x + 2 > ybuf.shape[1]:
            return
        seg = ybuf[y0 : y0 + 16, x - 2 : x + 2].astype("int32")
        _simple_apply(seg, lim)
        ybuf[y0 : y0 + 16, x - 2 : x + 2] = seg

    def edge_h(y, lim):
        if y < 2 or y + 2 > ybuf.shape[0]:
            return
        seg = ybuf[y - 2 : y + 2, x0 : x0 + 16].astype("int32").T.copy()
        _simple_apply(seg, lim)
        ybuf[y - 2 : y + 2, x0 : x0 + 16] = seg.T

    if mb_x > 0:
        edge_v(x0, mb_lim)
    if inner:
        for dx in (4, 8, 12):
            edge_v(x0 + dx, sb_lim)
    if mb_y > 0:
        edge_h(y0, mb_lim)
    if inner:
        for dy in (4, 8, 12):
            edge_h(y0 + dy, sb_lim)


def _simple_apply(seg, lim):
    import numpy as np

    P1, P0, Q0, Q1 = (seg[:, i] for i in range(4))
    mask = np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1) <= lim
    ps1, ps0, qs0, qs1 = _s(P1), _s(P0), _s(Q0), _s(Q1)
    w = _c127(_c127(ps1 - qs1) + 3 * (qs0 - ps0))
    f1 = _c127(w + 4) >> 3
    f2 = _c127(w + 3) >> 3
    nq0 = np.where(mask, qs0 - f1, qs0)
    np0 = np.where(mask, ps0 + f2, ps0)
    seg[:, 1] = np.clip(np0 + 128, 0, 255)
    seg[:, 2] = np.clip(nq0 + 128, 0, 255)


def decode_vp8(payload: bytes) -> tuple[int, int, bytes] | None:
    """Decode a VP8 key-frame chunk body to (width, height, rgb bytes)
    using the repo-wide Rec.601 limited-range integer conversion and
    nearest chroma upsampling (the decode_y4m rule)."""
    import numpy as np

    dec = decode_vp8_yuv(payload)
    if dec is None:
        return None
    w, h, y, u, v = dec
    up = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32) - 128
    vp = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32) - 128
    yy = 298 * (y.astype(np.int32) - 16)
    r = (yy + 409 * vp + 128) >> 8
    g = (yy - 100 * up - 208 * vp + 128) >> 8
    b = (yy + 516 * up + 128) >> 8
    rgb = np.stack(
        [np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(b, 0, 255)], -1
    ).astype(np.uint8)
    return w, h, rgb.tobytes()
