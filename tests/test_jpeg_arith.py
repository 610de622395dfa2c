"""Arithmetic-coded JPEG (SOF9/SOF10) decoder tests.

The forward QM-coder here is written independently from the T.81
flowcharts (interval arithmetic kept as an unbounded integer, so
carries resolve by big-int addition instead of BYTEOUT stacking — a
deliberately DIFFERENT register strategy from the package decoder's
32-bit C/CT registers; the two agreeing is two renderings of the spec
agreeing). The statistical-model emitters mirror T.81 Annex F/G. The
evidence standard is the progressive-Huffman one: arithmetic
re-encodings of the SAME quantized coefficients (tests/test_jpeg.py's
_coef_grids) must decode BIT-IDENTICALLY to the Huffman baseline
encoding.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from travel_data_ingestion_spark.llm.jpeg import _ARITH_TAB, decode_jpeg
from test_jpeg import _ZZ, _coef_grids, _comp_grid_dims, _smooth, encode_jpeg


# ---------------------------------------------------------------------------
# independent forward QM-coder


class _QMEncoder:
    """T.81 QM encoder dual of the package decoder's INTEROP
    convention (the one real libjpeg streams use): MPS owns the BOTTOM
    subinterval [0, A-Qe), LPS the top [A-Qe, A), conditional exchange
    when A-Qe < Qe, state adaptation only on renormalization. C is an
    unbounded int scaled by the renorm shifts; flush() emits the final
    interval base as the codeword (any value inside the nested
    interval decodes identically). Round-13 note: the previous
    rendering here put the MPS on TOP — it round-tripped with the
    then-matching decoder while both desynced against the system
    libjpeg (the conformance battery in test_sysjpeg.py now pins the
    real convention from both directions)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, st: bytearray, i: int, d: int) -> None:
        sv = st[i]
        s = sv & 0x7F
        mps = sv >> 7
        qe, nlps, nmps, switch = _ARITH_TAB[s]
        self.a -= qe
        if d == mps:
            if self.a & 0xFFFF8000:
                return  # MPS in the bottom interval, no renorm: done
            if self.a < qe:
                self.c += self.a  # exchange: MPS takes the top interval
                self.a = qe
            st[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:
                self.c += self.a  # LPS takes the top interval
                self.a = qe
            # else exchange: LPS keeps the (smaller) bottom interval
            if switch:
                mps = 1 - mps
            st[i] = (mps << 7) | nlps
        while not (self.a & 0xFFFF8000):
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        nbits = 16 + self.shifts
        nbytes = (nbits + 7) // 8
        word = self.c << (nbytes * 8 - nbits)
        raw = word.to_bytes(nbytes, "big") + b"\x00\x00"
        return raw.replace(b"\xff", b"\xff\x00")  # JPEG byte stuffing


def _fresh_banks(n_dc: int, n_ac: int):
    return (
        [bytearray(64) for _ in range(n_dc)],
        [bytearray(256) for _ in range(n_ac)],
        bytearray([113]),
    )


def _emit_magnitude(enc, st, pos, chain_pos, sz):
    """Shared magnitude-category chain + bit pattern: returns after
    emitting the category decisions (from ``pos``, chaining at
    ``chain_pos`` once past the first doubling) and the sz bits."""
    if sz == 0:
        enc.encode(st, pos, 0)
        m = 0
    else:
        enc.encode(st, pos, 1)
        m = 1
        pos = chain_pos
        while sz >= (m << 1):
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(st, pos, 0)
    pos += 14
    mm = m >> 1
    while mm:
        enc.encode(st, pos, 1 if (sz & mm) else 0)
        mm >>= 1
    return m


def _encode_dc(enc, st, diff, ctx, ci, cond):
    base = ctx[ci]
    if diff == 0:
        enc.encode(st, base, 0)
        ctx[ci] = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    sz = abs(diff) - 1
    # DC chains from X1 = bin 20 (note: unlike AC there is no second
    # same-bin doubling decision — the first chain step is X1)
    pos = base + 2 + sign
    if sz == 0:
        enc.encode(st, pos, 0)
        m = 0
    else:
        enc.encode(st, pos, 1)
        m = 1
        pos = 20
        while sz >= (m << 1):
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(st, pos, 0)
    low, up = cond
    if m < ((1 << low) >> 1):
        ctx[ci] = 0
    elif m > ((1 << up) >> 1):
        ctx[ci] = 12 + sign * 4
    else:
        ctx[ci] = 4 + sign * 4
    pos += 14
    mm = m >> 1
    while mm:
        enc.encode(st, pos, 1 if (sz & mm) else 0)
        mm >>= 1


def _encode_ac_band(enc, st, fixed, zz, k0, kend, kx, al):
    """AC first pass (sequential when k0=1, kend=63, al=0)."""
    vals = [(abs(int(zz[k])) >> al) * (1 if int(zz[k]) >= 0 else -1)
            for k in range(kend + 1)]
    kn = kend
    while kn >= k0 and vals[kn] == 0:
        kn -= 1
    k = k0
    while k <= kn:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while vals[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = vals[k]
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = abs(v) - 1
        pos = base + 2
        if sz == 0:
            enc.encode(st, pos, 0)
        else:
            enc.encode(st, pos, 1)
            if sz == 1:
                enc.encode(st, pos, 0)
                m = 1
                pos += 14
            else:
                enc.encode(st, pos, 1)
                m = 2
                pos = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, pos, 1)
                    m <<= 1
                    pos += 1
                enc.encode(st, pos, 0)
                pos += 14
            mm = m >> 1
            while mm:
                enc.encode(st, pos, 1 if (sz & mm) else 0)
                mm >>= 1
        k += 1
    if kn < kend:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine(enc, st, fixed, zz, k0, kend, ah, al):
    """AC refinement (Annex G dual of the decoder's refine loop)."""
    hist = [abs(int(zz[k])) >> ah if k <= kend else 0 for k in range(kend + 1)]
    cur = [abs(int(zz[k])) >> al if k <= kend else 0 for k in range(kend + 1)]
    kex = kend
    while kex >= k0 and hist[kex] == 0:
        kex -= 1
    kn = kend  # last newly-significant position
    while kn >= k0 and not (hist[kn] == 0 and cur[kn] != 0):
        kn -= 1
    k = k0
    while k <= kend:
        base = 3 * (k - 1)
        if k > kex:
            if k > kn:
                enc.encode(st, base, 1)  # EOB
                return
            enc.encode(st, base, 0)
        while True:
            if hist[k] != 0:
                enc.encode(st, base + 2, cur[k] & 1)
                break
            if cur[k] != 0:  # newly significant (cur must be 1)
                enc.encode(st, base + 1, 1)
                enc.encode(fixed, 0, 0 if int(zz[k]) >= 0 else 1)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        k += 1


# ---------------------------------------------------------------------------
# file assembly


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(rgb_shape, comps, qly, qlc, grayscale, sof_marker, dac=None):
    h, w = rgb_shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(int(qly.reshape(-1)[_ZZ][i]) for i in range(64)))
    if not grayscale:
        out += _seg(0xDB, bytes([1]) + bytes(int(qlc.reshape(-1)[_ZZ][i]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(sof_marker, sof)
    if dac is not None:
        body = b""
        for (tc, tb), v in sorted(dac.items()):
            body += bytes([(tc << 4) | tb, v])
        out += _seg(0xCC, body)
    return out


def encode_jpeg_arith(
    rgb, quality=90, subsample="444", grayscale=False, restart_interval=0, dac=None
):
    """Sequential arithmetic JPEG (SOF9) of the SAME coefficients
    encode_jpeg emits. ``dac``: {(tc, tb): value} conditioning."""
    comps, grids, mcux, mcuy, (qly, qlc), (hmax, vmax, w, h) = _coef_grids(
        rgb, quality, subsample, grayscale
    )
    dac = dac or {}
    dc_cond = {tb: ((v & 15), (v >> 4)) for (tc, tb), v in dac.items() if tc == 0}
    ac_cond = {tb: v for (tc, tb), v in dac.items() if tc == 1}
    out = _headers(rgb.shape, comps, qly, qlc, grayscale, 0xC9, dac or None)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _hs, _vs, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    units = []
    for my in range(mcuy):
        for mx in range(mcux):
            blocks = []
            for ci, (_cid, hs, vs, _tq) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        blocks.append((ci, my * vs + by, mx * hs + bx))
            units.append(blocks)

    def fresh():
        dc_b, ac_b, fixed = _fresh_banks(2, 2)
        return (
            _QMEncoder(), dc_b, ac_b, fixed,
            {ci: 0 for ci in range(len(comps))},
            {ci: 0 for ci in range(len(comps))},
        )

    enc, dc_b, ac_b, fixed, ctx, pred = fresh()
    rst = 0
    for u, blocks in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            enc, dc_b, ac_b, fixed, ctx, pred = fresh()
        for ci, by, bx in blocks:
            tq = comps[ci][3]
            zz = grids[ci][by, bx]
            v = int(zz[0])
            _encode_dc(enc, dc_b[tq], v - pred[ci], ctx, ci, dc_cond.get(tq, (0, 1)))
            pred[ci] = v
            _encode_ac_band(enc, ac_b[tq], fixed, zz, 1, 63, ac_cond.get(tq, 5), 0)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    rgb, quality=90, subsample="444", grayscale=False, script=None
):
    """Progressive arithmetic JPEG (SOF10); script format matches
    encode_jpeg_progressive."""
    comps, grids, mcux, mcuy, (qly, qlc), (hmax, vmax, w, h) = _coef_grids(
        rgb, quality, subsample, grayscale
    )
    if script is None:
        script = [("dc", 0, 1), ("dc", 1, 0)]
        for ci in range(len(comps)):
            script += [
                ("ac", ci, 1, 5, 0, 1),
                ("ac", ci, 6, 63, 0, 1),
                ("ac", ci, 1, 63, 1, 0),
            ]
    out = _headers(rgb.shape, comps, qly, qlc, grayscale, 0xCA)
    for entry in script:
        enc = _QMEncoder()
        dc_b, ac_b, fixed = _fresh_banks(2, 2)
        if entry[0] == "dc":
            _ah, _al = entry[1], entry[2]
            sos = bytes([len(comps)])
            for cid, _hs, _vs, tq in comps:
                sos += bytes([cid, 0x00 if tq == 0 else 0x11])
            sos += bytes([0, 0, (_ah << 4) | _al])
            out += _seg(0xDA, sos)
            ctx = {ci: 0 for ci in range(len(comps))}
            pred = {ci: 0 for ci in range(len(comps))}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (_cid, hs, vs, tq) in enumerate(comps):
                        for by in range(vs):
                            for bx in range(hs):
                                full = int(grids[ci][my * vs + by, mx * hs + bx, 0])
                                if _ah == 0:
                                    v = full >> _al
                                    _encode_dc(
                                        enc, dc_b[tq], v - pred[ci], ctx, ci, (0, 1)
                                    )
                                    pred[ci] = v
                                else:
                                    enc.encode(fixed, 0, (full >> _al) & 1)
        else:
            _kind, ci, ss, se, _ah, _al = entry
            tq = comps[ci][3]
            cid = comps[ci][0]
            sos = bytes([1, cid, 0x00 if tq == 0 else 0x11, ss, se, (_ah << 4) | _al])
            out += _seg(0xDA, sos)
            chh, cw = _comp_grid_dims(comps[ci], hmax, vmax, w, h)
            for by in range(chh):
                for bx in range(cw):
                    zz = grids[ci][by, bx]
                    if _ah == 0:
                        _encode_ac_band(enc, ac_b[tq], fixed, zz, ss, se, 5, _al)
                    else:
                        _encode_ac_refine(enc, ac_b[tq], fixed, zz, ss, se, _ah, _al)
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests


def test_arith_tab_structure():
    """Structural invariants of the Table D.3 transcription — stored in
    the spec's own column order (Qe, Next_Index_LPS, Next_Index_MPS,
    Switch): 113 adaptive states + the fixed state; every arc in range;
    Qe values below the renorm threshold; SWITCH only on states whose
    LPS arc can flip the sense (the spec marks exactly the chain
    heads). ASYMMETRIC rows are pinned on purpose: rows whose NLPS and
    NMPS differ are the only rows that can detect a column swap in the
    decode()/encode() unpack (a swap once shipped — adaptation ran
    backwards while the shared-table round-trip stayed green)."""
    assert len(_ARITH_TAB) == 114
    for i, (qe, nlps, nmps, sw) in enumerate(_ARITH_TAB):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
    # spot-pins: the famous start state, the fast-attack entry, the
    # steady-state terminal, and the non-adapting fixed state
    assert _ARITH_TAB[0] == (0x5A1D, 1, 1, 1)
    assert _ARITH_TAB[14][0] == 0x5A7F and _ARITH_TAB[14][3] == 1
    assert _ARITH_TAB[112] == (0x59EB, 112, 111, 1)
    assert _ARITH_TAB[113] == (0x5A1D, 113, 113, 0)
    # asymmetric-arc pins, per published Table D.3: state 1 is
    # Qe=0x2586 with NLPS=14 (bail to the long chain) and NMPS=2
    # (continue the fast attack); state 2 and the fast-attack terminal
    # 13 (Qe=0x0001, NLPS=12, NMPS=13=self) likewise
    assert _ARITH_TAB[1] == (0x2586, 14, 2, 0)
    assert _ARITH_TAB[2] == (0x1114, 16, 3, 0)
    assert _ARITH_TAB[13] == (0x0001, 12, 13, 0)
    # switch states are exactly the six chain heads + state 0
    assert [i for i, r in enumerate(_ARITH_TAB) if r[3]] == [
        0, 14, 36, 64, 80, 88, 95, 105, 110, 112,
    ]
    # direction of adaptation: walking the NMPS arcs from state 0 must
    # ride the fast-attack chain 0->1->...->13 (monotonically shrinking
    # Qe to the 0x0001 floor within 14 steps). Under the historical
    # column swap this walk reads the LPS column and Qe GROWS.
    s, qe_prev = 0, _ARITH_TAB[0][0]
    for _ in range(14):
        s = _ARITH_TAB[s][2]
        assert _ARITH_TAB[s][0] <= qe_prev
        qe_prev = _ARITH_TAB[s][0]
    assert s == 13 and _ARITH_TAB[13][0] == 0x0001


def test_qm_coder_adapts_toward_skew():
    """Adaptation DIRECTION, pinned independently of the table/unpack
    consistency between encoder and decoder: 20k all-MPS decisions in
    one context must compress to essentially nothing (the estimator
    rides NMPS arcs down to Qe=0x0001 ~= 2^-15 probability), and the
    decoder must reproduce them. With the MPS/LPS columns swapped the
    stream is ~20 kbits; correct adaptation lands under 20 bytes."""
    from travel_data_ingestion_spark.llm.jpeg import _ArithDecoder

    enc = _QMEncoder()
    st = bytearray(1)
    for _ in range(20000):
        enc.encode(st, 0, 0)
    payload = enc.flush()
    assert len(payload) < 20, len(payload)
    dec = _ArithDecoder(payload)
    st2 = bytearray(1)
    assert all(dec.decode(st2, 0) == 0 for _ in range(20000))
    # the context must have ridden the fast-attack chain to (or next to)
    # the Qe-floor terminal — state 12's Qe=0x0003 renorms only every
    # ~11k decisions, so the final hop to 13 depends on the run length
    assert (st[0] & 0x7F) in (12, 13) and st2[0] == st[0]


def test_qm_coder_roundtrip_random_decisions():
    """The coder pair round-trips an arbitrary decision sequence over
    adapting contexts — pure QM layer, no JPEG model."""
    from travel_data_ingestion_spark.llm.jpeg import _ArithDecoder

    r = np.random.RandomState(7)
    decisions = [(int(r.randint(0, 8)), int(b)) for b in (r.rand(5000) < 0.3)]
    enc = _QMEncoder()
    st = bytearray(8)
    for i, d in decisions:
        enc.encode(st, i, d)
    data = enc.flush()
    # destuff (the scan extractor normally does this)
    clean = data.replace(b"\xff\x00", b"\xff")
    dec = _ArithDecoder(clean)
    st2 = bytearray(8)
    got = [(i, dec.decode(st2, i)) for i, _d in decisions]
    assert got == decisions
    assert st == st2  # identical final adaptation state


def test_sequential_arith_decodes_bit_identical_to_baseline():
    img = _smooth(24, 16, 3)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    arith = decode_jpeg(encode_jpeg_arith(img, quality=90))
    assert base is not None and arith is not None
    assert arith == base


def test_sequential_arith_subsampling_and_grayscale():
    img = _smooth(19, 13, 5)  # non-multiple dims: MCU padding in play
    for kw in ({"subsample": "420"}, {"subsample": "422"}, {"grayscale": True}):
        base = decode_jpeg(encode_jpeg(img, quality=85, **kw))
        arith = decode_jpeg(encode_jpeg_arith(img, quality=85, **kw))
        assert arith == base, kw


def test_sequential_arith_noise_image():
    r = np.random.RandomState(11)
    img = r.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    arith = decode_jpeg(encode_jpeg_arith(img, quality=95))
    assert arith == base


def test_arith_restart_markers():
    img = _smooth(32, 24, 9)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    arith = decode_jpeg(encode_jpeg_arith(img, quality=90, restart_interval=2))
    assert arith == base


def test_arith_dac_conditioning():
    """Non-default DAC conditioning (DC L=1/U=3 packed as 0x31, AC
    Kx=1 and Kx=63) changes the coded bits but must not change the
    decoded image — encoder and decoder condition identically."""
    img = _smooth(24, 16, 13)
    base = decode_jpeg(encode_jpeg_arith(img, quality=90))
    for dac in (
        {(0, 0): 0x31, (0, 1): 0x31},
        {(1, 0): 1, (1, 1): 1},
        {(1, 0): 63, (1, 1): 63},
        {(0, 0): 0x20, (1, 0): 13},
    ):
        payload = encode_jpeg_arith(img, quality=90, dac=dac)
        assert decode_jpeg(payload) == base, dac


def test_progressive_arith_decodes_bit_identical_to_baseline():
    img = _smooth(24, 16, 21)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_arith_progressive(img, quality=90))
    assert prog is not None and prog == base


def test_progressive_arith_spectral_only_and_deep_refinement():
    img = _smooth(16, 16, 23)
    base = decode_jpeg(encode_jpeg(img, quality=92))
    spectral = [("dc", 0, 0)] + [
        ("ac", ci, 1, 63, 0, 0) for ci in range(3)
    ]
    assert decode_jpeg(
        encode_jpeg_arith_progressive(img, quality=92, script=spectral)
    ) == base
    deep = [("dc", 0, 2), ("dc", 2, 1), ("dc", 1, 0)]
    for ci in range(3):
        deep += [
            ("ac", ci, 1, 63, 0, 2),
            ("ac", ci, 1, 63, 2, 1),
            ("ac", ci, 1, 63, 1, 0),
        ]
    assert decode_jpeg(
        encode_jpeg_arith_progressive(img, quality=92, script=deep)
    ) == base


def test_progressive_arith_noise_420():
    r = np.random.RandomState(31)
    img = r.randint(0, 256, (24, 16, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    prog = decode_jpeg(
        encode_jpeg_arith_progressive(img, quality=90, subsample="420")
    )
    assert prog == base


def test_arith_truncation_and_adversarial_totality():
    img = _smooth(16, 16, 41)
    payload = encode_jpeg_arith(img, quality=90)
    for cut in range(0, len(payload), 11):
        decode_jpeg(payload[:cut])  # must never raise or hang
    r = np.random.RandomState(5)
    for _ in range(50):
        mutated = bytearray(payload)
        for _k in range(4):
            mutated[int(r.randint(0, len(mutated)))] = int(r.randint(0, 256))
        decode_jpeg(bytes(mutated))  # totality


def test_arith_bad_dac_rejected():
    img = _smooth(16, 16, 43)
    payload = encode_jpeg_arith(img, quality=90, dac={(1, 0): 13, (1, 1): 13})
    i = payload.index(b"\xff\xcc")
    # AC Kx = 0 is out of range (spec: 1..63)
    bad = bytearray(payload)
    bad[i + 5] = 0
    assert decode_jpeg(bytes(bad)) is None


def test_decode_image_routes_arith_jpeg():
    from travel_data_ingestion_spark.llm.multimodal import decode_image, phash_bytes

    img = _smooth(24, 24, 47)
    payload = encode_jpeg_arith(img, quality=95)
    dec = decode_image(payload)
    assert dec is not None and (dec[0], dec[1]) == (24, 24)
    # the arithmetic re-encode pHashes with the Huffman encode of the
    # same coefficients at hamming 0 (identical decoded pixels)
    assert phash_bytes(payload) == phash_bytes(encode_jpeg(img, quality=95))
