#!/usr/bin/env python3
"""Generate travel_data_ingestion_spark/llm/vp8_tables.py — the RFC 6386
published constant tables for the VP8 key-frame decoder.

The numbers are spec constants (RFC 6386 §13.4/§13.5 default token
probability tables, §14.1 quantizer lookup tables, §11.4 key-frame
B-mode probabilities, §8.1 coefficient-band/zigzag orders, §13.2
category extra-bit probabilities). To avoid hand-transcription slips
in ~3,200 values, this tool reads them out of the SYSTEM libwebp
shared library (a known-good implementation that embeds the same spec
constants twice — decoder and encoder copies), anchored by pattern
search on rows whose published values are well known, and
cross-verifies: both embedded copies must be byte-identical and every
anchor row must equal its published value. Run on a machine with
libwebp; the emitted module is committed and pure-stdlib.
"""

from __future__ import annotations

import os
import struct

LIB_CANDIDATES = (
    "/lib/x86_64-linux-gnu/libwebp.so.7",
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _findall(data: bytes, pat: bytes) -> list[int]:
    out, i = [], 0
    while True:
        i = data.find(pat, i)
        if i < 0:
            return out
        out.append(i)
        i += 1


def main() -> None:
    path = next(p for p in LIB_CANDIDATES if os.path.exists(p))
    data = open(path, "rb").read()

    # --- quantizer lookups (§14.1): dc ends 157, ac ends 284 ---------
    ac_hits = _findall(data, struct.pack("<12H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15))
    acs = {data[h:h + 256] for h in ac_hits}
    assert len(acs) == 1 and len(ac_hits) >= 2, ac_hits
    ac = list(struct.unpack("<128H", acs.pop()))
    assert ac[-1] == 284 and ac[:8] == [4, 5, 6, 7, 8, 9, 10, 11]

    dc_hits = _findall(data, bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15]))
    dcs = {data[h:h + 128] for h in dc_hits}
    assert len(dcs) == 1 and len(dc_hits) >= 2, dc_hits
    dc = list(dcs.pop())
    assert dc[-1] == 157

    # --- zigzag (§8.1) ------------------------------------------------
    zigzag = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    assert _findall(data, bytes(zigzag))

    # --- coefficient bands (§13.3) -------------------------------------
    bands = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
    assert _findall(data, bytes(bands))

    # --- default coefficient probs (§13.5), [4][8][3][11] --------------
    # anchor: the published type-0/band-1/ctx-0 row; block starts 33
    # bytes earlier (type-0 band-0 is the all-128 dummy band)
    a = _findall(data, bytes([253, 136, 254, 255, 228, 219, 128]))
    starts = [h - 33 for h in a]
    blocks = {data[s:s + 1056] for s in starts}
    assert len(blocks) == 1 and len(starts) >= 2, starts
    coeff = list(blocks.pop())
    assert coeff[:33] == [128] * 33

    # --- coeff update probs (§13.4) + kf bmode probs (§11.4) -----------
    # layout fact verified here: the 1056-byte update-prob table is
    # immediately followed by the 900-byte kf_bmode table in libwebp's
    # rodata (both copies)
    bm_hits = _findall(data, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
    upds = {data[h - 1056:h] for h in bm_hits}
    bms = {data[h:h + 900] for h in bm_hits}
    assert len(upds) == 1 and len(bms) == 1 and len(bm_hits) >= 2, bm_hits
    upd = list(upds.pop())
    bmode_lib = list(bms.pop())
    assert upd[:11] == [255] * 11 and min(upd) >= 176
    # libwebp's internal B-mode enum permutes the RFC 6386 §11.2 order
    # (libwebp: RD=4, VR=5, LD=6; RFC: LD=4, RD=5, VR=6), and the
    # [10][10][9] table is indexed by mode value — re-index rows and
    # columns into RFC numbering (the per-row 9 probabilities are in
    # tree-node order, identical in both). This permutation was found
    # the hard way: unpermuted rows desync the mode parse exactly when
    # a context mode >= 4 first appears (tests/test_vp8.py's libwebp
    # conformance battery pins it).
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # rfc index -> libwebp index
    bmode = [0] * 900
    for a in range(10):
        for l in range(10):
            src = (perm[a] * 10 + perm[l]) * 9
            dst = (a * 10 + l) * 9
            bmode[dst:dst + 9] = bmode_lib[src:src + 9]

    # --- category extra-bit probs (§13.2) -------------------------------
    cat6 = [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]
    assert _findall(data, bytes(cat6))
    for probe in ([180, 157, 141, 134, 130], [176, 155, 140, 135], [173, 148, 140]):
        assert _findall(data, bytes(probe + [0]))
    cats = [[159], [165, 145], [173, 148, 140], [176, 155, 140, 135],
            [180, 157, 141, 134, 130], cat6]

    def fmt(name: str, vals: list[int], per: int = 16) -> str:
        body = "\n".join(
            "    " + " ".join(f"{v}," for v in vals[i:i + per])
            for i in range(0, len(vals), per)
        )
        return f"{name} = bytes((\n{body}\n))"

    out = [
        '"""RFC 6386 published constant tables for the VP8 key-frame decoder',
        "(generated by tools/gen_vp8_tables.py — regenerate there, do not",
        "edit by hand). Sections: quantizer lookups (RFC 6386 §14.1),",
        "zigzag / coefficient-band orders (§8.1, §13.3), default token",
        "probabilities and their update probabilities (§13.4-13.5,",
        "flattened [4][8][3][11]), key-frame B-mode probabilities (§11.4,",
        "flattened [10][10][9]), and the category extra-bit probabilities",
        '(§13.2)."""',
        "",
        "DC_QLOOKUP = (" + ", ".join(map(str, dc)) + ")",
        "",
        "AC_QLOOKUP = (" + ", ".join(map(str, ac)) + ")",
        "",
        "ZIGZAG = (" + ", ".join(map(str, zigzag)) + ")",
        "",
        "COEFF_BANDS = (" + ", ".join(map(str, bands)) + ")",
        "",
        fmt("COEFF_PROBS", coeff, 22),
        "",
        fmt("COEFF_UPDATE_PROBS", upd, 22),
        "",
        fmt("KF_BMODE_PROBS", bmode, 18),
        "",
        "# key-frame Y / UV mode trees' probabilities (§11.2-11.3)",
        "KF_YMODE_PROBS = (145, 156, 163, 128)",
        "KF_UV_PROBS = (142, 114, 183)",
        "",
        "CAT_PROBS = (",
    ] + [f"    {tuple(c)!r}," for c in cats] + [
        ")",
        "",
    ]
    dest = os.path.join(REPO, "travel_data_ingestion_spark", "llm", "vp8_tables.py")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
