"""Generate tests/systiff_vectors.py: SYSTEM-libtiff-encoded streams
pinned with sha256 of the expected package decode (expectation
computed from the SOURCE samples, independent of the code under
test).

Usage: python tools/gen_systiff_vectors.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from systiff_shim import expected_tiff_rgb, sys_encode_tiff  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(17)
    h, w = 14, 23
    cases = [
        ("lzw_pred2_rgb8", (h, w, 3), 8, 5, 2, False),
        ("deflate_pred2_gray16", (h, w), 16, 8, 2, False),
        ("packbits_rgba8", (h, w, 4), 8, 32773, 0, False),
        ("lzw_palette", (h, w), 8, 5, 0, True),
        ("none_gray8_strip1", (h, w), 8, 1, 0, False),
    ]
    out = [
        '"""SYSTEM-libtiff conformance vectors (tools/',
        "gen_systiff_vectors.py — regenerate there, do not edit). Each",
        "entry: (tiff stream encoded by the installed libtiff, width,",
        "height, sha256 of the expected (w*h*3) RGB bytes under the",
        'package normalization contract)."""',
        "",
        "VECTORS = {",
    ]
    for name, shape, bps, comp, pred, palette in cases:
        mx = 255 if bps == 8 else 65535
        dt = np.uint8 if bps == 8 else np.uint16
        samples = rng.integers(0, mx + 1, shape).astype(dt)
        rps = 1 if name.endswith("strip1") else 4
        payload = sys_encode_tiff(samples, bps, comp, pred, rps,
                                  palette=palette)
        assert payload is not None, name
        exp = expected_tiff_rgb(samples, bps, palette=palette)
        digest = hashlib.sha256(
            np.ascontiguousarray(exp).tobytes()).hexdigest()
        hexs = payload.hex()
        body = "\n".join(
            f'        "{hexs[i:i + 64]}"' for i in range(0, len(hexs), 64)
        )
        out.append(f'    "{name}": (bytes.fromhex(')
        out.append(body)
        out.append(f'    ), {w}, {h}, "{digest}"),')
        out.append("")
    out.append("}")
    dest = os.path.join(REPO, "tests", "systiff_vectors.py")
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}: {len(cases)} vectors")


if __name__ == "__main__":
    main()
