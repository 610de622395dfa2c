"""Generate tests/sysjpeg_vectors.py: SYSTEM-libjpeg-encoded JPEG
streams pinned with the system decoder's coefficient hashes.

These are the third-party conformance anchors for the package JPEG
decoder (baseline/progressive/arithmetic/progressive-arithmetic): the
streams were produced by the installed libjpeg encoder, the expected
values by its jpeg_read_coefficients — nothing in the package touched
either side. The default test lane replays them without needing the
library; the live battery in tests/test_sysjpeg.py re-derives them
when the toolchain is present.

Usage: python tools/gen_sysjpeg_vectors.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from sysjpeg_shim import sys_decode_coefs, sys_encode  # noqa: E402


def photo(w: int, h: int, seed: int, gray: bool = False) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (
        120
        + 60 * np.sin(x / 5.3 + seed)
        + 45 * np.cos(y / 4.1 - seed)
        + rng.normal(0, 14, (h, w))
    )
    if gray:
        return np.clip(base, 0, 255).astype(np.uint8)
    rgb = np.stack(
        [base, np.roll(base, 3, axis=1) * 0.9 + 20, 255 - base * 0.7],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def main() -> None:
    cases = [
        ("baseline_color", photo(24, 17, 1), 80, "b", 0),
        ("progressive_color", photo(24, 17, 2), 80, "p", 0),
        ("arith_color", photo(24, 17, 3), 80, "a", 0),
        ("arith_progressive", photo(21, 19, 4), 85, "P", 0),
        ("arith_gray", photo(29, 23, 5, gray=True), 90, "a", 0),
        ("arith_restart", photo(32, 24, 6), 75, "a", 2),
    ]
    out = [
        '"""SYSTEM-libjpeg conformance vectors (tools/',
        "gen_sysjpeg_vectors.py — regenerate there, do not edit). Each",
        "entry: (jpeg stream encoded by the installed libjpeg, per-",
        "component (height_blocks, width_blocks, sha256 of the SYSTEM",
        "jpeg_read_coefficients dump in natural order)). Third-party",
        'ground truth: the package produced neither side."""',
        "",
        "VECTORS = {",
    ]
    for name, img, q, mode, restart in cases:
        payload = sys_encode(img, q, mode, restart)
        assert payload is not None, f"system encode failed for {name}"
        coefs = sys_decode_coefs(payload)
        assert coefs is not None, f"system coef decode failed for {name}"
        hexs = payload.hex()
        body = "\n".join(
            f'        "{hexs[i:i + 64]}"' for i in range(0, len(hexs), 64)
        )
        comps = ", ".join(
            f'({hb}, {wb}, "{hashlib.sha256(rb.tobytes()).hexdigest()}")'
            for hb, wb, rb in coefs
        )
        out.append(f'    "{name}": (bytes.fromhex(')
        out.append(body)
        out.append(f"    ), [{textwrap.fill(comps, 68)}]),".replace(
            "\n", "\n     "))
        out.append("")
    out.append("}")
    dest = os.path.join(REPO, "tests", "sysjpeg_vectors.py")
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}: {len(cases)} vectors")


if __name__ == "__main__":
    main()
