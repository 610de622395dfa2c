"""Generate tests/syspng_vectors.py: SYSTEM-libpng-encoded streams
pinned with sha256 of the expected package decode (computed from the
SOURCE samples, not from the package — the encoder and the
expectation are both independent of the code under test).

Usage: python tools/gen_syspng_vectors.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from syspng_shim import (  # noqa: E402
    GA,
    GRAY,
    PALETTE,
    RGB,
    RGBA,
    expected_rgb,
    sys_encode_png,
)


def main() -> None:
    rng = np.random.default_rng(42)
    cases = [
        ("gray1_adam7", GRAY, 1, 1, None),
        ("gray16_paeth", GRAY, 16, 0, 0x80),  # forced Paeth filter
        ("rgb8_heuristic", RGB, 8, 0, None),
        ("rgb16_adam7", RGB, 16, 1, None),
        ("palette8", PALETTE, 8, 0, None),
        ("rgba8_adam7", RGBA, 8, 1, None),
        ("ga16", GA, 16, 0, None),
    ]
    out = [
        '"""SYSTEM-libpng conformance vectors (tools/gen_syspng_vectors.py',
        "— regenerate there, do not edit). Each entry: (png stream encoded",
        "by the installed libpng, width, height, sha256 of the expected",
        '(w*h*3) RGB bytes under the package normalization contract)."""',
        "",
        "VECTORS = {",
    ]
    for name, color, depth, interlace, filters in cases:
        h, w = 15, 22
        mx = (1 << depth) - 1
        if color == PALETTE:
            pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
            samples = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            pal = None
            ch = {GRAY: None, RGB: 3, GA: 2, RGBA: 4}[color]
            shape = (h, w) if ch is None else (h, w, ch)
            dt = np.uint16 if depth == 16 else np.uint8
            samples = rng.integers(0, mx + 1, shape).astype(dt)
        payload = sys_encode_png(samples, color, depth, interlace, pal,
                                 filters)
        assert payload is not None, name
        exp = expected_rgb(samples, color, depth, pal)
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
    dest = os.path.join(REPO, "tests", "syspng_vectors.py")
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}: {len(cases)} vectors")


if __name__ == "__main__":
    main()
