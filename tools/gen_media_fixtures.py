"""Regenerate travel_data_ingestion_spark/queries/media_literals.py.

The package deliberately ships DECODERS only (the _GAMMA_JPEG pattern:
re-encoded planted fixtures are pinned as literals, generated once by
the independent forward encoders that live in tests/). This tool runs
those test encoders over the deterministic planted bases and writes the
literals module. Re-run after changing a planted base or adding a
container; the module records the generating expression per literal.

Usage: python tools/gen_media_fixtures.py
"""

from __future__ import annotations

import os
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_audio_formats import _ima_encode, _wav_ms  # noqa: E402
from test_ogg import _mux as _ogg_mux  # noqa: E402
from test_ogg import _ogg_flac  # noqa: E402
from test_vorbis import encode_pcm_mono  # noqa: E402
from test_bmp_pnm import _bmp, _ico, _ico_dib  # noqa: E402
from test_gif import _gif  # noqa: E402
from test_tiff import (  # noqa: E402
    _hdiff,
    _lzw_enc,
    _packbits_enc,
    _tiff,
    _tile_blocks,
)


def alpha_base() -> np.ndarray:
    """The mm03 alpha-clique base (queries/llm_multimodal.py)."""
    return np.random.RandomState(42).randint(0, 256, (24, 24, 3)).astype("uint8")


def delta_base() -> np.ndarray:
    """The delta-clique base: 5-level posterized noise (<=125 distinct
    colors, so a GIF palette represents it losslessly)."""
    r = np.random.RandomState(13)
    return (r.randint(0, 256, (24, 24, 3)) // 52 * 52 + 26).astype("uint8")


def gif_still(rgb: np.ndarray) -> bytes:
    colors, inverse = np.unique(rgb.reshape(-1, 3), axis=0, return_inverse=True)
    assert len(colors) <= 256, len(colors)
    idx = inverse.reshape(rgb.shape[:2]).astype(np.uint8)
    return _gif(rgb.shape[1], rgb.shape[0], colors.astype(np.uint8), [{"idx": idx}])


def gif_animated(n_frames: int = 23, w: int = 8, h: int = 8) -> bytes:
    """n_frames distinct 8x8 full frames over a 16-color palette."""
    pal = np.random.RandomState(3).randint(0, 256, (16, 3)).astype(np.uint8)
    r = np.random.RandomState(21)
    frames = [{"idx": r.randint(0, 16, (h, w)).astype(np.uint8)} for _ in range(n_frames)]
    return _gif(w, h, pal, frames)


def _clique_clip():
    from travel_data_ingestion_spark.queries.llm_multimodal import _env_clip

    return _env_clip()


def audio_ima_wav() -> bytes:
    """IMA/DVI ADPCM rendering of the mm03 audio-clique clip: block
    align 16 -> 25 samples/block, 80 whole blocks = exactly the clip's
    2000 frames (equal length keeps the energy segments aligned with
    the other renderings; measured hamming 1 vs the whole clique)."""
    import struct

    from travel_data_ingestion_spark.queries.llm_multimodal import _env_clip

    data = _ima_encode(np.asarray(_env_clip()), 1, 16)
    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 8000, 16, 4)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_ogg_flac() -> bytes:
    """Ogg-FLAC rendering of the audio-clique clip: the clip's verbatim
    native FLAC frames re-framed per the xiph Ogg-FLAC mapping, audio
    split across three packets / small pages so the graded path
    exercises cross-page packet continuation."""
    from travel_data_ingestion_spark.queries.llm_multimodal import (
        _flac_verbatim16,
    )

    native = _flac_verbatim16(_clique_clip())
    return _ogg_flac(native, max_segs=64, final_granule=2000, split_audio=3)


def audio_ogg_vorbis() -> bytes:
    """Real lossy Ogg-Vorbis rendering of the audio-clique clip via the
    fixture-grade constrained encoder in tests/test_vorbis.py (all-short
    blocks, per-frame adaptive flat floor, 8-bit residue grid; ~34 dB
    SNR — envelope intact, so the audio pHash lands in the clique)."""
    x = np.asarray(_clique_clip(), dtype=np.float64) / 32768.0
    pkts = encode_pcm_mono(x)
    return _ogg_mux(pkts, serial=0x5662, final_granule=2000)


def gamma_jpeg_arith() -> bytes:
    """Arithmetic-coded (SOF9) JPEG rendering of the gamma-clique base
    at quality 95 — the same coefficients as the pinned baseline
    _GAMMA_JPEG decode bit-identically through the QM-coder path, so
    the literal lands in the gamma clique at pHash hamming 0."""
    from test_jpeg_arith import encode_jpeg_arith
    from travel_data_ingestion_spark.queries.llm_multimodal import _gamma_smooth

    return encode_jpeg_arith(_gamma_smooth(), quality=95)


def alpha_webp() -> bytes:
    """VP8L (WebP-lossless) rendering of the alpha-clique base, with
    the subtract-green transform, a color cache, and LZ77 enabled so
    the pinned literal exercises the decoder's full coded-image path
    (lossless -> pHash hamming 0 vs the alpha PPM)."""
    from test_webp import _webp_lossless

    return _webp_lossless(alpha_base(), subtract_green=True, cache_bits=8, lz77=True)


def zeta_webp_lossy() -> bytes:
    """Lossy VP8 (key-frame) WebP — the zeta clique's generating
    stream, encoded by the SYSTEM libwebp at generation time (the
    package ships the decoder only — llm/vp8.py — and tests/test_vp8.py
    pins that decoder bit-exact against the same library). The clique
    design inverts the _GAMMA_JPEG pattern: the planted BASE is the
    DECODED image of this stream (a crawl that stores both a .webp and
    a re-rendered PPM/PNG of it), so the stream and its re-renders sit
    at pHash hamming 0 by construction — a lossy codec is only a pHash
    fixed point in the decode direction (re-ENCODING a smooth image
    drifts 4-14 bits because most of its 8x8 DCT coefficients sit near
    the pHash median). The generator asserts hamming 0."""
    import ctypes

    from travel_data_ingestion_spark.llm.multimodal import decode_image, phash_bytes

    lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libwebp.so.7")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    yy, xx = np.mgrid[0:24, 0:32]
    g = (
        128 + 70 * np.sin(xx / 5.1 + 1.0) * np.cos(yy / 4.2)
        + 30 * np.sin((xx + yy) / 7.7)
    ).clip(0, 255).astype(np.uint8)
    rgb = np.stack([g] * 3, -1)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), 32, 24, 96, 92.0, ctypes.byref(out)
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    w, h, px = decode_image(data)
    assert (w, h) == (32, 24)
    base_ppm = b"P6\n32 24\n255\n" + px
    dist = bin(phash_bytes(data) ^ phash_bytes(base_ppm)).count("1")
    assert dist == 0, f"zeta lossy-webp pHash drifted: {dist}"
    return data


def _vp8_still_frames(n: int, seed: int) -> list[bytes]:
    """n distinct 16x16 lossy VP8 stills via the SYSTEM libwebp (the
    zeta_webp_lossy ctypes path) — frame payloads for the planted
    WebM / animated-WebP clips."""
    import ctypes

    lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libwebp.so.7")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    r = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        rgb = r.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        buf = ctypes.POINTER(ctypes.c_uint8)()
        sz = lib.WebPEncodeRGB(
            np.ascontiguousarray(rgb).tobytes(), 16, 16, 48, 75.0,
            ctypes.byref(buf),
        )
        assert sz > 0
        out.append(ctypes.string_at(buf, sz))
        lib.WebPFree(buf)
    return out


def video_webm_vp8() -> bytes:
    """21-frame all-keyframe VP8 WebM: Matroska container from the
    hand-written spec muxer in tests/test_webm_anim.py, frame payloads
    from the system libwebp; asserts the package decodes all 21."""
    from test_webm_anim import _vp8_chunk_payload, webm_vp8
    from travel_data_ingestion_spark.llm.multimodal import decode_webm

    stills = _vp8_still_frames(21, seed=31)
    payload = webm_vp8([_vp8_chunk_payload(s) for s in stills])
    dec = decode_webm(payload)
    assert dec is not None and dec[:2] == (16, 16) and len(dec[2]) == 21
    return payload


def video_awebp_vp8() -> bytes:
    """13-frame animated WebP (ANIM/ANMF around lossy VP8 key frames);
    asserts the package decodes all 13 full-canvas frames."""
    from test_webm_anim import webp_anim
    from travel_data_ingestion_spark.llm.multimodal import decode_webp_anim

    stills = _vp8_still_frames(13, seed=37)
    payload = webp_anim((16, 16), [(0, 0, s) for s in stills])
    dec = decode_webp_anim(payload)
    assert dec is not None and dec[:2] == (16, 16) and len(dec[2]) == 13
    return payload


def main() -> None:
    a0 = alpha_base()
    d0 = delta_base()
    diffed = _hdiff(a0)
    lits = [
        (
            "ALPHA_BMP24",
            "tests/test_bmp_pnm._bmp(alpha_base, bpp=24) — lossless 24-bit BMP",
            _bmp(a0, bpp=24),
        ),
        (
            "ALPHA_TIFF_PACKBITS",
            "tests/test_tiff._tiff(comp=32773, strips=[_packbits_enc(alpha)])",
            _tiff(24, 24, None, comp=32773, strips=[_packbits_enc(a0.tobytes())]),
        ),
        (
            "ALPHA_TIFF_LZW_PRED2",
            "tests/test_tiff._tiff(comp=5, predictor=2, strips=[_lzw_enc(_hdiff(alpha))])"
            " — the common real-world LZW+horizontal-differencing layout",
            _tiff(24, 24, None, comp=5, predictor=2, strips=[_lzw_enc(diffed.tobytes())]),
        ),
        (
            "ALPHA_TIFF_DEFLATE",
            "tests/test_tiff._tiff(comp=8, strips=[zlib.compress(alpha)])"
            " — Adobe-Deflate strips",
            _tiff(24, 24, None, comp=8, strips=[__import__('zlib').compress(alpha_base().tobytes())]),
        ),
        (
            "ALPHA_TIFF_TILED",
            "tests/test_tiff._tiff(tiles=(16, 8, _tile_blocks(alpha, 16, 8,"
            " zlib.compress))) — tiled layout (tags 322-325), edge-padded grid",
            _tiff(
                24, 24, None, comp=8,
                tiles=(16, 8, _tile_blocks(alpha_base(), 16, 8, __import__("zlib").compress)),
            ),
        ),
        (
            "ALPHA_ICO",
            "tests/test_bmp_pnm._ico([(24, 24, _ico_dib(alpha))]) — a"
            " classic headerless-DIB icon entry with an AND mask",
            _ico([(24, 24, _ico_dib(alpha_base()))]),
        ),
        (
            "DELTA_GIF",
            "tests/test_gif._gif over the exact color palette of the 5-level"
            " posterized delta base — lossless",
            gif_still(d0),
        ),
        (
            "AUDIO_IMA_WAV",
            "tests/test_audio_formats._ima_encode over the audio-clique clip,"
            " block_align 16 (25 samples/block x 80 = the clip's 2000 frames)",
            audio_ima_wav(),
        ),
        (
            "AUDIO_MS_ADPCM_WAV",
            "tests/test_audio_formats._wav_ms over the audio-clique clip,"
            " block_align 256 (500 samples/block x 4 = the clip's 2000 frames)",
            _wav_ms(np.asarray(_clique_clip()), 1, block_align=256),
        ),
        (
            "AUDIO_OGG_FLAC",
            "tests/test_ogg._ogg_flac (independent RFC 3533 muxer) around"
            " the clip's verbatim native FLAC, 3 audio packets over small"
            " pages (cross-page continuation in the graded path)",
            audio_ogg_flac(),
        ),
        (
            "AUDIO_OGG_VORBIS",
            "tests/test_vorbis.encode_pcm_mono over the audio-clique clip"
            " (real lossy Vorbis: all-short blocks, per-frame adaptive"
            " floor, 8-bit residue grid) in tests/test_ogg._mux pages",
            audio_ogg_vorbis(),
        ),
        (
            "VIDEO_GIF_23F",
            "tests/test_gif._gif: 23 distinct full 8x8 frames, 16-color palette",
            gif_animated(),
        ),
        (
            "ALPHA_WEBP",
            "tests/test_webp._webp_lossless(alpha_base, subtract_green=True,"
            " cache_bits=8, lz77=True) — lossless VP8L with the subtract-green"
            " transform, a 256-entry color cache, and dist-1 backrefs",
            alpha_webp(),
        ),
        (
            "VIDEO_WEBM_VP8_21F",
            "tests/test_webm_anim.webm_vp8 (hand-written Matroska muxer,"
            " public EBML spec) around 21 distinct 16x16 all-keyframe VP8"
            " payloads from the SYSTEM libwebp at q75",
            video_webm_vp8(),
        ),
        (
            "VIDEO_AWEBP_13F",
            "tests/test_webm_anim.webp_anim (hand-written ANIM/ANMF muxer,"
            " public WebP container spec) around 13 distinct 16x16 lossy VP8"
            " key frames from the SYSTEM libwebp at q75",
            video_awebp_vp8(),
        ),
        (
            "ZETA_WEBP_LOSSY",
            "SYSTEM libwebp WebPEncodeRGB(zeta sinusoid, q=92) — lossy VP8"
            " key-frame WebP, the zeta clique's generating stream (the"
            " planted base is its DECODE, so stream and re-renders sit at"
            " pHash hamming 0); package-side decode is llm/vp8.py (pinned"
            " bit-exact against the same library by tests/test_vp8.py)",
            zeta_webp_lossy(),
        ),
        (
            "GAMMA_JPEG_ARITH",
            "tests/test_jpeg_arith.encode_jpeg_arith(gamma, quality=95) —"
            " SOF9 arithmetic (QM-coder) encoding of the same quantized"
            " coefficients as the baseline _GAMMA_JPEG literal",
            gamma_jpeg_arith(),
        ),
    ]
    out = [
        '"""Pinned re-encoded planted media (generated by',
        "tools/gen_media_fixtures.py — run it to regenerate; do not edit the",
        "hex by hand). The package ships decoders only, so re-encodes of the",
        "planted bases come from the independent forward encoders in tests/,",
        'pinned once as literals — the _GAMMA_JPEG pattern."""',
        "",
    ]
    for name, how, payload in lits:
        hexs = payload.hex()
        body = "\n".join(
            f'    "{hexs[i:i + 72]}"' for i in range(0, len(hexs), 72)
        )
        out.append(f"# {textwrap.fill(how, 70).replace(chr(10), chr(10) + '# ')}")
        out.append(f"{name} = bytes.fromhex(")
        out.append(body)
        out.append(")")
        out.append("")
    dest = os.path.join(REPO, "travel_data_ingestion_spark", "queries", "media_literals.py")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest}: " + ", ".join(f"{n}={len(p)}B" for n, _h, p in lits))


if __name__ == "__main__":
    main()
