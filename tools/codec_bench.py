"""Per-decoder throughput ledger (SCALE.md 'codec swap point' table).

Measures decoded throughput of every pure-Python media decoder over
deterministic representative payloads: payload MB/s (what a 100 TB scan
pays) and output MB/s (pixels/samples produced). Pure functions, no
Spark — the kernels are map-only, so per-core decode rate IS the
cluster-level rate divided by cores.

Usage: python tools/codec_bench.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from travel_data_ingestion_spark.llm.multimodal import (  # noqa: E402
    decode_audio,
    decode_avi,
    decode_bmp,
    decode_gif,
    decode_image,
    decode_png,
    decode_tiff,
    decode_webm,
    decode_webp_anim,
    encode_png,
)
from travel_data_ingestion_spark.queries import media_literals as ML  # noqa: E402
from travel_data_ingestion_spark.queries.llm_multimodal import (  # noqa: E402
    _GAMMA_JPEG,
    _avi_bytes,
    _dib_frame,
    _env_clip,
    _flac_verbatim16,
    _ppm_bytes,
    _wav_pcm16,
)


def _big_rgb(side: int = 256) -> np.ndarray:
    return np.random.RandomState(9).randint(0, 256, (side, side, 3)).astype("uint8")


def cases() -> list[tuple[str, bytes, object]]:
    from test_audio_formats import _ima_encode, _ms_encode, _wav_ms
    from test_bmp_pnm import _bmp, _bmp_rle_file, _ico, _ico_dib, _rle_encode
    from test_tiff import _lzw_enc, _packbits_enc, _tiff

    rgb = _big_rgb()
    smooth = np.tile(
        np.linspace(0, 255, 256, dtype=np.uint8).reshape(1, 256, 1), (256, 1, 3)
    )
    clip = np.tile(_env_clip(), 32)  # 64k samples (fits one FLAC frame)
    return [
        ("PPM P6 (256x256)", _ppm_bytes(rgb), decode_image),
        ("PNG rgb8 noise (256x256)", encode_png(256, 256, rgb.tobytes()), decode_png),
        (
            "PNG rgb8 smooth (256x256)",
            encode_png(256, 256, smooth.tobytes()),
            decode_png,
        ),
        ("JPEG baseline (32x24 fixture)", _GAMMA_JPEG, decode_image),
        ("JPEG arithmetic (32x24 fixture)", ML.GAMMA_JPEG_ARITH, decode_image),
        ("BMP 24-bit (256x256)", _bmp(rgb, bpp=24), decode_bmp),
        (
            "TIFF PackBits (256x256)",
            _tiff(256, 256, None, comp=32773, strips=[_packbits_enc(rgb.tobytes())]),
            decode_tiff,
        ),
        (
            "TIFF Deflate (256x256)",
            _tiff(256, 256, None, comp=8, strips=[__import__("zlib").compress(rgb.tobytes())]),
            decode_tiff,
        ),
        (
            "TIFF LZW (256x256)",
            _tiff(256, 256, None, comp=5, strips=[_lzw_enc(rgb.tobytes())]),
            decode_tiff,
        ),
        ("GIF still (24x24 fixture)", ML.DELTA_GIF, decode_gif),
        ("GIF animated 23f (8x8)", ML.VIDEO_GIF_23F, decode_gif),
        (
            "AVI MJPEG 35f (32x24)",
            _avi_bytes([_GAMMA_JPEG] * 35, 32, 24, b"MJPG", b"MJPG"),
            decode_avi,
        ),
        (
            "AVI DIB 17f (16x8)",
            _avi_bytes(
                [
                    _dib_frame(
                        np.random.RandomState(7).randint(0, 256, (8, 16, 3)).astype("uint8")
                    )
                ]
                * 17,
                16,
                8,
                bytes(4),
                b"DIB ",
            ),
            decode_avi,
        ),
        (
            "BMP RLE8 posterized (128x128)",
            _bmp_rle_file(
                (np.random.RandomState(12).randint(0, 256, (128, 128)) // 32 * 32).astype("uint8"),
                np.random.RandomState(13).randint(0, 256, (256, 3)),
                8,
            ),
            decode_bmp,
        ),
        ("WAV PCM16 (64k samples)", _wav_pcm16(clip), decode_audio),
        (
            "WAV IMA-ADPCM (64k samples)",
            _wav_ima_payload(clip, _ima_encode),
            decode_audio,
        ),
        (
            "WAV MS-ADPCM (64k samples)",
            _wav_ms(np.asarray(clip), 1, block_align=256),
            decode_audio,
        ),
        (
            "ICO (64x64 DIB entry)",
            _ico([(64, 64, _ico_dib(_big_rgb(64)))]),
            decode_image,
        ),
        ("FLAC verbatim (64k samples)", _flac_verbatim16(clip), decode_audio),
        (
            "WebP VP8L noise (64x64)",
            _webp_noise(),
            decode_image,
        ),
        (
            "WebP VP8L flat+lz77 (256x256)",
            _webp_flat(),
            decode_image,
        ),
        (
            "WebP lossy VP8 (32x24 fixture)",
            ML.ZETA_WEBP_LOSSY,
            decode_image,
        ),
        (
            "WebM VP8 21 keyframes (16x16)",
            ML.VIDEO_WEBM_VP8_21F,
            decode_webm,
        ),
        (
            "Animated WebP 13f lossy (16x16)",
            ML.VIDEO_AWEBP_13F,
            decode_webp_anim,
        ),
        (
            "Ogg-FLAC (64k samples)",
            _ogg_flac_payload(clip),
            decode_audio,
        ),
        (
            "Ogg-Vorbis (64k samples)",
            _ogg_vorbis_payload(clip),
            decode_audio,
        ),
    ]


def _ogg_flac_payload(clip) -> bytes:
    from test_ogg import _ogg_flac

    return _ogg_flac(_flac_verbatim16(clip), final_granule=len(clip),
                     split_audio=4)


def _ogg_vorbis_payload(clip) -> bytes:
    from test_ogg import _mux
    from test_vorbis import encode_pcm_mono

    pkts = encode_pcm_mono(np.asarray(clip, dtype=np.float64) / 32768.0)
    return _mux(pkts, final_granule=len(clip))


def _webp_noise() -> bytes:
    from test_webp import _webp_lossless

    return _webp_lossless(_big_rgb(64), subtract_green=True, cache_bits=8)


def _webp_flat() -> bytes:
    from test_webp import _webp_lossless

    rgb = np.zeros((256, 256, 3), dtype=np.uint8)
    rgb[:, :, 1] = 190
    return _webp_lossless(rgb, lz77=True)


def _wav_ima_payload(clip, ima_encode) -> bytes:
    import struct

    data = ima_encode(np.asarray(clip), 1, 256)
    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 8000, 256, 4)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _out_bytes(result) -> int:
    if result is None:
        raise RuntimeError("decode failed")
    if len(result) == 3 and isinstance(result[2], list):  # video
        return sum(len(f) for f in result[2])
    if len(result) == 3 and hasattr(result[2], "nbytes"):  # audio float64
        return result[2].nbytes
    return len(result[2])  # image rgb bytes


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"{'decoder':34} {'payload':>9} {'in MB/s':>9} {'out MB/s':>9}")
    for name, payload, fn in cases():
        out_b = _out_bytes(fn(payload))  # warm + validate
        n = max(reps, int(2e6 / (len(payload) + 1)))  # small payloads: more reps
        t0 = time.perf_counter()
        for _ in range(n):
            fn(payload)
        dt = (time.perf_counter() - t0) / n
        print(
            f"{name:34} {len(payload):>8}B {len(payload) / dt / 1e6:>9.2f} "
            f"{out_b / dt / 1e6:>9.2f}"
        )


if __name__ == "__main__":
    main()
