"""Reference native-codec adapter: system libheif for AVIF/HEIC.

This module is the documented codec swap path
(``llm/multimodal.py``'s hook block) made concrete. It is NOT imported
by default — the engine's shipped decode surface stays pure-Python —
but a deployment whose workers have the public ``libheif`` shared
library (which fronts libde265/dav1d/libaom for HEVC/AV1 payloads, as
this container's does) turns on real AVIF/HEIC pixel decode with:

    SPARK_GRAFT_CODEC_MODULE=travel_data_ingestion_spark.llm.native_codecs

or, in-process, ``register_image_codec(native_codecs.image_codec)``.
Every kernel (features, pHash dedup, resize, clustering) and every
oracle is untouched: the adapter returns the same ``(w, h, rgb_bytes)``
tuple the pure decoders do and *declines* (returns None for) anything
that is not a HEIF-brand ISOBMFF payload, so PNG/JPEG/... still flow
through the pure decoders and a worker without the library simply
leaves the hook unset (import of this module fails loudly only when
explicitly requested via the env var — the documented contract).

ctypes-only binding, no pip packages; the few enum values used
(colorspace RGB=1, chroma interleaved-RGB=10) are from the public
libheif C API header. Tests (tests/test_isobmff.py) verify the adapter
against images ENCODED by the same library and pin the drop-in
contract through extract_features/phash.
"""

from __future__ import annotations

import ctypes as C

_LIB = None
_FNS: dict = {}


class _HeifError(C.Structure):
    _fields_ = [("code", C.c_int), ("subcode", C.c_int),
                ("message", C.c_char_p)]


def _lib():
    global _LIB
    if _LIB is None:
        lib = None
        for name in ("libheif.so.1", "libheif.so", "libheif.1.dylib"):
            try:
                lib = C.CDLL(name)
                break
            except OSError:
                continue
        if lib is None:
            raise OSError("libheif not available on this worker")

        def sig(n, res, args):
            f = getattr(lib, n)
            f.restype = res
            f.argtypes = args
            _FNS[n] = f

        sig("heif_context_alloc", C.c_void_p, [])
        sig("heif_context_free", None, [C.c_void_p])
        sig("heif_context_read_from_memory", _HeifError,
            [C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p])
        sig("heif_context_get_primary_image_handle", _HeifError,
            [C.c_void_p, C.POINTER(C.c_void_p)])
        sig("heif_image_handle_release", None, [C.c_void_p])
        sig("heif_image_handle_get_width", C.c_int, [C.c_void_p])
        sig("heif_image_handle_get_height", C.c_int, [C.c_void_p])
        sig("heif_decode_image", _HeifError,
            [C.c_void_p, C.POINTER(C.c_void_p), C.c_int, C.c_int,
             C.c_void_p])
        sig("heif_image_release", None, [C.c_void_p])
        sig("heif_image_get_plane_readonly", C.POINTER(C.c_uint8),
            [C.c_void_p, C.c_int, C.POINTER(C.c_int)])
        _LIB = lib
    return _LIB


_HEIF_BRANDS = (b"avif", b"avis", b"heic", b"heix", b"hevc", b"mif1",
                b"msf1", b"heim", b"heis")


def image_codec(payload: bytes):
    """decode_image contract: (width, height, rgb_bytes) for AVIF/HEIC
    payloads via libheif; None (decline) for everything else or on any
    decode error — the pure path then handles/stubs it."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    if payload[8:12] not in _HEIF_BRANDS:
        return None
    try:
        _lib()
    except OSError:
        return None
    f = _FNS
    ctx = f["heif_context_alloc"]()
    handle = C.c_void_p()
    img = C.c_void_p()
    try:
        buf = C.create_string_buffer(payload, len(payload))
        if f["heif_context_read_from_memory"](
            ctx, buf, len(payload), None
        ).code:
            return None
        if f["heif_context_get_primary_image_handle"](
            ctx, C.byref(handle)
        ).code:
            return None
        w = f["heif_image_handle_get_width"](handle)
        h = f["heif_image_handle_get_height"](handle)
        if not (0 < w <= 1 << 15 and 0 < h <= 1 << 15):
            return None
        # colorspace RGB (1), chroma interleaved 24-bit RGB (10)
        if f["heif_decode_image"](handle, C.byref(img), 1, 10, None).code:
            return None
        stride = C.c_int()
        p = f["heif_image_get_plane_readonly"](img, 10, C.byref(stride))
        if not p:
            return None
        s = stride.value
        raw = C.string_at(p, s * h)
        if s == w * 3:
            rgb = raw
        else:
            rgb = b"".join(
                raw[r * s : r * s + w * 3] for r in range(h)
            )
        return w, h, rgb
    finally:
        if img:
            f["heif_image_release"](img)
        if handle:
            f["heif_image_handle_release"](handle)
        f["heif_context_free"](ctx)
