"""Build-and-run helpers for the SYSTEM libtiff conformance oracle.

libtiff.so.6 is installed without headers, so the shim declares the
handful of DOCUMENTED public entry points itself (TIFFOpen /
TIFFSetField / TIFFWriteScanline / TIFFReadRGBAImageOriented — a
stable exported ABI) and links -l:libtiff.so.6. ctypes is NOT used
for the writer: TIFFSetField's varargs forwarding to codec pseudo-tags
(PREDICTOR) silently failed to arm the encoder under ctypes/libffi's
non-variadic call path — the tag was written but the data was never
differenced, producing semantically broken files (round-13 finding;
the C shim path differences correctly).

Writer: strip-based gray/RGB/RGBA at 8/16 bits, compression
none/LZW/deflate/PackBits, optional horizontal predictor, palette
images with a formulaic colormap mirrored in expected_tiff_rgb().
Reader: TIFFReadRGBAImageOriented top-left RGBA — the system
decoder's own view of any stream, for cross-decode comparison.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_TIFFSHIM_C = r"""
typedef void TIFF;
extern TIFF* TIFFOpen(const char*, const char*);
extern int TIFFSetField(TIFF*, unsigned int, ...);
extern int TIFFGetField(TIFF*, unsigned int, ...);
extern int TIFFWriteScanline(TIFF*, void*, unsigned int, unsigned short);
extern int TIFFReadRGBAImageOriented(TIFF*, unsigned int, unsigned int,
                                     unsigned int*, int, int);
extern void TIFFClose(TIFF*);
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* w <in.raw> <w> <h> <ch> <bps> <comp> <pred> <rps> <photo> <out.tif>
 *   photo 3 = palette: samples are indices; a formulaic 256-entry
 *   colormap is installed (see expected_tiff_rgb).
 * r <in.tif> <out.raw>  -> "w h\n" + RGBA bytes, top-left origin
 */
int main(int argc, char** argv){
  if (argc < 2) return 2;
  if (argv[1][0]=='w') {
    FILE* f=fopen(argv[2],"rb"); if(!f) return 3;
    int w=atoi(argv[3]), h=atoi(argv[4]), ch=atoi(argv[5]);
    int bps=atoi(argv[6]), comp=atoi(argv[7]), pred=atoi(argv[8]);
    int rps=atoi(argv[9]), photo=atoi(argv[10]);
    TIFF* t = TIFFOpen(argv[11], "w"); if(!t) return 4;
    TIFFSetField(t, 256, w);
    TIFFSetField(t, 257, h);
    TIFFSetField(t, 258, bps);
    TIFFSetField(t, 277, ch);
    TIFFSetField(t, 262, photo);
    TIFFSetField(t, 284, 1);
    TIFFSetField(t, 259, comp);
    if (pred && !TIFFSetField(t, 317, pred)) return 5;
    TIFFSetField(t, 278, rps);
    if (photo==3) {
      static unsigned short r[256], g[256], b[256];
      for (int i=0;i<256;i++){ r[i]=(unsigned short)(i*257);
        g[i]=(unsigned short)(((255-i)*257)); b[i]=(unsigned short)((i*131)%65536); }
      TIFFSetField(t, 320, r, g, b);
    }
    size_t stride=(size_t)w*ch*(bps/8);
    unsigned char* row=malloc(stride);
    for (int y=0;y<h;y++){
      if (fread(row,1,stride,f)!=stride) return 6;
      if (TIFFWriteScanline(t,row,y,0)!=1) return 7;
    }
    TIFFClose(t); fclose(f);
    return 0;
  } else {
    TIFF* t = TIFFOpen(argv[2], "r"); if(!t) return 3;
    unsigned int w=0, h=0;
    if (!TIFFGetField(t, 256, &w) || !TIFFGetField(t, 257, &h)) return 4;
    unsigned int* buf = malloc((size_t)w*h*4);
    if (!TIFFReadRGBAImageOriented(t, w, h, buf, 1 /*TOPLEFT*/, 0)) return 5;
    FILE* o=fopen(argv[3],"wb");
    fprintf(o,"%u %u\n",w,h);
    fwrite(buf,4,(size_t)w*h,o);
    fclose(o); TIFFClose(t);
    return 0;
  }
}
"""

_BUILD: dict | None = None

_LIBTIFF = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"


def build_shim():
    global _BUILD
    if _BUILD is not None:
        return _BUILD or None
    _BUILD = {}
    if not os.path.exists(_LIBTIFF):
        return None
    d = tempfile.mkdtemp(prefix="systiff_")
    try:
        cpath = os.path.join(d, "tiffshim.c")
        with open(cpath, "w") as f:
            f.write(_TIFFSHIM_C)
        r = subprocess.run(
            ["gcc", "-O2", "-o", os.path.join(d, "tiffshim"), cpath,
             "-l:libtiff.so.6"],
            capture_output=True, timeout=60,
        )
        if r.returncode != 0:
            return None
        _BUILD = {"tiffshim": os.path.join(d, "tiffshim"), "dir": d}
        return _BUILD
    except (OSError, subprocess.TimeoutExpired):
        _BUILD = {}
        return None


def sys_encode_tiff(samples: np.ndarray, bps: int = 8, comp: int = 1,
                    pred: int = 0, rps: int = 4,
                    palette: bool = False) -> bytes | None:
    """Encode (h, w[, ch]) uint8/uint16 samples through the system
    libtiff (native-endian 16-bit, matching TIFFWriteScanline's memory
    layout). palette=True writes photometric 3 with the shim's
    formulaic colormap over (h, w) index samples."""
    b = build_shim()
    if b is None:
        return None
    h, w = samples.shape[:2]
    ch = 1 if samples.ndim == 2 else samples.shape[2]
    photo = 3 if palette else (2 if ch >= 3 else 1)
    raw = os.path.join(b["dir"], "in.raw")
    out = os.path.join(b["dir"], "out.tif")
    dt = np.uint16 if bps == 16 else np.uint8
    np.ascontiguousarray(samples, dtype=dt).tofile(raw)
    r = subprocess.run(
        [b["tiffshim"], "w", raw, str(w), str(h), str(ch), str(bps),
         str(comp), str(pred), str(rps), str(photo), out],
        capture_output=True, timeout=60,
    )
    if r.returncode != 0:
        return None
    with open(out, "rb") as f:
        return f.read()


def sys_decode_tiff_rgba(payload: bytes):
    """(w, h, uint8 rgba array) via TIFFReadRGBAImageOriented."""
    b = build_shim()
    if b is None:
        return None
    src = os.path.join(b["dir"], "d.tif")
    dst = os.path.join(b["dir"], "d.raw")
    with open(src, "wb") as f:
        f.write(payload)
    r = subprocess.run([b["tiffshim"], "r", src, dst],
                       capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(dst, "rb") as f:
        data = f.read()
    nl = data.index(b"\n")
    w, h = map(int, data[:nl].split())
    packed = np.frombuffer(data[nl + 1:], dtype="<u4").reshape(h, w)
    rgba = np.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                     (packed >> 16) & 0xFF, (packed >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)
    return w, h, rgba


def shim_palette() -> np.ndarray:
    """The (256, 3) 8-bit palette the shim's 16-bit colormap maps to
    under the package's exact-round 16->8 colormap scaling."""
    i = np.arange(256, dtype=np.int64)
    cols = [i * 257, (255 - i) * 257, (i * 131) % 65536]
    return np.stack(
        [(c * 255 + 32767) // 65535 for c in cols], axis=-1
    ).astype(np.uint8)


def expected_tiff_rgb(samples: np.ndarray, bps: int,
                      palette: bool = False) -> np.ndarray:
    """The package decode_tiff contract on known source samples."""
    if palette:
        return shim_palette()[samples]
    s = samples.astype(np.int64)
    if bps == 16:
        s = (s * 255 + 32767) // 65535
    s = s.astype(np.uint8)
    if s.ndim == 2:
        return np.repeat(s[:, :, None], 3, axis=2)
    return s[:, :, :3]
