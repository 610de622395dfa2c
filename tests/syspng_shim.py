"""Build-and-run helpers for the SYSTEM libpng conformance oracle.

Same role as tests/sysjpeg_shim.py: the installed libpng16
(/usr/lib/x86_64-linux-gnu/libpng16.so.16, headers present) is the
third-party ground truth for the package's PNG decoder. A ~60-line C
shim over the DOCUMENTED write API encodes raw samples into every
legal (color type, bit depth, interlace) combination with libpng's
own filter heuristics and zlib settings — byte streams the package
did not produce — and a reader over the simplified png_image API
cross-decodes 8-bit non-alpha images for byte-identical comparison.

PNG is lossless, so unlike JPEG the conformance bar is PIXEL
equality: the package decode of a libpng-encoded image must equal the
source samples mapped through the package's documented normalization
(sub-byte gray upscale, exact-round 16->8, palette resolution, alpha
drop). Degrades to None (tests skip) without gcc/png.h/libpng.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_PNGSHIM_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

/* w <in.raw> <w> <h> <color> <depth> <interlace> <out.png> [filter]
 *   in.raw: for palette (color 3): 768 palette bytes then 1 index
 *   byte per pixel; otherwise 1 byte per sample (2 BE for depth 16).
 *   Sub-byte depths take 1 byte per sample; png_set_packing packs.
 * r <in.png> <out.raw>   (8-bit RGB, non-alpha images only)
 */
int main(int argc, char** argv){
  if (argc < 2) return 2;
  if (argv[1][0]=='w') {
    FILE* f=fopen(argv[2],"rb"); if(!f) return 3;
    int w=atoi(argv[3]), h=atoi(argv[4]), color=atoi(argv[5]);
    int depth=atoi(argv[6]), interlace=atoi(argv[7]);
    png_structp p=png_create_write_struct(PNG_LIBPNG_VER_STRING,0,0,0);
    png_infop info=png_create_info_struct(p);
    if (setjmp(png_jmpbuf(p))) return 4;
    FILE* o=fopen(argv[8],"wb");
    png_init_io(p,o);
    png_set_IHDR(p,info,w,h,depth,color,interlace,
                 PNG_COMPRESSION_TYPE_DEFAULT,PNG_FILTER_TYPE_DEFAULT);
    png_color pal[256];
    if (color==PNG_COLOR_TYPE_PALETTE) {
      unsigned char pb[768];
      if (fread(pb,1,768,f)!=768) return 5;
      for (int i=0;i<256;i++){pal[i].red=pb[3*i];pal[i].green=pb[3*i+1];pal[i].blue=pb[3*i+2];}
      png_set_PLTE(p,info,pal,depth<8?(1<<depth):256);
    }
    if (argc>9) png_set_filter(p,0,atoi(argv[9]));
    png_write_info(p,info);
    if (depth<8) png_set_packing(p);
    int ch = (color==PNG_COLOR_TYPE_RGB)?3:(color==PNG_COLOR_TYPE_RGBA)?4:
             (color==PNG_COLOR_TYPE_GA)?2:1;
    int bps = depth==16?2:1;
    size_t stride=(size_t)w*ch*bps;
    unsigned char* data=malloc(stride*h);
    if (fread(data,1,stride*h,f)!=stride*h) return 5;
    png_bytep* rows=malloc(sizeof(png_bytep)*h);
    for (int y=0;y<h;y++) rows[y]=data+y*stride;
    png_write_image(p,rows);
    png_write_end(p,info);
    png_destroy_write_struct(&p,&info);
    fclose(o); fclose(f);
    return 0;
  } else {
    png_image im; memset(&im,0,sizeof im);
    im.version=PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&im,argv[2])) return 3;
    im.format=PNG_FORMAT_RGB;
    unsigned char* buf=malloc(PNG_IMAGE_SIZE(im));
    if (!png_image_finish_read(&im,NULL,buf,0,NULL)) return 4;
    FILE* o=fopen(argv[3],"wb");
    fprintf(o,"%u %u\n",im.width,im.height);
    fwrite(buf,1,PNG_IMAGE_SIZE(im),o);
    fclose(o);
    return 0;
  }
}
"""

_BUILD: dict | None = None

# png.h color type numbers
GRAY, RGB, PALETTE, GA, RGBA = 0, 2, 3, 4, 6


def build_shim():
    global _BUILD
    if _BUILD is not None:
        return _BUILD or None
    _BUILD = {}
    if not os.path.exists("/usr/include/png.h"):
        return None
    d = tempfile.mkdtemp(prefix="syspng_")
    try:
        cpath = os.path.join(d, "pngshim.c")
        with open(cpath, "w") as f:
            f.write(_PNGSHIM_C)
        r = subprocess.run(
            ["gcc", "-O2", "-o", os.path.join(d, "pngshim"), cpath, "-lpng"],
            capture_output=True, timeout=60,
        )
        if r.returncode != 0:
            return None
        _BUILD = {"pngshim": os.path.join(d, "pngshim"), "dir": d}
        return _BUILD
    except (OSError, subprocess.TimeoutExpired):
        _BUILD = {}
        return None


def sys_encode_png(samples: np.ndarray, color: int, depth: int,
                   interlace: int, palette: np.ndarray | None = None,
                   filters: int | None = None) -> bytes | None:
    """Encode through the system libpng. ``samples``: (h, w) or
    (h, w, ch) with one uint8 per sample (uint16 for depth 16, written
    big-endian); palette images pass index samples plus a (256, 3)
    palette."""
    b = build_shim()
    if b is None:
        return None
    h, w = samples.shape[:2]
    raw = os.path.join(b["dir"], "in.raw")
    out = os.path.join(b["dir"], "out.png")
    with open(raw, "wb") as f:
        if color == PALETTE:
            assert palette is not None
            f.write(np.ascontiguousarray(palette, dtype=np.uint8).tobytes())
            f.write(np.ascontiguousarray(samples, dtype=np.uint8).tobytes())
        elif depth == 16:
            f.write(np.ascontiguousarray(samples, dtype=">u2").tobytes())
        else:
            f.write(np.ascontiguousarray(samples, dtype=np.uint8).tobytes())
    args = [b["pngshim"], "w", raw, str(w), str(h), str(color),
            str(depth), str(interlace), out]
    if filters is not None:
        args.append(str(filters))
    r = subprocess.run(args, capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(out, "rb") as f:
        return f.read()


def sys_decode_png_rgb(payload: bytes):
    """(w, h, uint8 rgb array) via the system libpng simplified read
    API (PNG_FORMAT_RGB) — for 8-bit non-alpha images only, where the
    conversion is the identity."""
    b = build_shim()
    if b is None:
        return None
    src = os.path.join(b["dir"], "d.png")
    dst = os.path.join(b["dir"], "d.raw")
    with open(src, "wb") as f:
        f.write(payload)
    r = subprocess.run([b["pngshim"], "r", src, dst],
                       capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(dst, "rb") as f:
        data = f.read()
    nl = data.index(b"\n")
    w, h = map(int, data[:nl].split())
    return w, h, np.frombuffer(data[nl + 1:], dtype=np.uint8).reshape(h, w, 3)


def expected_rgb(samples: np.ndarray, color: int, depth: int,
                 palette: np.ndarray | None = None) -> np.ndarray:
    """The package decode_png contract applied to known source
    samples: sub-byte gray upscaled by v*255//(2^d-1), 16-bit by exact
    rounding, palette resolved, alpha dropped, gray replicated."""
    if color == PALETTE:
        rgb = palette[samples]
        return rgb.astype(np.uint8)
    s = samples.astype(np.int64)
    if depth == 16:
        s8 = (s * 255 + 32767) // 65535
    elif depth < 8:
        s8 = s * 255 // ((1 << depth) - 1)
    else:
        s8 = s
    s8 = s8.astype(np.uint8)
    if color == GRAY:
        return np.repeat(s8[:, :, None], 3, axis=2)
    if color == GA:
        return np.repeat(s8[:, :, :1], 3, axis=2)
    if color == RGB:
        return s8
    return s8[:, :, :3]  # RGBA: alpha dropped
