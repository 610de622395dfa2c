"""Build-and-run helpers for the SYSTEM libjpeg conformance oracle.

The installed libjpeg (/usr/lib/x86_64-linux-gnu/libjpeg.so.62) is the
third-party ground truth for the package's JPEG decoders — the same
role libwebp plays for VP8 in test_vp8.py. Unlike libwebp, libjpeg's
public API hinges on caller-allocated structs whose size/layout the
library validates (jpeg_CreateDecompress checks sizeof(struct
jpeg_decompress_struct)), so raw ctypes is not viable; instead two
~50-line C shims using only the DOCUMENTED public API are compiled
against the installed headers (/usr/include/jpeglib.h, dev package
present in this image) at test time:

- ``jpegshim e`` encodes raw RGB/gray through the system encoder in
  four entropy modes (baseline / progressive / arithmetic /
  progressive+arithmetic, optional restart interval);
- ``jpegshim d`` decodes any JPEG to raw pixels;
- ``coefshim`` dumps the system decoder's raw DCT coefficient blocks
  (jpeg_read_coefficients) — the ENTROPY-EXACT comparison surface:
  two correct entropy decoders must agree on every coefficient, while
  pixels may differ by spec-legal IDCT/upsampling rounding.

All helpers degrade to None when gcc / headers / library are absent;
tests skip. Pinned library-produced vectors (tools/
gen_sysjpeg_vectors.py) keep the default lane anchored without any of
this installed.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_JPEGSHIM_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
#include <setjmp.h>

struct my_err { struct jpeg_error_mgr pub; jmp_buf jb; };
static void my_exit(j_common_ptr cinfo){ struct my_err* e=(struct my_err*)cinfo->err; longjmp(e->jb,1); }

int main(int argc, char** argv){
  if (argc < 2) return 2;
  if (argv[1][0]=='d') {
    FILE* f=fopen(argv[2],"rb"); if(!f) return 3;
    struct jpeg_decompress_struct c; struct my_err jerr;
    c.err=jpeg_std_error(&jerr.pub); jerr.pub.error_exit=my_exit;
    if (setjmp(jerr.jb)) { return 4; }
    jpeg_create_decompress(&c);
    jpeg_stdio_src(&c,f);
    jpeg_read_header(&c,TRUE);
    jpeg_start_decompress(&c);
    FILE* o=fopen(argv[3],"wb");
    fprintf(o,"%d %d %d\n",c.output_width,c.output_height,c.output_components);
    int stride=c.output_width*c.output_components;
    JSAMPROW row=malloc(stride);
    while(c.output_scanline<c.output_height){ jpeg_read_scanlines(&c,&row,1); fwrite(row,1,stride,o); }
    jpeg_finish_decompress(&c); jpeg_destroy_decompress(&c); fclose(o); fclose(f);
    return 0;
  } else {
    FILE* f=fopen(argv[2],"rb"); if(!f) return 3;
    int w=atoi(argv[3]), h=atoi(argv[4]), comps=atoi(argv[5]), q=atoi(argv[6]);
    char mode=argv[7][0];
    struct jpeg_compress_struct c; struct my_err jerr;
    c.err=jpeg_std_error(&jerr.pub); jerr.pub.error_exit=my_exit;
    if (setjmp(jerr.jb)) { return 4; }
    jpeg_create_compress(&c);
    FILE* o=fopen(argv[8],"wb");
    jpeg_stdio_dest(&c,o);
    c.image_width=w; c.image_height=h; c.input_components=comps;
    c.in_color_space = comps==3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c,q,TRUE);
    if (mode=='p'||mode=='P') jpeg_simple_progression(&c);
    if (mode=='a'||mode=='P') c.arith_code=TRUE;
    if (argc > 9) c.restart_interval = atoi(argv[9]);
    jpeg_start_compress(&c,TRUE);
    int stride=w*comps; JSAMPROW row=malloc(stride);
    for(int y=0;y<h;y++){ if(fread(row,1,stride,f)!=(size_t)stride) return 5; jpeg_write_scanlines(&c,&row,1); }
    jpeg_finish_compress(&c); jpeg_destroy_compress(&c); fclose(o); fclose(f);
    return 0;
  }
}
"""

_COEFSHIM_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
#include <setjmp.h>

struct my_err { struct jpeg_error_mgr pub; jmp_buf jb; };
static void my_exit(j_common_ptr cinfo){ struct my_err* e=(struct my_err*)cinfo->err; longjmp(e->jb,1); }

int main(int argc, char** argv){
  FILE* f=fopen(argv[1],"rb"); if(!f) return 3;
  struct jpeg_decompress_struct c; struct my_err jerr;
  c.err=jpeg_std_error(&jerr.pub); jerr.pub.error_exit=my_exit;
  if (setjmp(jerr.jb)) { return 4; }
  jpeg_create_decompress(&c);
  jpeg_stdio_src(&c,f);
  jpeg_read_header(&c,TRUE);
  jvirt_barray_ptr* ca = jpeg_read_coefficients(&c);
  FILE* o=fopen(argv[2],"wb");
  fprintf(o,"%d\n",c.num_components);
  for (int ci=0; ci<c.num_components; ci++){
    jpeg_component_info* comp=&c.comp_info[ci];
    fprintf(o,"%d %d\n",comp->width_in_blocks,comp->height_in_blocks);
    for (JDIMENSION r=0;r<comp->height_in_blocks;r++){
      JBLOCKARRAY rows=(*c.mem->access_virt_barray)((j_common_ptr)&c,ca[ci],r,1,FALSE);
      fwrite(rows[0],sizeof(JCOEF),64*comp->width_in_blocks,o);
    }
  }
  jpeg_finish_decompress(&c); jpeg_destroy_decompress(&c);
  fclose(o); fclose(f);
  return 0;
}
"""

_BUILD: dict | None = None


def build_shims():
    """Compile both shims once; returns {'jpegshim': path, 'coefshim':
    path, 'dir': tmpdir} or None when the toolchain/headers/library
    are unavailable."""
    global _BUILD
    if _BUILD is not None:
        return _BUILD or None
    _BUILD = {}
    if not os.path.exists("/usr/include/jpeglib.h"):
        _BUILD = {}
        return None
    d = tempfile.mkdtemp(prefix="sysjpeg_")
    try:
        for name, src in (("jpegshim", _JPEGSHIM_C), ("coefshim", _COEFSHIM_C)):
            cpath = os.path.join(d, name + ".c")
            with open(cpath, "w") as f:
                f.write(src)
            r = subprocess.run(
                ["gcc", "-O2", "-o", os.path.join(d, name), cpath, "-ljpeg"],
                capture_output=True, timeout=60,
            )
            if r.returncode != 0:
                _BUILD = {}
                return None
        _BUILD = {"jpegshim": os.path.join(d, "jpegshim"),
                  "coefshim": os.path.join(d, "coefshim"), "dir": d}
        return _BUILD
    except (OSError, subprocess.TimeoutExpired):
        _BUILD = {}
        return None


def sys_encode(img: np.ndarray, quality: int, mode: str,
               restart: int = 0) -> bytes | None:
    """Encode an (h, w, 3) or (h, w) uint8 array through the system
    libjpeg. mode: b=baseline, p=progressive, a=arithmetic,
    P=progressive+arithmetic."""
    b = build_shims()
    if b is None:
        return None
    h, w = img.shape[:2]
    comps = 1 if img.ndim == 2 else img.shape[2]
    raw = os.path.join(b["dir"], "in.raw")
    out = os.path.join(b["dir"], "out.jpg")
    np.ascontiguousarray(img).tofile(raw)
    args = [b["jpegshim"], "e", raw, str(w), str(h), str(comps),
            str(quality), mode, out]
    if restart:
        args.append(str(restart))
    r = subprocess.run(args, capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(out, "rb") as f:
        return f.read()


def sys_decode_pixels(payload: bytes):
    """(w, h, ncomp, uint8 array) via the system decoder, or None."""
    b = build_shims()
    if b is None:
        return None
    src = os.path.join(b["dir"], "d.jpg")
    dst = os.path.join(b["dir"], "d.raw")
    with open(src, "wb") as f:
        f.write(payload)
    r = subprocess.run([b["jpegshim"], "d", src, dst],
                       capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(dst, "rb") as f:
        data = f.read()
    nl = data.index(b"\n")
    w, h, c = map(int, data[:nl].split())
    arr = np.frombuffer(data[nl + 1:], dtype=np.uint8).reshape(h, w, c)
    return w, h, c, arr


def sys_decode_coefs(payload: bytes):
    """[(hb, wb, int16 array[hb, wb, 64] natural order), ...] per
    component via jpeg_read_coefficients, or None."""
    b = build_shims()
    if b is None:
        return None
    src = os.path.join(b["dir"], "c.jpg")
    dst = os.path.join(b["dir"], "c.bin")
    with open(src, "wb") as f:
        f.write(payload)
    r = subprocess.run([b["coefshim"], src, dst],
                       capture_output=True, timeout=60)
    if r.returncode != 0:
        return None
    with open(dst, "rb") as f:
        data = f.read()
    head, rest = data.split(b"\n", 1)
    out = []
    for _ in range(int(head)):
        hdr, rest = rest.split(b"\n", 1)
        wb, hb = map(int, hdr.split())
        nb = wb * hb * 128
        out.append((hb, wb,
                    np.frombuffer(rest[:nb], dtype=np.int16)
                    .reshape(hb, wb, 64).copy()))
        rest = rest[nb:]
    return out


def repo_decode_coefs(payload: bytes):
    """Decode with the PACKAGE decoder, returning per-component
    coefficient blocks in natural order (the jpeg_read_coefficients
    comparison surface), or None."""
    from travel_data_ingestion_spark.llm import jpeg as J

    captured = {}
    orig = J._reconstruct

    def cap(frame, geom, coefs, qt):
        captured["coefs"] = coefs
        return orig(frame, geom, coefs, qt)

    J._reconstruct = cap
    try:
        if J.decode_jpeg(payload) is None:
            return None
    finally:
        J._reconstruct = orig
    zz = list(J._ZIGZAG)
    out = []
    for grid in captured["coefs"]:
        grid = np.asarray(grid)
        nat = np.zeros_like(grid)
        nat[:, :, zz] = grid
        out.append(nat)
    return out


def coefs_match(payload: bytes) -> bool | None:
    """True iff the package decoder reproduces every system-decoder
    coefficient exactly (None when the oracle is unavailable)."""
    ref = sys_decode_coefs(payload)
    if ref is None:
        return None
    rep = repo_decode_coefs(payload)
    if rep is None:
        return False
    for (hb, wb, rb), rp in zip(ref, rep):
        if rp.shape[0] < hb or rp.shape[1] < wb:
            return False
        if not np.array_equal(rp[:hb, :wb], rb):
            return False
    return True
