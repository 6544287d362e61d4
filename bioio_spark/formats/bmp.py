"""Pure-Python BMP codec (Windows DIB, the BITMAPINFOHEADER layout) —
imageio-tier surface: the reference's bioio-imageio plugin lists .bmp
among its everyday raster formats (ref README.md:61 full-list link).

Scope: the uncompressed (BI_RGB) files that cover virtually all wild
BMPs — 8-bit paletted (decoded through the BGRA color table; an
all-gray palette collapses to a 2D grayscale plane), 24-bit BGR, and
32-bit BGRA; top-down (negative height) and the default bottom-up row
orders; 4-byte-aligned row stride. Encode writes 8-bit grayscale
(with the identity gray palette) or 24-bit BGR.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = 14
_INFO_HEADER = 40


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> HxW uint8 (gray) or HxWx3 / HxWx4 uint8 (RGB/RGBA)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing BM magic)")
    (off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", data, 14)
    if hdr_size < _INFO_HEADER:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    (clr_used,) = struct.unpack_from("<I", data, 46)
    if compression != 0:
        raise ValueError(
            f"unsupported BMP compression {compression}; only BI_RGB")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h < 0
    h = abs(h)
    stride = (w * (bpp // 8) + 3) & ~3
    rows = np.frombuffer(
        data[off:off + stride * h], dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_pal = clr_used or 256
        pal = np.frombuffer(
            data[_FILE_HEADER + hdr_size:
                 _FILE_HEADER + hdr_size + 4 * n_pal],
            dtype=np.uint8).reshape(n_pal, 4)      # B G R A quads
        idx = rows[:, :w]
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            return pal[idx, 0]                      # grayscale palette
        return pal[idx][:, :, [2, 1, 0]]            # BGR(A) -> RGB
    px = rows[:, :w * (bpp // 8)].reshape(h, w, bpp // 8)
    if bpp == 24:
        return px[:, :, [2, 1, 0]]                  # BGR -> RGB
    return px[:, :, [2, 1, 0, 3]]                   # BGRA -> RGBA


def encode_bmp(img: np.ndarray) -> bytes:
    """HxW uint8 (gray, written 8-bit paletted) or HxWx3 uint8 (RGB,
    written 24-bit BGR) -> bottom-up BI_RGB BMP bytes."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"BMP encodes uint8, got {a.dtype}")
    if a.ndim == 2:
        h, w = a.shape
        bpp, pal_n = 8, 256
        pal = np.zeros((256, 4), np.uint8)
        pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
        body_rows = a
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        bpp, pal_n = 24, 0
        pal = np.zeros((0, 4), np.uint8)
        body_rows = a[:, :, [2, 1, 0]].reshape(h, w * 3)   # RGB -> BGR
    else:
        raise ValueError(
            f"BMP encodes HxW gray or HxWx3 RGB, got shape {a.shape}")
    stride = (w * (bpp // 8) + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :body_rows.shape[1]] = body_rows
    body = rows[::-1].tobytes()                     # bottom-up
    off = _FILE_HEADER + _INFO_HEADER + 4 * pal_n
    head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", _INFO_HEADER, w, h, 1, bpp,
                       0, len(body), 2835, 2835, pal_n, 0)
    return head + info + pal.tobytes() + body
