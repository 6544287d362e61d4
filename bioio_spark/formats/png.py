"""Pure-Python baseline PNG codec (stdlib zlib only).

Second real format after TIFF (the reference delegates PNG/JPEG to the
bioio-imageio plugin, ref README.md:54-80). Scope: color types 0
(grayscale), 2 (RGB), 3 (paletted, bit depth 1/2/4/8, optional tRNS
alpha), 4 (gray+alpha), 6 (RGBA); bit depth 8 or 16 for non-paletted;
progressive (Adam7-interlaced) files decode, the encoder writes
non-interlaced. The decoder reconstructs ALL five scanline filters
(None/Sub/Up/Average/Paeth), so files from standard writers decode; the
encoder emits filter 0 rows (types 0 and 2).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(plane: np.ndarray) -> bytes:
    """Encode a 2D uint8/uint16 plane as grayscale PNG, or an (H, W, 3)
    array as RGB (color type 2)."""
    a = np.asarray(plane)
    if a.ndim == 2:
        color, samples = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color, samples = 2, 3
    else:
        raise ValueError(
            f"encode_png expects 2D (grayscale) or (H, W, 3) RGB, got "
            f"shape {a.shape}")
    if a.dtype == np.uint8:
        depth, payload = 8, a
    elif a.dtype == np.uint16:
        depth, payload = 16, a.astype(">u2")
    else:
        raise ValueError(
            f"PNG baseline supports uint8/uint16, got {a.dtype}")
    h, w = a.shape[0], a.shape[1]
    raw = bytearray()
    rows = payload.tobytes()
    stride = w * samples * (depth // 8)
    for r in range(h):
        raw.append(0)                      # filter type 0 (None)
        raw += rows[r * stride:(r + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_SAMPLES_OF_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG -> numpy array: 2D (H, W) for grayscale, 3D
    (H, W, samples) for RGB / gray+alpha / RGBA; uint8 or uint16."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = depth = color = interlace = None
    plte = trns = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"tRNS":
            trns = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    raw_all = zlib.decompress(bytes(idat))
    if color == 3:
        return _decode_paletted(raw_all, width, height, depth,
                                interlace, plte, trns)
    if color not in _SAMPLES_OF_COLOR_TYPE:
        raise ValueError(f"unsupported PNG color type {color} "
                         f"(supported: 0, 2, 3, 4, 6)")
    if depth not in (8, 16):
        raise ValueError(f"only bit depth 8/16 supported, got {depth}")
    samples = _SAMPLES_OF_COLOR_TYPE[color]
    raw = raw_all
    bpp = samples * depth // 8       # filter distance = bytes per pixel
    dt = np.dtype(">u2") if depth == 16 else np.dtype("u1")
    if not interlace:
        out = _defilter(np.frombuffer(raw, dtype=np.uint8),
                        height, width, bpp)
        shape = ((height, width) if samples == 1
                 else (height, width, samples))
        return (np.frombuffer(out.tobytes(), dtype=dt)
                .reshape(shape).astype(dt.newbyteorder("=")))
    # Adam7 (interlace method 1): seven independently-filtered
    # sub-images concatenated in the zlib stream; each pass scatters
    # onto its (y0::ys, x0::xs) lattice of the full image.
    full = np.zeros((height, width, samples),
                    dtype=dt.newbyteorder("="))
    buf = np.frombuffer(raw, dtype=np.uint8)
    pos = 0
    for (x0, y0, xs, ys) in _ADAM7_PASSES:
        w_p = -(-(width - x0) // xs) if width > x0 else 0
        h_p = -(-(height - y0) // ys) if height > y0 else 0
        if w_p == 0 or h_p == 0:
            continue
        n = h_p * (1 + w_p * bpp)
        sub = _defilter(buf[pos:pos + n], h_p, w_p, bpp)
        pos += n
        sub_px = (np.frombuffer(sub.tobytes(), dtype=dt)
                  .reshape(h_p, w_p, samples)
                  .astype(dt.newbyteorder("=")))
        full[y0::ys, x0::xs] = sub_px
    return full[:, :, 0] if samples == 1 else full


#: Adam7 pass lattice: (x_start, y_start, x_step, y_step)
_ADAM7_PASSES = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _defilter(raw: np.ndarray, height: int, n_units: int,
              bpp: int) -> np.ndarray:
    """Undo per-scanline filtering of one (sub-)image -> (h, stride)
    uint8 array. Unfiltering is numpy-vectorized per row: None is a
    copy, Up is one wrapping uint8 add against the prior row, Sub is a
    per-byte-lane cumulative sum mod 256 (x[i] = sum of raw deltas —
    modular addition distributes over the prefix sum). Only Average and
    Paeth keep a sequential per-byte loop (their recurrences read the
    just-reconstructed left neighbor through a non-linear op). A 2k x 2k
    16-bit plane of None/Up/Sub rows therefore costs numpy ops, not ~8M
    interpreted iterations."""
    stride = n_units * bpp
    rows = raw[:height * (stride + 1)].reshape(height, stride + 1)
    ftypes = rows[:, 0]
    bad = set(np.unique(ftypes)) - {0, 1, 2, 3, 4}
    if bad:
        raise ValueError(f"unknown PNG filter type {min(bad)}")
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ftype = ftypes[r]
        line = rows[r, 1:]
        if ftype == 0:      # None
            rec = line.copy()
        elif ftype == 1:    # Sub: per-lane prefix sum mod 256
            lanes = line.reshape(n_units, bpp).astype(np.int64)
            rec = (lanes.cumsum(axis=0) & 0xFF).astype(
                np.uint8).reshape(stride)
        elif ftype == 2:    # Up: wrapping add against prior row
            rec = line + prior
        else:
            rec = np.empty(stride, dtype=np.uint8)
            if ftype == 3:      # Average
                for i in range(stride):
                    left = rec[i - bpp] if i >= bpp else 0
                    rec[i] = (line[i] + ((int(left) + int(prior[i])) >> 1)
                              ) & 0xFF
            else:               # Paeth
                for i in range(stride):
                    left = int(rec[i - bpp]) if i >= bpp else 0
                    ul = int(prior[i - bpp]) if i >= bpp else 0
                    rec[i] = (line[i] + _paeth(left, int(prior[i]), ul)
                              ) & 0xFF
        out[r] = rec
        prior = rec
    return out


def _unpack_indices(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride_bytes) defiltered palette scanlines -> (h, w) uint8
    index plane for bit depth 1/2/4/8 (big-endian bit order per spec)."""
    if depth == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(rows.shape[0], -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (vals * weights).sum(axis=2)[:, :w].astype(np.uint8)


def _decode_paletted(raw: bytes, width: int, height: int, depth: int,
                     interlace: int, plte, trns) -> np.ndarray:
    """Color type 3: defilter the packed index plane (filter unit = one
    byte for depth < 8 per spec), unpack bit-depth-1/2/4/8 indices, and
    map through PLTE -> (H, W, 3) RGB, or (H, W, 4) RGBA when a tRNS
    chunk carries per-index alpha."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette bit depth {depth} unsupported")
    if plte is None:
        raise ValueError("paletted PNG missing its PLTE chunk")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    alpha = None
    if trns is not None:
        alpha = np.full(len(pal), 255, dtype=np.uint8)
        a = np.frombuffer(trns, dtype=np.uint8)
        alpha[:len(a)] = a

    buf = np.frombuffer(raw, dtype=np.uint8)
    idx = np.zeros((height, width), dtype=np.uint8)
    if not interlace:
        stride = (width * depth + 7) // 8
        idx[:] = _unpack_indices(_defilter(buf, height, stride, 1),
                                 width, depth)
    else:
        pos = 0
        for (x0, y0, xs, ys) in _ADAM7_PASSES:
            w_p = -(-(width - x0) // xs) if width > x0 else 0
            h_p = -(-(height - y0) // ys) if height > y0 else 0
            if w_p == 0 or h_p == 0:
                continue
            stride = (w_p * depth + 7) // 8
            n = h_p * (1 + stride)
            idx[y0::ys, x0::xs] = _unpack_indices(
                _defilter(buf[pos:pos + n], h_p, stride, 1), w_p, depth)
            pos += n
    if np.any(idx >= len(pal)):
        raise ValueError("palette index out of range")
    rgb = pal[idx]
    if alpha is None:
        return rgb
    return np.dstack([rgb, alpha[idx]])
