"""MRC (.mrc / .st / .map) codec — the electron-microscopy volume
standard the reference routes to bioio-bioformats (the `.mrc`/`.st`
rows of the Bio-Formats long tail; ref README.md:74). Layout per the
public MRC-2014 specification (CCP-EM; the format DeltaVision forked,
so this sits beside formats/dv.py):

- 1024-byte header: nx/ny/nz, mode (0=int8, 1=int16, 2=float32,
  6=uint16), mx/my/mz sampling, cell dimensions in ÅNGSTRÖMS
  (pixel size = xlen/mx), ``MAP `` stamp at 208, machine stamp at
  212 (0x44 0x44 LE / 0x11 0x11 BE), label count + 10x80 labels
- ``nsymbt`` extended-header bytes follow, then nz contiguous
  ny*nx sections — each a planned byte range
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

HEADER_SIZE = 1024
_DTYPE_OF_MODE = {0: "i1", 1: "<i2", 2: "<f4", 6: "<u2"}
_MODE_OF_DTYPE = {"int8": 0, "int16": 1, "float32": 2, "uint16": 6}


def encode_mrc(vol: np.ndarray,
               pixel_size_a: float = 1.0,
               labels: Optional[list] = None) -> bytes:
    """ZYX (or YX) volume -> little-endian MRC-2014 bytes."""
    a = np.ascontiguousarray(vol)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("encode_mrc takes a YX or ZYX volume")
    dt = np.dtype(a.dtype)
    if dt.name not in _MODE_OF_DTYPE:
        raise ValueError(f"MRC encodes {list(_MODE_OF_DTYPE)}, "
                         f"got {dt.name}")
    nz, ny, nx = a.shape
    head = bytearray(HEADER_SIZE)
    struct.pack_into("<3i", head, 0, nx, ny, nz)
    struct.pack_into("<i", head, 12, _MODE_OF_DTYPE[dt.name])
    struct.pack_into("<3i", head, 28, nx, ny, nz)        # mx my mz
    struct.pack_into("<3f", head, 40, pixel_size_a * nx,
                     pixel_size_a * ny, pixel_size_a * nz)
    struct.pack_into("<3f", head, 52, 90.0, 90.0, 90.0)
    struct.pack_into("<3i", head, 64, 1, 2, 3)           # mapc/r/s
    struct.pack_into("<3f", head, 76, float(a.min()), float(a.max()),
                     float(a.mean()))
    struct.pack_into("<i", head, 92, 0)                  # nsymbt
    head[208:212] = b"MAP "
    head[212:216] = b"\x44\x44\x00\x00"                  # LE stamp
    labs = labels or ["bioio-spark MRC-2014"]
    struct.pack_into("<i", head, 220, len(labs))
    for i, lab in enumerate(labs[:10]):
        raw = lab.encode("ascii", errors="replace")[:80]
        head[224 + 80 * i:224 + 80 * i + len(raw)] = raw
    return bytes(head) + a.astype(dt.newbyteorder("<"),
                                  copy=False).tobytes()


def parse_mrc_header(head: bytes) -> dict:
    """First 1024 bytes -> header dict; byte order from the machine
    stamp (falling back to the MAP stamp check)."""
    if len(head) < HEADER_SIZE:
        raise ValueError("truncated MRC file: header under 1024 bytes")
    if head[208:212] != b"MAP ":
        raise ValueError("not an MRC file (no MAP stamp at 208)")
    bo = ">" if head[212] == 0x11 else "<"
    nx, ny, nz, mode = struct.unpack_from(f"{bo}4i", head, 0)
    mx, my, mz = struct.unpack_from(f"{bo}3i", head, 28)
    xlen, ylen, zlen = struct.unpack_from(f"{bo}3f", head, 40)
    (nsymbt,) = struct.unpack_from(f"{bo}i", head, 92)
    if mode not in _DTYPE_OF_MODE:
        raise ValueError(f"unsupported MRC mode {mode}")
    dt = np.dtype(_DTYPE_OF_MODE[mode])
    if bo == ">":
        dt = dt.newbyteorder(">")
    (nlabl,) = struct.unpack_from(f"{bo}i", head, 220)
    labels = []
    for i in range(max(0, min(nlabl, 10))):
        raw = head[224 + 80 * i:224 + 80 * (i + 1)]
        labels.append(raw.rstrip(b"\x00 ").decode(
            "ascii", errors="replace"))
    # pixel size: Å per sample (0 when the cell is unset)
    px_a = xlen / mx if mx else 0.0
    return {
        "nx": nx, "ny": ny, "nz": nz, "mode": mode, "dtype": dt,
        "nsymbt": nsymbt, "pixel_size_a": px_a,
        "data_offset": HEADER_SIZE + nsymbt,
        "section_bytes": ny * nx * dt.itemsize,
        "labels": labels, "bo": bo,
    }


def read_mrc_header(path: str) -> dict:
    with open(path, "rb") as f:
        return parse_mrc_header(f.read(HEADER_SIZE))
