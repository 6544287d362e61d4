"""Pure-Python DeltaVision (.dv / .r3d) codec — the reference's bioio-dv
plugin tier (ref README.md:60).

DV is the MRC subfile variant written by API/GE DeltaVision microscopes,
documented publicly by the Priism/IVE "IM subfile format" notes and
mirrored by the open-source `mrc` readers: a fixed 1024-byte header, an
optional per-section extended header, then `nsec` contiguous YX planes.
Header fields used here (byte offsets, little- or big-endian detected
via the dvid magic):

  0/4/8    nx, ny, nsec (int32)   — plane width/height, total sections
  12       PixelType (int32)      — 0 u1, 1 i2, 2 f4, 4 c8, 6 u2, 7 i4
  40/44/48 dx, dy, dz (float32)   — pixel spacing (µm)
  92       next (int32)           — extended header size in bytes
  96       dvid (int16)           — magic, -16224 (0xC0A0)
  128/130  NumIntegers/NumFloats  — per-section extended-header shape
  180      NumTimes (int16)
  182      ImgSequence (int16)    — 0 ZTW, 1 WZT, 2 ZWT (fastest first)
  196      NumWaves (int16)
  198..206 wave1..wave5 (int16)   — wavelengths (nm); DV waves map to C
  220      NumTitles (int32), 224.. ten 80-byte title slots

nz = nsec / (NumTimes * NumWaves); ImgSequence fixes which of (z, t, w)
varies fastest through the section sequence. Every section is a
contiguous plane at a computable byte offset, so windowed/parallel reads
are pure seek arithmetic — see iter_dv_sections.
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

DV_MAGIC = -16224          # dvid int16 (0xC0A0 little-endian)
HEADER_SIZE = 1024

#: PixelType -> numpy dtype (Priism mode table; 3 = complex int16 and
#: 5 = EM int16 are not emitted by DeltaVision acquisitions)
DTYPE_OF_PIXEL_TYPE = {0: "u1", 1: "i2", 2: "f4", 4: "c8", 6: "u2",
                       7: "i4"}
PIXEL_TYPE_OF_DTYPE = {np.dtype(v).name: k
                       for k, v in DTYPE_OF_PIXEL_TYPE.items()}

#: ImgSequence -> the (fastest, middle, slowest) axes of the section
#: sequence, named over z/t/w
_SEQ_AXES = {0: ("z", "t", "w"), 1: ("w", "z", "t"), 2: ("z", "w", "t")}
SEQUENCE_NAMES = {0: "ZTW", 1: "WZT", 2: "ZWT"}


def parse_dv_header(head: bytes) -> dict:
    """First 1024 bytes -> header dict; detects byte order by the dvid
    magic and validates the section/time/wave factorization."""
    if len(head) < HEADER_SIZE:
        raise ValueError("truncated DV file: header under 1024 bytes")
    for bo in ("<", ">"):
        (dvid,) = struct.unpack(f"{bo}h", head[96:98])
        if dvid == DV_MAGIC:
            break
    else:
        raise ValueError("not a DV file (dvid magic 0xC0A0 not found)")
    nx, ny, nsec, pixel_type = struct.unpack(f"{bo}4i", head[0:16])
    dx, dy, dz = struct.unpack(f"{bo}3f", head[40:52])
    (next_,) = struct.unpack(f"{bo}i", head[92:96])
    n_ints, n_floats = struct.unpack(f"{bo}2h", head[128:132])
    (num_times,) = struct.unpack(f"{bo}h", head[180:182])
    (img_sequence,) = struct.unpack(f"{bo}h", head[182:184])
    (num_waves,) = struct.unpack(f"{bo}h", head[196:198])
    waves = struct.unpack(f"{bo}5h", head[198:208])
    if pixel_type not in DTYPE_OF_PIXEL_TYPE:
        raise ValueError(f"unsupported DV PixelType {pixel_type}")
    if img_sequence not in _SEQ_AXES:
        raise ValueError(f"unsupported DV ImgSequence {img_sequence}")
    num_times = max(1, num_times)
    num_waves = max(1, num_waves)
    if nsec % (num_times * num_waves):
        raise ValueError(
            f"nsec {nsec} not divisible by NumTimes*NumWaves "
            f"{num_times}*{num_waves}")
    return {
        "bo": bo, "nx": nx, "ny": ny, "nsec": nsec,
        "pixel_type": pixel_type,
        "dtype": np.dtype(f"{bo}{DTYPE_OF_PIXEL_TYPE[pixel_type]}"),
        "dx": dx, "dy": dy, "dz": dz,
        "ext_size": next_, "n_ints": n_ints, "n_floats": n_floats,
        "num_times": num_times, "num_waves": num_waves,
        "num_z": nsec // (num_times * num_waves),
        "img_sequence": img_sequence,
        "waves": [w for w in waves[:num_waves]],
        "data_offset": HEADER_SIZE + next_,
    }


def section_index(h: dict, t: int, w: int, z: int) -> int:
    """(t, w, z) -> section number per the header's ImgSequence."""
    fast, mid, slow = _SEQ_AXES[h["img_sequence"]]
    size = {"z": h["num_z"], "t": h["num_times"], "w": h["num_waves"]}
    pos = {"z": z, "t": t, "w": w}
    return (pos[slow] * size[mid] * size[fast]
            + pos[mid] * size[fast] + pos[fast])


def iter_dv_sections(h: dict) -> list[dict]:
    """Per-section plan: ``{t, w, z, offset, nbytes}`` — each section is
    one contiguous YX plane, so a windowed or distributed read seeks
    straight to the planes it needs (the DV analog of TIFF strip
    planning; at scale this is one ranged GET per plane)."""
    plane_bytes = h["nx"] * h["ny"] * h["dtype"].itemsize
    out = []
    for t in range(h["num_times"]):
        for w in range(h["num_waves"]):
            for z in range(h["num_z"]):
                sec = section_index(h, t, w, z)
                out.append({
                    "t": t, "w": w, "z": z,
                    "offset": h["data_offset"] + sec * plane_bytes,
                    "nbytes": plane_bytes,
                })
    return out


def decode_dv(data: bytes):
    """Whole-file decode -> (block TCZYX ndarray, header dict). DV waves
    map to the C axis (the reference's bioio-dv exposes channels the
    same way)."""
    h = parse_dv_header(data[:HEADER_SIZE])
    block = np.empty((h["num_times"], h["num_waves"], h["num_z"],
                      h["ny"], h["nx"]), dtype=h["dtype"])
    for s in iter_dv_sections(h):
        plane = np.frombuffer(
            data[s["offset"]:s["offset"] + s["nbytes"]],
            dtype=h["dtype"]).reshape(h["ny"], h["nx"])
        block[s["t"], s["w"], s["z"]] = plane
    return block.astype(h["dtype"].newbyteorder("=")), h


def encode_dv(block: np.ndarray,
              pixel_sizes: Optional[Sequence[float]] = None,
              waves: Optional[Sequence[int]] = None,
              img_sequence: int = 0,
              title: Optional[str] = None) -> bytes:
    """Encode a TCZYX block as a little-endian DV file (no extended
    header). `pixel_sizes` is (dz, dy, dx) in µm; `waves` the per-channel
    wavelengths (nm, up to 5); `img_sequence` the section order (default
    0 = ZTW, the order DeltaVision acquisitions use)."""
    a = np.asarray(block)
    if a.ndim != 5:
        raise ValueError(f"encode_dv expects 5D TCZYX, got {a.ndim}D")
    name = a.dtype.name
    if name not in PIXEL_TYPE_OF_DTYPE:
        raise ValueError(
            f"DV cannot store dtype {name}; supported: "
            f"{sorted(PIXEL_TYPE_OF_DTYPE)}")
    if img_sequence not in _SEQ_AXES:
        raise ValueError(f"unsupported ImgSequence {img_sequence}")
    t_n, w_n, z_n, ny, nx = a.shape
    if w_n > 5:
        raise ValueError("DV stores at most 5 waves (channels)")
    dz, dy, dx = (float(v) for v in (pixel_sizes or (1.0, 1.0, 1.0)))
    wl = list(waves or [0] * w_n)
    if len(wl) != w_n:
        raise ValueError(f"{len(wl)} wavelengths for {w_n} waves")
    a = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<"),
                                      copy=False))

    head = bytearray(HEADER_SIZE)
    struct.pack_into("<4i", head, 0, nx, ny, t_n * w_n * z_n,
                     PIXEL_TYPE_OF_DTYPE[name])
    struct.pack_into("<3i", head, 28, nx, ny, z_n)      # mx my mz
    struct.pack_into("<3f", head, 40, dx, dy, dz)
    fa = a.real.astype(np.float64)    # header stats are real-valued
    struct.pack_into("<3f", head, 76, float(fa.min()),
                     float(fa.max()), float(fa.mean()))
    struct.pack_into("<i", head, 92, 0)                  # no ext header
    struct.pack_into("<h", head, 96, DV_MAGIC)
    struct.pack_into("<h", head, 180, t_n)
    struct.pack_into("<h", head, 182, img_sequence)
    struct.pack_into("<h", head, 196, w_n)
    struct.pack_into(f"<{w_n}h", head, 198, *[int(v) for v in wl])
    if title:
        tb = title.encode("utf-8")[:80]
        struct.pack_into("<i", head, 220, 1)
        head[224:224 + len(tb)] = tb

    h = parse_dv_header(bytes(head))     # self-check the factorization
    body = bytearray(t_n * w_n * z_n * ny * nx * a.itemsize)
    plane_bytes = ny * nx * a.itemsize
    for t in range(t_n):
        for w in range(w_n):
            for z in range(z_n):
                off = section_index(h, t, w, z) * plane_bytes
                body[off:off + plane_bytes] = a[t, w, z].tobytes()
    return bytes(head) + bytes(body)
