"""MetaMorph STK (.stk) codec — the Molecular Devices stack dialect of
TIFF that the reference routes to bioio-bioformats (the `.stk` row of
the Bio-Formats long tail; ref README.md:74). Layout per the public
"MetaMorph Stack (STK) file" UIC-tag documentation (mirrored by
Bio-Formats' MetamorphReader and tifffile's STK support):

- the file has ONE IFD describing plane 0; the remaining planes'
  pixels are stored CONTIGUOUSLY after plane 0's data with NO IFDs of
  their own — plane i's data starts at
  ``strip_offset_0 + i * plane_bytes``
- private tag 33629 (UIC2) declares ``count = number of planes`` while
  its payload holds SIX u32s per plane (z-distance numerator/
  denominator, creation date/time, modification date/time) — the
  deliberate non-conformance every STK reader special-cases
- tag 33630 (UIC3) holds per-plane wavelength rationals; tag 33628
  (UIC1) is an (id, value) pair list
- planes map to Z when the UIC2 z-distances are nonzero, else to T
  (the Bio-Formats axis rule)
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

UIC1_TAG = 33628
UIC2_TAG = 33629
UIC3_TAG = 33630
UIC4_TAG = 33631


def encode_stk(planes: np.ndarray,
               z_distance: float = 0.0,
               wavelength: float = 0.0,
               description: Optional[str] = None) -> bytes:
    """N-plane (NYX) uint8/uint16/float32 stack -> .stk bytes: one IFD
    for plane 0, planes 1..N-1 appended contiguously, UIC2 declaring N
    with 6-u32-per-plane records, UIC3 wavelength rationals.
    ``z_distance`` > 0 marks the stack as a Z series (the axis rule)."""
    from bioio_spark.formats.tiff_pages import PageSpec, compose_tiff

    if planes.ndim != 3:
        raise ValueError("encode_stk takes an NYX plane stack")
    n = planes.shape[0]
    # z-distance as a rational with 1000 denominator (µm fixed-point)
    znum, zden = int(round(z_distance * 1000)), 1000
    uic2 = b"".join(struct.pack("<6I", znum, zden, 0, 0, 0, 0)
                    for _ in range(n))
    wnum, wden = int(round(wavelength * 1000)), 1000
    uic3 = b"".join(struct.pack("<2I", wnum, wden) for _ in range(n))
    extra = planes[1:].astype(
        planes.dtype.newbyteorder("<"), copy=False).tobytes()
    page = PageSpec(planes[0], description=description,
                    extra_tags=[(UIC2_TAG, 4, uic2, n),
                                (UIC3_TAG, 5, uic3, n),
                                (UIC1_TAG, 4, [0, 0])],
                    extra_data=extra)
    data, layouts = compose_tiff([page])
    # contiguity invariant the reader relies on: plane 1 directly
    # follows plane 0's strip
    plane_bytes = planes[0].nbytes
    if n > 1:
        assert layouts[0]["extra_data_start"] == \
            layouts[0]["chunk_offsets"][0] + plane_bytes
    return data


def _find_tags(path: str, wanted: Sequence[int]) -> dict:
    """Minimal IFD0 entry scan -> {tag: (typ, declared_count,
    payload_offset_or_inline_bytes)} for the UIC tags, WITHOUT the
    standard size=typ*count assumption (UIC2's payload is 24 bytes per
    declared-count unit)."""
    out = {}
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] != b"II" or struct.unpack("<H", head[2:4])[0] != 42:
            raise ValueError(f"{path}: not a classic little-endian TIFF")
        (ifd_off,) = struct.unpack("<I", head[4:8])
        f.seek(ifd_off)
        (n_ent,) = struct.unpack("<H", f.read(2))
        table = f.read(12 * n_ent)
        for i in range(n_ent):
            ent = table[12 * i:12 * (i + 1)]
            tag, typ = struct.unpack("<HH", ent[:4])
            if tag in wanted:
                (count,) = struct.unpack("<I", ent[4:8])
                (off,) = struct.unpack("<I", ent[8:12])
                out[tag] = (typ, count, off)
    return out


def read_stk_catalog(path: str) -> dict:
    """Driver-side STK catalog: the shared IFD walk for page geometry
    plus a UIC-tag scan. Returns ``{n_planes, axis ('Z'|'T'),
    z_distance, wavelength, page, plane_offsets}`` — plane i's pixels
    at ``plane_offsets[i]``, one contiguous plane per offset."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(path)
    pg = pages[0]
    if len(pages) != 1:
        raise ValueError(f"{path}: STK files carry one IFD, "
                         f"got {len(pages)}")
    if pg["comp"] != 1:
        raise ValueError(f"{path}: compressed STK not supported "
                         f"(plane stacking needs raw strips)")
    uic = _find_tags(path, (UIC1_TAG, UIC2_TAG, UIC3_TAG))
    if UIC2_TAG not in uic:
        raise ValueError(f"{path}: no UIC2 tag (33629) — not an STK")
    _typ, n_planes, uic2_off = uic[UIC2_TAG]
    with open(path, "rb") as f:
        f.seek(uic2_off)
        rec = f.read(24 * n_planes)
    if len(rec) < 24 * n_planes:
        raise ValueError(f"{path}: truncated UIC2 records")
    zdists = []
    for i in range(n_planes):
        znum, zden = struct.unpack_from("<2I", rec, 24 * i)
        zdists.append(znum / zden if zden else 0.0)
    wavelength = None
    if UIC3_TAG in uic:
        _t, cnt, off = uic[UIC3_TAG]
        with open(path, "rb") as f:
            f.seek(off)
            buf = f.read(8 * cnt)
        wnum, wden = struct.unpack_from("<2I", buf, 0)
        wavelength = wnum / wden if wden else None
    plane_bytes = (pg["h"] * pg["w"] * pg["spp"]
                   * np.dtype(pg["dtype"]).itemsize)
    base = pg["chunks"][0]["offset"]
    # plane stacking assumes plane 0's strips are contiguous raw bytes
    pos = base
    for ch in pg["chunks"]:
        if ch["offset"] != pos:
            raise ValueError(f"{path}: non-contiguous plane-0 strips "
                             f"break STK plane stacking")
        pos += ch["nbytes"]
    if pos - base != plane_bytes:
        raise ValueError(f"{path}: plane-0 strip bytes {pos - base} != "
                         f"geometry {plane_bytes}")
    axis = "Z" if any(zdists) else "T"
    return {
        "n_planes": n_planes,
        "axis": axis,
        "z_distance": zdists[0] if zdists else 0.0,
        "wavelength": wavelength,
        "page": pg,
        "plane_offsets": [base + i * plane_bytes
                          for i in range(n_planes)],
        "plane_bytes": plane_bytes,
    }
