"""DICOM (.dcm) codec — the medical/microscopy imaging standard the
reference routes to bioio-bioformats (the `.dcm` row of the Bio-Formats
long tail; ref README.md:74). Layout per the public DICOM standard
(NEMA PS3.10 file format + PS3.5 data structures):

- 128-byte preamble + ``DICM`` magic, then the File Meta group
  (0002,xxxx; always Explicit VR Little Endian) and the dataset
- this codec speaks Explicit VR Little Endian datasets (the default
  transfer syntax 1.2.840.10008.1.2.1): data elements are
  ``(group u16, element u16, VR 2ch, length)`` with the long-form
  length for OB/OW/SQ/UN/UT
- pixels live in (7FE0,0010) PixelData; NumberOfFrames stacks frames
  CONTIGUOUSLY — frame i is one byte range, the planned-read unit

Attributes modeled: Rows/Columns (0028,0010/0011), BitsAllocated
(0028,0100), PixelRepresentation (0028,0103), SamplesPerPixel
(0028,0002), NumberOfFrames (0028,0008), PixelSpacing (0028,0030),
SpacingBetweenSlices (0018,0088), SeriesDescription (0008,103E).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

MAGIC_OFFSET = 128
TRANSFER_SYNTAX_EXPLICIT_LE = "1.2.840.10008.1.2.1"

_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UN", b"UT"}


def _element(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _str_el(group, elem, vr, text: str) -> bytes:
    return _element(group, elem, vr, text.encode("ascii"))


def encode_dicom(frames: np.ndarray,
                 pixel_spacing_mm: tuple = (1.0, 1.0),
                 slice_spacing_mm: Optional[float] = None,
                 series_description: str = "bioio-spark") -> bytes:
    """NYX (multi-frame) or YX uint8/uint16/int16 array -> Part-10
    DICOM bytes (Explicit VR Little Endian, frames contiguous in
    PixelData)."""
    a = np.ascontiguousarray(frames)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError("encode_dicom takes YX or NYX frames")
    dt = np.dtype(a.dtype)
    if dt.name not in ("uint8", "uint16", "int16"):
        raise ValueError(f"DICOM codec encodes uint8/uint16/int16, "
                         f"got {dt.name}")
    n, rows, cols = a.shape
    bits = dt.itemsize * 8
    signed = 1 if dt.kind == "i" else 0

    meta = b""
    meta += _element(0x0002, 0x0001, b"OB", b"\x00\x01")
    meta += _str_el(0x0002, 0x0010, b"UI", TRANSFER_SYNTAX_EXPLICIT_LE)
    meta_group = _element(0x0002, 0x0000, b"UL",
                          struct.pack("<I", len(meta))) + meta

    ds = b""
    ds += _str_el(0x0008, 0x103E, b"LO", series_description)
    ds += _element(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    ds += _str_el(0x0028, 0x0008, b"IS", str(n))
    ds += _element(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    ds += _element(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds += _str_el(0x0028, 0x0030, b"DS",
                  f"{pixel_spacing_mm[0]}\\{pixel_spacing_mm[1]}")
    if slice_spacing_mm is not None:
        ds += _str_el(0x0018, 0x0088, b"DS", str(slice_spacing_mm))
    ds += _element(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    ds += _element(0x0028, 0x0101, b"US", struct.pack("<H", bits))
    ds += _element(0x0028, 0x0102, b"US", struct.pack("<H", bits - 1))
    ds += _element(0x0028, 0x0103, b"US", struct.pack("<H", signed))
    payload = a.astype(dt.newbyteorder("<"), copy=False).tobytes()
    ds += _element(0x7FE0, 0x0010,
                   b"OW" if bits == 16 else b"OB", payload)
    return b"\x00" * MAGIC_OFFSET + b"DICM" + meta_group + ds


def parse_dicom(path: str) -> dict:
    """Driver-side parse: element walk WITHOUT reading PixelData —
    returns the attribute dict plus ``pixel_offset``/``frame_bytes``
    so each frame is a byte range. A few KB of reads on any size of
    file (PixelData is seek-skipped)."""
    attrs: dict = {}
    with open(path, "rb") as f:
        head = f.read(MAGIC_OFFSET + 4)
        if len(head) < MAGIC_OFFSET + 4 or \
                head[MAGIC_OFFSET:MAGIC_OFFSET + 4] != b"DICM":
            raise ValueError(f"{path}: no DICM magic — not Part-10")
        while True:
            pos = f.tell()
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            group, elem = struct.unpack("<HH", hdr[:4])
            vr = hdr[4:6]
            if vr in _LONG_VRS:
                (length,) = struct.unpack("<I", f.read(4))
                value_off = pos + 12
            else:
                (length,) = struct.unpack("<H", hdr[6:8])
                value_off = pos + 8
            if length == 0xFFFFFFFF:
                raise ValueError(
                    f"{path}: undefined-length (encapsulated/"
                    f"compressed) PixelData not supported — "
                    f"uncompressed Explicit VR LE only")
            if (group, elem) == (0x7FE0, 0x0010):
                attrs["pixel_offset"] = value_off
                attrs["pixel_length"] = length
                f.seek(length, 1)
                continue
            value = f.read(length)
            key = (group, elem)
            if key == (0x0002, 0x0010):
                ts = value.rstrip(b"\x00").decode("ascii")
                if ts != TRANSFER_SYNTAX_EXPLICIT_LE:
                    raise ValueError(
                        f"{path}: transfer syntax {ts} not supported "
                        f"(uncompressed Explicit VR LE only)")
            elif key == (0x0028, 0x0010):
                attrs["rows"] = struct.unpack("<H", value)[0]
            elif key == (0x0028, 0x0011):
                attrs["cols"] = struct.unpack("<H", value)[0]
            elif key == (0x0028, 0x0100):
                attrs["bits"] = struct.unpack("<H", value)[0]
            elif key == (0x0028, 0x0103):
                attrs["signed"] = struct.unpack("<H", value)[0]
            elif key == (0x0028, 0x0002):
                attrs["spp"] = struct.unpack("<H", value)[0]
            elif key == (0x0028, 0x0008):
                attrs["n_frames"] = int(value.strip(b"\x00 ") or b"1")
            elif key == (0x0028, 0x0030):
                parts = value.strip(b"\x00 ").split(b"\\")
                attrs["pixel_spacing"] = tuple(
                    float(p) for p in parts[:2])
            elif key == (0x0018, 0x0088):
                attrs["slice_spacing"] = float(value.strip(b"\x00 "))
            elif key == (0x0008, 0x103E):
                attrs["description"] = value.rstrip(
                    b"\x00 ").decode("ascii", errors="replace")
    for req in ("rows", "cols", "bits", "pixel_offset"):
        if req not in attrs:
            raise ValueError(f"{path}: dataset lacks {req}")
    attrs.setdefault("n_frames", 1)
    attrs.setdefault("signed", 0)
    attrs.setdefault("spp", 1)
    if attrs["spp"] != 1:
        raise ValueError(f"{path}: SamplesPerPixel {attrs['spp']} "
                         f"not supported (grayscale only)")
    itemsize = attrs["bits"] // 8
    attrs["dtype"] = np.dtype(
        f"<{'i' if attrs['signed'] else 'u'}{itemsize}")
    attrs["frame_bytes"] = attrs["rows"] * attrs["cols"] * itemsize
    want = attrs["frame_bytes"] * attrs["n_frames"]
    if attrs["pixel_length"] < want:
        raise ValueError(
            f"{path}: PixelData {attrs['pixel_length']} bytes < "
            f"{want} for {attrs['n_frames']} frames")
    return attrs
