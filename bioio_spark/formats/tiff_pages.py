"""Heterogeneous multi-page TIFF composer — the fixture/writer substrate
for the TIFF-container vendor dialects (Zeiss LSM, MetaMorph STK, Aperio
SVS, Leica SCN) whose files mix page layouts the uniform
``formats.tiff.encode_tiff`` cannot express: per-page ImageDescription
strings, tiled and striped pages in one file, PlanarConfiguration=2
channel-plane strips, NewSubfileType-flagged thumbnails, private vendor
tags, and raw data blocks appended contiguously after a page's pixels
(the STK plane stack).

This is a WRITER used to build test fixtures and export files in those
public layouts (TIFF 6.0 structure; dialect specifics cited in each
dialect module); reading goes through the seek-based IFD walk
``formats.tiff.iter_tiff_chunks(keep_tags=...)`` so multi-GB vendor
files still catalog with a few KB of reads and decode executor-side
from planned byte ranges.
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

from bioio_spark.formats.tiff import (
    _BITS_PER_SAMPLE, _COMPRESSION, _IMAGE_DESCRIPTION, _IMAGE_LENGTH,
    _IMAGE_WIDTH, _NEW_SUBFILE_TYPE, _PHOTOMETRIC, _PLANAR_CONFIG,
    _ROWS_PER_STRIP, _SAMPLE_FORMAT, _SAMPLE_FORMAT_OF_KIND,
    _SAMPLES_PER_PIXEL, _STRIP_BYTE_COUNTS, _STRIP_OFFSETS,
    _TILE_BYTE_COUNTS, _TILE_LENGTH, _TILE_OFFSETS, _TILE_WIDTH,
    _TYPE_ASCII, _TYPE_LONG, _TYPE_SHORT, _TYPE_SIZES,
)

_TYPE_RATIONAL = 5


def _pack_values(typ: int, values) -> bytes:
    """Tag payload bytes for a values list (or raw bytes passthrough)."""
    if isinstance(values, (bytes, bytearray)):
        return bytes(values)
    if typ == _TYPE_ASCII:
        out = values[0].encode("utf-8") if isinstance(values[0], str) \
            else bytes(values[0])
        return out + b"\x00"
    if typ == _TYPE_RATIONAL:
        out = b""
        for num, den in values:
            out += struct.pack("<II", num, den)
        return out
    fmt = {1: "B", _TYPE_SHORT: "H", _TYPE_LONG: "I",
           11: "f", 12: "d"}[typ]
    return struct.pack(f"<{len(values)}{fmt}", *values)


class PageSpec:
    """One page of a composed TIFF.

    array: 2D YX or 3D YXS ndarray (uncompressed unless jpeg=True)
    description: this page's ImageDescription (vendor dialects use
        per-page strings — e.g. the Aperio pipe-metadata)
    tile: (th, tw) -> TIFF 6.0 §15 tiled layout (multiples of 16)
    planar2: True -> PlanarConfiguration=2, one strip per SAMPLE plane
        (the LSM channel layout); array must be YXS
    subfile_type: NewSubfileType value (1 flags a thumbnail page)
    extra_tags: [(tag, type, values-or-bytes)] private vendor entries
    extra_data: raw bytes appended CONTIGUOUSLY after this page's pixel
        data (the STK plane stack lives there); the returned layout
        records where it landed
    jpeg: compress each strip/tile as a baseline JPEG chunk
        (compression 7, uint8 gray/RGB — the Aperio layout)
    lzw: compress each strip/tile with TIFF 6.0 §13 LZW (compression
        5 — the wild Zeiss LSM layout)
    """

    def __init__(self, array: np.ndarray,
                 description: Optional[str] = None,
                 tile: Optional[tuple] = None,
                 planar2: bool = False,
                 subfile_type: Optional[int] = None,
                 extra_tags: Sequence[tuple] = (),
                 extra_data: bytes = b"",
                 jpeg: bool = False,
                 lzw: bool = False):
        self.array = np.ascontiguousarray(array)
        self.description = description
        self.tile = tile
        self.planar2 = planar2
        self.subfile_type = subfile_type
        self.extra_tags = list(extra_tags)
        self.extra_data = extra_data
        self.jpeg = jpeg
        self.lzw = lzw
        if planar2 and (self.array.ndim != 3 or tile is not None):
            raise ValueError("planar2 pages are striped YXS arrays")
        if tile is not None and (tile[0] % 16 or tile[1] % 16):
            raise ValueError(f"tile dims must be multiples of 16: {tile}")
        if jpeg and self.array.dtype != np.uint8:
            raise ValueError("jpeg pages are uint8")
        if jpeg and lzw:
            raise ValueError("pick one compression")


def _page_chunks(p: PageSpec) -> list[bytes]:
    """Pixel payload chunks in file order (strips or row-major tiles)."""
    a = p.array
    if p.tile is not None:
        th, tw = p.tile
        h, w = a.shape[:2]
        chunks = []
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                t = a[ty:ty + th, tx:tx + tw]
                # edge tiles stored full-size, zero-padded (TIFF §15)
                if t.shape[0] != th or t.shape[1] != tw:
                    pad = [(0, th - t.shape[0]), (0, tw - t.shape[1])]
                    if a.ndim == 3:
                        pad.append((0, 0))
                    t = np.pad(t, pad)
                chunks.append(np.ascontiguousarray(t))
        arrs = chunks
    elif p.planar2:
        arrs = [np.ascontiguousarray(a[:, :, s])
                for s in range(a.shape[2])]
    else:
        arrs = [a]
    if p.jpeg:
        from bioio_spark.formats.jpeg import encode_jpeg
        return [encode_jpeg(np.ascontiguousarray(c), quality=95,
                            subsampling="444") for c in arrs]
    le = a.dtype.newbyteorder("<")
    if p.lzw:
        from bioio_spark.formats.tiff import lzw_encode
        return [lzw_encode(c.astype(le, copy=False).tobytes())
                for c in arrs]
    return [c.astype(le, copy=False).tobytes() for c in arrs]


def compose_tiff(pages: Sequence[PageSpec]) -> tuple[bytes, list[dict]]:
    """Compose a classic little-endian TIFF from heterogeneous pages.

    Returns (file bytes, per-page layout dicts ``{data_start,
    extra_data_start, chunk_offsets}``) so dialect writers can point
    private tags (e.g. STK UIC offsets) at known file positions.
    Layout per page: [chunk payloads][extra_data], then after all
    pages' data: [descriptions + out-of-line tag arrays + IFDs],
    IFDs chained in page order.
    """
    if not pages:
        raise ValueError("compose_tiff requires at least one page")
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    layouts: list[dict] = []
    page_chunks: list[list[bytes]] = []
    for p in pages:
        chunks = _page_chunks(p)
        lay = {"data_start": len(out), "chunk_offsets": []}
        for c in chunks:
            lay["chunk_offsets"].append(len(out))
            out.extend(c)
            if len(out) % 2:
                out.append(0)
        lay["extra_data_start"] = len(out)
        out.extend(p.extra_data)
        if len(out) % 2:
            out.append(0)
        layouts.append(lay)
        page_chunks.append(chunks)

    prev_next_ptr = 4  # header's IFD0 offset field
    for p, lay, chunks in zip(pages, layouts, page_chunks):
        a = p.array
        h, w = a.shape[:2]
        spp = a.shape[2] if a.ndim == 3 else 1
        kind = _SAMPLE_FORMAT_OF_KIND[a.dtype.kind]
        bits = a.dtype.itemsize * 8

        # (tag, typ, values, payload_bytes_or_None)
        entries: list[tuple] = [
            (_IMAGE_WIDTH, _TYPE_LONG, [w], None),
            (_IMAGE_LENGTH, _TYPE_LONG, [h], None),
            (_BITS_PER_SAMPLE, _TYPE_SHORT, [bits] * spp,
             _pack_values(_TYPE_SHORT, [bits] * spp)),
            (_COMPRESSION, _TYPE_SHORT,
             [7 if p.jpeg else 5 if p.lzw else 1], None),
            (_PHOTOMETRIC, _TYPE_SHORT, [2 if spp == 3 else 1], None),
            (_SAMPLES_PER_PIXEL, _TYPE_SHORT, [spp], None),
            (_SAMPLE_FORMAT, _TYPE_SHORT, [kind] * spp,
             _pack_values(_TYPE_SHORT, [kind] * spp)),
        ]
        if p.subfile_type is not None:
            entries.append((_NEW_SUBFILE_TYPE, _TYPE_LONG,
                            [p.subfile_type], None))
        if p.description is not None:
            entries.append((_IMAGE_DESCRIPTION, _TYPE_ASCII, None,
                            _pack_values(_TYPE_ASCII, [p.description])))
        offs = lay["chunk_offsets"]
        counts = [len(c) for c in chunks]
        if p.tile is not None:
            th, tw = p.tile
            entries += [
                (_TILE_WIDTH, _TYPE_LONG, [tw], None),
                (_TILE_LENGTH, _TYPE_LONG, [th], None),
                (_TILE_OFFSETS, _TYPE_LONG, offs,
                 _pack_values(_TYPE_LONG, offs)),
                (_TILE_BYTE_COUNTS, _TYPE_LONG, counts,
                 _pack_values(_TYPE_LONG, counts)),
            ]
        else:
            entries += [
                (_ROWS_PER_STRIP, _TYPE_LONG, [h], None),
                (_STRIP_OFFSETS, _TYPE_LONG, offs,
                 _pack_values(_TYPE_LONG, offs)),
                (_STRIP_BYTE_COUNTS, _TYPE_LONG, counts,
                 _pack_values(_TYPE_LONG, counts)),
                (_PLANAR_CONFIG, _TYPE_SHORT,
                 [2 if p.planar2 else 1], None),
            ]
        for ext in p.extra_tags:
            tag, typ, values = ext[0], ext[1], ext[2]
            payload = _pack_values(typ, values)
            if len(ext) > 3:
                # explicit declared count — the MetaMorph STK quirk:
                # UIC2 declares count = n_planes while carrying 6*N
                # LONGs of per-plane records at the offset
                count = ext[3]
            elif isinstance(values, (bytes, bytearray)):
                count = len(values) if typ in (1, _TYPE_ASCII) else \
                    len(values) // _TYPE_SIZES[typ]
            elif typ == _TYPE_ASCII:
                count = len(payload)
            else:
                count = len(values)
            entries.append((tag, typ, None, payload, count))

        # out-of-line payloads first, then the IFD entry table
        ifd_entries: list[bytes] = []
        for ent in sorted(entries, key=lambda e: e[0]):
            tag, typ = ent[0], ent[1]
            values, payload = ent[2], ent[3]
            count = ent[4] if len(ent) > 4 else (
                len(payload) if typ == _TYPE_ASCII else len(values))
            nbytes = _TYPE_SIZES[typ] * count
            if payload is not None and (nbytes > 4 or len(payload) > 4):
                if len(out) % 2:
                    out.append(0)
                off = len(out)
                out.extend(payload)
                ifd_entries.append(
                    struct.pack("<HHII", tag, typ, count, off))
            else:
                inline = payload if payload is not None else \
                    _pack_values(typ, values)
                inline = inline[:4] + b"\x00" * (4 - min(len(inline), 4))
                ifd_entries.append(
                    struct.pack("<HHI", tag, typ, count) + inline)
        if len(out) % 2:
            out.append(0)
        ifd_off = len(out)
        struct.pack_into("<I", out, prev_next_ptr, ifd_off)
        out.extend(struct.pack("<H", len(ifd_entries)))
        out.extend(b"".join(ifd_entries))
        prev_next_ptr = len(out)
        out.extend(struct.pack("<I", 0))  # next-IFD, patched by successor
    return bytes(out), layouts
