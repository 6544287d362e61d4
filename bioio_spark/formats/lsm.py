"""Zeiss LSM (.lsm) codec — the laser-scanning-microscope dialect of
TIFF that the reference routes to bioio-bioformats (the `.lsm` row of
the Bio-Formats long tail; ref README.md:74 "bioio-bioformats Full
List"). The container is classic little-endian TIFF; everything
Zeiss-specific lives in private tag 34412 (CZ_LSMINFO), whose layout is
public (Zeiss "LSM File Format" documentation; mirrored by tifffile's
CZ_LSMINFO record and Bio-Formats' ZeissLSMReader):

- pages alternate full-resolution image pages and NewSubfileType=1
  thumbnail pages; image page p maps to (t, z) = divmod(p, DimensionZ)
- channels are stored PlanarConfiguration=2: one strip per channel
  plane inside each page
- CZ_LSMINFO (little-endian struct on IFD0) carries the axis sizes
  (DimensionX/Y/Z/Channels/Time), DataType (1=uint8, 2=12-bit stored
  as uint16, 5=float32), VoxelSize X/Y/Z in METERS, TimeInterval in
  seconds, and absolute file offsets of auxiliary blocks — the channel
  names/colors block at OffsetChannelColors

Only the fields the BioImage catalog needs are modeled; the raw struct
is preserved as scene metadata. Encode exists to build fixtures and
export in the same public layout (two-pass compose so the absolute
OffsetChannelColors lands correctly).
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

CZ_LSMINFO_TAG = 34412
_MAGIC = 0x0400494C
# CZ_LSMINFO fixed head: MagicNumber u32, StructureSize i32, then
# DimensionX/Y/Z/Channels/Time, DataType, ThumbnailX/Y (8 x i32 at
# offset 8), VoxelSizeX/Y/Z + OriginX/Y/Z (6 x f64 at 40, METERS),
# ScanType/SpectralScan (2 x u16 at 88), TypeOfData u32, four block
# offsets at 96 (VectorOverlay, InputLut, OutputLut, ChannelColors),
# TimeInterval f64 at 112 — the subset this codec reads/writes.
_STRUCT_SIZE = 160

_DATA_TYPE_OF_DTYPE = {"uint8": 1, "uint16": 2, "float32": 5}
_DTYPE_OF_DATA_TYPE = {1: "uint8", 2: "uint16", 5: "float32"}


def build_lsm_info(size_x: int, size_y: int, size_z: int, size_c: int,
                   size_t: int, dtype: str,
                   voxel_xyz_m: tuple = (1e-6, 1e-6, 1e-6),
                   time_interval_s: float = 0.0,
                   channel_colors_off: int = 0,
                   scan_type: int = 0,
                   thumb_xy: tuple = (0, 0)) -> bytes:
    """CZ_LSMINFO struct bytes (fixed 160-byte head + zero pad)."""
    if dtype not in _DATA_TYPE_OF_DTYPE:
        raise ValueError(f"LSM DataType supports {_DATA_TYPE_OF_DTYPE}, "
                         f"got {dtype}")
    buf = bytearray(_STRUCT_SIZE)
    struct.pack_into("<Ii", buf, 0, _MAGIC, _STRUCT_SIZE)
    struct.pack_into("<8i", buf, 8, size_x, size_y, size_z, size_c,
                     size_t, _DATA_TYPE_OF_DTYPE[dtype],
                     thumb_xy[0], thumb_xy[1])
    struct.pack_into("<6d", buf, 40, voxel_xyz_m[0], voxel_xyz_m[1],
                     voxel_xyz_m[2], 0.0, 0.0, 0.0)
    struct.pack_into("<HHI", buf, 88, scan_type, 0, 0)
    # offsets: VectorOverlay, InputLut, OutputLut, ChannelColors
    struct.pack_into("<4I", buf, 96, 0, 0, 0, channel_colors_off)
    struct.pack_into("<d", buf, 112, time_interval_s)
    # OffsetChannelDataTypes, OffsetScanInformation, OffsetKsData,
    # OffsetTimeStamps stay 0
    return bytes(buf)


def parse_lsm_info(buf: bytes) -> dict:
    """Decode the CZ_LSMINFO head -> catalog fields."""
    if len(buf) < 120:
        raise ValueError("CZ_LSMINFO truncated")
    magic, size = struct.unpack_from("<Ii", buf, 0)
    if magic & 0xFFFF != 0x494C:            # 'LI'
        raise ValueError(f"bad CZ_LSMINFO magic 0x{magic:08X}")
    (dx, dy, dz, dc, dt, data_type, tx, ty) = struct.unpack_from(
        "<8i", buf, 8)
    vx, vy, vz, ox, oy, oz = struct.unpack_from("<6d", buf, 40)
    scan_type, spectral = struct.unpack_from("<HH", buf, 88)
    off_colors = struct.unpack_from("<4I", buf, 96)[3]
    (time_interval,) = struct.unpack_from("<d", buf, 112)
    return {
        "size_x": dx, "size_y": dy, "size_z": dz, "size_c": dc,
        "size_t": dt,
        "dtype": _DTYPE_OF_DATA_TYPE.get(data_type),
        "data_type": data_type,
        "voxel_m": (vx, vy, vz),
        "scan_type": scan_type,
        "offset_channel_colors": off_colors,
        "time_interval": time_interval,
        "struct_size": size,
    }


def build_channel_colors(names: Sequence[str],
                         colors: Optional[Sequence[int]] = None) -> bytes:
    """The ChannelColors block: s32 BlockSize, NumberColors,
    NumberNames, ColorsOffset, NamesOffset, Mono (offsets relative to
    block start); colors are u32 BGR ints; each name is a u32
    entry-size prefix + NUL-terminated utf-8."""
    n = len(names)
    colors = list(colors) if colors is not None else [0] * n
    name_blobs = []
    for nm in names:
        raw = nm.encode("utf-8") + b"\x00"
        name_blobs.append(struct.pack("<I", len(raw)) + raw)
    names_payload = b"".join(name_blobs)
    colors_off = 24
    names_off = colors_off + 4 * n
    block_size = names_off + len(names_payload)
    return (struct.pack("<6i", block_size, n, n, colors_off,
                        names_off, 0)
            + struct.pack(f"<{n}I", *colors) + names_payload)


def parse_channel_colors(buf: bytes) -> tuple[list[str], list[int]]:
    (block_size, n_colors, n_names, colors_off, names_off,
     _mono) = struct.unpack_from("<6i", buf, 0)
    colors = list(struct.unpack_from(f"<{n_colors}I", buf, colors_off))
    names, pos = [], names_off
    for _ in range(n_names):
        (sz,) = struct.unpack_from("<I", buf, pos)
        raw = buf[pos + 4:pos + 4 + sz]
        names.append(raw.split(b"\x00", 1)[0].decode("utf-8"))
        pos += 4 + sz
    return names, colors


def encode_lsm(block: np.ndarray,
               channel_names: Optional[Sequence[str]] = None,
               voxel_xyz_m: tuple = (1e-6, 1e-6, 1e-6),
               time_interval_s: float = 0.0,
               thumbnails: bool = True,
               scan_type: int = 0,
               lzw: bool = False) -> bytes:
    """TCZYX block -> .lsm bytes (image pages in t-major (t, z) order,
    channels as planar-2 strips, optional 32x32-capped thumbnail pages
    interleaved after each image page, CZ_LSMINFO + ChannelColors on
    IFD0). ``lzw=True`` LZW-compresses the channel strips — the wild
    Zeiss acquisition layout."""
    from bioio_spark.formats.tiff_pages import PageSpec, compose_tiff

    if block.ndim != 5:
        raise ValueError("encode_lsm takes a TCZYX block")
    t_n, c_n, z_n, y_n, x_n = block.shape
    dt = np.dtype(block.dtype)
    if dt.name not in _DATA_TYPE_OF_DTYPE:
        raise ValueError(f"LSM encodes {list(_DATA_TYPE_OF_DTYPE)}, "
                         f"got {dt.name}")
    names = list(channel_names) if channel_names else \
        [f"Ch{i + 1}" for i in range(c_n)]
    if len(names) != c_n:
        raise ValueError("channel_names length != C")
    colors_block = build_channel_colors(names)

    ty, tx = min(32, y_n), min(32, x_n)

    def build(colors_off: int):
        pages = []
        for t in range(t_n):
            for z in range(z_n):
                yxs = np.moveaxis(block[t, :, z], 0, -1)  # YXS
                extra = []
                if t == 0 and z == 0:
                    info = build_lsm_info(
                        x_n, y_n, z_n, c_n, t_n, dt.name,
                        voxel_xyz_m=voxel_xyz_m,
                        time_interval_s=time_interval_s,
                        channel_colors_off=colors_off,
                        scan_type=scan_type,
                        thumb_xy=(tx, ty) if thumbnails else (0, 0))
                    extra = [(CZ_LSMINFO_TAG, 1, info)]
                    pages.append(PageSpec(
                        yxs, planar2=True, extra_tags=extra,
                        extra_data=colors_block, lzw=lzw))
                else:
                    pages.append(PageSpec(yxs, planar2=True, lzw=lzw))
                if thumbnails:
                    thumb = np.ascontiguousarray(
                        yxs[:ty, :tx])
                    pages.append(PageSpec(thumb, planar2=True,
                                          subfile_type=1))
        return compose_tiff(pages)

    _, layouts = build(0)
    data, layouts2 = build(layouts[0]["extra_data_start"])
    assert layouts2[0]["extra_data_start"] == \
        layouts[0]["extra_data_start"]
    return data


def read_lsm_catalog(path: str) -> dict:
    """Driver-side catalog: IFD walk + CZ_LSMINFO + channel names —
    no pixel IO beyond the IFD/struct bytes."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(path, keep_tags=(CZ_LSMINFO_TAG,))
    info_raw = pages[0]["vendor"].get(CZ_LSMINFO_TAG)
    if not info_raw:
        raise ValueError(f"{path}: no CZ_LSMINFO (tag 34412) — not LSM")
    # BYTE-typed tags come back as per-byte int lists from the IFD walk
    buf = bytes(info_raw) if isinstance(info_raw[0], int) \
        else bytes(info_raw[0])
    info = parse_lsm_info(buf)
    names: list[str] = []
    if info["offset_channel_colors"]:
        with open(path, "rb") as f:
            f.seek(info["offset_channel_colors"])
            head = f.read(4)
            (block_size,) = struct.unpack("<i", head)
            buf = head + f.read(max(block_size - 4, 0))
        names, _colors = parse_channel_colors(buf)
    image_pages = [pg for pg in pages if not (pg["subfile"] & 1)]
    z_n = max(info["size_z"], 1)
    if len(image_pages) != max(info["size_t"], 1) * z_n:
        raise ValueError(
            f"{path}: {len(image_pages)} image pages != T*Z "
            f"{info['size_t']}x{z_n}")
    return {"info": info, "pages": image_pages, "channel_names": names}
