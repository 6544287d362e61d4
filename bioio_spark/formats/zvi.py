"""Zeiss ZVI (.zvi) codec — the AxioVision legacy format the reference
routes to bioio-bioformats (the `.zvi` row of the Bio-Formats long
tail; ref README.md:74). A ZVI is an OLE2 compound document (public
MS-CFB spec — bioio_spark.formats.cfb) whose ``Image`` storage holds
one ``Item(N)`` storage per plane, each with a ``Contents`` stream of
OLE-VARIANT-typed fields followed by a raw pixel block, and a
``Tags/Contents`` stream of (value, tagID, attribute) triples carrying
the plane's coordinate indexes — the layout described by the public
ZVI format specification (v2.0.x) and consumed by Bio-Formats'
ZeissZVIReader.

Implemented subset (documented honestly):
- VARIANT field encoding: u16 VT code + payload for VT_EMPTY/I2/I4/R8/
  BSTR (u32 byte length + UTF-16LE)/BOOL/UI4/BLOB.
- ``Image/Item(N)/Contents``: Version, FileName, Width, Height, Depth,
  PixelFormat, Count, ValidBitsPerPixel fields, then the raw pixel
  block header {Version, Width, Height, Depth, PixelWidth,
  PixelFormat, ValidBitsPerPixel} (7 x u32) + row-major pixels.
- ``Image/Item(N)/Tags/Contents``: Version, Count, then triples; the
  coordinate-index tag group Z=2819, C=2820, T=2821, tile=2822 and the
  scaling-factor group X=769, Y=772, Z=775.
- Pixel formats per the spec's PixelFormat enum: 1=BGR24, 2=BGRA32,
  3=GRAY8, 4=GRAY16, 5=GRAY32, 6=GRAY32F, 7=BGR48, 8=GRAY64F.
  Interleaved BGR samples map to channels in R,G,B(,A) order.

Pixel payloads resolve to SECTOR EXTENTS in the .zvi file at catalog
time — executors seek-read exactly their plane's byte runs (the OIB
pattern, sources/oib_image.py), so no driver pixel IO and no shuffle.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

VT_EMPTY = 0
VT_I2 = 2
VT_I4 = 3
VT_R8 = 5
VT_BSTR = 8
VT_BOOL = 11
VT_UI4 = 19
VT_BLOB = 65

TAG_SCALE_X = 769
TAG_SCALE_Y = 772
TAG_SCALE_Z = 775
TAG_INDEX_Z = 2819
TAG_INDEX_C = 2820
TAG_INDEX_T = 2821
TAG_INDEX_TILE = 2822

# PixelFormat enum -> (numpy dtype, samples per pixel, BGR-interleaved)
PIXEL_FORMATS = {
    1: (np.uint8, 3, True),     # BGR24
    2: (np.uint8, 4, True),     # BGRA32
    3: (np.uint8, 1, False),    # GRAY8
    4: (np.uint16, 1, False),   # GRAY16
    5: (np.int32, 1, False),    # GRAY32
    6: (np.float32, 1, False),  # GRAY32F
    7: (np.uint16, 3, True),    # BGR48
    8: (np.float64, 1, False),  # GRAY64F
}

_GRAY_OF_DTYPE = {"uint8": 3, "uint16": 4, "int32": 5,
                  "float32": 6, "float64": 8}


def _vt(code: int, value) -> bytes:
    out = struct.pack("<H", code)
    if code == VT_EMPTY:
        return out
    if code == VT_I2:
        return out + struct.pack("<h", value)
    if code in (VT_I4,):
        return out + struct.pack("<i", value)
    if code == VT_UI4:
        return out + struct.pack("<I", value)
    if code == VT_R8:
        return out + struct.pack("<d", float(value))
    if code == VT_BOOL:
        return out + struct.pack("<H", 0xFFFF if value else 0)
    if code == VT_BSTR:
        raw = str(value).encode("utf-16-le")
        return out + struct.pack("<I", len(raw)) + raw
    if code == VT_BLOB:
        raw = bytes(value)
        return out + struct.pack("<I", len(raw)) + raw
    raise ValueError(f"unsupported VT code {code}")


def _read_vt(buf: bytes, pos: int) -> tuple:
    """-> (value, new_pos); raises on truncation/unknown VT."""
    if pos + 2 > len(buf):
        raise ValueError("truncated VARIANT field")
    (code,) = struct.unpack_from("<H", buf, pos)
    pos += 2
    if code == VT_EMPTY:
        return None, pos
    if code == VT_I2:
        return struct.unpack_from("<h", buf, pos)[0], pos + 2
    if code == VT_I4:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if code == VT_UI4:
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if code == VT_R8:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if code == VT_BOOL:
        return struct.unpack_from("<H", buf, pos)[0] != 0, pos + 2
    if code in (VT_BSTR, VT_BLOB):
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        raw = buf[pos:pos + n]
        if len(raw) != n:
            raise ValueError("truncated VARIANT payload")
        if code == VT_BSTR:
            return raw.decode("utf-16-le"), pos + n
        return raw, pos + n
    raise ValueError(f"unsupported VT code {code} at offset {pos - 2}")


_RAW_HEADER = struct.Struct("<7I")   # Version, W, H, Depth, PixelWidth,
                                     # PixelFormat, ValidBits


def _item_contents(plane: np.ndarray, pixel_format: int,
                   file_name: str) -> tuple:
    """(stream bytes, pixel payload offset within the stream)."""
    dt, samples, _bgr = PIXEL_FORMATS[pixel_format]
    h, w = plane.shape[:2]
    valid_bits = plane.dtype.itemsize * 8
    head = b"".join([
        _vt(VT_I4, 0x20000000),          # Version
        _vt(VT_BSTR, file_name),
        _vt(VT_I4, w), _vt(VT_I4, h), _vt(VT_I4, 1),   # Depth
        _vt(VT_I4, pixel_format),
        _vt(VT_I4, 1),                   # Count
        _vt(VT_I4, valid_bits),
        _vt(VT_BLOB, b""),               # Others
        _vt(VT_BLOB, b""),               # Layers
        _vt(VT_BLOB, b""),               # Scaling
    ])
    raw = _RAW_HEADER.pack(1, w, h, 1, dt().itemsize * samples,
                           pixel_format, valid_bits)
    payload = np.ascontiguousarray(plane).tobytes()
    return head + raw + payload, len(head) + _RAW_HEADER.size


def _tags_stream(pairs: list) -> bytes:
    body = b"".join(_vt(VT_I4, v) + _vt(VT_I4, tid) + _vt(VT_I4, 0)
                    if not isinstance(v, float) else
                    _vt(VT_R8, v) + _vt(VT_I4, tid) + _vt(VT_I4, 0)
                    for tid, v in pairs)
    return _vt(VT_I4, 0x20000000) + _vt(VT_I4, len(pairs)) + body


def encode_zvi(block: np.ndarray, pixel_format: Optional[int] = None,
               um_per_px: Optional[float] = None,
               z_step_um: Optional[float] = None) -> bytes:
    """TCZYX block -> .zvi bytes. Gray formats emit one Item per
    (t, c, z) plane; BGR formats (pixel_format 1/2/7) pack the C axis
    as interleaved samples, one Item per (t, z)."""
    if block.ndim != 5:
        raise ValueError("encode_zvi takes a TCZYX block")
    t_n, c_n, z_n, y_n, x_n = block.shape
    if pixel_format is None:
        pixel_format = _GRAY_OF_DTYPE.get(block.dtype.name)
        if pixel_format is None:
            raise ValueError(f"no ZVI pixel format for {block.dtype}")
    dt, samples, bgr = PIXEL_FORMATS[pixel_format]
    if block.dtype != dt:
        raise ValueError(
            f"pixel format {pixel_format} holds {np.dtype(dt).name}, "
            f"block is {block.dtype.name}")
    streams = []
    idx = 0

    def _tags(t, c, z):
        pairs = [(TAG_INDEX_Z, z), (TAG_INDEX_C, c), (TAG_INDEX_T, t),
                 (TAG_INDEX_TILE, 0)]
        if idx == 0:
            if um_per_px:
                pairs += [(TAG_SCALE_X, float(um_per_px)),
                          (TAG_SCALE_Y, float(um_per_px))]
            if z_step_um:
                pairs.append((TAG_SCALE_Z, float(z_step_um)))
        return _tags_stream(pairs)

    if bgr:
        if c_n % samples:
            raise ValueError(
                f"pixel format {pixel_format} packs {samples} channels"
                f" per item; block has C={c_n}")
        for t in range(t_n):
            for cb in range(c_n // samples):
                for z in range(z_n):
                    # channels are R,G,B(,A) on the C axis, item cb
                    # owning channel block cb*samples..; ZVI stores
                    # B,G,R(,A) interleaved within each item
                    plane = np.stack(
                        [block[t,
                               cb * samples + (2 - s if s < 3 else s),
                               z]
                         for s in range(samples)], axis=-1)
                    data, _ = _item_contents(plane, pixel_format,
                                             f"plane{idx}.bin")
                    streams.append(
                        (f"Image/Item({idx})/Contents", data))
                    streams.append((f"Image/Item({idx})/Tags/Contents",
                                    _tags(t, cb, z)))
                    idx += 1
    else:
        for t in range(t_n):
            for c in range(c_n):
                for z in range(z_n):
                    data, _ = _item_contents(block[t, c, z],
                                             pixel_format,
                                             f"plane{idx}.bin")
                    streams.append(
                        (f"Image/Item({idx})/Contents", data))
                    streams.append(
                        (f"Image/Item({idx})/Tags/Contents",
                         _tags(t, c, z)))
                    idx += 1
    summary = b"".join([
        _vt(VT_I4, 0x20000000),
        _vt(VT_I4, 0),                       # Type
        _vt(VT_BSTR, "Zeiss Vision Image (ZVI)"),
        _vt(VT_BSTR, ""),
        _vt(VT_I4, x_n), _vt(VT_I4, y_n), _vt(VT_I4, z_n),
        _vt(VT_I4, pixel_format),
        _vt(VT_I4, idx),                     # item count
        _vt(VT_I4, np.dtype(dt).itemsize * 8),
    ])
    from bioio_spark.formats.cfb import build_cfb

    return build_cfb([("Image/Contents", summary)] + streams)


def _parse_summary(buf: bytes) -> dict:
    pos = 0
    version, pos = _read_vt(buf, pos)
    _type, pos = _read_vt(buf, pos)
    desc, pos = _read_vt(buf, pos)
    _fname, pos = _read_vt(buf, pos)
    w, pos = _read_vt(buf, pos)
    h, pos = _read_vt(buf, pos)
    depth, pos = _read_vt(buf, pos)
    pf, pos = _read_vt(buf, pos)
    count, pos = _read_vt(buf, pos)
    valid_bits, pos = _read_vt(buf, pos)
    return {"width": int(w), "height": int(h), "depth": int(depth),
            "pixel_format": int(pf), "count": int(count),
            "valid_bits": int(valid_bits),
            "description": str(desc)}


def _parse_item_header(buf: bytes) -> dict:
    """Parse an Item Contents prefix -> raw-block geometry + the
    offset of the pixel payload within the stream."""
    pos = 0
    _version, pos = _read_vt(buf, pos)
    _fname, pos = _read_vt(buf, pos)
    w, pos = _read_vt(buf, pos)
    h, pos = _read_vt(buf, pos)
    _depth, pos = _read_vt(buf, pos)
    pf, pos = _read_vt(buf, pos)
    _count, pos = _read_vt(buf, pos)
    _vb, pos = _read_vt(buf, pos)
    for _ in range(3):                       # Others, Layers, Scaling
        _blob, pos = _read_vt(buf, pos)
    if pos + _RAW_HEADER.size > len(buf):
        raise ValueError("truncated ZVI raw-block header")
    (_rv, rw, rh, _rd, px_width, rpf,
     _rvb) = _RAW_HEADER.unpack_from(buf, pos)
    if (rw, rh, rpf) != (int(w), int(h), int(pf)):
        raise ValueError(
            f"ZVI raw-block header ({rw}x{rh} fmt {rpf}) disagrees "
            f"with item fields ({w}x{h} fmt {pf})")
    if int(pf) not in PIXEL_FORMATS:
        raise ValueError(f"unsupported ZVI pixel format {pf}")
    return {"width": int(w), "height": int(h),
            "pixel_format": int(pf), "pixel_width": int(px_width),
            "pixel_offset": pos + _RAW_HEADER.size}


def _parse_tags(buf: bytes) -> dict:
    pos = 0
    _version, pos = _read_vt(buf, pos)
    count, pos = _read_vt(buf, pos)
    out = {}
    for _ in range(int(count)):
        value, pos = _read_vt(buf, pos)
        tag_id, pos = _read_vt(buf, pos)
        _attr, pos = _read_vt(buf, pos)
        out[int(tag_id)] = value
    return out


def slice_extents(extents, skip: int, length: int) -> list:
    """Trim (offset, nbytes) runs to the [skip, skip+length) byte
    window of the stream — maps a pixel payload to file byte ranges."""
    out = []
    remaining = length
    for off, n in extents:
        if skip >= n:
            skip -= n
            continue
        take = min(n - skip, remaining)
        out.append((off + skip, take))
        remaining -= take
        skip = 0
        if remaining == 0:
            break
    if remaining:
        raise ValueError(f"extent window overruns stream by "
                         f"{remaining} bytes")
    return out


def read_zvi_catalog(path: str) -> dict:
    """Driver-side catalog: CFB directory + per-item header prefixes +
    coordinate tags — no pixel IO (the D8 contract). Returns dims,
    dtype, physical sizes, and ``planes`` mapping (t, c, z) ->
    (file byte extents of the pixel payload, n_samples, sample_index)
    where BGR items contribute one entry per interleaved sample."""
    from bioio_spark.formats.cfb import CfbFile

    cfb = CfbFile(path)
    names = set(cfb.stream_names())
    if "Image/Contents" not in names:
        raise ValueError(f"{path}: no Image/Contents stream — not ZVI")
    summary = _parse_summary(cfb.read_stream("Image/Contents"))
    pf = summary["pixel_format"]
    if pf not in PIXEL_FORMATS:
        raise ValueError(f"{path}: unsupported ZVI pixel format {pf}")
    dt, samples, bgr = PIXEL_FORMATS[pf]
    items = {}
    scale = {}
    i = 0
    while f"Image/Item({i})/Contents" in names:
        ext = cfb.stream_extents(f"Image/Item({i})/Contents")
        head = _read_prefix(path, ext, 4096)
        hdr = _parse_item_header(head)
        if hdr["pixel_format"] != pf:
            raise ValueError(f"{path}: item {i} pixel format "
                             f"{hdr['pixel_format']} != summary {pf}")
        if (hdr["width"], hdr["height"]) != (summary["width"],
                                             summary["height"]):
            raise ValueError(f"{path}: item {i} is "
                             f"{hdr['width']}x{hdr['height']}, summary "
                             f"says {summary['width']}x"
                             f"{summary['height']}")
        tags_name = f"Image/Item({i})/Tags/Contents"
        tags = (_parse_tags(cfb.read_stream(tags_name))
                if tags_name in names else {})
        if i == 0:
            for tid, key in ((TAG_SCALE_X, "um_per_px"),
                             (TAG_SCALE_Z, "z_step_um")):
                if tid in tags:
                    scale[key] = float(tags[tid])
        n_bytes = (summary["width"] * summary["height"]
                   * np.dtype(dt).itemsize * samples)
        payload = slice_extents(ext, hdr["pixel_offset"], n_bytes)
        key = (int(tags.get(TAG_INDEX_T, 0)),
               int(tags.get(TAG_INDEX_C, 0)),
               int(tags.get(TAG_INDEX_Z, 0)))
        if key in items:
            raise ValueError(f"{path}: duplicate plane coords {key}")
        items[key] = payload
        i += 1
    if i == 0:
        raise ValueError(f"{path}: no Image/Item(N) streams")
    if i != summary["count"]:
        raise ValueError(f"{path}: {i} items, summary declares "
                         f"{summary['count']}")
    t_n = max(k[0] for k in items) + 1
    z_n = max(k[2] for k in items) + 1
    c_base = max(k[1] for k in items) + 1
    c_n = c_base * samples if bgr else c_base
    if len(items) != t_n * c_base * z_n:
        raise ValueError(
            f"{path}: {len(items)} items do not fill the TxCxZ grid "
            f"{t_n}x{c_base}x{z_n}")
    return {
        "size_t": t_n, "size_c": c_n, "size_z": z_n,
        "size_y": summary["height"], "size_x": summary["width"],
        "dtype": np.dtype(dt).name, "pixel_format": pf,
        "samples": samples, "bgr": bgr,
        "um_per_px": scale.get("um_per_px"),
        "z_step_um": scale.get("z_step_um"),
        "description": summary["description"],
        "planes": items,
    }


def _read_prefix(path: str, extents, n: int) -> bytes:
    out = b""
    with open(path, "rb") as f:
        for off, length in extents:
            f.seek(off)
            out += f.read(min(length, n - len(out)))
            if len(out) >= n:
                break
    return out


def decode_zvi(path_or_bytes) -> np.ndarray:
    """Whole-file eager decode -> TCZYX ndarray (test/oracle path; the
    distributed read plan lives in sources/zvi_image.py)."""
    import os
    import tempfile

    if isinstance(path_or_bytes, (bytes, bytearray)):
        with tempfile.NamedTemporaryFile(suffix=".zvi",
                                         delete=False) as f:
            f.write(path_or_bytes)
            tmp = f.name
        try:
            return decode_zvi(tmp)
        finally:
            os.remove(tmp)
    cat = read_zvi_catalog(path_or_bytes)
    dt = np.dtype(cat["dtype"])
    samples = cat["samples"]
    out = np.zeros((cat["size_t"], cat["size_c"], cat["size_z"],
                    cat["size_y"], cat["size_x"]), dtype=dt)
    with open(path_or_bytes, "rb") as f:
        for (t, c, z), ext in cat["planes"].items():
            raw = b""
            for off, n in ext:
                f.seek(off)
                raw += f.read(n)
            plane = np.frombuffer(raw, dtype=dt)
            if cat["bgr"]:
                plane = plane.reshape(cat["size_y"], cat["size_x"],
                                      samples)
                # channel block c*samples..: a multi-channel BGR grid
                # (c_base > 1) maps each item's samples to its OWN
                # channel block — without the offset every item would
                # collide on channels 0..samples-1
                for s in range(samples):
                    mapped = 2 - s if s < 3 else s
                    out[t, c * samples + mapped, z] = plane[..., s]
            else:
                out[t, c, z] = plane.reshape(cat["size_y"],
                                             cat["size_x"])
    return out
