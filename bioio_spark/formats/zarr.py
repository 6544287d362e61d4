"""Pure-Python Zarr v2 chunk codec + OME-NGFF 0.4 metadata helpers.

The reference's second headline plugin is bioio-ome-zarr (ref README.md:66
reader for `.zarr`, :81 OMEZarrWriter for OME-NGFF 0.4/0.5). This module
implements the public Zarr v2 storage spec (zarr-specs v2: `.zarray` /
`.zgroup` JSON documents, C-order chunks, same-stored-shape edge chunks
padded with fill_value, `dimension_separator` "." or "/") and the OME-NGFF
0.4 `multiscales` / `omero` attribute layout — from the published specs
only, with zlib as the compressor (blosc is not in this container; zlib is
a registered numcodecs id).

Zarr is the scale-native format of the pair: a TCZYX array is a CHUNK GRID,
so read/write parallelism is the number of chunks, not the number of files
— at 100 TB this is what lets 1000 executors touch one image concurrently.
"""

from __future__ import annotations

import json
import zlib
from typing import Optional, Sequence

import numpy as np


# -- chunk codec -----------------------------------------------------------

def encode_chunk(block: np.ndarray, compressor: Optional[str] = "zlib",
                 level: int = 1) -> bytes:
    """C-order raw bytes of one FULL-SHAPE chunk, optionally zlib-deflated.

    Zarr v2 stores every chunk with the same shape; callers pad edge
    chunks with fill_value before encoding."""
    raw = np.ascontiguousarray(block).tobytes()
    if compressor == "zlib":
        return zlib.compress(raw, level)
    if compressor is None:
        return raw
    raise ValueError(f"unsupported compressor {compressor!r}")


def decode_chunk(data: bytes, dtype: str | np.dtype,
                 chunk_shape: Sequence[int],
                 compressor: Optional[str] = "zlib") -> np.ndarray:
    if compressor == "zlib":
        data = zlib.decompress(data)
    elif compressor is not None:
        raise ValueError(f"unsupported compressor {compressor!r}")
    return np.frombuffer(data, dtype=np.dtype(dtype)).reshape(
        tuple(chunk_shape))


# -- .zarray / .zgroup documents ------------------------------------------

def build_zarray(shape: Sequence[int], chunks: Sequence[int],
                 dtype: str | np.dtype,
                 compressor: Optional[str] = "zlib",
                 fill_value=0,
                 dimension_separator: str = ".") -> str:
    comp = ({"id": "zlib", "level": 1} if compressor == "zlib" else None)
    return json.dumps({
        "zarr_format": 2,
        "shape": list(int(s) for s in shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": np.dtype(dtype).str,
        "compressor": comp,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    })


def parse_zarray(doc: str) -> dict:
    z = json.loads(doc)
    if z.get("zarr_format") != 2:
        raise ValueError(f"unsupported zarr_format {z.get('zarr_format')}")
    if z.get("order", "C") != "C":
        raise ValueError("only C-order zarr arrays supported")
    if z.get("filters"):
        raise ValueError("zarr filters not supported")
    comp = z.get("compressor")
    if comp is None:
        comp_id = None
    elif isinstance(comp, dict) and comp.get("id") == "zlib":
        comp_id = "zlib"
    else:
        raise ValueError(f"unsupported compressor {comp!r}")
    return {
        "shape": tuple(z["shape"]),
        "chunks": tuple(z["chunks"]),
        "dtype": np.dtype(z["dtype"]),
        "compressor": comp_id,
        "fill_value": z.get("fill_value", 0),
        "dimension_separator": z.get("dimension_separator", "."),
    }


ZGROUP = json.dumps({"zarr_format": 2})


def parse_zarr3_array(doc: str) -> dict:
    """Zarr v3 array `zarr.json` -> the same decode-info dict as
    parse_zarray. Supported codec chains: [bytes] and [bytes, gzip]
    (the v3 spec's required core codecs); chunk keys use the "default"
    encoding ("c" prefix + "/" or "." separator)."""
    z = json.loads(doc)
    if z.get("zarr_format") != 3 or z.get("node_type") != "array":
        raise ValueError("not a zarr v3 array document")
    grid = z.get("chunk_grid", {})
    if grid.get("name", "regular") != "regular":
        raise ValueError("only regular chunk grids supported")
    chunks = tuple(grid.get("configuration", {}).get("chunk_shape", ()))
    codecs = z.get("codecs") or [{"name": "bytes"}]
    names = [c.get("name") for c in codecs]
    endian = "little"
    compressor = None
    if names == ["bytes"]:
        pass
    elif names == ["bytes", "gzip"]:
        compressor = "zlib"     # gzip member decodes via zlib (wbits auto)
    else:
        raise ValueError(f"unsupported zarr v3 codec chain {names}")
    for c in codecs:
        if c.get("name") == "bytes":
            endian = c.get("configuration", {}).get("endian", "little")
    dt = np.dtype(z["data_type"])
    if endian == "big":
        dt = dt.newbyteorder(">")
    enc = z.get("chunk_key_encoding",
                {"name": "default", "configuration": {"separator": "/"}})
    if enc.get("name", "default") != "default":
        raise ValueError("only the default chunk-key encoding supported")
    sep = enc.get("configuration", {}).get("separator", "/")
    return {
        "shape": tuple(z["shape"]),
        "chunks": chunks,
        "dtype": dt,
        "compressor": compressor,
        "fill_value": z.get("fill_value", 0),
        "dimension_separator": sep,
        "key_prefix": "c",      # v3 "default" encoding chunk prefix
        "gzip_member": compressor == "zlib",
    }


def decode_chunk_v3(data: bytes, dtype, chunk_shape,
                    compressor: Optional[str]) -> np.ndarray:
    """v3 twin of decode_chunk: gzip member instead of raw zlib stream."""
    if compressor == "zlib":
        data = zlib.decompress(data, wbits=zlib.MAX_WBITS | 32)  # gzip/zlib
    elif compressor is not None:
        raise ValueError(f"unsupported compressor {compressor!r}")
    return np.frombuffer(data, dtype=np.dtype(dtype)).reshape(
        tuple(chunk_shape))


# -- OME-NGFF 0.4 attributes ----------------------------------------------

_AXIS_TYPES = {"t": "time", "c": "channel", "z": "space", "y": "space",
               "x": "space"}


def _ngff_attrs_dict(image_name: Optional[str],
                     channel_names: Optional[Sequence[str]],
                     physical_pixel_sizes=None,
                     n_levels: int = 1,
                     level_scale: int = 2,
                     version: str = "0.4") -> dict:
    pps = physical_pixel_sizes
    base = [1.0, 1.0,
            float(getattr(pps, "Z", None) or 1.0) if pps else 1.0,
            float(getattr(pps, "Y", None) or 1.0) if pps else 1.0,
            float(getattr(pps, "X", None) or 1.0) if pps else 1.0]
    axes = [{"name": n, "type": _AXIS_TYPES[n]} for n in "tczyx"]
    for ax in axes:
        if ax["type"] == "space":
            ax["unit"] = "micrometer"
    datasets = []
    for lv in range(n_levels):
        f = float(level_scale ** lv)
        datasets.append({
            "path": str(lv),
            "coordinateTransformations": [{
                "type": "scale",
                "scale": base[:3] + [base[3] * f, base[4] * f]}],
        })
    attrs: dict = {"multiscales": [{
        "version": version,
        "name": image_name or "",
        "axes": axes,
        "datasets": datasets,
    }]}
    if channel_names is not None:
        attrs["omero"] = {
            "channels": [{"label": str(n)} for n in channel_names]}
    return attrs


def build_ngff_attrs(image_name: Optional[str],
                     channel_names: Optional[Sequence[str]],
                     physical_pixel_sizes=None,
                     n_levels: int = 1,
                     level_scale: int = 2) -> str:
    """`.zattrs` for one image group: NGFF 0.4 `multiscales` (TCZYX axes,
    per-level scale transforms) + `omero.channels` labels."""
    return json.dumps(_ngff_attrs_dict(
        image_name, channel_names, physical_pixel_sizes,
        n_levels=n_levels, level_scale=level_scale, version="0.4"))


def build_zarr3_group(image_name: Optional[str],
                      channel_names: Optional[Sequence[str]],
                      physical_pixel_sizes=None,
                      n_levels: int = 1,
                      level_scale: int = 2) -> str:
    """Group `zarr.json` for NGFF 0.5 over Zarr v3: the same multiscales
    + omero attributes wrapped under `attributes.ome` (the 0.5 layout
    parse_ngff_attrs already reads)."""
    attrs = _ngff_attrs_dict(
        image_name, channel_names, physical_pixel_sizes,
        n_levels=n_levels, level_scale=level_scale, version="0.5")
    return json.dumps({
        "zarr_format": 3, "node_type": "group",
        "attributes": {"ome": {"version": "0.5", **attrs}}})


def build_zarr3_array(shape: Sequence[int], chunks: Sequence[int],
                      dtype: str | np.dtype,
                      compressor: Optional[str] = "zlib",
                      fill_value=0) -> str:
    """Array `zarr.json` (Zarr v3): little-endian `bytes` codec plus an
    optional `gzip` compressor, regular chunk grid, default '/'-separated
    chunk-key encoding — exactly the chain parse_zarr3_array accepts."""
    codecs: list = [{"name": "bytes",
                     "configuration": {"endian": "little"}}]
    if compressor == "zlib":
        codecs.append({"name": "gzip", "configuration": {"level": 1}})
    elif compressor is not None:
        raise ValueError(f"unsupported compressor {compressor!r}")
    return json.dumps({
        "zarr_format": 3, "node_type": "array",
        "shape": [int(s) for s in shape],
        "data_type": np.dtype(dtype).name,
        "chunk_grid": {"name": "regular",
                       "configuration": {
                           "chunk_shape": [int(c) for c in chunks]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": fill_value,
        "codecs": codecs,
    })


def encode_chunk_v3(block: np.ndarray,
                    compressor: Optional[str] = "zlib",
                    level: int = 1) -> bytes:
    """v3 twin of encode_chunk: little-endian C-order bytes through the
    v3 gzip codec (a real gzip member, not a raw zlib stream)."""
    import gzip as _gzip

    le = np.dtype(block.dtype).newbyteorder("<")
    raw = np.ascontiguousarray(block.astype(le, copy=False)).tobytes()
    if compressor == "zlib":
        return _gzip.compress(raw, level)
    if compressor is None:
        return raw
    raise ValueError(f"unsupported compressor {compressor!r}")


def parse_ngff_attrs(doc: str) -> dict:
    """Extract image name, axes order, level paths, per-axis scale, and
    channel labels from an NGFF `.zattrs` document — 0.4 (top-level
    `multiscales`) or 0.5 (wrapped under `attributes.ome` in the group's
    zarr.json, or passed here as the `ome` sub-object)."""
    a = json.loads(doc)
    if "attributes" in a and "ome" in a.get("attributes", {}):
        a = a["attributes"]["ome"]          # v3 group zarr.json document
    elif "ome" in a and "multiscales" not in a:
        a = a["ome"]                         # bare NGFF 0.5 attributes
    ms = (a.get("multiscales") or [{}])[0]
    # No explicit axes (bare-array doc, or a pre-0.4 multiscales block):
    # return None and let the caller derive 'tczyx'[-rank:] from the
    # array's real shape — defaulting to 5 axes here mis-binds selectors
    # on lower-rank bare stores.
    axes = "".join(ax["name"] for ax in ms.get("axes", [])) or None
    datasets = ms.get("datasets") or [{"path": "0"}]
    scale = None
    ct = (datasets[0].get("coordinateTransformations") or [])
    for tr in ct:
        if tr.get("type") == "scale":
            scale = tr.get("scale")
    channels = None
    if "omero" in a:
        channels = [c.get("label") for c in a["omero"].get("channels", [])]
    return {
        "name": ms.get("name") or None,
        "axes": axes,
        "level_paths": [d["path"] for d in datasets],
        "scale": scale,
        "channel_names": channels,
    }


def chunk_key(indices: Sequence[int], separator: str = ".") -> str:
    return separator.join(str(int(i)) for i in indices)
