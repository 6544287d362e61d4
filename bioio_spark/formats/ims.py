"""Imaris IMS (.ims) codec — the Bitplane HDF5-based microscopy format
that the reference routes to bioio-bioformats (the `.ims` row of the
Bio-Formats long tail; ref README.md:74). The layout is public
(Bitplane "Imaris 5.5 open file format" description, mirrored by the
open imaris readers and Bio-Formats' ImarisHDFReader):

- ``/DataSet/ResolutionLevel r/TimePoint t/Channel c/Data``: one ZYX
  dataset per (level, time, channel)
- ``/DataSetInfo/Image``: char-array attributes ``X``/``Y``/``Z``
  (logical sizes — datasets may be padded) and ``ExtMin*``/``ExtMax*``
  physical extents in µm
- ``/DataSetInfo/Channel c``: ``Name`` (+ display attributes)
- ``/DataSetInfo/TimeInfo``: timepoint stamps

Container IO runs on the in-repo native HDF5 subset codec
(bioio_spark.formats.hdf5) — no h5py/libhdf5. Contiguous datasets
resolve to byte extents, so a Z plane is one contiguous range — the
planned-read unit. Gzip-chunked wild files resolve to per-chunk plans
through the same codec.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def encode_ims(block: np.ndarray,
               channel_names: Optional[Sequence[str]] = None,
               pps_zyx_um: tuple = (1.0, 1.0, 1.0),
               n_levels: int = 1,
               chunks: Optional[tuple] = None,
               gzip: bool = False) -> bytes:
    """TCZYX block -> .ims bytes (levels 1.. are ceil-half Y/X block
    means, the catalog's level-dim rule). Default layout is contiguous
    Data datasets; ``chunks=(cz, cy, cx)`` (+``gzip=True``) writes the
    v1-B-tree chunked/deflate layout wild Imaris files use."""
    from bioio_spark.formats.hdf5 import H5Node, build_hdf5
    from bioio_spark.formats.svs import _halve

    if block.ndim != 5:
        raise ValueError("encode_ims takes a TCZYX block")
    t_n, c_n, z_n, y_n, x_n = block.shape
    names = list(channel_names) if channel_names else \
        [f"Channel {i}" for i in range(c_n)]
    if len(names) != c_n:
        raise ValueError("channel_names length != C")

    root = H5Node()
    root.attrs["ImarisVersion"] = b"5.5.0"
    root.attrs["DataSetDirectoryName"] = b"DataSet"
    ds = root.group("DataSet")
    for r in range(n_levels):
        rl = ds.group(f"ResolutionLevel {r}")
        for t in range(t_n):
            tp = rl.group(f"TimePoint {t}")
            for c in range(c_n):
                stack = block[t, c]
                for _ in range(r):
                    stack = np.stack([_halve(p) for p in stack])
                ch = tp.group(f"Channel {c}")
                ch.attrs["ImageSizeX"] = str(stack.shape[2]).encode()
                ch.attrs["ImageSizeY"] = str(stack.shape[1]).encode()
                ch.attrs["ImageSizeZ"] = str(stack.shape[0]).encode()
                ch.dataset("Data", stack, chunks=chunks, gzip=gzip)
    info = root.group("DataSetInfo")
    img = info.group("Image")
    img.attrs["X"] = str(x_n).encode()
    img.attrs["Y"] = str(y_n).encode()
    img.attrs["Z"] = str(z_n).encode()
    img.attrs["Unit"] = b"um"
    pz, py, px = pps_zyx_um
    img.attrs["ExtMin0"] = b"0"
    img.attrs["ExtMin1"] = b"0"
    img.attrs["ExtMin2"] = b"0"
    img.attrs["ExtMax0"] = repr(px * x_n).encode()
    img.attrs["ExtMax1"] = repr(py * y_n).encode()
    img.attrs["ExtMax2"] = repr(pz * z_n).encode()
    for c, nm in enumerate(names):
        info.group(f"Channel {c}").attrs["Name"] = nm.encode()
    ti = info.group("TimeInfo")
    ti.attrs["DatasetTimePoints"] = str(t_n).encode()
    return build_hdf5(root)


def read_ims_catalog(path: str) -> dict:
    """Driver-side catalog: sizes/extents/channel names from
    /DataSetInfo, per-(r, t, c) dataset plans from the HDF5 layout
    messages — attribute + B-tree reads only, no pixel IO."""
    from bioio_spark.formats.hdf5 import H5Reader

    with H5Reader(path) as r:
        img = r.attrs("DataSetInfo/Image")
        size_x = int(img["X"])
        size_y = int(img["Y"])
        size_z = int(img["Z"])
        pps = None
        try:
            ex = [float(img[f"ExtMax{i}"]) - float(img[f"ExtMin{i}"])
                  for i in range(3)]
            pps = (ex[2] / size_z if size_z else None,
                   ex[1] / size_y if size_y else None,
                   ex[0] / size_x if size_x else None)
        except (KeyError, ValueError):
            pass
        names = []
        ci = 0
        while True:
            try:
                names.append(str(
                    r.attrs(f"DataSetInfo/Channel {ci}")["Name"]))
                ci += 1
            except KeyError:
                break
        levels = sorted(
            int(n.split()[-1])
            for n in r.list_children("DataSet")
            if n.startswith("ResolutionLevel"))
        tps = sorted(
            int(n.split()[-1])
            for n in r.list_children("DataSet/ResolutionLevel 0")
            if n.startswith("TimePoint"))
        chans = sorted(
            int(n.split()[-1])
            for n in r.list_children(
                "DataSet/ResolutionLevel 0/TimePoint 0")
            if n.startswith("Channel"))
        if names and len(names) != len(chans):
            names = names[:len(chans)]
        datasets = {}
        for lv in levels:
            for t in tps:
                for c in chans:
                    p = (f"DataSet/ResolutionLevel {lv}/TimePoint {t}"
                         f"/Channel {c}/Data")
                    datasets[(lv, t, c)] = r.dataset_info(p)
        return {
            "size_t": len(tps), "size_c": len(chans), "size_z": size_z,
            "size_y": size_y, "size_x": size_x,
            "n_levels": len(levels),
            "channel_names": names or None,
            "pps_zyx": pps,
            "datasets": datasets,
        }
