"""Zeiss LSM (.lsm) reader — native coverage for a format the
reference can only reach through the bioio-bioformats Java bridge
(ref README.md:74 routes .lsm to the Bio-Formats long tail). Built on
the in-repo TIFF IFD walk + the public CZ_LSMINFO layout
(bioio_spark.formats.lsm).

- **Catalog (driver-side)**: one IFD walk (a few KB of seek reads)
  plus the 160-byte CZ_LSMINFO struct and the channel-names block —
  axis sizes, dtype, voxel sizes (meters -> µm), time interval,
  channel names. The D8 metadata-only contract: no pixel IO.
- **Pixels (executor-side)**: LSM strips are UNCOMPRESSED channel
  planes (PlanarConfiguration=2), so the driver plans one row per
  (page, strip) = (t, z, c, y-range) byte range and a `mapInPandas`
  seek-reads exactly its strip — at object-store scale each task is
  one ranged GET, zero shuffle (the DV/SLDY lever).
- Thumbnail pages (NewSubfileType bit 0) are skipped: they are
  display-only reductions, not pyramid levels of the data.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_LSM_EXTS = (".lsm",)


def _plan_strips(path: str):
    """(info, channel_names, plan rows): one row per (t, z, c) strip
    byte range, from the catalog walk only."""
    from bioio_spark.formats.lsm import read_lsm_catalog

    cat = read_lsm_catalog(path)
    info, pages = cat["info"], cat["pages"]
    z_n = max(info["size_z"], 1)
    ap = os.path.abspath(path)
    plan = []
    for p_idx, pg in enumerate(pages):
        t, z = divmod(p_idx, z_n)
        if pg["comp"] not in (1, 5):
            raise ValueError(
                f"{path}: LSM page compression {pg['comp']} not "
                f"supported (LSM writes raw or LZW)")
        for ch in pg["chunks"]:
            plan.append({
                "path": ap, "t": t, "z": z, "c": ch["s"],
                "offset": ch["offset"], "nbytes": ch["nbytes"],
                "y0": ch["y0"], "ny": ch["h"], "nx": pg["w"],
                "dtype": pg["dtype"], "comp": pg["comp"],
                "pred": pg["pred"],
            })
    return info, cat["channel_names"], plan


def _strip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Seek-read one channel-plane strip per plan row (raw bytes, or
    whole-strip LZW decode for wild compressed acquisitions — TIFF 6.0
    §13, optionally with the horizontal predictor)."""
    from bioio_spark.formats.tiff import (_undo_horizontal_predictor,
                                          decompress_tiff_chunk)

    for pdf in it:
        for r in pdf.itertuples():
            buf = read_range(r.path, r.offset, r.nbytes)
            comp = getattr(r, "comp", 1)
            if comp != 1:
                buf = decompress_tiff_chunk(buf, comp)
            plane = np.frombuffer(
                buf, dtype=np.dtype(r.dtype),
                count=r.ny * r.nx).reshape(r.ny, r.nx)
            if getattr(r, "pred", 1) == 2:
                plane = _undo_horizontal_predictor(plane)
            yield pd.DataFrame({
                "t": np.full(plane.size, r.t, np.int32),
                "c": np.full(plane.size, r.c, np.int32),
                "z": np.full(plane.size, r.z, np.int32),
                "y": np.repeat(np.arange(
                    r.y0, r.y0 + r.ny, dtype=np.int32), r.nx),
                "x": np.tile(np.arange(r.nx, dtype=np.int32), r.ny),
                "value": plane.ravel().astype(np.float64),
            })


def read_lsm_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None):
    """Window-pruned LSM read: t/z selectors prune whole PAGES, c
    prunes whole strips (one strip per channel plane), and the y window
    narrows each surviving strip's read to its contiguous row range
    (strip rows are contiguous, so a y-window is a byte range). The x
    trim is a residual codegen filter. Selector forms match the other
    window readers (None / int / (start, stop) / slice)."""
    from bioio_spark.sources.zarr_image import _norm_window

    info, _names, plan = _plan_strips(path)
    t0, t1 = _norm_window(t, max(info["size_t"], 1))
    c0, c1 = _norm_window(c, max(info["size_c"], 1))
    z0, z1 = _norm_window(z, max(info["size_z"], 1))
    y0, y1 = _norm_window(y, info["size_y"])
    x0, x1 = _norm_window(x, info["size_x"])
    pruned = []
    for r in plan:
        if not (t0 <= r["t"] < t1 and c0 <= r["c"] < c1
                and z0 <= r["z"] < z1):
            continue
        ry0, ry1 = max(r["y0"], y0), min(r["y0"] + r["ny"], y1)
        if ry0 >= ry1:
            continue
        if r["comp"] == 1:
            # raw strips: the y window is a byte range
            row_bytes = r["nbytes"] // r["ny"]
            pruned.append({**r,
                           "offset": r["offset"]
                           + (ry0 - r["y0"]) * row_bytes,
                           "nbytes": (ry1 - ry0) * row_bytes,
                           "y0": ry0, "ny": ry1 - ry0})
        else:
            # LZW strips decode whole; y trims in the residual filter
            pruned.append(r)
    schema = "t int, c int, z int, y int, x int, value double"
    if not pruned or x0 >= x1:
        return spark.createDataFrame([], schema)
    plan_df = spark.createDataFrame(pd.DataFrame(pruned)).repartition(
        min(len(pruned), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(_strip_batches, schema=schema)
    return px.filter(
        (F.col("x") >= x0) & (F.col("x") < x1)
        & (F.col("y") >= y0) & (F.col("y") < y1))


def read_lsm_planes(spark: SparkSession, path: str):
    """ZERO-SHUFFLE strip -> planes-layout read: one payload row per
    (t, z, c) channel-plane strip, the LSM member of the planes
    family."""
    _info, _names, plan = _plan_strips(path)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bioio_spark.formats.tiff import (
            _undo_horizontal_predictor, decompress_tiff_chunk)

        for pdf in it:
            for r in pdf.itertuples():
                buf = read_range(r.path, r.offset, r.nbytes)
                if getattr(r, "comp", 1) != 1:
                    buf = decompress_tiff_chunk(buf, r.comp)
                plane = np.frombuffer(
                    buf, dtype=np.dtype(r.dtype),
                    count=r.ny * r.nx).reshape(r.ny, r.nx)
                if getattr(r, "pred", 1) == 2:
                    plane = _undo_horizontal_predictor(plane)
                yield pd.DataFrame({
                    "t": [int(r.t)], "c": [int(r.c)], "z": [int(r.z)],
                    "y0": [int(r.y0)], "x0": [0],
                    "h": [int(r.ny)], "w": [int(r.nx)],
                    "values": [plane.ravel().astype(np.float64)],
                })

    plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
        min(len(plan), spark.sparkContext.defaultParallelism))
    return plan_df.mapInPandas(
        batches,
        schema="t int, c int, z int, y0 int, x0 int, h int, w int, "
               "values array<double>")


class LsmImageReader:
    """BioImage reader over Zeiss LSM files (plugin tier)."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_LSM_EXTS):
            return False
        try:
            from bioio_spark.formats.lsm import read_lsm_catalog
            read_lsm_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError(
                "LSM dimension order comes from CZ_LSMINFO")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        info, names, plan = _plan_strips(self._path)
        scene = "Image:0"
        c_n = max(info["size_c"], 1)
        use_names = self._channel_names or (names or None)
        channel_rows = [
            {"image_id": self._image_id, "scene": scene,
             "c": ci, "channel_name": nm}
            for ci, nm in enumerate(
                resolve_channel_names(use_names, c_n, 0))]
        pps = self._pps
        vx, vy, vz = info["voxel_m"]
        if pps is None and any((vx, vy, vz)):
            # CZ_LSMINFO voxel sizes are METERS; catalog speaks µm
            pps = PhysicalPixelSizes(
                Z=vz * 1e6 if vz else None,
                Y=vy * 1e6 if vy else None,
                X=vx * 1e6 if vx else None)
        dt = np.dtype(plan[0]["dtype"]).newbyteorder("=")
        scene_rows = [{
            "image_id": self._image_id, "scene": scene,
            "scene_idx": 0, "dim_order": "TCZYX",
            "size_t": max(info["size_t"], 1), "size_c": c_n,
            "size_z": max(info["size_z"], 1),
            "size_y": info["size_y"], "size_x": info["size_x"],
            "size_m": None, "size_s": None,
            "dtype": dt.name, "ome_pixel_type": dt.name,
            "pps_z": pps.Z if pps else None,
            "pps_y": pps.Y if pps else None,
            "pps_x": pps.X if pps else None,
            "time_interval": info["time_interval"] or None,
            "metadata": (f"LSM ScanType={info['scan_type']} "
                         f"DataType={info['data_type']}"),
        }]

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _strip_batches,
                  schema="t int, c int, z int, y int, x int, "
                         "value double")
              .select(
                  F.lit(self._image_id).alias("image_id"),
                  F.lit(scene).alias("scene"),
                  F.lit(0).alias("res_level"), "t", "c", "z", "y", "x",
                  F.lit(-1).alias("m"), F.lit(-1).alias("s"), "value")
              .select(*PIXEL_COLUMNS))

        return ImageDataset(pixels=px, scenes=pd.DataFrame(scene_rows),
                            channels=pd.DataFrame(channel_rows))
