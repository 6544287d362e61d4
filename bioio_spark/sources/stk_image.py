"""MetaMorph STK (.stk) reader — native coverage for a format the
reference can only reach through the bioio-bioformats Java bridge (ref
README.md:74 routes .stk). Built on the in-repo TIFF IFD walk plus the
public UIC-tag layout (bioio_spark.formats.stk).

- **Catalog (driver-side)**: one IFD + UIC2 scan gives plane count,
  the Z-vs-T axis rule (nonzero z-distance -> Z), z spacing, and the
  wavelength — no pixel IO (D8 contract).
- **Pixels (executor-side)**: STK planes are contiguous raw blocks at
  ``base + i * plane_bytes``, so the driver plans one row per plane
  and a `mapInPandas` seek-reads exactly its plane — one ranged GET
  per plane at object-store scale, zero shuffle (the DV lever).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_STK_EXTS = (".stk",)


def _plan_planes(path: str):
    from bioio_spark.formats.stk import read_stk_catalog

    cat = read_stk_catalog(path)
    pg = cat["page"]
    ap = os.path.abspath(path)
    z_axis = cat["axis"] == "Z"
    plan = [{
        "path": ap,
        "t": 0 if z_axis else i, "z": i if z_axis else 0,
        "offset": off, "nbytes": cat["plane_bytes"],
        "ny": pg["h"], "nx": pg["w"], "dtype": pg["dtype"],
    } for i, off in enumerate(cat["plane_offsets"])]
    return cat, plan


def _plane_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for r in pdf.itertuples():
            buf = read_range(r.path, r.offset, r.nbytes)
            plane = np.frombuffer(
                buf, dtype=np.dtype(r.dtype),
                count=r.ny * r.nx).reshape(r.ny, r.nx)
            yield pd.DataFrame({
                "t": np.full(plane.size, r.t, np.int32),
                "c": np.zeros(plane.size, np.int32),
                "z": np.full(plane.size, r.z, np.int32),
                "y": np.repeat(np.arange(r.ny, dtype=np.int32), r.nx),
                "x": np.tile(np.arange(r.nx, dtype=np.int32), r.ny),
                "value": plane.ravel().astype(np.float64),
            })


def read_stk_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None):
    """Window-pruned STK read: the stack selector (t or z per the axis
    rule) prunes whole planes, the y window narrows each surviving
    plane to its contiguous row byte range; x trims via a residual
    codegen filter. Selector forms match the window-read family."""
    from bioio_spark.sources.zarr_image import _norm_window

    cat, plan = _plan_planes(path)
    pg = cat["page"]
    n = cat["n_planes"]
    z_axis = cat["axis"] == "Z"
    t0, t1 = _norm_window(t, n if not z_axis else 1)
    c0, c1 = _norm_window(c, 1)
    z0, z1 = _norm_window(z, n if z_axis else 1)
    y0, y1 = _norm_window(y, pg["h"])
    x0, x1 = _norm_window(x, pg["w"])
    row_bytes = pg["w"] * np.dtype(pg["dtype"]).itemsize
    pruned = []
    for r in plan:
        if not (t0 <= r["t"] < t1 and z0 <= r["z"] < z1):
            continue
        pruned.append({**r,
                       "offset": r["offset"] + y0 * row_bytes,
                       "nbytes": (y1 - y0) * row_bytes,
                       "y0": y0, "ny": y1 - y0})
    schema = "t int, c int, z int, y int, x int, value double"
    if not pruned or c0 >= c1 or x0 >= x1:
        return spark.createDataFrame([], schema)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for r in pdf.itertuples():
                buf = read_range(r.path, r.offset, r.nbytes)
                plane = np.frombuffer(
                    buf, dtype=np.dtype(r.dtype),
                    count=r.ny * r.nx).reshape(r.ny, r.nx)
                yield pd.DataFrame({
                    "t": np.full(plane.size, r.t, np.int32),
                    "c": np.zeros(plane.size, np.int32),
                    "z": np.full(plane.size, r.z, np.int32),
                    "y": np.repeat(np.arange(
                        r.y0, r.y0 + r.ny, dtype=np.int32), r.nx),
                    "x": np.tile(np.arange(r.nx, dtype=np.int32), r.ny),
                    "value": plane.ravel().astype(np.float64),
                })

    plan_df = spark.createDataFrame(pd.DataFrame(pruned)).repartition(
        min(len(pruned), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(batches, schema=schema)
    return px.filter((F.col("x") >= x0) & (F.col("x") < x1))


class StkImageReader:
    """BioImage reader over MetaMorph STK plane stacks (plugin tier)."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_STK_EXTS):
            return False
        try:
            from bioio_spark.formats.stk import read_stk_catalog
            read_stk_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("STK axis mapping follows the UIC2 "
                             "z-distance rule")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        cat, plan = _plan_planes(self._path)
        pg = cat["page"]
        scene = "Image:0"
        names = self._channel_names
        if names is None and cat["wavelength"]:
            names = [str(int(round(cat["wavelength"])))]
        channel_rows = [
            {"image_id": self._image_id, "scene": scene,
             "c": 0, "channel_name": nm}
            for nm in resolve_channel_names(names, 1, 0)]
        pps = self._pps
        if pps is None and cat["z_distance"]:
            pps = PhysicalPixelSizes(Z=cat["z_distance"], Y=None, X=None)
        z_axis = cat["axis"] == "Z"
        dt = np.dtype(pg["dtype"]).newbyteorder("=")
        scene_rows = [{
            "image_id": self._image_id, "scene": scene,
            "scene_idx": 0, "dim_order": "TCZYX",
            "size_t": 1 if z_axis else cat["n_planes"], "size_c": 1,
            "size_z": cat["n_planes"] if z_axis else 1,
            "size_y": pg["h"], "size_x": pg["w"],
            "size_m": None, "size_s": None,
            "dtype": dt.name, "ome_pixel_type": dt.name,
            "pps_z": pps.Z if pps else None,
            "pps_y": pps.Y if pps else None,
            "pps_x": pps.X if pps else None,
            "time_interval": None,
            "metadata": (f"STK axis={cat['axis']} "
                         f"planes={cat['n_planes']}"),
        }]

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _plane_batches,
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
