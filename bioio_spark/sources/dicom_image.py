"""DICOM (.dcm) reader — native coverage for a format the reference
can only reach through the bioio-bioformats Java bridge (ref
README.md:74 routes .dcm). Layout per the public DICOM standard
(bioio_spark.formats.dicom); multi-frame files map frames to Z (the
Bio-Formats convention for volumes), PixelSpacing/SpacingBetweenSlices
(millimeters) convert to µm pixel sizes.

- **Catalog (driver-side)**: one element walk that seek-skips
  PixelData — KBs of reads on any file size (D8 contract).
- **Pixels (executor-side)**: frames are contiguous in PixelData, so
  the driver plans one row per frame byte range; a directory of .dcm
  files (the series-per-directory convention) reads as scenes.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_DCM_EXTS = (".dcm", ".dicom")


def _dcm_paths(image: str) -> list[str]:
    if os.path.isdir(image):
        return sorted(p for p in _glob.glob(os.path.join(image, "*"))
                      if p.lower().endswith(_DCM_EXTS))
    return [image]


def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for r in pdf.itertuples():
            buf = read_range(r.path, r.offset, r.nbytes)
            plane = np.frombuffer(
                buf, dtype=np.dtype(r.dtype),
                count=r.ny * r.nx).reshape(r.ny, r.nx)
            yield pd.DataFrame({
                "scene": r.scene,
                "t": np.zeros(plane.size, np.int32),
                "c": np.zeros(plane.size, np.int32),
                "z": np.full(plane.size, r.z, np.int32),
                "y": np.repeat(np.arange(r.ny, dtype=np.int32), r.nx),
                "x": np.tile(np.arange(r.nx, dtype=np.int32), r.ny),
                "value": plane.ravel().astype(np.float64),
            })


def read_dicom_window(spark: SparkSession, path: str,
                      t=None, c=None, z=None, y=None, x=None):
    """Window-pruned DICOM read: z prunes whole FRAMES, the y window
    narrows each surviving frame to its contiguous row byte range; x
    trims via codegen filter."""
    from bioio_spark.formats.dicom import parse_dicom
    from bioio_spark.sources.zarr_image import _norm_window

    attrs = parse_dicom(path)
    t0, t1 = _norm_window(t, 1)
    c0, c1 = _norm_window(c, 1)
    z0, z1 = _norm_window(z, attrs["n_frames"])
    y0, y1 = _norm_window(y, attrs["rows"])
    x0, x1 = _norm_window(x, attrs["cols"])
    row_bytes = attrs["cols"] * attrs["dtype"].itemsize
    ap = os.path.abspath(path)
    plan = [{"path": ap, "scene": "Image:0", "z": z_,
             "offset": attrs["pixel_offset"]
             + z_ * attrs["frame_bytes"] + y0 * row_bytes,
             "nbytes": (y1 - y0) * row_bytes,
             "y0": y0, "ny": y1 - y0, "nx": attrs["cols"],
             "dtype": attrs["dtype"].str}
            for z_ in range(z0, z1)]
    schema = "t int, c int, z int, y int, x int, value double"
    if not plan or t0 >= t1 or c0 >= c1 or x0 >= x1:
        return spark.createDataFrame([], schema)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for r in pdf.itertuples():
                buf = read_range(r.path, r.offset, r.nbytes)
                plane = np.frombuffer(
                    buf, dtype=np.dtype(r.dtype),
                    count=r.ny * r.nx).reshape(r.ny, r.nx)
                yield pd.DataFrame({
                    "t": np.zeros(plane.size, np.int32),
                    "c": np.zeros(plane.size, np.int32),
                    "z": np.full(plane.size, r.z, np.int32),
                    "y": np.repeat(np.arange(
                        r.y0, r.y0 + r.ny, dtype=np.int32), r.nx),
                    "x": np.tile(np.arange(r.nx, dtype=np.int32), r.ny),
                    "value": plane.ravel().astype(np.float64),
                })

    plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
        min(len(plan), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(batches, schema=schema)
    return px.filter((F.col("x") >= x0) & (F.col("x") < x1))


class DicomImageReader:
    """BioImage reader over Part-10 DICOM files / series dirs."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        paths = _dcm_paths(image)
        if not paths or not image.lower().endswith(
                _DCM_EXTS) and not os.path.isdir(image):
            return False
        try:
            from bioio_spark.formats.dicom import parse_dicom
            parse_dicom(paths[0])
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("DICOM frames map to Z; dim_order is "
                             "fixed")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.formats.dicom import parse_dicom
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        paths = _dcm_paths(self._path)
        if not paths:
            raise FileNotFoundError(f"No DICOM files under {self._path}")
        scene_rows, channel_rows, plan = [], [], []
        for si, p in enumerate(paths):
            attrs = parse_dicom(p)
            scene = f"Image:{si}"
            for ci, nm in enumerate(resolve_channel_names(
                    self._channel_names, 1, si)):
                channel_rows.append({
                    "image_id": self._image_id, "scene": scene,
                    "c": ci, "channel_name": nm})
            pps = self._pps
            if pps is None and "pixel_spacing" in attrs:
                # DICOM spacings are millimeters; catalog speaks µm
                ry, rx = attrs["pixel_spacing"]
                sz = attrs.get("slice_spacing")
                pps = PhysicalPixelSizes(
                    Z=sz * 1000.0 if sz else None,
                    Y=ry * 1000.0, X=rx * 1000.0)
            dt = attrs["dtype"].newbyteorder("=")
            scene_rows.append({
                "image_id": self._image_id, "scene": scene,
                "scene_idx": si, "dim_order": "TCZYX",
                "size_t": 1, "size_c": 1,
                "size_z": attrs["n_frames"],
                "size_y": attrs["rows"], "size_x": attrs["cols"],
                "size_m": None, "size_s": None,
                "dtype": dt.name, "ome_pixel_type": dt.name,
                "pps_z": pps.Z if pps else None,
                "pps_y": pps.Y if pps else None,
                "pps_x": pps.X if pps else None,
                "time_interval": None,
                "metadata": attrs.get("description"),
            })
            ap = os.path.abspath(p)
            for z in range(attrs["n_frames"]):
                plan.append({
                    "path": ap, "scene": scene, "z": z,
                    "offset": attrs["pixel_offset"]
                    + z * attrs["frame_bytes"],
                    "nbytes": attrs["frame_bytes"],
                    "ny": attrs["rows"], "nx": attrs["cols"],
                    "dtype": attrs["dtype"].str})
        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _batches,
                  schema="scene string, t int, c int, z int, y int, "
                         "x int, value double")
              .select(
                  F.lit(self._image_id).alias("image_id"), "scene",
                  F.lit(0).alias("res_level"), "t", "c", "z", "y", "x",
                  F.lit(-1).alias("m"), F.lit(-1).alias("s"), "value")
              .select(*PIXEL_COLUMNS))

        return ImageDataset(pixels=px, scenes=pd.DataFrame(scene_rows),
                            channels=pd.DataFrame(channel_rows))
