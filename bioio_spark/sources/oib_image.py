"""Olympus OIB (.oib) reader — native coverage for a format the
reference can only reach through the bioio-bioformats Java bridge (ref
README.md:74 routes .oib). An OIB is an MS-CFB compound document
holding the OIF payload (bioio_spark.formats.{cfb,oib}).

- **Catalog (driver-side)**: CFB directory walk + OibInfo map + the
  UTF-16 INI stream — no pixel IO (D8 contract).
- **Pixels (executor-side)**: each plane stream resolves to SECTOR
  EXTENTS (byte runs) at catalog time; the driver plans one row per
  plane carrying its extents, and a `mapInPandas` seek-reads exactly
  those runs and decodes the embedded TIFF — zero shuffle, and
  because the writer lays streams contiguously, each task is one
  ranged GET at object-store scale.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_OIB_EXTS = (".oib",)


def _read_extents(path: str, offsets, lengths) -> bytes:
    from bioio_spark.fsio import ranged_read

    return ranged_read(path, offsets, lengths)


def _plane_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from bioio_spark.formats.tiff import decode_tiff

    for pdf in it:
        for r in pdf.itertuples():
            planes, _desc = decode_tiff(
                _read_extents(r.path, r.offsets, r.lengths))
            plane = planes[0]
            y_n, x_n = plane.shape
            yield pd.DataFrame({
                "t": np.full(plane.size, r.t, np.int32),
                "c": np.full(plane.size, r.c, np.int32),
                "z": np.full(plane.size, r.z, np.int32),
                "y": np.repeat(np.arange(y_n, dtype=np.int32), x_n),
                "x": np.tile(np.arange(x_n, dtype=np.int32), y_n),
                "value": plane.ravel().astype(np.float64),
            })


def read_oib_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None):
    """Window-pruned OIB read: t/c/z prune whole plane STREAMS
    (driver-side grid arithmetic over the CFB catalog); the y/x trim
    is a codegen filter after the per-plane decode (plane streams are
    whole TIFFs, so the stream is the read granularity)."""
    from bioio_spark.formats.oib import read_oib_catalog
    from bioio_spark.sources.zarr_image import _norm_window

    cat = read_oib_catalog(path)
    t0, t1 = _norm_window(t, cat["size_t"])
    c0, c1 = _norm_window(c, cat["size_c"])
    z0, z1 = _norm_window(z, cat["size_z"])
    y0, y1 = _norm_window(y, cat["size_y"])
    x0, x1 = _norm_window(x, cat["size_x"])
    ap = os.path.abspath(path)
    plan = [{"path": ap, "t": ti, "c": ci, "z": zi,
             "offsets": [o for o, _ in ext],
             "lengths": [n for _, n in ext]}
            for (ti, ci, zi), ext in sorted(cat["planes"].items())
            if t0 <= ti < t1 and c0 <= ci < c1 and z0 <= zi < z1]
    schema = "t int, c int, z int, y int, x int, value double"
    if not plan or y0 >= y1 or x0 >= x1:
        return spark.createDataFrame([], schema)
    plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
        min(len(plan), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(_plane_batches, schema=schema)
    return px.filter(
        (F.col("y") >= y0) & (F.col("y") < y1)
        & (F.col("x") >= x0) & (F.col("x") < x1))


class OibImageReader:
    """BioImage reader over Olympus OIB compound documents."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_OIB_EXTS):
            return False
        try:
            from bioio_spark.formats.oib import read_oib_catalog
            read_oib_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("OIB axis sizes come from the embedded "
                             "OIF INI")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.formats.oib import read_oib_catalog
        from bioio_spark.formats.tiff import decode_tiff
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        cat = read_oib_catalog(self._path)
        scene = "Image:0"
        names = self._channel_names or cat["channel_names"]
        channel_rows = [
            {"image_id": self._image_id, "scene": scene,
             "c": ci, "channel_name": nm}
            for ci, nm in enumerate(resolve_channel_names(
                names, cat["size_c"], 0))]
        pps = self._pps
        if pps is None and (cat["um_per_px"] or cat["z_step_um"]):
            pps = PhysicalPixelSizes(
                Z=cat["z_step_um"] or None,
                Y=cat["um_per_px"] or None,
                X=cat["um_per_px"] or None)
        # dtype from one plane stream's first KB (IFD-only decode would
        # need extents anyway; planes are small single-page TIFFs)
        first = next(iter(sorted(cat["planes"].items())))[1]
        head = _read_extents(os.path.abspath(self._path),
                             [o for o, _ in first],
                             [n for _, n in first])
        pl0, _ = decode_tiff(head)
        dt = pl0[0].dtype
        if pl0[0].shape != (cat["size_y"], cat["size_x"]):
            raise ValueError(
                f"{self._path}: plane streams are "
                f"{pl0[0].shape[1]}x{pl0[0].shape[0]}, INI says "
                f"{cat['size_x']}x{cat['size_y']}")
        scene_rows = [{
            "image_id": self._image_id, "scene": scene,
            "scene_idx": 0, "dim_order": "TCZYX",
            "size_t": cat["size_t"], "size_c": cat["size_c"],
            "size_z": cat["size_z"],
            "size_y": cat["size_y"], "size_x": cat["size_x"],
            "size_m": None, "size_s": None,
            "dtype": dt.name, "ome_pixel_type": dt.name,
            "pps_z": pps.Z if pps else None,
            "pps_y": pps.Y if pps else None,
            "pps_x": pps.X if pps else None,
            "time_interval": cat["time_interval"],
            "metadata": "OIB FLUOVIEW (MS-CFB container)",
        }]
        ap = os.path.abspath(self._path)
        plan = [{"path": ap, "t": t, "c": c, "z": z,
                 "offsets": [o for o, _ in ext],
                 "lengths": [n for _, n in ext]}
                for (t, c, z), ext in sorted(cat["planes"].items())]
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
