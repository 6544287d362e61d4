"""Yokogawa CellVoyager HCS reader — native coverage for the
high-content-screening plate layout the reference can only reach
through the bioio-bioformats Java bridge (ref README.md:74). Built on
the public mlf/mrf XML catalog (bioio_spark.formats.cellvoyager).

- **Plate model**: WELLS are scenes (named ``Well R{row}C{col}``),
  FIELDS are mosaic (M) tiles whose stage X/Y feed the tiles table —
  so the existing M1 broadcast-stitch machinery reconstructs each
  well from its fields, and M2/M3 tile-position lookups work.
- **Catalog (driver-side)**: the two XML documents + one TIFF header
  read for plane geometry (D8 contract).
- **Pixels (executor-side)**: one plan row per record (a single-plane
  TIFF), one file per task — HCS plates are tens of thousands of
  small files, the layout binaryFile/task-per-file parallelism was
  made for; zero shuffle.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_bytes

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _plane_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from bioio_spark.formats.tiff import decode_tiff

    for pdf in it:
        for r in pdf.itertuples():
            planes, _desc = decode_tiff(read_bytes(r.path))
            plane = planes[0]
            y_n, x_n = plane.shape
            yield pd.DataFrame({
                "scene": r.scene,
                "m": np.full(plane.size, r.m, np.int32),
                "t": np.full(plane.size, r.t, np.int32),
                "c": np.full(plane.size, r.c, np.int32),
                "z": np.full(plane.size, r.z, np.int32),
                "y": np.repeat(np.arange(y_n, dtype=np.int32), x_n),
                "x": np.tile(np.arange(x_n, dtype=np.int32), y_n),
                "value": plane.ravel().astype(np.float64),
            })


class CellVoyagerImageReader:
    """BioImage reader over CellVoyager measurement directories."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str) or not os.path.isdir(image):
            return False
        from bioio_spark.formats.cellvoyager import MLF_NAME

        if not os.path.isfile(os.path.join(image, MLF_NAME)):
            return False
        try:
            from bioio_spark.formats.cellvoyager import \
                read_cellvoyager_catalog
            read_cellvoyager_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("CellVoyager axes come from the mlf "
                             "records")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.formats.cellvoyager import \
            read_cellvoyager_catalog
        from bioio_spark.formats.tiff import iter_tiff_chunks
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        cat = read_cellvoyager_catalog(self._path)
        # plane geometry from ONE record's TIFF header
        first = cat["records"][0]
        pg0 = iter_tiff_chunks(
            os.path.join(self._path, first["file"]))[0]
        dt = np.dtype(pg0["dtype"]).newbyteorder("=")
        pps = self._pps
        if pps is None and cat["um_per_px"]:
            pps = PhysicalPixelSizes(Z=None, Y=cat["um_per_px"],
                                     X=cat["um_per_px"])

        by_well: dict = {}
        for r in cat["records"]:
            by_well.setdefault((r["row"], r["column"]), []).append(r)

        scene_rows, channel_rows, tile_rows, plan = [], [], [], []
        for si, key in enumerate(cat["wells"]):
            row, col = key
            recs = by_well[key]
            f_n = max(r["field"] for r in recs) + 1
            t_n = max(r["t"] for r in recs) + 1
            c_n = max(r["c"] for r in recs) + 1
            z_n = max(r["z"] for r in recs) + 1
            scene = f"Well R{row:02d}C{col:02d}"
            names = self._channel_names or cat["channel_names"]
            for ci, nm in enumerate(resolve_channel_names(
                    names, c_n, si)):
                channel_rows.append({
                    "image_id": self._image_id, "scene": scene,
                    "c": ci, "channel_name": nm})
            # field stage positions (µm) -> pixel offsets for the
            # M1 stitch
            if f_n > 1 and pps and pps.Y and pps.X:
                pos = {}
                for r in recs:
                    pos[r["field"]] = (r["y_um"], r["x_um"])
                ys = [p[0] for p in pos.values()]
                xs = [p[1] for p in pos.values()]
                for m, (py_, px_) in sorted(pos.items()):
                    tile_rows.append({
                        "image_id": self._image_id, "scene": scene,
                        "m": m,
                        "y_off": int(round((py_ - min(ys)) / pps.Y)),
                        "x_off": int(round((px_ - min(xs)) / pps.X))})
            scene_rows.append({
                "image_id": self._image_id, "scene": scene,
                "scene_idx": si,
                "dim_order": ("M" if f_n > 1 else "") + "TCZYX",
                "size_t": t_n, "size_c": c_n, "size_z": z_n,
                "size_y": pg0["h"], "size_x": pg0["w"],
                "size_m": f_n if f_n > 1 else None, "size_s": None,
                "dtype": dt.name, "ome_pixel_type": dt.name,
                "pps_z": None,
                "pps_y": pps.Y if pps else None,
                "pps_x": pps.X if pps else None,
                "time_interval": None,
                "metadata": f"CellVoyager well R{row}C{col}",
            })
            for r in recs:
                plan.append({
                    "path": os.path.join(os.path.abspath(self._path),
                                         r["file"]),
                    "scene": scene,
                    "m": r["field"] if f_n > 1 else -1,
                    "t": r["t"], "c": r["c"], "z": r["z"]})

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _plane_batches,
                  schema="scene string, m int, t int, c int, z int, "
                         "y int, x int, value double")
              .select(
                  F.lit(self._image_id).alias("image_id"), "scene",
                  F.lit(0).alias("res_level"), "t", "c", "z", "y", "x",
                  "m", F.lit(-1).alias("s"), "value")
              .select(*PIXEL_COLUMNS))

        return ImageDataset(
            pixels=px, scenes=pd.DataFrame(scene_rows),
            channels=pd.DataFrame(channel_rows),
            tiles=pd.DataFrame(tile_rows) if tile_rows else None)
