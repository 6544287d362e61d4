"""Olympus OIF (.oif) reader — native coverage for a format the
reference can only reach through the bioio-bioformats Java bridge (ref
README.md:74 routes .oif). Built on the public INI + plane-TIFF
directory layout (bioio_spark.formats.oif) and the in-repo TIFF codec.

- **Catalog (driver-side)**: one UTF-16 INI decode + a directory
  listing — axis sizes, dye-name channels, µm conversions, the time
  interval. No pixel IO (D8 contract).
- **Pixels (executor-side)**: one plan row per plane TIFF; each task
  decodes exactly its file (the TIFF-glob lever) — zero shuffle,
  plane-count parallelism.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_bytes, read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_OIF_EXTS = (".oif",)


def _plane_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from bioio_spark.formats.tiff import decode_tiff

    for pdf in it:
        for r in pdf.itertuples():
            planes, _desc = decode_tiff(read_bytes(r.path))
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


def read_oif_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None):
    """Window-pruned OIF read: t/c/z selectors prune whole plane FILES
    (driver-side grid arithmetic); within each surviving file the
    (y, x) window prunes strips via the shared seek-based TIFF
    planning (uncompressed single-strip planes read as one row-range
    GET). Residual trim is a codegen filter."""
    from bioio_spark.formats.oif import read_oif_catalog
    from bioio_spark.formats.tiff import iter_tiff_chunks
    from bioio_spark.sources.zarr_image import _norm_window

    cat = read_oif_catalog(path)
    t0, t1 = _norm_window(t, cat["size_t"])
    c0, c1 = _norm_window(c, cat["size_c"])
    z0, z1 = _norm_window(z, cat["size_z"])
    y0, y1 = _norm_window(y, cat["size_y"])
    x0, x1 = _norm_window(x, cat["size_x"])
    plan = []
    for (ti, ci, zi), p in cat["planes"].items():
        if not (t0 <= ti < t1 and c0 <= ci < c1 and z0 <= zi < z1):
            continue
        pg = iter_tiff_chunks(p)[0]
        row_bytes = pg["w"] * np.dtype(pg["dtype"]).itemsize
        for ch in pg["chunks"]:
            ry0 = max(ch["y0"], y0)
            ry1 = min(ch["y0"] + ch["h"], y1)
            if ry0 >= ry1:
                continue
            if pg["comp"] == 1:
                plan.append({
                    "path": os.path.abspath(p), "t": ti, "c": ci,
                    "z": zi,
                    "offset": ch["offset"]
                    + (ry0 - ch["y0"]) * row_bytes,
                    "nbytes": (ry1 - ry0) * row_bytes,
                    "y0": ry0, "ny": ry1 - ry0, "nx": pg["w"],
                    "dtype": pg["dtype"],
                })
            else:
                raise ValueError(
                    f"{p}: compressed OIF planes not supported on the "
                    f"windowed path; use the full reader")
    schema = "t int, c int, z int, y int, x int, value double"
    if not plan or x0 >= x1:
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
                    "c": np.full(plane.size, r.c, np.int32),
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


class OifImageReader:
    """BioImage reader over Olympus OIF plane-file directories."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_OIF_EXTS):
            return False
        try:
            from bioio_spark.formats.oif import read_oif_catalog
            read_oif_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("OIF axis sizes come from the INI's "
                             "Axis sections")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.formats.oif import read_oif_catalog
        from bioio_spark.formats.tiff import iter_tiff_chunks
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        cat = read_oif_catalog(self._path)
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
        # dtype from one plane's IFD (a few bytes, no pixel IO)
        pg0 = iter_tiff_chunks(next(iter(cat["planes"].values())))[0]
        dt = np.dtype(pg0["dtype"]).newbyteorder("=")
        if (pg0["h"], pg0["w"]) != (cat["size_y"], cat["size_x"]):
            raise ValueError(
                f"{self._path}: plane files are "
                f"{pg0['w']}x{pg0['h']}, INI says "
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
            "metadata": "OIF FLUOVIEW",
        }]
        plan = [{"path": os.path.abspath(p), "t": t, "c": c, "z": z}
                for (t, c, z), p in sorted(cat["planes"].items())]
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
