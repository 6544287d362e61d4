"""Adobe DNG (.dng) camera-RAW reader — native coverage for the
openly-specified corner of the camera-RAW tail the reference reaches
only through the bioio-bioformats Java bridge (ref README.md:70
"Bio-Formats supported file formats" includes DNG/camera RAW).

- **Catalog (driver-side)**: one IFD walk (`formats/dng.py`) gives
  dims, strip byte ranges, CFA pattern, black/white levels — no pixel
  IO (D8 contract).
- **Pixels (executor-side)**: one plan row per strip; uncompressed
  strips slice straight from the ranged read, lossless-JPEG strips
  (Compression 7, the DNG-mandated codec) decode through the in-repo
  SOF3 codec (`formats/ljpeg.py`) — each strip is its own complete
  codestream, so strips are the independent read+decode granularity:
  one ranged GET each, zero shuffle.

The CFA mosaic is exposed un-demosaiced as a single-channel YX plane
(channel name = the CFA pattern string, e.g. "RGGB") — demosaicing is
an interpolation POLICY, not a property of the file, so it belongs to
downstream operators; this matches how the raw IFD actually stores
samples.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bioio_spark.fsio import read_range

_DNG_EXTS = (".dng",)


def _plan_strips(path: str):
    from bioio_spark.formats.dng import read_dng_catalog

    cat = read_dng_catalog(path)
    ap = os.path.abspath(path)
    plan = [{
        "path": ap, "offset": ch["offset"], "nbytes": ch["nbytes"],
        "y0": ch["y0"], "ny": ch["h"], "nx": ch["w"],
        "comp": cat["comp"], "dtype": cat["dtype"],
    } for ch in cat["chunks"]]
    return cat, plan


def _strip_array(r) -> np.ndarray:
    buf = read_range(r.path, r.offset, r.nbytes)
    if r.comp == 7:
        from bioio_spark.formats.ljpeg import decode_ljpeg
        return decode_ljpeg(buf)
    return np.frombuffer(buf, dtype=np.dtype(r.dtype),
                         count=r.ny * r.nx).reshape(r.ny, r.nx)


def _strip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for r in pdf.itertuples():
            plane = _strip_array(r)
            ny, nx = plane.shape
            yield pd.DataFrame({
                "t": np.zeros(plane.size, np.int32),
                "c": np.zeros(plane.size, np.int32),
                "z": np.zeros(plane.size, np.int32),
                "y": np.repeat(np.arange(r.y0, r.y0 + ny,
                                         dtype=np.int32), nx),
                "x": np.tile(np.arange(nx, dtype=np.int32), ny),
                "value": plane.ravel().astype(np.float64),
            })


def read_dng_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None):
    """Window-pruned DNG read: the y window prunes whole strips
    driver-side (uncompressed strips additionally narrow to the
    touched row byte range; SOF3 strips are the decode granularity);
    x/y trim is a residual codegen filter."""
    from bioio_spark.sources.zarr_image import _norm_window

    cat, plan = _plan_strips(path)
    t0, t1 = _norm_window(t, 1)
    c0, c1 = _norm_window(c, 1)
    z0, z1 = _norm_window(z, 1)
    y0, y1 = _norm_window(y, cat["size_y"])
    x0, x1 = _norm_window(x, cat["size_x"])
    pruned = []
    for r in plan:
        if r["y0"] + r["ny"] <= y0 or r["y0"] >= y1:
            continue
        if r["comp"] == 1:
            lo = max(y0, r["y0"])
            hi = min(y1, r["y0"] + r["ny"])
            row_bytes = r["nx"] * np.dtype(r["dtype"]).itemsize
            pruned.append({**r,
                           "offset": r["offset"]
                           + (lo - r["y0"]) * row_bytes,
                           "nbytes": (hi - lo) * row_bytes,
                           "y0": lo, "ny": hi - lo})
        else:
            pruned.append(r)
    schema = "t int, c int, z int, y int, x int, value double"
    if (not pruned or t0 >= t1 or c0 >= c1 or z0 >= z1
            or x0 >= x1 or y0 >= y1):
        return spark.createDataFrame([], schema)
    plan_df = spark.createDataFrame(pd.DataFrame(pruned)).repartition(
        min(len(pruned), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(_strip_batches, schema=schema)
    return px.filter(
        (F.col("y") >= y0) & (F.col("y") < y1)
        & (F.col("x") >= x0) & (F.col("x") < x1))


class DngImageReader:
    """BioImage reader over Adobe DNG camera-RAW mosaics."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_DNG_EXTS):
            return False
        try:
            from bioio_spark.formats.dng import read_dng_catalog
            read_dng_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("DNG raw mosaics are always single-plane "
                             "YX")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)

        cat, plan = _plan_strips(self._path)
        scene = "Image:0"
        names = self._channel_names
        if names is None and cat["cfa_pattern"]:
            names = [cat["cfa_pattern"]]
        channel_rows = [
            {"image_id": self._image_id, "scene": scene,
             "c": 0, "channel_name": nm}
            for nm in resolve_channel_names(names, 1, 0)]
        dt = np.dtype(cat["dtype"]).newbyteorder("=")
        scene_rows = [{
            "image_id": self._image_id, "scene": scene,
            "scene_idx": 0, "dim_order": "TCZYX",
            "size_t": 1, "size_c": 1, "size_z": 1,
            "size_y": cat["size_y"], "size_x": cat["size_x"],
            "size_m": None, "size_s": None,
            "dtype": dt.name, "ome_pixel_type": dt.name,
            "pps_z": self._pps.Z if self._pps else None,
            "pps_y": self._pps.Y if self._pps else None,
            "pps_x": self._pps.X if self._pps else None,
            "time_interval": None,
            "metadata": (f"DNG {cat['dng_version']} model="
                         f"{cat['model']} cfa={cat['cfa_pattern']} "
                         f"black={cat['black_level']} "
                         f"white={cat['white_level']} "
                         f"comp={cat['comp']}"),
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
