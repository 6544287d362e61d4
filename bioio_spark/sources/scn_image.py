"""Leica SCN (.scn) reader — native coverage for a format the
reference can only reach through the bioio-bioformats Java bridge (ref
README.md:74 routes .scn). Built on the in-repo TIFF machinery plus
the public SCN XML catalog (bioio_spark.formats.scn).

- **Scenes**: one per ``<image>`` in the collection XML (macro +
  acquired regions — the Bio-Formats series model); each scene's
  ``<dimension>`` entries give its res_levels and focal planes (Z).
- **Catalog (driver-side)**: IFD walk + XML parse only (D8 contract).
- **Pixels (executor-side)**: one plan row per (scene, level, z,
  tile); `mapInPandas` seek-reads + decodes exactly its tile — zero
  shuffle, one ranged GET per tile at object-store scale.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_SCN_EXTS = (".scn",)


def _chunk_plan(path: str):
    from bioio_spark.formats.scn import read_scn_catalog

    cat = read_scn_catalog(path)
    ap = os.path.abspath(path)
    plan = []
    for si, im in enumerate(cat["images"]):
        scene = f"Image:{si}"
        for lv in im["levels"]:
            pg = lv["page"]
            for ch in pg["chunks"]:
                plan.append({
                    "path": ap, "scene": scene,
                    "res_level": lv["r"], "z": lv["z"],
                    "offset": ch["offset"], "nbytes": ch["nbytes"],
                    "y0": ch["y0"], "x0": ch["x0"],
                    "ch": ch["h"], "cw": ch["w"],
                    "page_h": pg["h"], "page_w": pg["w"],
                    "dtype": pg["dtype"], "comp": pg["comp"],
                    "spp": pg["spp"],
                    "jpeg_tables": pg.get("jpeg_tables"),
                })
    return cat, plan


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from bioio_spark.formats.tiff import (_decode_jpeg_chunk,
                                          decompress_tiff_chunk)

    for pdf in it:
        for r in pdf.itertuples():
            payload = read_range(r.path, r.offset, r.nbytes)
            dt = np.dtype(r.dtype)
            if r.comp == 7:
                tables = (bytes(r.jpeg_tables)
                          if r.jpeg_tables is not None else None)
                block = _decode_jpeg_chunk(payload, tables)
            else:
                raw = decompress_tiff_chunk(payload, r.comp)
                shape = (r.ch, r.cw, r.spp) if r.spp > 1 else \
                    (r.ch, r.cw)
                block = np.frombuffer(
                    raw, dtype=dt,
                    count=r.ch * r.cw * r.spp).reshape(shape)
            vh = min(r.ch, r.page_h - r.y0)
            vw = min(r.cw, r.page_w - r.x0)
            block = block[:vh, :vw]
            y_n, x_n = block.shape[:2]
            s_n = block.shape[2] if block.ndim == 3 else 1
            s_col = (np.full(block.size, -1, np.int32) if s_n == 1 else
                     np.tile(np.arange(s_n, dtype=np.int32), y_n * x_n))
            yield pd.DataFrame({
                "scene": r.scene,
                "res_level": np.full(block.size, r.res_level, np.int32),
                "z": np.full(block.size, r.z, np.int32),
                "y": np.repeat(np.arange(
                    r.y0, r.y0 + y_n, dtype=np.int32), x_n * s_n),
                "x": np.tile(np.repeat(np.arange(
                    r.x0, r.x0 + x_n, dtype=np.int32), s_n), y_n),
                "s": s_col,
                "value": block.ravel().astype(np.float64),
            })


def read_scn_window(spark: SparkSession, path: str, scene: int = 0,
                    z=None, y=None, x=None, level: int = 0):
    """Tile-pruned windowed read of one image's level: z prunes whole
    focal-plane pages, the (y, x) window selects intersecting tiles.
    Residual trim is a codegen filter."""
    from bioio_spark.sources.zarr_image import _norm_window

    cat, plan = _chunk_plan(path)
    if not (0 <= scene < len(cat["images"])):
        raise IndexError(f"{path}: no image {scene}")
    im = cat["images"][scene]
    lv0 = [lv for lv in im["levels"] if lv["r"] == level]
    if not lv0:
        raise IndexError(f"{path}: image {scene} has no level {level}")
    h, w = lv0[0]["size_y"], lv0[0]["size_x"]
    z0, z1 = _norm_window(z, im["z_n"])
    y0, y1 = _norm_window(y, h)
    x0, x1 = _norm_window(x, w)
    key = f"Image:{scene}"
    pruned = [r for r in plan
              if r["scene"] == key and r["res_level"] == level
              and z0 <= r["z"] < z1
              and r["y0"] < y1 and r["y0"] + r["ch"] > y0
              and r["x0"] < x1 and r["x0"] + r["cw"] > x0]
    schema = ("scene string, res_level int, z int, y int, x int, "
              "s int, value double")
    if not pruned:
        return spark.createDataFrame([], schema)
    plan_df = spark.createDataFrame(pd.DataFrame(pruned)).repartition(
        min(len(pruned), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(_decode_batches, schema=schema)
    return px.filter(
        (F.col("y") >= y0) & (F.col("y") < y1)
        & (F.col("x") >= x0) & (F.col("x") < x1)).drop(
        "scene", "res_level")


class ScnImageReader:
    """BioImage reader over Leica SCN slide collections."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_SCN_EXTS):
            return False
        try:
            from bioio_spark.formats.scn import read_scn_catalog
            read_scn_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("SCN dimensions come from the collection "
                             "XML")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)

        cat, plan = _chunk_plan(self._path)
        pps = self._pps
        scene_rows, channel_rows = [], []
        for si, im in enumerate(cat["images"]):
            scene = f"Image:{si}"
            pg0 = im["levels"][0]["page"]
            spp = pg0["spp"]
            dt = np.dtype(pg0["dtype"]).newbyteorder("=")
            for ci, nm in enumerate(resolve_channel_names(
                    self._channel_names, 1, si)):
                channel_rows.append({
                    "image_id": self._image_id, "scene": scene,
                    "c": ci, "channel_name": nm})
            scene_rows.append({
                "image_id": self._image_id, "scene": scene,
                "scene_idx": si,
                "dim_order": "TCZYXS" if spp > 1 else "TCZYX",
                "size_t": 1, "size_c": 1, "size_z": im["z_n"],
                "size_y": im["size_y"], "size_x": im["size_x"],
                "size_m": None,
                "size_s": spp if spp > 1 else None,
                "dtype": dt.name, "ome_pixel_type": dt.name,
                "res_levels": list(range(im["n_levels"])),
                "pps_z": pps.Z if pps else None,
                "pps_y": pps.Y if pps else None,
                "pps_x": pps.X if pps else None,
                "time_interval": None,
                "metadata": f"SCN image {im['name']}",
            })

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _decode_batches,
                  schema="scene string, res_level int, z int, y int, "
                         "x int, s int, value double")
              .select(
                  F.lit(self._image_id).alias("image_id"), "scene",
                  "res_level",
                  F.lit(0).alias("t"), F.lit(0).alias("c"),
                  "z", "y", "x",
                  F.lit(-1).alias("m"), "s", "value")
              .select(*PIXEL_COLUMNS))

        return ImageDataset(pixels=px, scenes=pd.DataFrame(scene_rows),
                            channels=pd.DataFrame(channel_rows))
