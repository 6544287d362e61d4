"""Hamamatsu NDPI (.ndpi) whole-slide reader — native coverage for a
format the reference can only reach through the bioio-bioformats Java
bridge (ref README.md:74 routes .ndpi). Built on the in-repo TIFF
machinery plus the public SourceLens classification
(bioio_spark.formats.ndpi); decode path shared with the SVS reader
(striped/tiled chunk seek-reads, gray or RGB).

- **Scenes**: Image:0 is the pyramid (SourceLens>0 pages as
  res_levels); the SourceLens=-1 macro and -2 map pages follow as
  their own scenes.
- **Catalog (driver-side)**: one IFD walk; XResolution (cm unit) ->
  physical pixel size. No pixel IO (D8 contract).
- **Pixels (executor-side)**: one plan row per (scene, level, strip);
  zero shuffle, one ranged GET per strip at object-store scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bioio_spark.sources.svs_image import _decode_batches

_NDPI_EXTS = (".ndpi",)


def _chunk_plan(path: str):
    from bioio_spark.formats.ndpi import read_ndpi_catalog

    cat = read_ndpi_catalog(path)
    ap = os.path.abspath(path)
    plan = []

    def add_page(pg, scene, level):
        for ch in pg["chunks"]:
            plan.append({
                "path": ap, "scene": scene, "res_level": level,
                "offset": ch["offset"], "nbytes": ch["nbytes"],
                "y0": ch["y0"], "x0": ch["x0"],
                "ch": ch["h"], "cw": ch["w"],
                "page_h": pg["h"], "page_w": pg["w"],
                "dtype": pg["dtype"], "comp": pg["comp"],
                "spp": pg["spp"],
                "jpeg_tables": pg.get("jpeg_tables"),
            })

    for lv, pg in enumerate(cat["levels"]):
        add_page(pg, "Image:0", lv)
    si = 1
    extras = []
    for kind in ("macro", "map"):
        pg = cat[kind]
        if pg is not None:
            add_page(pg, f"Image:{si}", 0)
            extras.append((kind, pg, f"Image:{si}"))
            si += 1
    return cat, extras, plan


class NdpiImageReader:
    """BioImage reader over Hamamatsu NDPI whole-slide files."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_NDPI_EXTS):
            return False
        try:
            from bioio_spark.formats.ndpi import read_ndpi_catalog
            read_ndpi_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("NDPI is a 2D (optionally RGB) slide "
                             "pyramid; dim_order is fixed")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        cat, extras, plan = _chunk_plan(self._path)
        pps = self._pps
        if pps is None and cat["um_per_px"]:
            pps = PhysicalPixelSizes(Z=None, Y=cat["um_per_px"],
                                     X=cat["um_per_px"])

        scene_rows, channel_rows = [], []

        def add_scene(si, pg, res_levels, kind):
            scene = f"Image:{si}"
            spp = pg["spp"]
            dt = np.dtype(pg["dtype"]).newbyteorder("=")
            for ci, nm in enumerate(resolve_channel_names(
                    self._channel_names, 1, si)):
                channel_rows.append({
                    "image_id": self._image_id, "scene": scene,
                    "c": ci, "channel_name": nm})
            scene_rows.append({
                "image_id": self._image_id, "scene": scene,
                "scene_idx": si,
                "dim_order": "TCZYXS" if spp > 1 else "TCZYX",
                "size_t": 1, "size_c": 1, "size_z": 1,
                "size_y": pg["h"], "size_x": pg["w"],
                "size_m": None,
                "size_s": spp if spp > 1 else None,
                "dtype": dt.name, "ome_pixel_type": dt.name,
                "res_levels": res_levels,
                "pps_z": None,
                "pps_y": pps.Y if pps and si == 0 else None,
                "pps_x": pps.X if pps and si == 0 else None,
                "time_interval": None,
                "metadata": (f"NDPI {kind} SourceLens="
                             f"{cat['source_lens']}"),
            })

        add_scene(0, cat["levels"][0],
                  list(range(len(cat["levels"]))), "slide")
        for kind, pg, scene in extras:
            add_scene(int(scene.split(":")[1]), pg, [0], kind)

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  _decode_batches,
                  schema="scene string, res_level int, y int, x int, "
                         "s int, value double")
              .select(
                  F.lit(self._image_id).alias("image_id"), "scene",
                  "res_level",
                  F.lit(0).alias("t"), F.lit(0).alias("c"),
                  F.lit(0).alias("z"), "y", "x",
                  F.lit(-1).alias("m"), "s", "value")
              .select(*PIXEL_COLUMNS))

        return ImageDataset(pixels=px, scenes=pd.DataFrame(scene_rows),
                            channels=pd.DataFrame(channel_rows))
