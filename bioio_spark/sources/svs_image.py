"""Aperio SVS (.svs) whole-slide reader — native coverage for a format
the reference can only reach through the bioio-bioformats Java bridge
(ref README.md:74 routes .svs). Built on the in-repo TIFF machinery
(tiled pages, JPEG-in-TIFF chunks) plus the public Aperio layout
(bioio_spark.formats.svs).

- **Scenes**: Image:0 is the pyramid (tiled pages as res_levels 0..k,
  ceil-halving per level — the C4 contract); the striped associated
  images (thumbnail, label, macro) follow as their own scenes, the
  Bio-Formats series model.
- **Catalog (driver-side)**: one IFD walk + the pipe-metadata parse;
  ``MPP`` feeds PhysicalPixelSizes (µm), ``AppMag`` is kept in scene
  metadata. No pixel IO (D8 contract).
- **Pixels (executor-side)**: the driver plans one row per surviving
  (scene, level, tile/strip) and a `mapInPandas` seek-reads + decodes
  exactly its chunk (raw or baseline-JPEG via the in-repo codec) —
  whole-slide images are the canonical 100 TB-shaped input, and this
  keeps each task one ranged GET + one tile decode, zero shuffle.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from bioio_spark.fsio import read_range

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_SVS_EXTS = (".svs",)


def _chunk_plan(path: str):
    """(catalog, plan rows): one row per (scene, res_level, chunk)."""
    from bioio_spark.formats.svs import read_svs_catalog

    cat = read_svs_catalog(path)
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
    for kind in ("thumbnail", "label", "macro"):
        pg = cat[kind]
        if pg is not None:
            add_page(pg, f"Image:{si}", 0)
            extras.append((kind, pg, f"Image:{si}"))
            si += 1
    return cat, extras, plan


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Seek-read + decode one tile/strip per plan row; RGB samples land
    in the s column (the imageio-tier convention)."""
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
                if block.ndim == 2 and r.spp == 3:
                    raise ValueError("RGB page decoded as gray")
            else:
                raw = decompress_tiff_chunk(payload, r.comp)
                shape = (r.ch, r.cw, r.spp) if r.spp > 1 else \
                    (r.ch, r.cw)
                block = np.frombuffer(
                    raw, dtype=dt,
                    count=r.ch * r.cw * r.spp).reshape(shape)
            # tiles are stored full-size; trim edge overhang
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
                "y": np.repeat(np.arange(
                    r.y0, r.y0 + y_n, dtype=np.int32), x_n * s_n),
                "x": np.tile(np.repeat(np.arange(
                    r.x0, r.x0 + x_n, dtype=np.int32), s_n), y_n),
                "s": s_col,
                "value": block.ravel().astype(np.float64),
            })


def read_svs_window(spark: SparkSession, path: str,
                    y=None, x=None, level: int = 0):
    """Tile-pruned windowed read of the pyramid scene: the (y, x)
    window selects only intersecting tiles of the requested level —
    reading a 10k x 10k region of a multi-GB slide touches
    O(window/tile) bytes. Residual trim is a codegen filter."""
    from bioio_spark.sources.zarr_image import _norm_window

    cat, _extras, plan = _chunk_plan(path)
    if not (0 <= level < len(cat["levels"])):
        raise IndexError(f"{path}: no pyramid level {level}")
    pg = cat["levels"][level]
    y0, y1 = _norm_window(y, pg["h"])
    x0, x1 = _norm_window(x, pg["w"])
    pruned = [r for r in plan
              if r["scene"] == "Image:0" and r["res_level"] == level
              and r["y0"] < y1 and r["y0"] + r["ch"] > y0
              and r["x0"] < x1 and r["x0"] + r["cw"] > x0]
    schema = ("scene string, res_level int, y int, x int, s int, "
              "value double")
    if not pruned:
        return spark.createDataFrame([], schema)
    plan_df = spark.createDataFrame(pd.DataFrame(pruned)).repartition(
        min(len(pruned), spark.sparkContext.defaultParallelism))
    px = plan_df.mapInPandas(_decode_batches, schema=schema)
    return px.filter(
        (F.col("y") >= y0) & (F.col("y") < y1)
        & (F.col("x") >= x0) & (F.col("x") < x1)).drop(
        "scene", "res_level")


class SvsImageReader:
    """BioImage reader over Aperio SVS whole-slide files."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str):
            return False
        if not image.lower().endswith(_SVS_EXTS):
            return False
        try:
            from bioio_spark.formats.svs import read_svs_catalog
            read_svs_catalog(image)
            return True
        except Exception:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError("SVS is a 2D (optionally RGB) slide "
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
        meta = cat["meta"]
        pps = self._pps
        mpp = meta.get("MPP")
        if pps is None and mpp:
            pps = PhysicalPixelSizes(Z=None, Y=float(mpp), X=float(mpp))

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
                "metadata": (f"SVS {kind} AppMag="
                             f"{meta.get('AppMag')} MPP={mpp}"),
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
