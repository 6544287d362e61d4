"""LIF reader (.lif) — the reference's bioio-lif plugin tier (ref
README.md:62), over the in-repo pure-Python Leica block+XML codec
(bioio_spark.formats.lif).

- **Catalog (driver-side)**: one block walk + the settings XML —
  scene names, shapes, dtypes, channel strides, and physical pixel
  sizes (dimension Length metres -> µm), no pixel IO.
- **Pixels (executor-side)**: one plan row per (scene, t, c, z)
  PLANE; each task seek-reads its plane through the stride arithmetic
  (`read_lif_plane`) — parallelism = plane count, zero shuffle, one
  ranged GET per plane at object-store scale (the same planned-read
  shape as the DV and CZI tiers)."""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _lif_paths(image: str) -> list[str]:
    if os.path.isdir(image):
        return sorted(p for p in _glob.glob(os.path.join(image, "*"))
                      if p.lower().endswith(".lif"))
    return [image]


def read_lif_window(spark: SparkSession, path: str,
                    t=None, c=None, z=None, y=None, x=None,
                    scene: int = 0):
    """Window-pruned LIF read: t/c/z selectors prune whole PLANES via
    the block walk + XML strides (driver-side, header-only IO), and the
    y window becomes a row-range seek inside each surviving plane
    (read_lif_plane y0/y1 — only the window's rows' bytes move); the x
    window prunes in numpy after the stride gather. Tile-scan (M > 1)
    scenes are not routed here — their global mosaic coordinates come
    from the stitch operator, so BioImage.read_window falls back to the
    standardized path for them."""
    from bioio_spark.formats.lif import parse_lif_header
    from bioio_spark.sources.zarr_image import _norm_window

    path = os.path.abspath(path)
    header = parse_lif_header(path)
    if not (0 <= scene < len(header["scenes"])):
        raise IndexError(f"{path}: no scene {scene}")
    sc = header["scenes"][scene]
    if sc.get("m_n", 1) > 1:
        raise ValueError(
            "read_lif_window reads single-tile scenes; tile scans "
            "route through BioImage/mosaic semantics")
    t_n, c_n, z_n, y_n, x_n = sc["shape"]
    t0, t1 = _norm_window(t, t_n)
    c0, c1 = _norm_window(c, c_n)
    z0, z1 = _norm_window(z, z_n)
    y0, y1 = _norm_window(y, y_n)
    x0, x1 = _norm_window(x, x_n)
    plan = [{"path": path, "scene_i": scene, "t": ti, "c": ci, "z": zi}
            for ti in range(t0, t1)
            for ci in range(c0, c1)
            for zi in range(z0, z1)]

    schema = "t int, c int, z int, y int, x int, value double"
    if not plan or y0 >= y1 or x0 >= x1:
        return spark.createDataFrame([], schema)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bioio_spark.formats.lif import (parse_lif_header,
                                             read_lif_plane)

        hdr_cache: dict = {}
        for pdf in it:
            for r in pdf.itertuples():
                if r.path not in hdr_cache:
                    hdr_cache[r.path] = parse_lif_header(r.path)
                rows = read_lif_plane(
                    r.path, hdr_cache[r.path], r.scene_i,
                    r.t, r.c, r.z, y0=y0, y1=y1)
                plane = rows[:, x0:x1]               # exact numpy prune
                yield pd.DataFrame({
                    "t": np.full(plane.size, r.t, np.int32),
                    "c": np.full(plane.size, r.c, np.int32),
                    "z": np.full(plane.size, r.z, np.int32),
                    "y": np.repeat(np.arange(
                        y0, y1, dtype=np.int32), x1 - x0),
                    "x": np.tile(np.arange(
                        x0, x1, dtype=np.int32), y1 - y0),
                    "value": plane.ravel().astype(np.float64),
                })

    plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
        min(len(plan), spark.sparkContext.defaultParallelism))
    return plan_df.mapInPandas(batches, schema=schema)


def read_lif_planes(spark: SparkSession, path: str, scene: int = 0):
    """ZERO-SHUFFLE plane -> planes-layout read (the LIF member of the
    planes family): one payload row per (t, c, z) plane via the stride
    arithmetic. Tile-scan scenes route through BioImage/mosaic."""
    from bioio_spark.formats.lif import parse_lif_header

    path = os.path.abspath(path)
    header = parse_lif_header(path)
    if not (0 <= scene < len(header["scenes"])):
        raise IndexError(f"{path}: no scene {scene}")
    sc = header["scenes"][scene]
    if sc.get("m_n", 1) > 1:
        raise ValueError(
            "read_lif_planes reads single-tile scenes; tile scans "
            "route through BioImage/mosaic semantics")
    t_n, c_n, z_n, y_n, x_n = sc["shape"]
    plan = [{"path": path, "scene_i": scene, "t": t, "c": c, "z": z}
            for t in range(t_n) for c in range(c_n)
            for z in range(z_n)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bioio_spark.formats.lif import (parse_lif_header,
                                             read_lif_plane)

        hdr_cache: dict = {}
        for pdf in it:
            for r in pdf.itertuples():
                if r.path not in hdr_cache:
                    hdr_cache[r.path] = parse_lif_header(r.path)
                plane = read_lif_plane(
                    r.path, hdr_cache[r.path], r.scene_i,
                    r.t, r.c, r.z)
                yield pd.DataFrame({
                    "t": [int(r.t)], "c": [int(r.c)], "z": [int(r.z)],
                    "y0": [0], "x0": [0],
                    "h": [plane.shape[0]], "w": [plane.shape[1]],
                    "values": [plane.ravel().astype(np.float64)],
                })

    plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
        min(len(plan), spark.sparkContext.defaultParallelism))
    return plan_df.mapInPandas(
        batches,
        schema="t int, c int, z int, y0 int, x0 int, h int, w int, "
               "values array<double>")


class LifImageReader:
    """BioImage reader over baseline LIF files (plugin tier)."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str) or not \
                image.lower().endswith(".lif"):
            return False
        try:
            import struct

            with open(image, "rb") as f:
                head = f.read(8)
            return len(head) == 8 and \
                struct.unpack("<i", head[:4])[0] == 0x70
        except OSError:
            return False

    def __init__(self, image: str, dim_order=None, channel_names=None,
                 physical_pixel_sizes=None, image_id: str = "img",
                 **_kwargs):
        if dim_order is not None:
            raise ValueError(
                "LIF dimensions come from the settings XML")
        self._path = image
        self._image_id = image_id
        self._channel_names = channel_names
        self._pps = physical_pixel_sizes

    def to_dataset(self, spark: SparkSession):
        from bioio_spark.formats.lif import parse_lif_header
        from bioio_spark.ome_utils import resolve_channel_names
        from bioio_spark.sources.array_like import (PIXEL_COLUMNS,
                                                    ImageDataset)
        from bioio_spark.types import PhysicalPixelSizes

        paths = _lif_paths(self._path)
        if len(paths) != 1:
            raise ValueError("LifImageReader reads one .lif file")
        path = os.path.abspath(paths[0])
        header = parse_lif_header(path)
        if not header["scenes"]:
            raise ValueError(f"{path}: LIF holds no images")

        scene_rows, channel_rows, tile_rows, plan = [], [], [], []
        for si, sc in enumerate(header["scenes"]):
            t_n, c_n, z_n, y_n, x_n = sc["shape"]
            m_n = sc.get("m_n", 1)
            scene = f"Image:{si}"
            for ci, nm in enumerate(resolve_channel_names(
                    self._channel_names, c_n, si)):
                channel_rows.append({
                    "image_id": self._image_id, "scene": scene,
                    "c": ci, "channel_name": nm})
            pps = self._pps
            if pps is None and sc["pps"]:
                pz, py, px_ = sc["pps"]
                pps = PhysicalPixelSizes(Z=pz, Y=py, X=px_)
            # tile-scan stage positions (µm) -> pixel offsets for the
            # M1 stitch, via the scene's pixel size
            if m_n > 1 and sc.get("tiles_um") and pps and pps.Y \
                    and pps.X:
                ys = [p_[0] for p_ in sc["tiles_um"]]
                xs = [p_[1] for p_ in sc["tiles_um"]]
                for m, (py_, px2) in enumerate(sc["tiles_um"]):
                    tile_rows.append({
                        "image_id": self._image_id, "scene": scene,
                        "m": m,
                        "y_off": int(round((py_ - min(ys)) / pps.Y)),
                        "x_off": int(round((px2 - min(xs)) / pps.X))})
            scene_rows.append({
                "image_id": self._image_id, "scene": scene,
                "scene_idx": si,
                "dim_order": ("M" if m_n > 1 else "") + "TCZYX",
                "size_t": t_n, "size_c": c_n, "size_z": z_n,
                "size_y": y_n, "size_x": x_n,
                "size_m": m_n if m_n > 1 else None, "size_s": None,
                "dtype": sc["dtype"], "ome_pixel_type": sc["dtype"],
                "pps_z": pps.Z if pps else None,
                "pps_y": pps.Y if pps else None,
                "pps_x": pps.X if pps else None,
                "time_interval": None,
                "metadata": header["xml"],
            })
            for m in range(m_n):
                for t in range(t_n):
                    for c in range(c_n):
                        for z in range(z_n):
                            plan.append({
                                "path": path, "scene": scene,
                                "scene_i": si,
                                "m": m if m_n > 1 else -1,
                                "t": t, "c": c, "z": z})

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from bioio_spark.formats.lif import (parse_lif_header,
                                                 read_lif_plane)

            hdr_cache: dict = {}
            for pdf in it:
                for r in pdf.itertuples():
                    if r.path not in hdr_cache:
                        hdr_cache[r.path] = parse_lif_header(r.path)
                    plane = read_lif_plane(
                        r.path, hdr_cache[r.path], r.scene_i,
                        r.t, r.c, r.z, m=max(r.m, 0))
                    y_n, x_n = plane.shape
                    yield pd.DataFrame({
                        "scene": r.scene,
                        "m": np.full(plane.size, r.m, np.int32),
                        "t": np.full(plane.size, r.t, np.int32),
                        "c": np.full(plane.size, r.c, np.int32),
                        "z": np.full(plane.size, r.z, np.int32),
                        "y": np.repeat(
                            np.arange(y_n, dtype=np.int32), x_n),
                        "x": np.tile(
                            np.arange(x_n, dtype=np.int32), y_n),
                        "value": plane.ravel().astype(np.float64),
                    })

        plan_df = spark.createDataFrame(pd.DataFrame(plan)).repartition(
            min(len(plan), spark.sparkContext.defaultParallelism))
        px = (plan_df.mapInPandas(
                  batches,
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
