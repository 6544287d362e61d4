"""Writers (S10, ref bioio/writers/__init__.py:10-15, bio_image.py:1229-1301).

Native sink: scene-partitioned parquet of the standardized pixel frame plus
catalog sidecars. OME-TIFF export mirrors the reference's writer-plugin
path: per-scene grouped export via applyInPandas, each scene encoded
executor-side with the in-repo pure-Python baseline TIFF codec
(bioio_spark.formats.tiff) — header, strip offsets, SampleFormat, and the
OME-XML ImageDescription are all real and roundtrip-verified against the
codec's own decoder.
"""

from __future__ import annotations

from typing import Optional

class Writer:
    """Writer base contract (the reference's bioio_base.writer.Writer
    surface, ref __init__.py:20): implementations provide a static
    ``save(data, uri, dim_order=None, **kwargs)``."""

    @staticmethod
    def save(data, uri: str, dim_order: Optional[str] = None,
             **kwargs) -> None:
        raise NotImplementedError(
            "Writer subclasses must implement save()")


WRITER_REGISTRY: dict[str, object] = {}

__all__ = ["Writer", "WRITER_REGISTRY", "register_writer",
           "discover_writers", "save_parquet", "save_ome_tiff",
           "save_ome_tiff_single_file", "save_ome_zarr",
           "read_parquet_image", "OmeTiffWriter",
           "OmeZarrWriter", "PngWriter", "JpegWriter", "ImsWriter",
           "DngWriter"]

#: entry-point group external writer packages advertise (the reference's
#: ``bioio.writers`` group, ref writers/__init__.py:10-15)
WRITER_ENTRY_POINT_GROUP = "bioio_spark.writers"


def register_writer(name: str, writer) -> None:
    """Entry-point-style registry (ref writers/__init__.py:10-15)."""
    WRITER_REGISTRY[name] = writer


def discover_writers(group: str = WRITER_ENTRY_POINT_GROUP) -> list[str]:
    """Load writers advertised through importlib.metadata entry points of
    installed distributions — the writer twin of plugins.discover_plugins
    (same S13 core-version compat filter). Each entry point resolves to a
    writer object (or a module exposing ``Writer``). Returns the names
    registered this call; already-registered names are skipped."""
    from importlib import metadata as _md

    from bioio_spark.plugins import (_core_version_tuple, log,
                                     plugin_core_requirement)

    core = _core_version_tuple()
    registered: list[str] = []
    for ep in _md.entry_points(group=group):
        dist = getattr(ep, "dist", None)
        dist_name = getattr(dist, "name", None) or ep.name
        # core-dist-advertised writers are keyed on entry-point name
        # (several writers ship in the one core distribution)
        if dist_name.replace("_", "-").lower() == "bioio-spark":
            dist_name = ep.name
        lo, hi, hi_incl = plugin_core_requirement(dist_name)
        if core < lo or (hi is not None
                         and (core > hi or (not hi_incl and core == hi))):
            log.warning(
                "Writer %s requires bioio-spark in [%s, %s]; running %s "
                "— skipped", dist_name, lo, hi, core)
            continue
        if dist_name in WRITER_REGISTRY:
            continue
        try:
            obj = ep.load()
        except Exception as exc:
            log.warning("Writer %s failed to load: %s", dist_name, exc)
            continue
        writer = getattr(obj, "Writer", obj)
        register_writer(dist_name, writer)
        # the reference also exposes discovered writers as module
        # attributes (`from bioio.writers import DummyWriter`, ref
        # tests/test_writer.py:29-36); mirror that when the entry-point
        # name is a valid identifier
        if ep.name.isidentifier():
            import sys as _sys

            mod = _sys.modules[__name__]
            setattr(mod, ep.name, writer)
            if ep.name not in __all__:
                __all__.append(ep.name)
        registered.append(dist_name)
    return registered


def save_parquet(img, uri: str, select_scenes=None) -> None:
    """Scene-partitioned parquet sink (ref bio_image.py:1229-1301 loop:
    scene order preserved, scene ids carried as partition values).

    Alongside the pixel data, the scene/channel catalogs are written as a
    JSON sidecar under `{uri}/_catalog` (underscore-prefixed paths are
    metadata by parquet convention, so a plain `spark.read.parquet(uri)`
    on the pixels still works). The sidecar is what lets a reload recover
    the cataloged dtype / pixel sizes instead of guessing."""
    import json

    scenes = list(img.scenes)
    if select_scenes is not None:
        sel = [s if isinstance(s, str) else scenes[s] for s in select_scenes]
        scenes = [s for s in scenes if s in sel]
    df = img.get_stack_dataframe()
    current = img.current_scene_index
    try:
        keep_idx = [img.scenes.index(s) for s in scenes]
        from pyspark.sql import functions as F

        (df.filter(F.col("scene_idx").isin(keep_idx))
           .repartition("scene_idx")
           .write.mode("overwrite")
           .partitionBy("scene_idx")
           .parquet(uri))

        # The written pixels are the *standardized* (stitched, TCZYX) frame,
        # so the sidecar records the standardized per-scene dims — not the
        # raw catalog row — plus the native dtype / physical sizes the
        # relational layout cannot carry (value column is DOUBLE).
        scene_rows, channel_rows = [], []
        for s in scenes:
            img.set_scene(s)
            d = img.dims
            base = img._scene_catalog_row()
            scene_rows.append({
                "image_id": base["image_id"], "scene": s,
                "scene_idx": img.scenes.index(s),
                "dim_order": d.order,
                **{f"size_{c.lower()}":
                   (d[c][0] if c in d.order else None) for c in "TCZYXMS"},
                "dtype": base.get("dtype", "float64"),
                "ome_pixel_type": base.get("ome_pixel_type"),
                "pps_z": base.get("pps_z"), "pps_y": base.get("pps_y"),
                "pps_x": base.get("pps_x"),
                "time_interval": base.get("time_interval"),
                "metadata": base.get("metadata"),
            })
            for ci, name in enumerate(img.channel_names):
                channel_rows.append({
                    "image_id": base["image_id"], "scene": s,
                    "c": ci, "channel_name": name})
        sidecar = json.dumps({
            "scenes": [_jsonable_record(r) for r in scene_rows],
            "channels": [_jsonable_record(r) for r in channel_rows],
        })
        spark = df.sparkSession
        (spark.createDataFrame([(sidecar,)], "v string")
         .coalesce(1).write.mode("overwrite").text(uri + "/_catalog"))
    finally:
        img.set_scene(current)


def _jsonable_record(rec: dict) -> dict:
    """numpy scalars / NaN -> plain JSON values for the catalog sidecar."""
    import math

    import numpy as np

    def conv(v):
        if v is None:
            return None
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, (np.floating, float)):
            f = float(v)
            return None if math.isnan(f) else f
        if isinstance(v, np.ndarray):
            return [conv(x) for x in v.tolist()]
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        return v

    return {k: conv(v) for k, v in rec.items()}


class OmeTiffWriter:
    """OME-TIFF writer (ref bioio writer-plugin contract,
    writers/__init__.py:10-15; save loop bio_image.py:1229-1301).

    Encoding is the in-repo pure-Python baseline codec
    (bioio_spark.formats.tiff): uncompressed little-endian multi-page
    grayscale TIFF with the OME-XML block in IFD0's ImageDescription —
    no external image library. `save` takes an ndarray (driver-side
    encode, like the reference's writer); the distributed per-scene path
    for BioImage/DataFrame-backed images is save_ome_tiff() below.
    """

    @staticmethod
    def save(data, uri: str, dim_order=None, channel_names=None,
             image_name=None, physical_pixel_sizes=None,
             compression: int = 1) -> None:
        import numpy as np

        from bioio_spark.dimensions import (guess_dim_order,
                                            validate_dim_order)
        from bioio_spark.formats.tiff import encode_ome_tiff
        from bioio_spark.ome_utils import resolve_channel_names

        a = np.asarray(data)
        order = (validate_dim_order(dim_order, a.shape) if dim_order
                 else guess_dim_order(a.shape))
        # standardize to TCZYX(+S): insert missing standard dims at size 1,
        # drop non-standard dims at index 0 (the BioImage-tier coercion,
        # ref tests/test_array_like_reader.py:1028-1047; S rides along as
        # the trailing interleaved-sample dim, ref bio_image.py:500-546)
        for d in order:
            if d not in "TCZYXS":
                a = a.take([0], axis=order.index(d)).squeeze(
                    axis=order.index(d))
                order = order.replace(d, "")
        for d in "TCZYX":
            if d not in order:
                a = np.expand_dims(a, 0)
                order = d + order
        target = "TCZYX" + ("S" if "S" in order else "")
        a = np.transpose(a, [order.index(d) for d in target])
        names = resolve_channel_names(channel_names, a.shape[1], 0) or None
        payload = encode_ome_tiff(
            a, image_id="Image:0", image_name=image_name,
            channel_names=names,
            physical_pixel_sizes=physical_pixel_sizes,
            compression=compression)
        with open(uri, "wb") as f:
            f.write(payload)


register_writer("OmeTiffWriter", OmeTiffWriter)


class ImsWriter:
    """Imaris IMS writer — the write half of the native-HDF5 story,
    making .ims read/write symmetric like TIFF/Zarr (the reference
    reaches .ims only through the bioio-bioformats Java bridge, ref
    README.md:74, and has no IMS writer at all).

    Encoding is the in-repo HDF5 composer (formats/hdf5.build_hdf5 —
    superblock/v1 object headers/B-trees, no h5py/libhdf5) laid out
    per the public Imaris 5.5 convention: /DataSet/ResolutionLevel r/
    TimePoint t/Channel c/Data plus /DataSetInfo attributes
    (ImageSize*, Ext*, channel names). ``n_levels`` > 1 writes the
    ceil-half pyramid; ``chunks``/``gzip`` select the chunked/deflate
    layout wild Imaris files use."""

    @staticmethod
    def save(data, uri: str, dim_order=None, channel_names=None,
             physical_pixel_sizes=None, n_levels: int = 1,
             chunks=None, gzip: bool = False) -> None:
        import numpy as np

        from bioio_spark.dimensions import (guess_dim_order,
                                            validate_dim_order)
        from bioio_spark.formats.ims import encode_ims

        a = np.asarray(data)
        order = (validate_dim_order(dim_order, a.shape) if dim_order
                 else guess_dim_order(a.shape))
        for d in order:
            if d not in "TCZYX":
                a = a.take([0], axis=order.index(d)).squeeze(
                    axis=order.index(d))
                order = order.replace(d, "")
        for d in "TCZYX":
            if d not in order:
                a = np.expand_dims(a, 0)
                order = d + order
        a = np.transpose(a, [order.index(d) for d in "TCZYX"])
        pps = physical_pixel_sizes
        if pps is None:
            pps_zyx = (1.0, 1.0, 1.0)
        elif hasattr(pps, "Z"):
            pps_zyx = (pps.Z or 1.0, pps.Y or 1.0, pps.X or 1.0)
        else:
            pps_zyx = tuple(pps)
        payload = encode_ims(a, channel_names=channel_names,
                             pps_zyx_um=pps_zyx, n_levels=n_levels,
                             chunks=chunks, gzip=gzip)
        with open(uri, "wb") as f:
            f.write(payload)


register_writer("ImsWriter", ImsWriter)


class DngWriter:
    """Adobe DNG writer — the write half of the camera-RAW story,
    making .dng read/write symmetric like TIFF/Zarr/IMS (the
    reference has no DNG writer; camera RAWs route through the
    bioio-bioformats bridge read-only, ref README.md:70).

    `save` takes a 2-D uint16 CFA mosaic (or anything squeezable to
    YX) and composes a valid single-IFD DNG via formats/dng.build_dng
    — Compression 1 (none) or 7 (lossless JPEG SOF3 strips through
    the in-repo formats/ljpeg codec)."""

    @staticmethod
    def save(data, uri: str, dim_order=None, channel_names=None,
             physical_pixel_sizes=None, compression: int = 7,
             rows_per_strip: int = 0,
             cfa_pattern: bytes = bytes((0, 1, 1, 2))) -> None:
        import numpy as np

        from bioio_spark.formats.dng import build_dng

        a = np.asarray(data)
        a = np.squeeze(a)
        if a.ndim != 2:
            raise ValueError(
                "DngWriter takes a single YX CFA mosaic plane "
                f"(got shape {np.asarray(data).shape})")
        if a.dtype.kind not in "ui":
            raise ValueError(
                f"DngWriter takes integer mosaic data (got "
                f"{a.dtype}); quantize floats explicitly first")
        if a.size and (int(a.min()) < 0 or int(a.max()) > 0xFFFF):
            raise ValueError(
                "DngWriter mosaic values must fit uint16 "
                f"(got range [{int(a.min())}, {int(a.max())}])")
        payload = build_dng(a.astype(np.uint16),
                            compression=compression,
                            rows_per_strip=rows_per_strip,
                            cfa_pattern=cfa_pattern)
        with open(uri, "wb") as f:
            f.write(payload)


register_writer("DngWriter", DngWriter)


class OmeZarrWriter:
    """OME-Zarr writer (the reference ecosystem's OMEZarrWriter,
    ref README.md:81 — OME-NGFF over Zarr v2).

    `save` takes an ndarray and writes a single-image NGFF 0.4 store
    driver-side (every chunk through the in-repo Zarr v2 codec); the
    distributed chunk-parallel path for BioImage/DataFrame-backed images
    is save_ome_zarr() below."""

    @staticmethod
    def save(data, uri: str, dim_order=None, channel_names=None,
             image_name=None, physical_pixel_sizes=None,
             chunks=None, compressor: str = "zlib") -> None:
        import math
        import os

        import numpy as np

        from bioio_spark.dimensions import (guess_dim_order,
                                            validate_dim_order)
        from bioio_spark.formats.zarr import (ZGROUP, build_ngff_attrs,
                                              build_zarray, chunk_key,
                                              encode_chunk)
        from bioio_spark.ome_utils import resolve_channel_names

        a = np.asarray(data)
        order = (validate_dim_order(dim_order, a.shape) if dim_order
                 else guess_dim_order(a.shape))
        for d in order:
            if d not in "TCZYX":
                a = a.take([0], axis=order.index(d)).squeeze(
                    axis=order.index(d))
                order = order.replace(d, "")
        for d in "TCZYX":
            if d not in order:
                a = np.expand_dims(a, 0)
                order = d + order
        a = np.transpose(a, [order.index(d) for d in "TCZYX"])
        cs = tuple(chunks) if chunks else _default_zarr_chunks(a.shape)
        names = resolve_channel_names(channel_names, a.shape[1], 0) or None

        os.makedirs(os.path.join(uri, "0"), exist_ok=True)
        with open(os.path.join(uri, ".zgroup"), "w") as f:
            f.write(ZGROUP)
        with open(os.path.join(uri, ".zattrs"), "w") as f:
            f.write(build_ngff_attrs(image_name or "Image:0", names,
                                     physical_pixel_sizes))
        with open(os.path.join(uri, "0", ".zarray"), "w") as f:
            f.write(build_zarray(a.shape, cs, a.dtype,
                                 compressor=compressor))
        grid = [math.ceil(s / c) for s, c in zip(a.shape, cs)]
        for idx in np.ndindex(*grid):
            block = np.zeros(cs, dtype=a.dtype)
            sl = tuple(slice(g * c, min((g + 1) * c, s))
                       for g, c, s in zip(idx, cs, a.shape))
            ext = tuple(s.stop - s.start for s in sl)
            block[tuple(slice(0, e) for e in ext)] = a[sl]
            with open(os.path.join(uri, "0", chunk_key(idx)), "wb") as f:
                f.write(encode_chunk(block, compressor=compressor))


register_writer("OmeZarrWriter", OmeZarrWriter)


class PngWriter:
    """Grayscale PNG writer over the baseline codec (formats/png.py):
    one 2D uint8/uint16 plane per file. Higher-dim input is coerced the
    BioImage way: non-YX standard dims sliced at index 0."""

    @staticmethod
    def save(data, uri: str, dim_order=None, **_kwargs) -> None:
        import numpy as np

        from bioio_spark.formats.png import encode_png

        a = np.asarray(data)
        while a.ndim > 2:
            a = a[0]
        if a.ndim != 2:
            raise ValueError("PngWriter needs at least a 2D plane")
        with open(uri, "wb") as f:
            f.write(encode_png(a))


register_writer("PngWriter", PngWriter)


class JpegWriter:
    """Baseline JPEG writer over the in-repo codec (formats/jpeg.py):
    2D uint8 grayscale or (H, W, 3) uint8 RGB planes."""

    @staticmethod
    def save(data, uri: str, quality: int = 90,
             subsampling: str = "444", **_kwargs) -> None:
        import numpy as np

        from bioio_spark.formats.jpeg import encode_jpeg

        a = np.asarray(data)
        a = a.reshape(a.shape[-3:]) if a.ndim > 3 else a
        if a.ndim == 3 and a.shape[2] != 3:
            a = a.reshape(a.shape[-2:])
        with open(uri, "wb") as f:
            f.write(encode_jpeg(a.astype(np.uint8), quality=quality,
                                subsampling=subsampling))


register_writer("JpegWriter", JpegWriter)


class TimeSeriesWriter:
    """Animation writer — the reference's bioio-imageio
    TimeSeriesWriter row (ref README.md:82 routes .gif/.mp4/.mkv
    through ffmpeg). ALL of the reference's routes are native here:
    **.gif** (multi-frame GIF89a via formats/gif.py), **.avi** (RIFF
    container via formats/avi.py, DIB bit-exact or MJPG),
    **.mp4/.mov** (ISO BMFF Motion-JPEG track via formats/mp4.py) and
    **.mkv** (Matroska/EBML V_MJPEG track via formats/mkv.py) — the
    JFIF routes are exact on DC-only blocky content, the
    img_jpeg_roundtrip rule.

    Input: (T, Y, X) uint8 gray or (T, Y, X, 3) uint8 RGB (the
    reference writer's TYX/TYXS contract)."""

    @staticmethod
    def save(data, uri: str, dim_order=None, fps: int = 10,
             codec: str = "rgb", **_kwargs) -> None:
        import numpy as np

        a = np.asarray(data)
        if a.ndim not in (3, 4) or (a.ndim == 4 and a.shape[-1]
                                    not in (3,)):
            raise ValueError(
                "TimeSeriesWriter takes (T, Y, X) or (T, Y, X, 3) "
                f"uint8 data, got shape {a.shape}")
        low = uri.lower()
        if low.endswith(".gif"):
            from bioio_spark.formats.gif import encode_gif

            delay_cs = max(1, round(100 / fps))
            with open(uri, "wb") as f:
                f.write(encode_gif(a.astype(np.uint8),
                                   delays=[delay_cs] * a.shape[0]))
        elif low.endswith(".avi"):
            from bioio_spark.formats.avi import encode_avi

            if a.ndim == 3:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_avi(a.astype(np.uint8), codec=codec,
                                   fps=fps))
        elif low.endswith((".mp4", ".mov")):
            from bioio_spark.formats.mp4 import encode_mp4

            if a.ndim == 3:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_mp4(a.astype(np.uint8), fps=fps))
        elif low.endswith(".mkv"):
            from bioio_spark.formats.mkv import encode_mkv

            if a.ndim == 3:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_mkv(a.astype(np.uint8), fps=fps))
        else:
            raise ValueError(f"{uri}: TimeSeriesWriter writes "
                             f".gif/.avi/.mp4/.mov/.mkv")


register_writer("TimeSeriesWriter", TimeSeriesWriter)


class TwoDWriter:
    """One-frame raster writer — the reference's bioio-imageio
    TwoDWriter row (ref README.md:83 routes .png/.bmp/.jpg and the
    one-frame video containers). Native targets: .png, .bmp,
    .jpg/.jpeg, .gif, .avi (one-frame RIFF), .mp4/.mov, .mkv, and
    .mpg/.mpeg (one-picture MPEG-1 elementary stream via
    formats/mpeg1.py). Input: (Y, X) gray or (Y, X, 3) RGB uint8
    (uint16 allowed for PNG)."""

    @staticmethod
    def save(data, uri: str, dim_order=None, **kwargs) -> None:
        import numpy as np

        a = np.asarray(data)
        if a.ndim not in (2, 3) or (a.ndim == 3
                                    and a.shape[-1] != 3):
            raise ValueError(
                "TwoDWriter takes (Y, X) or (Y, X, 3) data, got "
                f"shape {a.shape}")
        low = uri.lower()
        if low.endswith(".png"):
            from bioio_spark.formats.png import encode_png

            with open(uri, "wb") as f:
                f.write(encode_png(a))
        elif low.endswith(".bmp"):
            from bioio_spark.formats.bmp import encode_bmp

            with open(uri, "wb") as f:
                f.write(encode_bmp(a.astype(np.uint8)))
        elif low.endswith((".jpg", ".jpeg")):
            from bioio_spark.formats.jpeg import encode_jpeg

            with open(uri, "wb") as f:
                f.write(encode_jpeg(a.astype(np.uint8),
                                    quality=kwargs.get("quality", 90)))
        elif low.endswith(".gif"):
            from bioio_spark.formats.gif import encode_gif

            with open(uri, "wb") as f:
                f.write(encode_gif(a.astype(np.uint8)))
        elif low.endswith(".avi"):
            from bioio_spark.formats.avi import encode_avi

            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_avi(a.astype(np.uint8)[None],
                                   codec="rgb"))
        elif low.endswith((".mp4", ".mov")):
            from bioio_spark.formats.mp4 import encode_mp4

            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_mp4(a.astype(np.uint8)[None]))
        elif low.endswith(".mkv"):
            from bioio_spark.formats.mkv import encode_mkv

            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_mkv(a.astype(np.uint8)[None]))
        elif low.endswith((".mpg", ".mpeg")):
            from bioio_spark.formats.mpeg1 import encode_mpeg1

            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            with open(uri, "wb") as f:
                f.write(encode_mpeg1(a.astype(np.uint8)[None]))
        elif low.endswith((".wmv", ".ogg")):
            raise NotImplementedError(
                f"{uri}: proprietary/ffmpeg-tier container — out of "
                f"scope; write .png/.bmp/.jpg/.gif/.avi/.mp4/.mkv/"
                f".mpg for a native format")
        else:
            raise ValueError(f"{uri}: TwoDWriter does not route this "
                             f"extension")


register_writer("TwoDWriter", TwoDWriter)


def save_ome_tiff(img, uri: str, select_scenes=None,
                  compression: int = 1, bigtiff: bool = False,
                  predictor: int = 1, tile=None,
                  n_levels: int = 1) -> list:
    """Distributed OME-TIFF export: one file per scene, encoded
    executor-side via applyInPandas (ref bio_image.py:1229-1301 semantics:
    scene order preserved, scene ids embedded in the OME-XML).

    Each scene's standardized pixels are grouped to one executor, assembled
    into a dense TCZYX block in the native catalog dtype, encoded with the
    baseline codec, and written to `{uri}/scene_{idx}.ome.tiff`. `uri` must
    be a filesystem visible to executors (shared storage on a cluster; the
    reference's tifffile writer has the same constraint).

    Per-scene grouping is the natural parallelism of this sink: OME-TIFF is
    a sequential single-file container, so scenes encode independently but
    one scene cannot be split — the same memory shape as the reference,
    which also assembles whole scenes. Returns the export report rows
    (scene_idx, scene, path, n_pages, n_bytes).

    `compression` 1 writes raw strips, 5 LZW-packs, 8 Deflates (zlib),
    32773 PackBits-RLEs each page; `predictor` 2 applies horizontal
    differencing before LZW/Deflate/PackBits (integer pixels only);
    `tile=(th, tw)` writes the tiled page layout (multiples of 16 — the
    wild pyramidal / .tiles.ome.tif convention, and what makes
    read_tiff_window prune at tile granularity on the way back in);
    `n_levels` > 1 adds SubIFD pyramid children per page (2x2 block-mean
    levels, the same convention as the Zarr sink's multiscales), read
    back via read_tiff_window(level=) / BioImage resolution levels.
    Scenes with an S dim (TCZYXS standard order) encode as interleaved
    multi-sample pages.
    """
    import os

    import pandas as pd

    os.makedirs(uri, exist_ok=True)
    scenes = list(img.scenes)
    if select_scenes is not None:
        sel = [s if isinstance(s, str) else scenes[s] for s in select_scenes]
        scenes = [s for s in scenes if s in sel]

    # per-scene metadata for the executor-side encoder (tiny; closure-
    # captured, not shuffled)
    meta: dict[int, dict] = {}
    current = img.current_scene_index
    try:
        for s in scenes:
            img.set_scene(s)
            d = img.dims
            base = img._scene_catalog_row()
            dims_order = "TCZYX" + ("S" if "S" in d.order else "")
            meta[img.scenes.index(s)] = {
                "scene": s,
                "shape": tuple(int(d[c][0]) for c in dims_order),
                "dtype": str(img.dtype),
                "channel_names": img.channel_names,
                "image_name": base.get("image_id"),
                "pps": img.physical_pixel_sizes,
            }
    finally:
        img.set_scene(current)

    from pyspark.sql import functions as F

    df = img.get_stack_dataframe().filter(
        F.col("scene_idx").isin(list(meta)))

    def encode_scene(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from bioio_spark.formats.tiff import encode_ome_tiff
        from bioio_spark.ome_utils import generate_ome_image_id

        idx = int(pdf["scene_idx"].iloc[0])
        m = meta[idx]
        t_n, c_n, z_n, y_n, x_n = m["shape"][:5]
        s_n = m["shape"][5] if len(m["shape"]) == 6 else 1
        block = np.empty(m["shape"], dtype=m["dtype"])
        flat = (pdf["t"].to_numpy() * (c_n * z_n * y_n * x_n)
                + pdf["c"].to_numpy() * (z_n * y_n * x_n)
                + pdf["z"].to_numpy() * (y_n * x_n)
                + pdf["y"].to_numpy() * x_n + pdf["x"].to_numpy())
        if s_n > 1:
            flat = flat * s_n + pdf["s"].to_numpy()
        block.ravel()[flat] = pdf["value"].to_numpy()
        sub_blocks = []
        lvl = block
        for _ in range(1, n_levels):
            t_, c_, z_, y_, x_ = lvl.shape[:5]
            pady, padx = -(-y_ // 2) * 2, -(-x_ // 2) * 2
            pad = np.zeros(lvl.shape[:3] + (pady, padx) + lvl.shape[5:],
                           dtype=np.float64)
            pad[:, :, :, :y_, :x_] = lvl
            # edge replication keeps block means unbiased at odd edges
            if pady > y_:
                pad[:, :, :, y_:, :x_] = lvl[:, :, :, y_ - 1:y_, :]
            if padx > x_:
                pad[:, :, :, :, x_:] = pad[:, :, :, :, x_ - 1:x_]
            down = (pad[:, :, :, 0::2, 0::2] + pad[:, :, :, 1::2, 0::2]
                    + pad[:, :, :, 0::2, 1::2]
                    + pad[:, :, :, 1::2, 1::2]) / 4.0
            if not np.issubdtype(np.dtype(m["dtype"]), np.floating):
                down = np.rint(down)
            lvl = down.astype(m["dtype"])
            sub_blocks.append(lvl)
        payload = encode_ome_tiff(
            block, image_id=generate_ome_image_id(idx),
            image_name=m["image_name"], channel_names=m["channel_names"],
            physical_pixel_sizes=m["pps"], compression=compression,
            bigtiff=bigtiff, predictor=predictor, tile=tile,
            sub_levels=sub_blocks or None)
        path = os.path.join(uri, f"scene_{idx}.ome.tiff")
        with open(path, "wb") as f:
            f.write(payload)
        return pd.DataFrame({
            "scene_idx": [idx], "scene": [m["scene"]], "path": [path],
            "n_pages": [t_n * c_n * z_n], "n_bytes": [len(payload)]})

    report = (df.groupBy("scene_idx")
              .applyInPandas(encode_scene,
                             "scene_idx int, scene string, path string, "
                             "n_pages int, n_bytes long")
              .orderBy("scene_idx"))
    return report.collect()


def save_ome_tiff_single_file(img, uri: str, select_scenes=None,
                              compression: int = 1,
                              bigtiff: bool = False,
                              tile=None, predictor: int = 1) -> dict:
    """All selected scenes into ONE multi-Image OME-TIFF (the in-file
    scene layout TiffImageReader and the reference's scene model read
    back, ref bio_image.py:433-498). OME-TIFF is a sequential container,
    so the whole file is one encode task holding every scene's block —
    the same memory shape as the reference's writer; use the per-scene
    directory sink (save_ome_tiff) or the chunk-parallel Zarr sink when
    scenes don't fit one task."""
    import os

    import numpy as np

    from bioio_spark.formats.tiff import encode_multiscene_ome_tiff
    from bioio_spark.ome_utils import generate_ome_image_id

    scenes = list(img.scenes)
    if select_scenes is not None:
        sel = [s if isinstance(s, str) else scenes[s] for s in select_scenes]
        scenes = [s for s in scenes if s in sel]

    blocks, ids, names, chans = [], [], [], []
    current = img.current_scene_index
    try:
        for i, s in enumerate(scenes):
            img.set_scene(s)
            if "S" in img.dims.order:
                raise ValueError("single-file export is TCZYX-only; "
                                 "save S-dim scenes per-scene")
            blocks.append(np.asarray(img.data))
            ids.append(generate_ome_image_id(i))
            names.append(img._scene_catalog_row().get("image_id"))
            chans.append(img.channel_names)
    finally:
        img.set_scene(current)

    payload = encode_multiscene_ome_tiff(
        blocks, image_ids=ids, image_names=names, channel_names=chans,
        physical_pixel_sizes=img.physical_pixel_sizes,
        compression=compression, bigtiff=bigtiff, tile=tile,
        predictor=predictor)
    os.makedirs(os.path.dirname(os.path.abspath(uri)) or ".",
                exist_ok=True)
    with open(uri, "wb") as f:
        f.write(payload)
    return {"path": uri, "n_scenes": len(blocks),
            "n_pages": sum(b.shape[0] * b.shape[1] * b.shape[2]
                           for b in blocks),
            "n_bytes": len(payload)}


def _default_zarr_chunks(shape) -> tuple:
    """One YX tile per chunk, capped at 256x256 — the NGFF-conventional
    chunking that keeps a chunk a few hundred KB and makes the chunk grid
    (not the file count) the unit of parallelism."""
    t, c, z, y, x = shape
    return (1, 1, 1, min(int(y), 256), min(int(x), 256))


def save_ome_zarr(img, uri: str, select_scenes=None, chunks=None,
                  compressor: str = "zlib", n_levels: int = 1,
                  ngff_version: str = "0.4", shards=None) -> list:
    """Distributed OME-Zarr export (the reference's OMEZarrWriter surface,
    ref README.md:81 — OME-NGFF). `ngff_version` selects the container:
    "0.4" writes NGFF 0.4 over Zarr v2 (`.zgroup`/`.zattrs`/`.zarray`,
    '.'-separated chunk keys); "0.5" writes NGFF 0.5 over Zarr v3
    (group + array `zarr.json`, `attributes.ome`, 'c/'-prefixed
    '/'-separated chunk keys, bytes+gzip codec chain).

    Unlike the OME-TIFF sink (a sequential container: one scene = one task),
    Zarr is chunk-parallel: the stack frame is bucketed by chunk-grid
    indices and `applyInPandas` encodes + writes ONE CHUNK per group, so
    write parallelism is the total chunk count across scenes. At 100 TB
    this is the sink that saturates a 1000-executor cluster; edge chunks
    are padded to full chunk shape with fill_value per the Zarr v2 spec.

    Layout: `{uri}/scene_{i}.zarr/` group per scene — `.zgroup`, `.zattrs`
    (NGFF multiscales + omero channel labels), and one array dir per
    resolution level with `.zarray` + `t.c.z.y.x` chunk files. Returns
    report rows (scene_idx, scene, path, n_chunks, n_bytes).

    `shards` (NGFF 0.5 only) writes the Zarr v3 `sharding_indexed`
    layout: a (T, C, Z, Y, X) SHARD shape, each an integer multiple of
    `chunks` per axis — one stored object per shard packing its inner
    chunks plus a bytes+crc32c byte-range index. At 100 TB this is the
    object-count lever: a 10^7-chunk level collapses to 10^4-10^5 shard
    objects while windowed reads keep inner-chunk granularity via index
    ranged-GETs. Write parallelism becomes one task per SHARD (each task
    encodes its inner chunks locally), so pick shards that keep
    shard-volume x dtype within executor memory.

    `n_levels` > 1 derives the NGFF multiscale pyramid inline via the C4
    producer (operators.pyramid: level k+1 = 2x2 block mean of level k,
    ceil-division shapes) — the whole pyramid is ONE composed plan, so
    producing it costs ~4/3 of a single pass over level 0. Downsampled
    means are rounded to nearest and stored in the scene dtype (the
    convention of pyramidal OME-Zarr writers).
    """
    import os

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from bioio_spark.formats.zarr import (ZGROUP, build_ngff_attrs,
                                          build_zarr3_array,
                                          build_zarr3_group, build_zarray,
                                          chunk_key, encode_chunk,
                                          encode_chunk_v3, encode_shard)

    if ngff_version not in ("0.4", "0.5"):
        raise ValueError(f"unsupported NGFF version {ngff_version!r}; "
                         "supported: '0.4' (Zarr v2), '0.5' (Zarr v3)")
    v3 = ngff_version == "0.5"
    if shards is not None:
        if not v3:
            raise ValueError("sharding requires ngff_version='0.5' "
                             "(the Zarr v3 sharding_indexed codec)")
        shards = tuple(int(s) for s in shards)
    os.makedirs(uri, exist_ok=True)
    scenes = list(img.scenes)
    if select_scenes is not None:
        sel = [s if isinstance(s, str) else scenes[s] for s in select_scenes]
        scenes = [s for s in scenes if s in sel]

    meta: dict[int, dict] = {}
    current = img.current_scene_index
    try:
        for s in scenes:
            img.set_scene(s)
            d = img.dims
            if "S" in d.order:
                raise ValueError(
                    "OME-Zarr scenes are TCZYX; fold the S dim into C "
                    "before saving (the OME SizeC rule)")
            shape = tuple(int(d[c][0]) for c in "TCZYX")
            meta[img.scenes.index(s)] = {
                "scene": s,
                "shape": shape,
                "chunks": tuple(chunks) if chunks
                else _default_zarr_chunks(shape),
                "shards": shards,
                "dtype": str(img.dtype),
                "channel_names": img.channel_names,
                "pps": img.physical_pixel_sizes,
            }
    finally:
        img.set_scene(current)

    # group metadata is driver-written (tiny JSON documents); pixel chunks
    # are executor-written. Level k shape: ceil-halved Y/X (the pyramid
    # operator's ceil-division contract), T/C/Z unchanged.
    def _level_shape(shape, lv):
        t, c, z, y, x = shape
        return (t, c, z, -(-y // (2 ** lv)), -(-x // (2 ** lv)))

    for idx, m in meta.items():
        root = os.path.join(uri, f"scene_{idx}.zarr")
        os.makedirs(root, exist_ok=True)
        if v3:
            with open(os.path.join(root, "zarr.json"), "w") as f:
                f.write(build_zarr3_group(m["scene"], m["channel_names"],
                                          m["pps"], n_levels=n_levels))
        else:
            with open(os.path.join(root, ".zgroup"), "w") as f:
                f.write(ZGROUP)
            with open(os.path.join(root, ".zattrs"), "w") as f:
                f.write(build_ngff_attrs(m["scene"], m["channel_names"],
                                         m["pps"], n_levels=n_levels))
        for lv in range(n_levels):
            os.makedirs(os.path.join(root, str(lv)), exist_ok=True)
            if v3:
                with open(os.path.join(root, str(lv), "zarr.json"),
                          "w") as f:
                    f.write(build_zarr3_array(
                        _level_shape(m["shape"], lv), m["chunks"],
                        m["dtype"], compressor=compressor,
                        shard_shape=m["shards"]))
            else:
                with open(os.path.join(root, str(lv), ".zarray"),
                          "w") as f:
                    f.write(build_zarray(_level_shape(m["shape"], lv),
                                         m["chunks"], m["dtype"],
                                         compressor=compressor))

    # chunk-grid bucketing: per-scene chunk sizes via a literal map (a few
    # scenes; stays a codegen projection, no extra shuffle beyond the
    # groupBy on the grid key)
    def _chunk_col(dim: str, pos: int):
        # group on the STORED-OBJECT grid: the shard grid when sharding
        # (one task writes one shard file), else the chunk grid
        pairs = []
        for idx, m in meta.items():
            pairs += [F.lit(idx),
                      F.lit((m["shards"] or m["chunks"])[pos])]
        return (F.col(dim) / F.create_map(*pairs)[F.col("scene_idx")]
                ).cast("int")

    df = img.get_stack_dataframe().filter(
        F.col("scene_idx").isin(list(meta)))
    if n_levels > 1:
        from bioio_spark.operators.pyramid import build_pyramid

        df = build_pyramid(df, n_levels)
    else:
        df = df.withColumn("res_level", F.lit(0))
    df = (df
          .withColumn("ct", _chunk_col("t", 0))
          .withColumn("cc", _chunk_col("c", 1))
          .withColumn("cz", _chunk_col("z", 2))
          .withColumn("cy", _chunk_col("y", 3))
          .withColumn("cx", _chunk_col("x", 4)))

    def encode_one(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = int(pdf["scene_idx"].iloc[0])
        lv = int(pdf["res_level"].iloc[0])
        m = meta[idx]
        cs = m["shards"] or m["chunks"]
        grid = tuple(int(pdf[k].iloc[0]) for k in
                     ("ct", "cc", "cz", "cy", "cx"))
        off = tuple(g * c for g, c in zip(grid, cs))
        block = np.zeros(cs, dtype=m["dtype"])  # fill_value 0 padding
        flat = ((pdf["t"].to_numpy() - off[0]) * (cs[1] * cs[2] * cs[3] * cs[4])
                + (pdf["c"].to_numpy() - off[1]) * (cs[2] * cs[3] * cs[4])
                + (pdf["z"].to_numpy() - off[2]) * (cs[3] * cs[4])
                + (pdf["y"].to_numpy() - off[3]) * cs[4]
                + (pdf["x"].to_numpy() - off[4]))
        vals = pdf["value"].to_numpy()
        if lv > 0 and not np.issubdtype(np.dtype(m["dtype"]), np.floating):
            vals = np.rint(vals)   # block means back to the scene dtype
        block.ravel()[flat] = vals
        if v3:
            # v3 "default" chunk-key encoding: c/<i0>/<i1>/... nested dirs
            path = os.path.join(uri, f"scene_{idx}.zarr", str(lv), "c",
                                *[str(int(g)) for g in grid])
            os.makedirs(os.path.dirname(path), exist_ok=True)
            if m["shards"]:
                payload = encode_shard(block, m["chunks"],
                                       compressor=compressor)
            else:
                payload = encode_chunk_v3(block, compressor=compressor)
        else:
            path = os.path.join(uri, f"scene_{idx}.zarr", str(lv),
                                chunk_key(grid))
            payload = encode_chunk(block, compressor=compressor)
        with open(path, "wb") as f:
            f.write(payload)
        return pd.DataFrame({"scene_idx": [idx], "n_bytes": [len(payload)]})

    per_chunk = (df.groupBy("scene_idx", "res_level",
                            "ct", "cc", "cz", "cy", "cx")
                 .applyInPandas(encode_one, "scene_idx int, n_bytes long")
                 .groupBy("scene_idx")
                 .agg(F.count(F.lit(1)).alias("n_chunks"),
                      F.sum("n_bytes").alias("n_bytes"))
                 .orderBy("scene_idx")
                 .collect())
    return [{"scene_idx": r["scene_idx"],
             "scene": meta[r["scene_idx"]]["scene"],
             "path": os.path.join(uri, f"scene_{r['scene_idx']}.zarr"),
             "n_chunks": r["n_chunks"], "n_bytes": r["n_bytes"]}
            for r in per_chunk]


def read_parquet_image(spark, uri: str, image_id: str = "img"):
    """Load a save_parquet() sink back into an ImageDataset (the native
    format's reader; inverse of save_parquet).

    If the `_catalog` sidecar exists, the scene/channel catalogs — dtype,
    physical pixel sizes, original scene ids, channel names — are restored
    from it exactly (the reference preserves scene ids through a save,
    ref bio_image.py:1278-1291). Without it (pre-sidecar sinks), the
    catalog is rebuilt relationally — shapes via max(dim)+1 aggregation
    (the D8 path, one small job over the dim columns only; value column is
    pruned from that scan), scene ids regenerated as Image:{scene_idx},
    channel names per the ome_utils guarantee, dtype defaulting to the
    value column's physical type (float64).
    """
    import json

    import pandas as pd
    from pyspark.sql import functions as F

    from bioio_spark.ome_utils import (generate_ome_image_id,
                                       resolve_channel_names)
    from bioio_spark.sources.array_like import PIXEL_COLUMNS, ImageDataset

    df = spark.read.parquet(uri)
    dim_cols = [c for c in ("t", "c", "z", "y", "x", "m", "s")
                if c in df.columns]

    sidecar = None
    try:
        lines = spark.read.text(uri + "/_catalog").collect()
        sidecar = json.loads("".join(r["value"] for r in lines))
    except Exception:
        sidecar = None

    if sidecar is not None and sidecar.get("scenes"):
        scene_rows = sidecar["scenes"]
        channel_rows = sidecar["channels"]
        idx_to_scene = {int(r["scene_idx"]): r["scene"] for r in scene_rows}
        scene_expr = F.create_map(
            *[F.lit(v) for kv in idx_to_scene.items() for v in kv]
        )[F.col("scene_idx").cast("int")]
    else:
        order = "".join(d.upper() for d in dim_cols)
        shapes = (df.groupBy("scene_idx")
                  .agg(*[(F.max(d) + 1).alias(f"size_{d}")
                         for d in dim_cols])
                  .orderBy("scene_idx").collect())
        scene_rows, channel_rows = [], []
        for row in shapes:
            idx = int(row["scene_idx"])
            scene = generate_ome_image_id(idx)
            size_c = int(row["size_c"]) if "c" in dim_cols else None
            for ci, name in enumerate(
                    resolve_channel_names(None, size_c, idx)):
                channel_rows.append({"image_id": image_id, "scene": scene,
                                     "c": ci, "channel_name": name})
            scene_rows.append({
                "image_id": image_id, "scene": scene, "scene_idx": idx,
                "dim_order": order,
                **{f"size_{d.lower()}":
                   (int(row[f"size_{d.lower()}"]) if d.lower() in dim_cols
                    else None) for d in "TCZYXMS"},
                "dtype": "float64", "ome_pixel_type": "double",
                "pps_z": None, "pps_y": None, "pps_x": None,
                "time_interval": None, "metadata": None,
            })
        scene_expr = F.concat(F.lit("Image:"),
                              F.col("scene_idx").cast("string"))

    px = df.select(
        F.lit(image_id).alias("image_id"), scene_expr.alias("scene"),
        F.lit(0).alias("res_level"),
        *[(F.col(d).cast("int") if d in dim_cols
           else F.lit(-1).cast("int")).alias(d)
          for d in ("t", "c", "z", "y", "x", "m", "s")],
        F.col("value").cast("double").alias("value"),
    ).select(*PIXEL_COLUMNS)

    return ImageDataset(pixels=px, scenes=pd.DataFrame(scene_rows),
                        channels=pd.DataFrame(channel_rows))
