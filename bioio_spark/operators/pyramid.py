"""Resolution-pyramid generation (C4 producer side, SURVEY §2.3).

The reference *selects* among pre-existing resolution levels
(ref bio_image.py:548-604); level production lives in its format plugins.
Spark-first, producing the pyramid IS a query: level k+1 = mean over 2x2
blocks of level k — a hash aggregation on (keys, y//2, x//2).

Scale: each level is one shuffle of the level above, and level sizes decay
4x per step, so the whole pyramid costs ~4/3 of one pass over level 0.
Partial aggregation combines the 4 block pixels map-side when the layout
keeps blocks within a partition (planes layout: always, for even tiles).
The zero-shuffle production path over the chunked layout is
`operators.planes.downsample_planes` (pooling inside tile payloads);
both are hash-checked against the same avg-pool oracle semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEYS = ["image_id", "scene", "scene_idx", "t", "c", "z", "m", "s"]


def downsample_2x(pixels: DataFrame) -> DataFrame:
    """One pyramid step: 2x2 block mean. Ragged right/bottom edges keep
    their partial blocks (1x2 / 2x1 / 1x1 means), matching the usual
    ceil-division level shapes."""
    keys = [c for c in _KEYS if c in pixels.columns]
    return (
        pixels.groupBy(
            *keys,
            (F.col("y") / 2).cast("long").cast("int").alias("y"),
            (F.col("x") / 2).cast("long").cast("int").alias("x"))
        .agg(F.avg("value").alias("value"))
    )


def build_pyramid(pixels: DataFrame, n_levels: int) -> DataFrame:
    """Stack levels 0..n_levels-1 with a res_level column; level 0 is the
    input. Each level derives from the previous (4x decay), not from
    level 0, so total work is bounded by the geometric series."""
    keys = [c for c in _KEYS if c in pixels.columns]
    out_cols = [*keys, "y", "x", "value"]
    level = pixels.select(*out_cols)
    levels = [level.withColumn("res_level", F.lit(0))]
    for k in range(1, n_levels):
        level = downsample_2x(level).select(*out_cols)
        levels.append(level.withColumn("res_level", F.lit(k)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
