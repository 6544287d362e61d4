"""M1-M4: mosaic tile stitching and positions (SURVEY §2.4).

The reference delegates stitching to format plugins
(ref bioio/bio_image.py:606-698, flag :60-71); tile positions surface via
`get_mosaic_tile_position(s)` (ref bio_image.py:1135-1216). Overlap semantics
are underdetermined in the reference, so we pin ours: **highest M wins**
(documented + test-pinned, SURVEY §7 "What's hard" #3).

Spark shape: equi-join pixels⋈tiles on (image_id, scene, m) — the tiles table
is tiny, so the join is an explicit `broadcast()` hash join with no shuffle of
the pixel side — then global coordinates by projection, then overlap dedup via
`max_by(value, m)` grouped on the stitched coordinate. A hash aggregate beats
the equivalent row_number window at scale: Catalyst plans a partial aggregate
*before* the shuffle, so overlapping tile rows collapse map-side and only one
row per global coordinate crosses the wire, with no per-partition sort. The
group key (…, y_g, x_g) is high-cardinality → no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stitch_mosaic(pixels: DataFrame, tiles: DataFrame) -> DataFrame:
    """Stitch an M-dim pixel frame into global YX coordinates.

    `tiles` columns: image_id, scene, m, y_off, x_off. Returns the pixel
    frame with y/x replaced by global coordinates, M removed, and overlaps
    resolved as highest-M-wins.
    """
    joined = (
        pixels.join(F.broadcast(tiles), on=["image_id", "scene", "m"])
        .withColumn("y_g", F.col("y") + F.col("y_off"))
        .withColumn("x_g", F.col("x") + F.col("x_off"))
    )
    return (
        joined.groupBy(
            "image_id", "scene", "res_level", "t", "c", "z", "s", "y_g", "x_g"
        )
        .agg(F.max_by("value", "m").alias("value"))
        .select(
            "image_id", "scene", "res_level", "t", "c", "z",
            F.col("y_g").alias("y"), F.col("x_g").alias("x"),
            F.lit(-1).alias("m"), "s", "value",
        )
    )


def mosaic_tile_position(tiles: DataFrame, m: int) -> tuple[int, int]:
    """M2: (top, left) of one tile; raises if the tile is absent
    (ref bio_image.py:1135-1165 UnexpectedShapeError analog)."""
    rows = tiles.filter(F.col("m") == m).select("y_off", "x_off").collect()
    if not rows:
        raise ValueError(f"No mosaic tile with M index {m}")
    return int(rows[0]["y_off"]), int(rows[0]["x_off"])


def mosaic_tile_positions(tiles: DataFrame) -> list[tuple[int, int]]:
    """M3: all tile positions ordered by M (ref bio_image.py:1167-1216)."""
    rows = tiles.orderBy("m").select("y_off", "x_off").collect()
    return [(int(r["y_off"]), int(r["x_off"])) for r in rows]
