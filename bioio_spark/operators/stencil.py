"""Stencil operators: neighborhood compute over YX planes (SURVEY §2.2/§2.4
extension — the convolution-shaped workload every imaging pipeline runs
after reading with the reference: smoothing/denoising before segmentation.
The reference itself delegates such compute to numpy on get_image_data
output, ref bio_image.py:841-917; here it is a distributed plan).

Two representations, same semantics (3x3 box mean with edge clamping: each
output pixel is the mean of its in-bounds neighbors, so edges average 4/6
cells instead of 9):

- `box_blur_pixels` — long-form pixels: explode each cell to the 9 targets
  it contributes to, one shuffle onto the target key, mean per target. The
  correctness representation (oracle: a relational self-join on
  |dy|<=1 AND |dx|<=1).

- `blur_planes` — the 100 TB path on the chunked planes layout with a real
  HALO EXCHANGE: every tile ships only its border (2 rows + 2 columns + 4
  corner cells, O(perimeter) bytes) to the up-to-8 grid neighbors; the one
  shuffle then carries each payload once plus the halo strips, and the
  blur runs vectorized inside the reassembled tile via higher-order
  functions — no per-pixel rows, no Python UDF. Shuffle volume is
  |tiles| * (payload + ~4*tile_edge), vs 9x the full pixel count for the
  exploded form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bioio_spark.operators.planes import PLANE_KEY_COLS


def box_blur_pixels(pixels: DataFrame, height: int, width: int,
                    plane_cols=("t", "c", "z")) -> DataFrame:
    """3x3 box mean per YX plane, edge-clamped (mean over in-bounds cells).

    Each input cell contributes to its 9 surrounding targets; targets
    outside [0,height) x [0,width) are dropped, so edge pixels naturally
    average fewer cells. One shuffle (groupBy target); the 9x row fan-out
    is why the planes variant exists for scale.
    """
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    keep = [c for c in plane_cols if c in pixels.columns]
    ex = pixels.select(*keep, "y", "x", "value",
                       F.explode(offsets).alias("o"))
    ny = (F.col("y") + F.col("o.dy")).alias("y")
    nx = (F.col("x") + F.col("o.dx")).alias("x")
    return (ex.select(*keep, ny, nx, "value")
            .filter((F.col("y") >= 0) & (F.col("y") < height)
                    & (F.col("x") >= 0) & (F.col("x") < width))
            .groupBy(*keep, "y", "x")
            .agg(F.avg("value").alias("value")))


def _column_strip(first: bool):
    """Gather one column of a row-major tile payload as an array."""
    idx = (lambda i: i * F.col("w") + 1) if first \
        else (lambda i: i * F.col("w") + F.col("w"))
    return F.transform(
        F.sequence(F.lit(0), F.col("h") - 1),
        lambda i: F.element_at(F.col("values"), idx(i).cast("int")))


def blur_planes(planes: DataFrame, tile_h: int = 256,
                tile_w: int = 256) -> DataFrame:
    """3x3 box mean on the planes layout via halo exchange.

    tile_h/tile_w are the GRID PITCH (the y0/x0 spacing used by
    pixels_to_planes); edge tiles may be ragged (h < tile_h, w < tile_w),
    in which case they simply have no neighbor on that side.

    Mechanics: each tile emits its own payload to itself ('c') and eight
    O(edge) halo strips to its grid neighbors, keyed by where the strip
    sits relative to the RECEIVER ('t' = the row just above the receiver,
    etc.). After one groupBy on the receiving tile, the strips become a
    dir -> cells map and the blur is a single `transform` over output
    positions with element_at lookups — strips missing at image borders
    yield NULL lookups, which the mean simply excludes (edge clamping).
    """
    key_cols = [c for c in PLANE_KEY_COLS if c in planes.columns]

    # all 9 outgoing records built in ONE projection over ONE scan of the
    # planes frame (an explode, not a 9-way union that would re-read the
    # source nine times): own payload to itself + 8 halo strips to the
    # grid neighbors
    def rec(dy, dx, dir_key, cells, sh, sw):
        return F.struct(
            (F.col("y0") + F.lit(dy * tile_h)).alias("ty0"),
            (F.col("x0") + F.lit(dx * tile_w)).alias("tx0"),
            F.lit(dir_key).alias("dir"),
            cells.alias("cells"), sh.alias("sh"), sw.alias("sw"))

    bottom_row = F.slice(F.col("values"),
                         (F.col("h") - 1) * F.col("w") + 1, F.col("w"))
    top_row = F.slice(F.col("values"), F.lit(1), F.col("w"))
    one = F.lit(1)
    outgoing = F.array(
        # own payload
        rec(0, 0, "c", F.col("values"), F.col("h"), F.col("w")),
        # receiver below me gets my bottom row as its top halo; etc.
        rec(1, 0, "t", bottom_row, one, F.col("w")),
        rec(-1, 0, "b", top_row, one, F.col("w")),
        rec(0, 1, "l", _column_strip(first=False), F.col("h"), one),
        rec(0, -1, "r", _column_strip(first=True), F.col("h"), one),
        # corner cells
        rec(1, 1, "tl", F.array(F.element_at(
            F.col("values"), (F.col("h") * F.col("w")).cast("int"))),
            one, one),
        rec(1, -1, "tr", F.array(F.element_at(
            F.col("values"),
            ((F.col("h") - 1) * F.col("w") + 1).cast("int"))), one, one),
        rec(-1, 1, "bl", F.array(F.element_at(
            F.col("values"), F.col("w").cast("int"))), one, one),
        rec(-1, -1, "br", F.array(F.element_at(F.col("values"), 1)),
            one, one),
    )
    union = (planes
             .select(*key_cols, F.explode(outgoing).alias("o"))
             .select(*key_cols, "o.ty0", "o.tx0", "o.dir", "o.cells",
                     "o.sh", "o.sw")
             .filter((F.col("ty0") >= 0) & (F.col("tx0") >= 0)))

    grouped = (
        union.groupBy(*key_cols, F.col("ty0").alias("y0"),
                      F.col("tx0").alias("x0"))
        .agg(F.map_from_entries(
                F.collect_list(F.struct("dir", "cells"))).alias("m"),
             # the receiving tile's own dims ride on its 'c' record
             F.max(F.when(F.col("dir") == "c", F.col("sh"))).alias("h"),
             F.max(F.when(F.col("dir") == "c", F.col("sw"))).alias("w"))
        # strips shipped past the image edge form groups with no own
        # payload; those tiles don't exist
        .filter(F.col("m")["c"].isNotNull()))

    m = F.col("m")
    own = m["c"]

    def cell(ny, nx, h, w):
        """Value of global-neighbor (ny, nx) in tile-relative coords; NULL
        when the lookup leaves the image (missing strip)."""
        return (
            F.when((ny >= 0) & (ny < h) & (nx >= 0) & (nx < w),
                   F.element_at(own, (ny * w + nx + 1).cast("int")))
            .when((ny < 0) & (nx >= 0) & (nx < w),
                  F.element_at(m["t"], (nx + 1).cast("int")))
            .when((ny >= h) & (nx >= 0) & (nx < w),
                  F.element_at(m["b"], (nx + 1).cast("int")))
            .when((nx < 0) & (ny >= 0) & (ny < h),
                  F.element_at(m["l"], (ny + 1).cast("int")))
            .when((nx >= w) & (ny >= 0) & (ny < h),
                  F.element_at(m["r"], (ny + 1).cast("int")))
            .when((ny < 0) & (nx < 0), F.element_at(m["tl"], 1))
            .when((ny < 0) & (nx >= w), F.element_at(m["tr"], 1))
            .when((ny >= h) & (nx < 0), F.element_at(m["bl"], 1))
            .otherwise(F.element_at(m["br"], 1)))

    def blurred(i):
        h = F.col("h")
        w = F.col("w")
        yi = (i / w).cast("int")
        xi = i % w
        vals = F.array(*[
            cell(yi + dy, xi + dx, h, w)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        present = F.filter(vals, lambda v: v.isNotNull())
        return (F.aggregate(present, F.lit(0.0), lambda a, v: a + v)
                / F.size(present))

    return grouped.select(
        *key_cols, "y0", "x0", "h", "w",
        F.transform(F.sequence(F.lit(0), F.col("h") * F.col("w") - 1),
                    blurred).alias("values"))
