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


def _halo_grouped(planes: DataFrame, tile_h: int, tile_w: int):
    """Shared halo exchange for 3x3 stencils on the planes layout.

    tile_h/tile_w are the GRID PITCH (the y0/x0 spacing used by
    pixels_to_planes); edge tiles may be ragged (h < tile_h, w < tile_w),
    in which case they simply have no neighbor on that side.

    Mechanics: each tile emits its own payload to itself ('c') and eight
    O(edge) halo strips to its grid neighbors, keyed by where the strip
    sits relative to the RECEIVER ('t' = the row just above the receiver,
    etc.). After one groupBy on the receiving tile, the strips become a
    dir -> cells map; strips missing at image borders yield NULL lookups,
    which every stencil op here simply excludes (edge clamping).
    Returns (grouped frame, key_cols).
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
    return grouped, key_cols


def _ext_rows():
    """Halo-extended rows ((h+2) x (w+2), NULL where the image ends) as an
    array-of-rows expression over a _halo_grouped frame."""
    m = F.col("m")
    own = m["c"]
    h, w = F.col("h"), F.col("w")
    dnull = F.lit(None).cast("double")

    def pad_row(row_arr, left, right):
        """[left_corner] ++ (strip or all-NULL row) ++ [right_corner]."""
        body = F.coalesce(row_arr, F.array_repeat(dnull, w.cast("int")))
        return F.concat(F.array(left), body, F.array(right))

    top_ext = pad_row(m["t"], F.element_at(m["tl"], 1),
                      F.element_at(m["tr"], 1))
    bot_ext = pad_row(m["b"], F.element_at(m["bl"], 1),
                      F.element_at(m["br"], 1))
    mid_ext = F.transform(
        F.sequence(F.lit(0), h - 1),
        lambda r: F.concat(
            F.array(F.element_at(m["l"], (r + 1).cast("int"))),
            F.slice(own, (r * w + 1).cast("int"), w.cast("int")),
            F.array(F.element_at(m["r"], (r + 1).cast("int")))))
    return F.concat(F.array(top_ext), mid_ext, F.array(bot_ext))


def blur_planes(planes: DataFrame, tile_h: int = 256,
                tile_w: int = 256) -> DataFrame:
    """3x3 box mean on the planes layout via halo exchange
    (see _halo_grouped for the exchange mechanics)."""
    grouped, key_cols = _halo_grouped(planes, tile_h, tile_w)

    # -- in-tile blur: separable row-strip formulation --------------------
    # The 3x3 box mean factors into a horizontal 3-tap pass over each row
    # of the halo-EXTENDED tile (_ext_rows) followed by a vertical 3-row
    # combine. Each pass is zip_with over shifted slices — a FIXED-size
    # expression tree and O(h*w) array ops, vs the previous per-cell
    # formulation whose 9 nested CASE lookups were instantiated once per
    # output position under codegen (measured 4.8x slower than the
    # exploded twin at fixture scale). The extended rows and horizontal
    # sums materialize as real array columns so each stage is evaluated
    # once, not re-expanded per reference.
    h, w = F.col("h"), F.col("w")

    def hwin(row):
        """Per-row horizontal 3-tap: (sum, count) over the w windows."""
        a = F.slice(row, 1, w.cast("int"))
        b = F.slice(row, 2, w.cast("int"))
        c = F.slice(row, 3, w.cast("int"))
        z = F.lit(0.0)
        s = F.zip_with(
            F.zip_with(a, b,
                       lambda x, y: F.coalesce(x, z) + F.coalesce(y, z)),
            c, lambda x, y: x + F.coalesce(y, z))
        n = F.zip_with(
            F.zip_with(a, b, lambda x, y: x.isNotNull().cast("int")
                       + y.isNotNull().cast("int")),
            c, lambda x, y: x + y.isNotNull().cast("int"))
        return F.struct(s.alias("s"), n.alias("n"))

    staged = (grouped
              .withColumn("ext", _ext_rows())
              .withColumn("hs", F.transform(F.col("ext"), hwin)))

    hs = F.col("hs")

    def out_row(r):
        """Vertical combine of horizontal rows r, r+1, r+2 (1-based)."""
        h1 = F.element_at(hs, (r + 1).cast("int"))
        h2 = F.element_at(hs, (r + 2).cast("int"))
        h3 = F.element_at(hs, (r + 3).cast("int"))
        s = F.zip_with(F.zip_with(h1["s"], h2["s"], lambda x, y: x + y),
                       h3["s"], lambda x, y: x + y)
        n = F.zip_with(F.zip_with(h1["n"], h2["n"], lambda x, y: x + y),
                       h3["n"], lambda x, y: x + y)
        return F.zip_with(s, n, lambda x, y: x / y)

    return staged.select(
        *key_cols, "y0", "x0", "h", "w",
        F.flatten(F.transform(F.sequence(F.lit(0), h - 1),
                              out_row)).alias("values"))


def morph_pixels(pixels: DataFrame, height: int, width: int, op: str,
                 plane_cols=("t", "c", "z")) -> DataFrame:
    """3x3 grayscale morphology per YX plane, edge-clamped: erosion
    (op='min') / dilation (op='max') — the structuring-element workloads
    that follow blur in a segmentation pipeline. Same contribution-explode
    shape as box_blur_pixels (the correctness representation)."""
    if op not in ("min", "max"):
        raise ValueError(f"op must be 'min' or 'max', got {op!r}")
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    keep = [c for c in plane_cols if c in pixels.columns]
    ex = pixels.select(*keep, "y", "x", "value",
                       F.explode(offsets).alias("o"))
    ny = (F.col("y") + F.col("o.dy")).alias("y")
    nx = (F.col("x") + F.col("o.dx")).alias("x")
    agg = F.min("value") if op == "min" else F.max("value")
    return (ex.select(*keep, ny, nx, "value")
            .filter((F.col("y") >= 0) & (F.col("y") < height)
                    & (F.col("x") >= 0) & (F.col("x") < width))
            .groupBy(*keep, "y", "x")
            .agg(agg.alias("value")))


def morph_planes(planes: DataFrame, op: str, tile_h: int = 256,
                 tile_w: int = 256) -> DataFrame:
    """3x3 morphology (erosion/dilation) on the planes layout via the same
    halo exchange as blur_planes. least/greatest skip NULLs, so missing
    border strips clamp for free; the separable min/max passes need no
    counts, making this the cheapest of the stencils."""
    if op not in ("min", "max"):
        raise ValueError(f"op must be 'min' or 'max', got {op!r}")
    pick = F.least if op == "min" else F.greatest
    grouped, key_cols = _halo_grouped(planes, tile_h, tile_w)
    h, w = F.col("h"), F.col("w")

    def hwin(row):
        a = F.slice(row, 1, w.cast("int"))
        b = F.slice(row, 2, w.cast("int"))
        c = F.slice(row, 3, w.cast("int"))
        return F.zip_with(F.zip_with(a, b, lambda x, y: pick(x, y)),
                          c, lambda x, y: pick(x, y))

    staged = (grouped
              .withColumn("ext", _ext_rows())
              .withColumn("hm", F.transform(F.col("ext"), hwin)))
    hm = F.col("hm")

    def out_row(r):
        h1 = F.element_at(hm, (r + 1).cast("int"))
        h2 = F.element_at(hm, (r + 2).cast("int"))
        h3 = F.element_at(hm, (r + 3).cast("int"))
        return F.zip_with(F.zip_with(h1, h2, lambda x, y: pick(x, y)),
                          h3, lambda x, y: pick(x, y))

    return staged.select(
        *key_cols, "y0", "x0", "h", "w",
        F.flatten(F.transform(F.sequence(F.lit(0), h - 1),
                              out_row)).alias("values"))


def median_pixels(pixels: DataFrame, height: int, width: int,
                  plane_cols=("t", "c", "z")) -> DataFrame:
    """3x3 median filter per YX plane, edge-clamped — the
    salt-and-pepper denoiser that complements the linear blur (N4).
    Same contribution-explode shape as box_blur_pixels; the median is
    the EXPLICIT order statistic over the sorted in-bounds neighbor
    list: (arr[(n+1) div 2] + arr[n div 2 + 1]) / 2 (1-based), which
    is the middle element for odd n (averaging an element with itself
    is exact) and the midpoint of the two middle elements for even n
    (edge pixels see 4 or 6 neighbors). Spelled identically in the
    oracle — never an engine median() whose interpolation rounding is
    not pinned. Neighbor lists are bounded (<= 9), so the collect is
    O(1) per target."""
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    keep = [c for c in plane_cols if c in pixels.columns]
    ex = pixels.select(*keep, "y", "x", "value",
                       F.explode(offsets).alias("o"))
    ny = (F.col("y") + F.col("o.dy")).alias("y")
    nx = (F.col("x") + F.col("o.dx")).alias("x")
    grouped = (ex.select(*keep, ny, nx, "value")
               .filter((F.col("y") >= 0) & (F.col("y") < height)
                       & (F.col("x") >= 0) & (F.col("x") < width))
               .groupBy(*keep, "y", "x")
               .agg(F.sort_array(F.collect_list("value")).alias("arr"),
                    F.count(F.lit(1)).alias("n")))
    lo = F.element_at("arr", ((F.col("n") + 1) / 2).cast("int"))
    hi = F.element_at("arr", (F.col("n") / 2).cast("int") + 1)
    return grouped.select(*keep, "y", "x",
                          ((lo + hi) / 2).alias("value"))


def sobel_pixels(pixels: DataFrame, height: int, width: int,
                 plane_cols=("t", "c", "z")) -> DataFrame:
    """3x3 Sobel gradient (N5): the weighted-kernel generalization of
    the box-blur contribution explode. Both kernels factor as
    wx(dy, dx) = dx * (2 - |dy|) and wy(dy, dx) = dy * (2 - |dx|), so
    one explode feeds BOTH gradient sums — a source pixel ships once
    and each target accumulates (gx, gy) in a single partial-combining
    hash aggregate (one shuffle on the target key, same as N1-N4).
    Interior targets only (every tap in-bounds), so there is no
    edge-clamp rule to pin. Outputs exact integers: gx, gy and the
    squared magnitude gx^2 + gy^2 (no sqrt — hash-stable).

    At 100 TB the planes/halo-exchange layout (blur_planes) is the
    byte-efficient twin; this pixel-level form is the semantics
    contract both share."""
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    keep = [c for c in plane_cols if c in pixels.columns]
    ex = pixels.select(*keep, "y", "x", "value",
                       F.explode(offsets).alias("o"))
    dy, dx = F.col("o.dy"), F.col("o.dx")
    ty = (F.col("y") - dy).alias("y")
    tx = (F.col("x") - dx).alias("x")
    wx = dx * (F.lit(2) - F.abs(dy))
    wy = dy * (F.lit(2) - F.abs(dx))
    return (ex.select(*keep, ty, tx,
                      (F.col("value") * wx).alias("cx"),
                      (F.col("value") * wy).alias("cy"))
            .filter((F.col("y") >= 1) & (F.col("y") <= height - 2)
                    & (F.col("x") >= 1) & (F.col("x") <= width - 2))
            .groupBy(*keep, "y", "x")
            .agg(F.sum("cx").cast("bigint").alias("gx"),
                 F.sum("cy").cast("bigint").alias("gy"))
            .withColumn("mag2", (F.col("gx") * F.col("gx")
                                 + F.col("gy") * F.col("gy"))
                        .cast("bigint")))


def sobel_planes(planes: DataFrame, tile_h: int = 256,
                 tile_w: int = 256) -> DataFrame:
    """Sobel gradient on the planes layout via halo exchange — the
    100 TB twin of sobel_pixels (tiles ship O(perimeter) strips, the
    in-tile pass is a fixed-size separable expression). Both kernels
    factor separably over the halo-extended rows: Gx = [1,2,1]^T ox
    [-1,0,1] (vertical smooth of horizontal diffs) and Gy =
    [-1,0,1]^T ox [1,2,1] (vertical diff of horizontal sums), so ONE
    horizontal pass feeds both gradients. NULL halo taps (image
    border) propagate through the arithmetic, so non-interior pixels
    emerge NULL and are filtered — exactly sobel_pixels' interior
    contract, with no height/width parameters needed.

    Returns pixel-level (keys, y, x, gx, gy, mag2), interior only."""
    grouped, key_cols = _halo_grouped(planes, tile_h, tile_w)
    h, w = F.col("h"), F.col("w")

    def hparts(row):
        a = F.slice(row, 1, w.cast("int"))
        b = F.slice(row, 2, w.cast("int"))
        c = F.slice(row, 3, w.cast("int"))
        d = F.zip_with(c, a, lambda x, y: x - y)
        s = F.zip_with(F.zip_with(a, b, lambda x, y: x + y + y),
                       c, lambda x, y: x + y)
        return F.struct(d.alias("d"), s.alias("s"))

    staged = (grouped
              .withColumn("ext", _ext_rows())
              .withColumn("hp", F.transform(F.col("ext"), hparts)))
    hp = F.col("hp")

    def row_structs(r):
        h1 = F.element_at(hp, (r + 1).cast("int"))
        h2 = F.element_at(hp, (r + 2).cast("int"))
        h3 = F.element_at(hp, (r + 3).cast("int"))
        gx = F.zip_with(
            F.zip_with(h1["d"], h2["d"], lambda x, y: x + y + y),
            h3["d"], lambda x, y: x + y)
        gy = F.zip_with(h3["s"], h1["s"], lambda x, y: x - y)
        return F.zip_with(gx, gy,
                          lambda x, y: F.struct(x.alias("gx"),
                                                y.alias("gy")))

    out = staged.select(
        *key_cols, "y0", "x0", "w",
        F.flatten(F.transform(F.sequence(F.lit(0), h - 1),
                              row_structs)).alias("gs"))
    ex = out.select(*key_cols, "y0", "x0", "w",
                    F.posexplode("gs").alias("i", "g"))
    return (ex.select(
                *key_cols,
                (F.col("y0") + (F.col("i") / F.col("w")).cast("long"))
                .cast("int").alias("y"),
                (F.col("x0") + F.col("i") % F.col("w")).cast("int")
                .alias("x"),
                F.col("g.gx").cast("bigint").alias("gx"),
                F.col("g.gy").cast("bigint").alias("gy"))
            .filter(F.col("gx").isNotNull() & F.col("gy").isNotNull())
            .withColumn("mag2", (F.col("gx") * F.col("gx")
                                 + F.col("gy") * F.col("gy"))
                        .cast("bigint")))
