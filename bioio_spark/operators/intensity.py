"""Image-wide intensity operators: integral image (summed-area table)
and histogram equalization — the two global-statistics primitives a
bioimage QC/feature pipeline runs after the local stencils (N1-N5).

Both are written in the scale shapes this repo standardizes on:

- ``integral_image`` is a SEPARABLE DISTRIBUTED PREFIX-SUM: one
  running-sum window per image row (partitioned by the row key — a
  partition is one row of X pixels, never the corpus), then one per
  column of those partial sums. Two bounded-partition shuffles; no
  global sort anywhere. At 100 TB the same two passes run
  tile-hierarchically (per-tile SAT + carry of tile-edge totals), and
  the per-row/per-column window here is the semantics contract that
  hierarchy must match.

- ``hist_equalize`` is the l11_curriculum_sample pattern applied to
  pixels: the value HISTOGRAM is a bounded partial-combining aggregate
  (at most 2^16 distinct intensities for real imagery, ~20/plane on
  the fixture), the CDF is a window over that tiny histogram (never
  over pixels), and the remap joins back broadcast-side. The formula
  is the classic integer equalization map
  ``floor((cdf - cdf_min) * (levels - 1) / (n - cdf_min))`` — all
  integer arithmetic, hash-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def integral_image(pixels: DataFrame,
                   plane_cols=("t", "c", "z")) -> DataFrame:
    """Summed-area table per YX plane: sat(y, x) = sum of value over
    all (yy <= y, xx <= x). Enables O(1) box sums of ANY window size
    (the constant-time twin of the fixed-3x3 stencils). Exact integer
    output on integer-valued pixels."""
    keep = [c for c in plane_cols if c in pixels.columns]
    row_w = (Window.partitionBy(*keep, "y").orderBy("x")
             .rowsBetween(Window.unboundedPreceding, 0))
    col_w = (Window.partitionBy(*keep, "x").orderBy("y")
             .rowsBetween(Window.unboundedPreceding, 0))
    return (pixels
            .withColumn("rsum", F.sum("value").over(row_w))
            .withColumn("sat", F.sum("rsum").over(col_w)
                        .cast("bigint"))
            .select(*keep, "y", "x", "sat"))


HIST_EQ_LEVELS = 256


def hist_equalize(pixels: DataFrame, n_pixels: int,
                  levels: int = HIST_EQ_LEVELS,
                  plane_cols=("t", "c", "z")) -> DataFrame:
    """Per-plane histogram equalization: remap each intensity to
    ``floor((cdf(v) - cdf_min) * (levels - 1) / (n - cdf_min))`` where
    cdf is the per-plane cumulative count ordered by value and cdf_min
    is the count of the plane's smallest value. A constant plane
    (n == cdf_min) maps to 0 by convention. ``n_pixels`` is the
    per-plane pixel count (Y*X), passed exactly so the gate stays
    integer."""
    keep = [c for c in plane_cols if c in pixels.columns]
    hist = (pixels.groupBy(*keep, "value")
            .agg(F.count(F.lit(1)).alias("cnt")))
    cdf_w = (Window.partitionBy(*keep).orderBy("value")
             .rowsBetween(Window.unboundedPreceding, 0))
    min_w = Window.partitionBy(*keep)
    remap = (hist
             .withColumn("cdf", F.sum("cnt").over(cdf_w))
             .withColumn("cdf_min", F.min(
                 F.when(F.col("cdf") == F.col("cnt"), F.col("cdf")))
                 .over(min_w))
             .withColumn(
                 "eq",
                 F.when(F.lit(n_pixels) == F.col("cdf_min"), F.lit(0))
                 .otherwise(F.expr(
                     f"((cdf - cdf_min) * {levels - 1}) DIV "
                     f"(CAST({n_pixels} AS BIGINT) - cdf_min)"))
                 .cast("bigint"))
             .select(*keep, "value", "eq"))
    return (pixels.join(F.broadcast(remap), [*keep, "value"])
            .select(*keep, "y", "x", "eq"))


def demosaic_pixels(pixels: DataFrame, height: int, width: int,
                    plane_cols=("t", "c", "z")) -> DataFrame:
    """Bilinear RGGB demosaic — the step a training pipeline runs on
    camera-RAW mosaics right after the DNG read (sources/dng_image.py
    exposes the CFA plane un-demosaiced precisely so this stays a
    queryable operator, not a reader policy).

    For an RGGB Bayer grid, edge-clamped bilinear interpolation is
    EXACTLY "per output pixel, the mean of each color's source pixels
    within the in-bounds 3x3 window": at an R site the window's only R
    is itself, its 4 edge neighbors are the G estimate and its 4
    diagonals the B estimate — and every in-bounds window (even the
    2x2 corner) contains all three phases, so the projection is total.
    One contribution explode + one hash aggregate on the target key —
    the N1-N5 shuffle shape, three channels for one exchange. Sums are
    integer-exact; each mean is a single IEEE division, bit-identical
    across engines.

    Returns (plane keys, y, x, r, g, b)."""
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    keep = [c for c in plane_cols if c in pixels.columns]
    code = (F.col("y") % 2) * 2 + (F.col("x") % 2)   # 0=R 1,2=G 3=B
    ph = (F.when(code == 0, 0).when(code == 3, 2).otherwise(1))
    ex = pixels.select(*keep, "y", "x", "value", ph.alias("ph"),
                       F.explode(offsets).alias("o"))
    ty = (F.col("y") + F.col("o.dy")).alias("y")
    tx = (F.col("x") + F.col("o.dx")).alias("x")

    def chan(p, name):
        hit = F.when(F.col("ph") == p, F.col("value"))
        return (F.sum(hit) / F.count(hit)).alias(name)

    return (ex.select(*keep, ty, tx, "ph", "value")
            .filter((F.col("y") >= 0) & (F.col("y") < height)
                    & (F.col("x") >= 0) & (F.col("x") < width))
            .groupBy(*keep, "y", "x")
            .agg(chan(0, "r"), chan(1, "g"), chan(2, "b")))


# -- DNG develop stage (black level -> white balance -> color matrix) -------

def invert_color_matrix(pairs) -> list:
    """Exact 3x3 inverse of a row-major list of 9 (num, den) rational
    pairs (DNG ColorMatrix1, XYZ->camera) -> row-major 3x3 FLOAT
    camera->XYZ matrix. The inversion runs in exact Fractions
    (adjugate / determinant) and only the final coefficients round to
    double — the literal both engines then parse identically."""
    from fractions import Fraction

    if len(pairs) != 9:
        raise ValueError("ColorMatrix1 needs 9 (num, den) pairs")
    m = [[Fraction(int(n), int(d)) for n, d in pairs[r * 3:r * 3 + 3]]
         for r in range(3)]
    det = (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
           - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
           + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))
    if det == 0:
        raise ValueError("ColorMatrix1 is singular")
    cof = [[(m[(i + 1) % 3][(j + 1) % 3] * m[(i + 2) % 3][(j + 2) % 3]
             - m[(i + 1) % 3][(j + 2) % 3] * m[(i + 2) % 3][(j + 1) % 3])
            for j in range(3)] for i in range(3)]
    # adjugate = transpose of cofactor matrix; this cyclic cofactor
    # form needs no sign grid
    return [[float(cof[j][i] / det) for j in range(3)]
            for i in range(3)]


def develop_sql(rgb_cte: str, black_level: int, neutral,
                cam_to_xyz) -> str:
    """DuckDB oracle half of develop_pixels: given a CTE chain ending
    in `rgb`(y, x, r, g, b), append wb + matrix stages with the SAME
    repr-formatted double literals the Spark side uses."""
    b = repr(float(black_level))
    vs = [f"greatest({c} - {b}, 0.0) / {repr(float(n))} AS v{c}"
          for c, n in zip("rgb", neutral)]
    outs = []
    for name, row in zip(("cie_x", "cie_y", "cie_z"), cam_to_xyz):
        terms = " + ".join(f"{repr(float(a))} * v{c}"
                           for a, c in zip(row, "rgb"))
        outs.append(f"({terms}) AS {name}")
    return f"""{rgb_cte},
    wb AS (SELECT y, x, {', '.join(vs)} FROM rgb)
    SELECT y, x, {', '.join(outs)} FROM wb ORDER BY y, x"""


def develop_pixels(rgb: DataFrame, black_level: int, neutral,
                   cam_to_xyz, plane_cols=()) -> DataFrame:
    """RAW develop: the camera processing chain the DNG spec (1.4,
    "Mapping Camera Color Space to CIE XYZ") prescribes after
    demosaicing — (1) black-level subtraction clamped at zero, (2)
    AsShotNeutral white balance (divide each channel by its camera
    neutral), (3) camera->XYZ via the inverted ColorMatrix1
    (invert_color_matrix). All three are one narrow codegen
    projection; every literal is a repr-formatted double parsed
    identically by Spark and DuckDB, and both engines run the same
    left-associated expression tree — deterministic, hash-checkable
    output with zero extra shuffles on top of the demosaic agg.

    `rgb` is demosaic_pixels output (plane keys, y, x, r, g, b);
    `neutral` is 3 floats; `cam_to_xyz` a row-major 3x3 float matrix.
    Returns (plane keys, y, x, cie_x, cie_y, cie_z)."""
    keep = [c for c in plane_cols if c in rgb.columns]
    blk = F.lit(float(black_level))
    vs = [(F.greatest(F.col(c) - blk, F.lit(0.0))
           / F.lit(float(n))).alias(f"v{c}")
          for c, n in zip("rgb", neutral)]
    wb = rgb.select(*keep, "y", "x", *vs)
    outs = []
    for name, row in zip(("cie_x", "cie_y", "cie_z"), cam_to_xyz):
        expr = None
        for a, c in zip(row, "rgb"):
            term = F.lit(float(a)) * F.col(f"v{c}")
            expr = term if expr is None else expr + term
        outs.append(expr.alias(name))
    return wb.select(*keep, "y", "x", *outs)


def box_sum_integral(pixels: DataFrame, radius: int,
                     plane_cols=("t", "c", "z")) -> DataFrame:
    """Box-window SUM of ANY radius in O(1) lookups per pixel via the
    summed-area table: box = sat(y2,x2) - sat(y1-1,x2) - sat(y2,x1-1)
    + sat(y1-1,x1-1), window clipped to the plane. This is the
    wide-stencil scale path: a (2R+1)^2 box through the explode-halo
    stencils ships (2R+1)^2 contributions per pixel (49 at R=3, 10201
    at R=50); through the SAT it is always FOUR corner rows joined on
    the pixel key — the radius drops out of the shuffle volume
    entirely, only the two SAT prefix passes remain.

    Upper clips come from a per-plane (max y, max x) aggregate
    broadcast back (bounded by plane count); lower out-of-range
    corners simply miss the left join and contribute 0. Exact integer
    output on integer-valued pixels."""
    keep = [c for c in plane_cols if c in pixels.columns]
    sat = integral_image(pixels, plane_cols).select(
        *keep, F.col("y").alias("sy"), F.col("x").alias("sx"), "sat")
    dims = pixels.groupBy(*keep).agg(
        F.max("y").alias("_my"), F.max("x").alias("_mx"))
    R = int(radius)
    base = pixels.join(F.broadcast(dims), keep)
    y1, x1 = F.col("y") - R - 1, F.col("x") - R - 1
    y2 = F.least(F.col("y") + R, F.col("_my"))
    x2 = F.least(F.col("x") + R, F.col("_mx"))
    corner = [(y2, x2, 1), (y1, x2, -1), (y2, x1, -1), (y1, x1, 1)]
    corners = base.select(
        *keep, "y", "x",
        F.explode(F.array(*[
            F.struct(cy.cast("int").alias("cy"),
                     cx.cast("int").alias("cx"),
                     F.lit(s).alias("sign"))
            for cy, cx, s in corner])).alias("k")) \
        .select(*keep, "y", "x", F.col("k")["cy"].alias("cy"),
                F.col("k")["cx"].alias("cx"),
                F.col("k")["sign"].alias("sign"))
    cond = (corners["cy"] == sat["sy"]) & (corners["cx"] == sat["sx"])
    for c in keep:
        cond = cond & (corners[c] == sat[c])
    joined = corners.join(sat, cond, "left").select(
        *[corners[c] for c in keep], corners["y"], corners["x"],
        corners["sign"], sat["sat"])
    return (joined.groupBy(*keep, "y", "x")
            .agg(F.sum(F.col("sign") * F.coalesce("sat", F.lit(0)))
                 .cast("bigint").alias("box_sum"))
            .orderBy(*keep, "y", "x"))
