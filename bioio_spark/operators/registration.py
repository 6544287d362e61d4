"""Time-lapse drift estimation (SURVEY §2.9b N20).

Exhaustive bounded block matching: for each consecutive-frame pair
(t -> t+1) within a (c, z) plane, the translation (dy, dx) in a
[-radius, +radius]^2 window maximizing the INTEGER cross-correlation
sum(a(y, x) * b(y + dy, x + dx)) over the valid overlap; ties resolve
to the smallest (dy, dx). Unnormalized correlation over a bounded
window is the classic registration estimator a tracking pipeline runs
before per-object linking.

Scale shape: one (2r+1)^2-way contribution explode + one
position-keyed equi-join (out-of-bounds taps drop out of the join
naturally) + one partial-combining aggregate per (pair, shift); the
argmax is a WindowGroupLimit top-1 over (2r+1)^2 rows per pair. The
shuffle volume is (2r+1)^2 x pixels — the N1 stencil shape with the
shift as an extra key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def estimate_drift(v: DataFrame, radius: int = 2) -> DataFrame:
    """`v`: (t, c, z, y, x, v) integer-intensity frame table. Returns
    (t, c, z, best_dy, best_dx, corr) for every t that has a t+1 —
    the per-pair drift estimate."""
    shifts = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)])
    t_next = v.select(F.col("t").alias("_tn")).distinct()
    a = (v.join(t_next, F.col("t") + 1 == F.col("_tn"), "left_semi")
         .select("t", "c", "z", "y", "x",
                 F.col("v").alias("va"),
                 F.explode(shifts).alias("s"))
         .select("t", "c", "z", F.col("s.dy").alias("dy"),
                 F.col("s.dx").alias("dx"), "va",
                 (F.col("y") + F.col("s.dy")).alias("ty"),
                 (F.col("x") + F.col("s.dx")).alias("tx")))
    b = v.select((F.col("t") - 1).alias("t"), "c", "z",
                 F.col("y").alias("ty"), F.col("x").alias("tx"),
                 F.col("v").alias("vb"))
    corr = (a.join(b, ["t", "c", "z", "ty", "tx"])
            .groupBy("t", "c", "z", "dy", "dx")
            .agg(F.sum(F.col("va") * F.col("vb")).alias("corr")))
    rk = F.row_number().over(
        Window.partitionBy("t", "c", "z")
        .orderBy(F.col("corr").desc(), F.col("dy"), F.col("dx")))
    return (corr.withColumn("rk", rk).filter(F.col("rk") == 1)
            .select("t", "c", "z",
                    F.col("dy").cast("int").alias("best_dy"),
                    F.col("dx").cast("int").alias("best_dx"),
                    F.col("corr").cast("bigint").alias("corr"))
            .orderBy("t", "c", "z"))
