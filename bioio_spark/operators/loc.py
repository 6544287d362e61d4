"""P8 label-based (.loc) selection: select pixels by *physical* coordinate
values instead of indices (SURVEY §2.2 P8; ref docs/OVERVIEW.md:337-354).

The reference attaches per-axis coordinate vectors (seconds on T, micrometers
on Z/Y/X — ref bio_image.py:527-539) and selects with `.loc`. Relationally,
coordinates are a dimension table `coords(dim, idx, physical_value)` generated
from the scene catalog's physical pixel sizes; a label-range selection is a
join + *range predicate on physical_value* (interval, not equi).

Scale: the coords table is tiny (sum of dim sizes rows) and broadcast; the
range predicate reduces to an IN/range filter on the index column after the
join, so the pixel-side scan keeps its pushdown and no extra shuffle appears.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bioio_spark.dimensions import DIM_COLUMNS, Dimensions
from bioio_spark.types import PhysicalPixelSizes


def build_coords(
    spark: SparkSession,
    dims: Dimensions,
    physical_pixel_sizes: Optional[PhysicalPixelSizes] = None,
    time_interval: Optional[float] = None,
) -> DataFrame:
    """Coordinate dimension table: one row per (dim letter, index) with its
    physical value (idx * per-step size; size defaults to 1.0 as the
    reference does for missing scales)."""
    step = {
        "T": time_interval if time_interval is not None else 1.0,
        "Z": (physical_pixel_sizes.Z if physical_pixel_sizes else None) or 1.0,
        "Y": (physical_pixel_sizes.Y if physical_pixel_sizes else None) or 1.0,
        "X": (physical_pixel_sizes.X if physical_pixel_sizes else None) or 1.0,
    }
    rows = []
    for letter, size in dims.items:
        if letter not in step:
            continue
        for i in range(size):
            rows.append((letter, i, float(i) * float(step[letter])))
    return spark.createDataFrame(
        rows, "dim string, idx int, physical_value double")


def loc_select(
    pixels: DataFrame,
    coords: DataFrame,
    bounds: dict[str, tuple[float, float]],
) -> DataFrame:
    """Keep pixels whose physical coordinate falls in [lo, hi] for every
    bounded dim (inclusive both ends, like pandas/xarray `.loc` slices).

    One broadcast join per bounded dim on the index column; the joined
    physical_value never leaves the plan (filter + drop), so the output
    schema equals the input schema.
    """
    plan = pixels
    for letter, (lo, hi) in bounds.items():
        col = DIM_COLUMNS[letter]
        dim_coords = (
            coords.filter(F.col("dim") == letter)
            .filter((F.col("physical_value") >= float(lo))
                    & (F.col("physical_value") <= float(hi)))
            .select(F.col("idx").alias(f"__loc_{col}"))
        )
        plan = plan.join(
            F.broadcast(dim_coords),
            plan[col] == dim_coords[f"__loc_{col}"],
            "inner",
        ).drop(f"__loc_{col}")
    return plan
