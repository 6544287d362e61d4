"""Chunked plane layout: roundtrip, window pruning, ndarray assembly."""

import numpy as np
from pyspark.sql import functions as F

from bioio_spark.operators.planes import (
    assemble_ndarray,
    pixels_to_planes,
    planes_to_pixels,
    select_window,
)


def _pixels(spark, arr):
    t, c, y, x = arr.shape
    rows = [(int(ti), int(ci), int(yi), int(xi), float(arr[ti, ci, yi, xi]))
            for ti in range(t) for ci in range(c)
            for yi in range(y) for xi in range(x)]
    return spark.createDataFrame(
        rows, "t int, c int, y int, x int, value double")


def test_roundtrip_ragged_tiles(spark):
    arr = np.arange(2 * 2 * 5 * 7, dtype=np.float64).reshape(2, 2, 5, 7)
    px = _pixels(spark, arr)
    planes = pixels_to_planes(px, tile_h=2, tile_w=3)
    # 5 rows -> tiles of h 2,2,1; 7 cols -> w 3,3,1
    hw = {(r["h"], r["w"]) for r in planes.collect()}
    assert hw == {(2, 3), (2, 1), (1, 3), (1, 1)}
    back = planes_to_pixels(planes)
    got = {(r["t"], r["c"], r["y"], r["x"]): r["value"]
           for r in back.collect()}
    assert len(got) == arr.size
    for k, v in got.items():
        assert arr[k] == v


def test_assemble_matches_numpy(spark):
    arr = np.arange(3 * 2 * 6 * 4, dtype=np.float64).reshape(3, 2, 6, 4)
    px = _pixels(spark, arr)
    planes = pixels_to_planes(px, tile_h=4, tile_w=4)
    out = assemble_ndarray(planes, "TC", arr.shape)
    np.testing.assert_array_equal(out, arr)


def test_window_prunes_tiles(spark):
    arr = np.arange(1 * 1 * 8 * 8, dtype=np.float64).reshape(1, 1, 8, 8)
    px = _pixels(spark, arr)
    planes = pixels_to_planes(px, tile_h=4, tile_w=4).cache()
    win = select_window(planes, y_lo=0, y_hi=2, x_lo=5, x_hi=7)
    rows = win.collect()
    assert len(rows) == 3 * 3
    np.testing.assert_array_equal(
        sorted(r["value"] for r in rows),
        sorted(arr[0, 0, 0:3, 5:8].ravel()))
    planes.unpersist()


def test_selector_predicates_reach_parquet_scan(spark, tmp_path):
    """Scale regression guard: point/strided selectors must appear as
    PushedFilters in the parquet scan, and column pruning must drop unused
    columns from ReadSchema."""
    import numpy as np

    from bioio_spark.dimensions import Dimensions
    from bioio_spark.operators.selectors import apply_selectors

    arr = np.arange(2 * 3 * 4 * 5, dtype=np.float64).reshape(2, 3, 4, 5)
    rows = [(t, c, y, x, float(arr[t, c, y, x]))
            for t in range(2) for c in range(3)
            for y in range(4) for x in range(5)]
    path = str(tmp_path / "px.parquet")
    (spark.createDataFrame(rows, "t int, c int, y int, x int, value double")
     .write.parquet(path))

    px = spark.read.parquet(path)
    plan, _ = apply_selectors(
        px, Dimensions("TCYX", (2, 3, 4, 5)), "YX", {"T": 1, "C": 2})
    physical = plan._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in physical.splitlines() if "PushedFilters" in l)
    assert "EqualTo(t,1)" in scan and "EqualTo(c,2)" in scan, scan
    # y/x/value survive; t/c are filter-only and pruned after pushdown
    assert "value:double" in scan
