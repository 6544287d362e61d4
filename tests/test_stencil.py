"""Stencil operators: 3x3 edge-clamped box blur — pixel-level explode and
planes-level halo exchange, both cross-checked against numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bioio_spark.operators.planes import pixels_to_planes, planes_to_pixels
from bioio_spark.operators.stencil import blur_planes, box_blur_pixels


def _pixels(spark, arr):
    t, c, y, x = arr.shape
    rows = [(int(ti), int(ci), int(yi), int(xi), float(arr[ti, ci, yi, xi]))
            for ti in range(t) for ci in range(c)
            for yi in range(y) for xi in range(x)]
    return spark.createDataFrame(
        rows, "t int, c int, y int, x int, value double")


def _ref_blur(arr):
    """Edge-clamped 3x3 mean: each output cell averages its in-bounds
    neighborhood."""
    out = np.zeros_like(arr)
    Y, X = arr.shape[-2:]
    for y in range(Y):
        for x in range(X):
            ys = slice(max(0, y - 1), min(Y, y + 2))
            xs = slice(max(0, x - 1), min(X, x + 2))
            out[..., y, x] = arr[..., ys, xs].mean(axis=(-2, -1))
    return out


def _collect_pixels(df, shape):
    got = np.zeros(shape)
    for r in df.collect():
        got[r["t"], r["c"], r["y"], r["x"]] = r["value"]
    return got


@pytest.mark.parametrize("shape", [(1, 1, 4, 5), (2, 2, 5, 7), (1, 1, 1, 6)])
def test_pixel_blur_matches_numpy(spark, shape):
    rng = np.random.default_rng(11)
    arr = np.round(rng.random(shape) * 100, 3)
    got = _collect_pixels(
        box_blur_pixels(_pixels(spark, arr), shape[-2], shape[-1],
                        plane_cols=("t", "c")), shape)
    np.testing.assert_allclose(got, _ref_blur(arr), rtol=0, atol=1e-9)


@pytest.mark.parametrize("shape,tile", [
    ((1, 1, 4, 5), (2, 3)),    # ragged both axes, multi-tile seams
    ((2, 2, 5, 7), (2, 2)),    # ragged rows, many seams
    ((1, 1, 6, 6), (3, 3)),    # exact grid, interior tile with 8 neighbors
    ((1, 1, 3, 4), (8, 8)),    # single tile (no halo at all)
    ((1, 1, 1, 9), (1, 2)),    # degenerate 1-row image, horizontal halos
])
def test_planes_blur_matches_numpy(spark, shape, tile):
    rng = np.random.default_rng(13)
    arr = np.round(rng.random(shape) * 100, 3)
    planes = pixels_to_planes(_pixels(spark, arr),
                              tile_h=tile[0], tile_w=tile[1])
    blurred = blur_planes(planes, tile_h=tile[0], tile_w=tile[1])
    got = _collect_pixels(planes_to_pixels(blurred), shape)
    np.testing.assert_allclose(got, _ref_blur(arr), rtol=0, atol=1e-9)


def test_planes_blur_shuffles_strips_not_payloads(spark):
    """The halo union emits exactly 1 payload + 8 strips per tile, and
    strip rows carry O(edge) cells, not tile payloads."""
    arr = np.arange(36, dtype=np.float64).reshape(1, 1, 6, 6)
    planes = pixels_to_planes(_pixels(spark, arr), tile_h=3, tile_w=3)
    out = blur_planes(planes, tile_h=3, tile_w=3)
    # output preserves the tile grid
    rows = out.select("y0", "x0", "h", "w").collect()
    assert {(r["y0"], r["x0"]) for r in rows} == {
        (0, 0), (0, 3), (3, 0), (3, 3)}
    assert all((r["h"], r["w"]) == (3, 3) for r in rows)
