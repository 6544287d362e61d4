"""M1-M4 mosaic semantics: stitch join, highest-M-wins overlap, positions
(ref bioio/bio_image.py:606-698, :1135-1227; FIXTURES.md B4 layout)."""

import numpy as np
import pandas as pd
import pytest

from bioio_spark.bio_image import BioImage
from bioio_spark.sources.array_like import ArrayLikeReader, ImageDataset

# 2x2 grid of 8x8 tiles overlapping 2px in both axes -> 14x14 canvas
OFFSETS = [(0, 0), (0, 6), (6, 0), (6, 6)]


@pytest.fixture(scope="module")
def mosaic_image(spark):
    arr = np.zeros((4, 1, 1, 1, 8, 8))
    for m in range(4):
        for y in range(8):
            for x in range(8):
                arr[m, 0, 0, 0, y, x] = m * 10000 + y * 100 + x
    ds = ArrayLikeReader(arr, dim_order="MTCZYX",
                         image_id="img_mosaic").to_dataset(spark)
    tiles = pd.DataFrame([
        {"image_id": "img_mosaic", "scene": "Image:0", "m": m,
         "y_off": yo, "x_off": xo}
        for m, (yo, xo) in enumerate(OFFSETS)])
    ds = ImageDataset(ds.pixels, ds.scenes, ds.channels, tiles=tiles)
    return BioImage(ds, spark=spark)


def test_stitched_dims(mosaic_image):
    # reconstruct_mosaic default on: M dim absorbed into global YX
    assert mosaic_image.dims.order == "TCZYX"
    assert mosaic_image.shape == (1, 1, 1, 14, 14)


def test_stitch_highest_m_wins(mosaic_image):
    data = mosaic_image.data[0, 0, 0]
    assert data.shape == (14, 14)
    # non-overlapping corner of tile 0
    assert data[0, 0] == 0.0
    # overlap zone y in [6,8), x in [6,8) covered by all four tiles -> m=3
    assert data[6, 6] == 3 * 10000 + 0 * 100 + 0
    assert data[7, 7] == 3 * 10000 + 1 * 100 + 1
    # x-overlap between tiles 0 and 1 at y<6: tile 1 (higher m) wins
    assert data[0, 6] == 1 * 10000 + 0 * 100 + 0
    # interior of tile 3
    assert data[13, 13] == 3 * 10000 + 7 * 100 + 7


def test_tile_positions(mosaic_image):
    assert mosaic_image.get_mosaic_tile_position(2) == (6, 0)
    assert mosaic_image.get_mosaic_tile_positions() == OFFSETS
    with pytest.raises(ValueError):
        mosaic_image.get_mosaic_tile_position(9)
    with pytest.raises(NotImplementedError):
        mosaic_image.get_mosaic_tile_positions(M=1)


def test_mosaic_tile_dims(mosaic_image):
    td = mosaic_image.mosaic_tile_dims
    assert td is not None and td.shape == (8, 8)


def test_unstitched_when_disabled(spark, mosaic_image):
    img2 = BioImage(mosaic_image._dataset, spark=spark,
                    reconstruct_mosaic=False)
    assert img2.dims.order == "MTCZYX"
    assert img2.shape == (4, 1, 1, 1, 8, 8)
