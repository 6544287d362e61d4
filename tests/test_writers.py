"""S10 writer surface: scene-partitioned parquet sink roundtrip + the
OME-TIFF stub contract (real registry, gated encode)."""

import numpy as np
import pytest

from bioio_spark.bio_image import BioImage
from bioio_spark.writers import WRITER_REGISTRY, OmeTiffWriter, save_parquet


def test_save_parquet_roundtrip(spark, tmp_path):
    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    b = np.arange(24, 48, dtype=np.float64).reshape(2, 3, 4)
    img = BioImage([a, b], dim_order="CYX", spark=spark)
    uri = str(tmp_path / "img.parquet")
    save_parquet(img, uri)

    back = spark.read.parquet(uri)
    assert back.count() == 48
    # partition values preserved per scene
    assert {r["scene_idx"] for r in
            back.select("scene_idx").distinct().collect()} == {0, 1}
    got = (back.filter("scene_idx = 1").orderBy("c", "y", "x")
           .select("value").toPandas()["value"].to_numpy())
    np.testing.assert_array_equal(got, b.ravel())


def test_save_parquet_scene_selection(spark, tmp_path):
    a = np.zeros((1, 2, 2))
    b = np.ones((1, 2, 2))
    img = BioImage([a, b], dim_order="CYX", spark=spark)
    uri = str(tmp_path / "sel.parquet")
    save_parquet(img, uri, select_scenes=[1])
    back = spark.read.parquet(uri)
    assert back.select("scene_idx").distinct().collect()[0][0] == 1
    # save must not disturb the handle's current scene
    assert img.current_scene_index == 0


def test_ome_tiff_writer_is_registered_and_real(tmp_path):
    import numpy as np

    from bioio_spark.formats.tiff import decode_ome_tiff

    assert WRITER_REGISTRY["OmeTiffWriter"] is OmeTiffWriter
    path = str(tmp_path / "x.ome.tiff")
    OmeTiffWriter.save(np.ones((2, 3), dtype=np.uint8), uri=path)
    block, xml = decode_ome_tiff(open(path, "rb").read())
    assert block.shape == (1, 1, 1, 2, 3)
    assert 'Type="uint8"' in xml


def test_parquet_image_full_roundtrip(spark, tmp_path):
    """save_parquet -> read_parquet_image -> BioImage: scenes, dims, and
    pixel values all survive the native sink."""
    import numpy as np

    from bioio_spark.writers import read_parquet_image

    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    b = np.arange(24, 48, dtype=np.float64).reshape(2, 3, 4)
    img = BioImage([a, b], dim_order="CYX", spark=spark)
    uri = str(tmp_path / "rt.parquet")
    save_parquet(img, uri)

    back = BioImage(read_parquet_image(spark, uri), spark=spark)
    # the sink stores the standardized TCZYX frame, so the reload is 5D
    assert back.scenes == ("Image:0", "Image:1")
    assert back.shape == (1, 2, 1, 3, 4)
    assert back.channel_names == ["Channel:0:0", "Channel:0:1"]
    np.testing.assert_array_equal(back.data[0, :, 0], a)
    back.set_scene(1)
    np.testing.assert_array_equal(back.data[0, :, 0], b)


def test_bioimage_routes_parquet_path(spark, tmp_path):
    """BioImage('*.parquet') routes to the native-format reader."""
    import numpy as np

    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    img = BioImage(a, dim_order="YX", spark=spark)
    uri = str(tmp_path / "route.parquet")
    save_parquet(img, uri)

    back = BioImage(uri, spark=spark)
    assert back.shape == (1, 1, 1, 3, 4)
    np.testing.assert_array_equal(back.data[0, 0, 0], a)
    # imread entry point works on parquet too
    from bioio_spark.bio_image import imread
    np.testing.assert_array_equal(imread(uri)[0, 0, 0], a)


def test_save_parquet_preserves_dtype_and_scene_ids(spark, tmp_path):
    """The _catalog sidecar carries the native dtype and original scene
    ids through a save/load roundtrip (ADVICE r1: reload must not
    collapse everything to float64)."""
    from bioio_spark.writers import read_parquet_image

    a = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
    img = BioImage(
        [a], dim_order="CYX", channel_names=[["red", "green"]], spark=spark)
    orig_scene = img.current_scene
    uri = str(tmp_path / "dt.parquet")
    save_parquet(img, uri)

    back = BioImage(read_parquet_image(spark, uri), spark=spark)
    assert back.dtype == np.dtype("uint16")
    assert back.current_scene == orig_scene
    assert back.channel_names == ["red", "green"]
    arr = back.data
    assert arr.dtype == np.dtype("uint16")
    np.testing.assert_array_equal(arr, a.reshape(1, 2, 1, 3, 4))


def test_get_image_data_preserves_native_dtype(spark):
    """BioImage.data / get_image_data return the cataloged dtype, not the
    relational DOUBLE carrier type."""
    a = (np.arange(12, dtype=np.int32) - 6).reshape(3, 4)
    img = BioImage(a, dim_order="YX", spark=spark)
    assert img.data.dtype == np.dtype("int32")
    sel = img.get_image_data("YX", Y=[0, 2])
    assert sel.dtype == np.dtype("int32")
    np.testing.assert_array_equal(sel, a[[0, 2]])
    # max/min projections preserve dtype; mean promotes (numpy semantics)
    assert img.project_data("Y", "max").dtype == np.dtype("int32")
    assert img.project_data("Y", "mean").dtype == np.dtype("float64")


def test_save_ome_tiff_single_file_multiscene(spark, tmp_path):
    """Multi-scene single-file export -> one OME-TIFF with two <Image>
    elements -> BioImage reads both scenes back identically."""
    import numpy as np

    from bioio_spark import BioImage
    from bioio_spark.writers import save_ome_tiff_single_file

    rng = np.random.default_rng(59)
    a = rng.integers(0, 4096, (2, 1, 3, 4), dtype=np.uint16)   # CZYX
    b = rng.integers(0, 4096, (1, 2, 3, 4), dtype=np.uint16)
    img = BioImage([a, b], dim_order="CZYX", spark=spark,
                   channel_names=[["m0", "m1"], ["solo"]])
    p = str(tmp_path / "all.ome.tiff")
    rep = save_ome_tiff_single_file(img, p, compression=8)
    assert rep["n_scenes"] == 2 and rep["n_pages"] == 2 + 2

    back = BioImage(p, spark=spark)
    assert back.scenes == ("Image:0", "Image:1")
    assert back.channel_names == ["m0", "m1"]
    np.testing.assert_array_equal(back.data[0], a)
    back.set_scene(1)
    assert back.channel_names == ["solo"]
    np.testing.assert_array_equal(back.data[0], b)

    # scene selection mirrors save(select_scenes=...)
    one = str(tmp_path / "one.ome.tiff")
    save_ome_tiff_single_file(img, one, select_scenes=[1])
    only = BioImage(one, spark=spark)
    assert len(only.scenes) == 1
    np.testing.assert_array_equal(only.data[0], b)


def test_bioimage_save_tiff_writes_one_file(spark, tmp_path):
    """ref bio_image.py:1229-1301: BioImage.save(uri) writes ONE OME-TIFF
    holding every selected scene — a real file, not a directory."""
    import os

    import numpy as np

    from bioio_spark import BioImage

    a = np.arange(2 * 3 * 4, dtype=np.uint16).reshape(2, 3, 4)
    b = (np.arange(2 * 3 * 4, dtype=np.uint16) + 100).reshape(2, 3, 4)
    img = BioImage([a, b], dim_order="ZYX", spark=spark)
    p = str(tmp_path / "all.ome.tiff")
    img.save(p)
    assert os.path.isfile(p)
    back = BioImage(p, spark=spark)
    assert back.scenes == ("Image:0", "Image:1")
    np.testing.assert_array_equal(back.data[0, 0], a)
    back.set_scene(1)
    np.testing.assert_array_equal(back.data[0, 0], b)

    one = str(tmp_path / "one.tiff")
    img.save(one, select_scenes=["Image:1"])
    only = BioImage(one, spark=spark)
    assert len(only.scenes) == 1
    np.testing.assert_array_equal(only.data[0, 0], b)
