"""TiffGlobReader: filename-indexed TIFF series -> stacks (the
reference's bioio-tiff-glob plugin tier, ref README.md:69)."""

import os

import numpy as np
import pytest

from bioio_spark import BioImage
from bioio_spark.formats.tiff import encode_tiff
from bioio_spark.sources.tiff_glob import TiffGlobReader, default_indexer


def _series(tmp_path, block, name="acq_t{t}_c{c}_z{z}.tif"):
    t_n, c_n, z_n = block.shape[:3]
    for t in range(t_n):
        for c in range(c_n):
            for z in range(z_n):
                p = tmp_path / name.format(t=t, c=c, z=z)
                p.write_bytes(encode_tiff([block[t, c, z]]))
    return str(tmp_path / ("acq_*.tif" if name.startswith("acq") else "*"))


def test_default_indexer_right_aligned():
    assert default_indexer("im_s1_t2_c0_z7.tif") == {
        "S": 1, "T": 2, "C": 0, "Z": 7}
    assert default_indexer("t3_c1_z2.tif") == {"T": 3, "C": 1, "Z": 2}
    assert default_indexer("plane_009.tif") == {"Z": 9}
    assert default_indexer("noints.tif") == {}


def test_is_supported_image(tmp_path):
    (tmp_path / "a_t0_c0_z0.tif").write_bytes(
        encode_tiff([np.zeros((2, 2), np.uint8)]))
    assert TiffGlobReader.is_supported_image(str(tmp_path / "*.tif"))
    assert not TiffGlobReader.is_supported_image(str(tmp_path / "*.png"))
    assert not TiffGlobReader.is_supported_image("plain.tif")  # no magic
    assert TiffGlobReader.is_supported_image(
        [str(tmp_path / "a_t0_c0_z0.tif")])


def test_glob_series_roundtrip(spark, tmp_path):
    idx = np.indices((2, 2, 3, 4, 5))
    block = (idx[0] * 10000 + idx[1] * 1000 + idx[2] * 100
             + idx[3] * 10 + idx[4]).astype(np.uint16)
    pat = _series(tmp_path, block)
    img = BioImage(pat, reader=TiffGlobReader, spark=spark)
    assert (img.dims.T, img.dims.C, img.dims.Z) == (2, 2, 3)
    np.testing.assert_array_equal(
        img.get_image_data("TCZYX").astype(np.uint16), block)


def test_glob_multiscene_and_custom_indexer(spark, tmp_path):
    blk = np.arange(2 * 2 * 3 * 2, dtype=np.uint8).reshape(2, 2, 3, 2)
    for s in range(2):
        for z in range(2):
            (tmp_path / f"pos{s}_sect{z}.tif").write_bytes(
                encode_tiff([blk[s, z]]))

    def indexer(f):
        import re
        m = re.match(r"pos(\d+)_sect(\d+)", os.path.basename(f))
        return {"S": int(m.group(1)), "Z": int(m.group(2))}

    img = BioImage(str(tmp_path / "pos*.tif"), reader=TiffGlobReader,
                   indexer=indexer, spark=spark)
    assert img.scenes == ("Image:0", "Image:1")
    np.testing.assert_array_equal(
        img.get_image_data("ZYX").astype(np.uint8), blk[0])
    img.set_scene("Image:1")
    np.testing.assert_array_equal(
        img.get_image_data("ZYX").astype(np.uint8), blk[1])


def test_glob_multipage_extends_z(spark, tmp_path):
    blk = np.arange(2 * 4 * 3 * 2, dtype=np.uint8).reshape(2, 4, 3, 2)
    # 2 z-index files x 2 pages each -> Z = 4
    for t in range(2):
        for zi in range(2):
            (tmp_path / f"m_t{t}_c0_z{zi}.tif").write_bytes(
                encode_tiff([blk[t, zi * 2], blk[t, zi * 2 + 1]]))
    img = BioImage(str(tmp_path / "m_*.tif"), reader=TiffGlobReader,
                   spark=spark)
    assert img.dims.Z == 4
    np.testing.assert_array_equal(
        img.get_image_data("TZYX").astype(np.uint8), blk)


def test_glob_incomplete_grid_raises(spark, tmp_path):
    (tmp_path / "g_t0_c0_z0.tif").write_bytes(
        encode_tiff([np.zeros((2, 2), np.uint8)]))
    (tmp_path / "g_t1_c1_z1.tif").write_bytes(
        encode_tiff([np.zeros((2, 2), np.uint8)]))
    with pytest.raises(ValueError, match="grid"):
        BioImage(str(tmp_path / "g_*.tif"), reader=TiffGlobReader,
                 spark=spark).dims


def test_glob_plugin_registered():
    from bioio_spark.plugins import _REGISTRY

    assert any(e.name == "bioio-tiff-glob-baseline" for e in _REGISTRY)
