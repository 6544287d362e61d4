"""Yokogawa CellVoyager HCS plates — wells as scenes, fields as
mosaic tiles fed by mlf stage positions (public layout; the reference
routes these to bioio-bioformats, ref README.md:74)."""

import numpy as np
import pytest

from bioio_spark import BioImage
from bioio_spark.formats.cellvoyager import (build_mlf,
                                             encode_cellvoyager,
                                             read_cellvoyager_catalog)
from bioio_spark.sources.cellvoyager_image import CellVoyagerImageReader


def _wells():
    rng = np.random.default_rng(23)
    return {
        (2, 3): rng.integers(0, 60000, (4, 2, 2, 1, 8, 10),
                             dtype=np.uint16),
        (2, 4): rng.integers(0, 60000, (1, 1, 2, 3, 8, 10),
                             dtype=np.uint16),
    }


def _write(tmp_path, wells=None, **kw):
    d = str(tmp_path / "meas")
    encode_cellvoyager(wells or _wells(), d,
                       channel_names=["DAPI", "GFP"],
                       um_per_px=0.65,
                       field_grid_um=8 * 0.65, **kw)
    return d


def test_catalog_wells_and_channels(tmp_path):
    d = _write(tmp_path)
    cat = read_cellvoyager_catalog(d)
    assert cat["wells"] == [(2, 3), (2, 4)]
    assert cat["channel_names"] == ["DAPI", "GFP"]
    assert cat["um_per_px"] == 0.65
    # 4 fields x 2t x 2c x 1z + 1 field x 1t x 2c x 3z
    assert len(cat["records"]) == 16 + 6


def test_catalog_rejects_incomplete_grid(tmp_path):
    import os

    d = _write(tmp_path)
    victim = next(f for f in os.listdir(d) if f.endswith(".tif"))
    os.remove(os.path.join(d, victim))
    # rebuild mlf? no — the mlf still lists it; catalog validates the
    # grid from the mlf, so remove a RECORD instead
    mlf = os.path.join(d, "MeasurementData.mlf")
    text = open(mlf).read()
    # drop one record element
    i = text.find("<ns0:MeasurementRecord")
    j = text.find("</ns0:MeasurementRecord>") + \
        len("</ns0:MeasurementRecord>")
    open(mlf, "w").write(text[:i] + text[j:])
    with pytest.raises(ValueError, match="records"):
        read_cellvoyager_catalog(d)


def test_wells_are_scenes(spark, tmp_path):
    wells = _wells()
    d = _write(tmp_path, wells=wells)
    img = BioImage(d, spark=spark, reader=CellVoyagerImageReader)
    assert img.scenes == ("Well R02C03", "Well R02C04")
    img.set_scene("Well R02C04")
    assert img.dims.shape == (1, 2, 3, 8, 10)
    np.testing.assert_array_equal(img.data, wells[(2, 4)][0])


def test_fields_stitch_like_numpy(spark, tmp_path):
    """The 2x2 field grid reconstructs through the shared M1 stitch:
    highest-M-wins compositing at the stage offsets."""
    wells = _wells()
    d = _write(tmp_path, wells=wells)
    img = BioImage(d, spark=spark, reader=CellVoyagerImageReader)
    # grid spacing 8 px; fields 8x10 -> stitched 16x18 with x overlap
    assert img.dims.shape == (2, 2, 1, 16, 18)
    got = img.data
    block = wells[(2, 3)]
    want = np.zeros((2, 2, 1, 16, 18), np.uint16)
    for fi in range(4):
        fy, fx = divmod(fi, 2)
        want[:, :, :, fy * 8:fy * 8 + 8, fx * 8:fx * 8 + 10] = \
            block[fi]
    np.testing.assert_array_equal(got, want)


def test_probe_requires_mlf(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert not CellVoyagerImageReader.is_supported_image(str(d))
    assert CellVoyagerImageReader.is_supported_image(_write(tmp_path))
