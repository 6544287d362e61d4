"""Labeled-array output tier (ref bio_image.py:500-546 xarray semantics):
coordinate values, channel-name coords, and the sel-vs-loc equivalence
against the relational coords table (operators/loc.py)."""

import numpy as np
import pytest

from bioio_spark import BioImage
from bioio_spark.labeled import LabeledArray, build_labeled
from bioio_spark.types import PhysicalPixelSizes


@pytest.fixture()
def img(spark):
    a = np.arange(2 * 3 * 4 * 5 * 6, dtype=np.float64).reshape(2, 3, 4, 5, 6)
    return BioImage(a, channel_names=["DAPI", "GFP", "RFP"], spark=spark,
                    physical_pixel_sizes=PhysicalPixelSizes(
                        Z=2.0, Y=0.5, X=0.25))


def test_coord_values_and_attrs(img):
    la = img.get_image_xarray()
    assert la.dims == "TCZYX"
    assert la.shape == (2, 3, 4, 5, 6)
    np.testing.assert_array_equal(la.coords["C"],
                                  np.array(["DAPI", "GFP", "RFP"],
                                           dtype=object))
    # T has no time_interval -> step defaults to 1.0 (same as coords table)
    np.testing.assert_allclose(la.coords["T"], [0.0, 1.0])
    np.testing.assert_allclose(la.coords["Z"], [0.0, 2.0, 4.0, 6.0])
    np.testing.assert_allclose(la.coords["Y"], [0.0, 0.5, 1.0, 1.5, 2.0])
    np.testing.assert_allclose(la.coords["X"],
                               np.arange(6) * 0.25)
    assert "standard_metadata" in la.attrs
    np.testing.assert_array_equal(la.data, img.data)


def test_sel_by_channel_name(img):
    la = img.get_image_xarray()
    one = la.sel(C="GFP")
    assert one.shape == (2, 1, 4, 5, 6)
    np.testing.assert_array_equal(one.data[:, 0], img.data[:, 1])
    with pytest.raises(KeyError):
        la.sel(C="nope")


def test_sel_physical_range(img):
    la = img.get_image_xarray()
    z = la.sel(Z=(2.0, 4.0))
    assert z.shape == (2, 3, 2, 5, 6)
    np.testing.assert_allclose(z.coords["Z"], [2.0, 4.0])
    np.testing.assert_array_equal(z.data, img.data[:, :, 1:3])


def test_sel_matches_dataframe_loc(img):
    """The labeled .sel and the relational BioImage.loc must keep the same
    index sets for the same physical bounds."""
    bounds = {"Z": (2.0, 4.0), "Y": (0.5, 1.5)}
    la = img.get_image_xarray().sel(**bounds)
    rows = img.loc(**bounds).select("z", "y").distinct().collect()
    z_idx = sorted({r["z"] for r in rows})
    y_idx = sorted({r["y"] for r in rows})
    np.testing.assert_allclose(np.array(z_idx) * 2.0, la.coords["Z"])
    np.testing.assert_allclose(np.array(y_idx) * 0.5, la.coords["Y"])
    # and the selected data block matches the index-selected original
    np.testing.assert_array_equal(
        la.data, img.data[:, :, z_idx][:, :, :, y_idx])


def test_dimension_order_out(img):
    la = img.get_image_xarray("ZYX")
    assert la.dims == "ZYX"
    assert la.shape == (4, 5, 6)
    assert "C" not in la.coords
    np.testing.assert_allclose(la.coords["Z"], [0.0, 2.0, 4.0, 6.0])


def test_labeled_validation():
    with pytest.raises(ValueError, match="2D"):
        LabeledArray(np.zeros((2, 2)), "TCZYX")
    with pytest.raises(ValueError, match="coord"):
        LabeledArray(np.zeros((2, 2)), "YX",
                     coords={"Y": np.arange(3)})
    la = build_labeled(np.zeros((2, 2)), "YX", None)
    with pytest.raises(ValueError, match="no dim"):
        la.sel(Q=(0, 1))


def test_get_xarray_stack(spark):
    arrs = [np.arange(24, dtype=np.float64).reshape(1, 2, 1, 3, 4),
            np.arange(24, 48, dtype=np.float64).reshape(1, 2, 1, 3, 4)]
    img = BioImage(arrs, channel_names=["a", "b"], spark=spark)
    st = img.get_xarray_stack()
    assert st.dims == "ITCZYX"
    assert st.shape == (2, 1, 2, 1, 3, 4)
    np.testing.assert_array_equal(
        st.coords["I"], np.array(["Image:0", "Image:1"], dtype=object))
    np.testing.assert_array_equal(st.coords["C"],
                                  np.array(["a", "b"], dtype=object))
    np.testing.assert_array_equal(st.data[1], arrs[1])
    # int selector with the dim still in the (default full) output order
    # keeps it at size 1 (P1 + default order semantics); coords beyond I
    # are omitted for selector stacks
    sel = img.get_xarray_stack(C=0)
    assert sel.dims == "ITCZYX"
    assert sel.shape == (2, 1, 1, 1, 3, 4)
    assert set(sel.coords) == {"I"}
    np.testing.assert_array_equal(sel.data[0, :, 0], arrs[0][:, 0])
