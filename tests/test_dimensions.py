"""Driver-side dimension semantics, pinned to the reference's behavior
(ref bioio/array_like_reader.py:131-163, bio_image.py:776-788)."""

import pytest

from bioio_spark.dimensions import (
    Dimensions,
    InvalidDimensionOrderingError,
    guess_dim_order,
    resolve_selector,
    target_standard_order,
    validate_dim_order,
)


@pytest.mark.parametrize("shape,expected", [
    ((5,), "X"),
    ((4, 5), "YX"),
    ((3, 4, 5), "ZYX"),
    ((2, 3, 4, 5), "CZYX"),
    ((6, 2, 3, 4, 5), "TCZYX"),
    ((1, 2, 3, 4, 5, 6), "TCZYXS"),
])
def test_guess_dim_order(shape, expected):
    assert guess_dim_order(shape) == expected


def test_guess_dim_order_too_many_dims():
    with pytest.raises(InvalidDimensionOrderingError):
        guess_dim_order((1, 2, 3, 4, 5, 6, 7))


def test_validate_dim_order():
    assert validate_dim_order("zyx", (3, 4, 5)) == "ZYX"
    with pytest.raises(InvalidDimensionOrderingError):
        validate_dim_order("ZY", (3, 4, 5))
    with pytest.raises(InvalidDimensionOrderingError):
        validate_dim_order("ZZX", (3, 4, 5))


@pytest.mark.parametrize("present,expected", [
    ("ZYX", "TCZYX"),
    ("TCZYXS", "TCZYXS"),
    ("MTCZYX", "MTCZYX"),
    ("MTCZYXS", "MTCZYXS"),
    ("YX", "TCZYX"),
])
def test_target_standard_order(present, expected):
    assert target_standard_order(present) == expected


def test_dimensions_access():
    d = Dimensions("TCZYX", (6, 2, 3, 4, 5))
    assert d.T == 6 and d.X == 5
    assert d["ZYX"] == (3, 4, 5)
    assert "T: 6" in str(d)


class TestResolveSelector:
    def test_point(self):
        rs = resolve_selector(3, 6)
        assert rs.kind == "point" and rs.indices == (3,)

    def test_point_negative(self):
        assert resolve_selector(-1, 6).indices == (5,)

    def test_point_out_of_range(self):
        with pytest.raises(IndexError):
            resolve_selector(6, 6)

    def test_fancy(self):
        rs = resolve_selector([0, 2, -1], 6)
        assert rs.kind == "fancy" and rs.indices == (0, 2, 5)

    def test_slice_negative_stop(self):
        # pins ref tests/test_array_like_reader.py:819-820 slice(0,-1,2)
        rs = resolve_selector(slice(0, -1, 2), 6)
        assert rs.kind == "stride"
        assert rs.kept_indices == (0, 2, 4)

    def test_range(self):
        rs = resolve_selector(range(1, 6, 2), 6)
        assert rs.kept_indices == (1, 3, 5)

    def test_negative_step_becomes_fancy(self):
        rs = resolve_selector(slice(None, None, -1), 4)
        assert rs.kind == "fancy" and rs.indices == (3, 2, 1, 0)

    def test_bad_type(self):
        with pytest.raises(TypeError):
            resolve_selector("nope", 4)
