"""bioio_raw Python DataSource: roundtrip, partition pruning, routing."""

import numpy as np
import pytest

from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In

from bioio_spark.sources.raw_format import (
    BioioRawReader,
    RawImageReader,
    register_raw_source,
    write_raw,
)


@pytest.fixture(scope="module")
def braw_path(tmp_path_factory):
    rng = np.random.default_rng(11)
    arr = rng.random((2, 3, 2, 6, 5))
    path = str(tmp_path_factory.mktemp("raw") / "img.braw")
    write_raw(arr, path)
    return path, arr


def test_roundtrip_through_datasource(spark, braw_path):
    path, arr = braw_path
    register_raw_source(spark)
    df = spark.read.format("bioio_raw").option("path", path).load()
    assert df.count() == arr.size
    got = {(r["t"], r["c"], r["z"], r["y"], r["x"]): r["value"]
           for r in df.filter("t = 1 AND c = 2").collect()}
    for (t, c, z, y, x), v in got.items():
        assert v == arr[t, c, z, y, x]
    assert len(got) == 2 * 6 * 5


def test_partition_per_plane_and_pruning(braw_path):
    path, arr = braw_path
    reader = BioioRawReader({"path": path})
    assert len(reader.partitions()) == 2 * 3 * 2  # one per (t, c, z)

    remaining = list(reader.pushFilters([EqualTo(("t",), 1),
                                         In(("c",), (0, 2)),
                                         GreaterThanOrEqual(("z",), 1)]))
    # every filter is handed back for re-application
    assert len(remaining) == 3
    parts = reader.partitions()
    assert len(parts) == 1 * 2 * 1
    assert all(p.t == 1 and p.c in (0, 2) and p.z >= 1 for p in parts)


def test_unknown_column_filters_ignored(braw_path):
    path, _ = braw_path
    reader = BioioRawReader({"path": path})
    reader.pushFilters([EqualTo(("value",), 0.5), EqualTo(("y",), 3)])
    assert len(reader.partitions()) == 12  # y/value are not plane-prunable


def test_spark_filter_correct_after_pruning(spark, braw_path):
    """End-to-end: pruned scan + Spark re-applied filter stays exact."""
    path, arr = braw_path
    register_raw_source(spark)
    df = spark.read.format("bioio_raw").option("path", path).load()
    total = (df.filter("t = 0 AND z = 1")
             .agg({"value": "sum"}).collect()[0][0])
    assert total == pytest.approx(arr[0, :, 1].sum())


def test_bioimage_routes_braw(spark, braw_path):
    from bioio_spark import BioImage

    path, arr = braw_path
    img = BioImage(path, spark=spark)
    assert img.scenes == ("Image:0",)
    assert img.dims.shape == (2, 3, 2, 6, 5)
    np.testing.assert_allclose(
        img.get_image_data("ZYX", T=1, C=2), arr[1, 2])
    assert img.channel_names == ["Channel:0:0", "Channel:0:1",
                                 "Channel:0:2"]


def test_write_raw_rejects_non_5d(tmp_path):
    with pytest.raises(ValueError, match="5D"):
        write_raw(np.zeros((2, 3)), str(tmp_path / "bad.braw"))


def test_raw_reader_rejects_dim_order_override():
    with pytest.raises(ValueError, match="TCZYX"):
        RawImageReader("x.braw", dim_order="XYZ")
