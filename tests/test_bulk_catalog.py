"""Executor-side bulk catalog over a mixed acquisition directory
(oracle parity covers the rollup query; these pin the per-format
catalog rows and the error-as-row contract)."""
import numpy as np


def _mixed_dir(tmp_path):
    from bioio_spark.formats.czi import encode_czi
    from bioio_spark.formats.lif import encode_lif
    from bioio_spark.formats.nd2 import encode_nd2
    from bioio_spark.formats.tiff import encode_tiff
    from bioio_spark.formats.zarr import (build_zarray, chunk_key,
                                          encode_chunk)

    (tmp_path / "a.tif").write_bytes(encode_tiff(
        [np.full((4, 6), 1, dtype=np.uint16)]))
    (tmp_path / "b.czi").write_bytes(encode_czi(
        [{"data": np.full((5, 7), c, dtype=np.uint16),
          "dims": {"C": c}} for c in range(3)]))
    (tmp_path / "c.nd2").write_bytes(encode_nd2(
        np.full((2, 6, 9), 3, dtype=np.uint8)))
    (tmp_path / "d.lif").write_bytes(encode_lif(
        [{"name": "S0",
          "data": np.full((2, 1, 3, 4, 5), 7, dtype=np.uint16)}]))
    z = tmp_path / "e.zarr"
    z.mkdir()
    a = np.full((3, 4, 8), 2, dtype=np.uint8)
    (z / ".zarray").write_text(build_zarray(a.shape, (1, 4, 8), a.dtype))
    for i in range(3):
        (z / chunk_key((i, 0, 0))).write_bytes(encode_chunk(a[i:i + 1]))
    (tmp_path / "broken.czi").write_bytes(b"not a czi at all")
    (tmp_path / "alien.xyz").write_bytes(b"?")
    return sorted(str(p) for p in tmp_path.iterdir())


def test_mixed_directory_rows(spark, tmp_path):
    from bioio_spark.sources.bulk import bulk_catalog

    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in bulk_catalog(spark, _mixed_dir(tmp_path)).collect()}
    assert rows["a.tif"]["ok"] and rows["a.tif"]["n_pages"] == 1
    b = rows["b.czi"]
    assert b["ok"] and (b["fmt"], b["n_pages"], b["size_y"],
                        b["size_x"], b["dtype"]) == \
        ("czi", 3, 5, 7, "uint16")
    c = rows["c.nd2"]
    assert c["ok"] and (c["fmt"], c["n_pages"], c["size_y"],
                        c["size_x"], c["dtype"]) == \
        ("nd2", 2, 6, 9, "uint8")
    d = rows["d.lif"]
    assert d["ok"] and (d["fmt"], d["n_pages"], d["size_y"],
                        d["size_x"], d["n_chunks"]) == ("lif", 6, 4, 5, 1)
    e = rows["e.zarr"]
    assert e["ok"] and (e["fmt"], e["n_pages"], e["size_y"],
                        e["size_x"], e["n_chunks"]) == ("zarr", 3, 4, 8, 3)
    assert e["n_bytes"] > 0   # store bytes = sum over objects
    # failures are ROWS, not job aborts
    bad = rows["broken.czi"]
    assert bad["ok"] is False and "CZI" in bad["err"] or \
        "ValueError" in bad["err"]
    alien = rows["alien.xyz"]
    assert alien["ok"] is False and "unsupported extension" in alien["err"]


def test_catalog_matches_reader_tier(spark, tmp_path):
    """The bulk row must agree with the per-file reader's own catalog
    (same walk, executor-side) — pin CZI as the representative."""
    from bioio_spark.bio_image import BioImage
    from bioio_spark.sources.bulk import catalog_one
    from bioio_spark.formats.czi import encode_czi

    p = tmp_path / "x.czi"
    p.write_bytes(encode_czi(
        [{"data": np.full((6, 8), c, dtype=np.uint16),
          "dims": {"C": c}} for c in range(2)]))
    row = catalog_one(str(p))
    img = BioImage(str(p), spark=spark)
    assert row["ok"]
    assert row["size_y"] == img.dims.Y and row["size_x"] == img.dims.X
    assert row["n_pages"] == 2 and row["dtype"] == str(img.dtype)
