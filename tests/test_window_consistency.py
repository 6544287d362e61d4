"""Cross-format window-read consistency: for EVERY planned source,
``BioImage.read_window`` (the pruned byte-range path) must return
exactly the rows of the standardized pixel frame filtered to the same
bounds — one invariant, six formats, several window shapes.
"""

import numpy as np
import pytest

from bioio_spark import BioImage


def _vol():
    idx = np.indices((2, 2, 3, 6, 7))        # t c z y x
    return (idx[0] * 10000 + idx[1] * 1000 + idx[2] * 100
            + idx[3] * 10 + idx[4]).astype(np.uint16)


def _write_fixture(fmt, vol, tmp_path, spark):
    if fmt == "tiff":
        from bioio_spark.writers import save_ome_tiff

        out = tmp_path / "w_tiff"
        save_ome_tiff(BioImage(vol, spark=spark), str(out),
                      compression=8)
        return str(out / "scene_0.ome.tiff")
    if fmt == "zarr":
        from bioio_spark.writers import save_ome_zarr

        out = tmp_path / "w_zarr"
        save_ome_zarr(BioImage(vol, spark=spark), str(out),
                      chunks=(1, 1, 2, 3, 4), compressor="zstd")
        return str(out / "scene_0.zarr")
    if fmt == "dv":
        from bioio_spark.formats.dv import encode_dv

        p = tmp_path / "w.dv"
        p.write_bytes(encode_dv(vol))
        return str(p)
    if fmt == "czi":
        from bioio_spark.formats.czi import encode_czi

        p = tmp_path / "w.czi"
        subs = [{"data": vol[t, c, z],
                 "dims": {"S": 0, "T": t, "C": c, "Z": z}}
                for t in range(2) for c in range(2) for z in range(3)]
        p.write_bytes(encode_czi(subs, compression=6))
        return str(p)
    if fmt == "nd2":
        from bioio_spark.formats.nd2 import encode_nd2

        p = tmp_path / "w.nd2"
        # seq = t*3 + z, channels interleaved per pixel
        frames = vol.transpose(0, 2, 3, 4, 1).reshape(6, 6, 7, 2)
        p.write_bytes(encode_nd2(
            frames, loops=[("TimeLoop", 2), ("ZStackLoop", 3)]))
        return str(p)
    if fmt == "lif":
        from bioio_spark.formats.lif import encode_lif

        p = tmp_path / "w.lif"
        p.write_bytes(encode_lif([{"name": "S", "data": vol}]))
        return str(p)
    if fmt == "lsm":
        from bioio_spark.formats.lsm import encode_lsm

        p = tmp_path / "w.lsm"
        p.write_bytes(encode_lsm(vol))
        return str(p)
    if fmt == "oif":
        from bioio_spark.formats.oif import encode_oif

        return encode_oif(vol, str(tmp_path), name="w")
    if fmt == "oib":
        from bioio_spark.formats.oib import encode_oib

        p = tmp_path / "w.oib"
        p.write_bytes(encode_oib(vol))
        return str(p)
    if fmt == "ims":
        from bioio_spark.formats.ims import encode_ims

        p = tmp_path / "w.ims"
        p.write_bytes(encode_ims(vol, chunks=(2, 3, 4), gzip=True))
        return str(p)
    raise AssertionError(fmt)


WINDOWS = [
    dict(t=1, z=(1, 3), y=(2, 5), x=(1, 6)),
    dict(c=1, y=(0, 3)),
    dict(t=0, c=0, z=0, y=2, x=(3, 7)),
]


@pytest.mark.parametrize("fmt", ["tiff", "zarr", "dv", "czi", "nd2",
                                 "lif", "lsm", "oif", "oib", "ims"])
def test_read_window_matches_filtered_frame(spark, tmp_path, fmt):
    vol = _vol()
    path = _write_fixture(fmt, vol, tmp_path, spark)
    img = BioImage(path, spark=spark)
    assert (img.dims.T, img.dims.C, img.dims.Z,
            img.dims.Y, img.dims.X) == vol.shape
    from pyspark.sql import functions as F

    full = img.get_image_dataframe()
    for win in WINDOWS:
        got = (img.read_window(**win)
               .orderBy("t", "c", "z", "y", "x").toPandas())
        cond = F.lit(True)
        for name, sel in win.items():
            size = {"t": 2, "c": 2, "z": 3, "y": 6, "x": 7}[name]
            lo, hi = ((sel, sel + 1) if isinstance(sel, int)
                      else (sel[0], sel[1] if sel[1] is not None
                            else size))
            cond = cond & (F.col(name) >= lo) & (F.col(name) < hi)
        want = (full.filter(cond)
                .select("t", "c", "z", "y", "x", "value")
                .orderBy("t", "c", "z", "y", "x").toPandas())
        assert len(got) == len(want), (fmt, win)
        for col in ("t", "c", "z", "y", "x", "value"):
            np.testing.assert_array_equal(
                got[col].to_numpy(), want[col].to_numpy(),
                err_msg=f"{fmt} {win} {col}")


@pytest.mark.parametrize("fmt", ["tiff", "zarr", "dv", "czi", "nd2",
                                 "lif", "lsm", "oif", "oib", "ims"])
def test_planes_fast_path_matches_pixels(spark, tmp_path, fmt):
    """get_planes_dataframe's zero-shuffle fast path, exploded back to
    pixels, equals the standardized long-form frame — the planes
    layout loses nothing for any source."""
    from bioio_spark.operators.planes import planes_to_pixels

    vol = _vol()
    path = _write_fixture(fmt, vol, tmp_path, spark)
    img = BioImage(path, spark=spark)
    got = (planes_to_pixels(img.get_planes_dataframe())
           .select("t", "c", "z", "y", "x", "value")
           .orderBy("t", "c", "z", "y", "x").toPandas())
    want = (img.get_image_dataframe()
            .select("t", "c", "z", "y", "x", "value")
            .orderBy("t", "c", "z", "y", "x").toPandas())
    assert len(got) == len(want) == vol.size
    for col in ("t", "c", "z", "y", "x", "value"):
        np.testing.assert_array_equal(
            got[col].to_numpy(), want[col].to_numpy(),
            err_msg=f"{fmt} {col}")


def test_a38_scd2_designed_history(spark, tmp_path):
    """A,A,B,A collapses to three half-open intervals: the repeated A
    run merges (n_events 2), the B interlude closes it, the final A
    re-opens (valid_to NULL = still current). Boundary = value
    change, not time gap."""
    import datetime as dt

    from bioio_spark.queries.relational import a38_scd2_intervals

    t = [dt.datetime(2024, 1, 1, h) for h in (0, 1, 2, 3)]
    rows = [(0, t[0], 7, "A", 0.0, "{}"), (1, t[1], 7, "A", 0.0, "{}"),
            (2, t[2], 7, "B", 0.0, "{}"), (3, t[3], 7, "A", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sfscd")
    df.write.parquet(d + "/events.parquet")

    out = [(r["event_type"], r["valid_from"], r["valid_to"],
            r["n_events"])
           for r in a38_scd2_intervals(spark, d).collect()]
    assert out == [("A", t[0], t[2], 2),
                   ("B", t[2], t[3], 1),
                   ("A", t[3], None, 1)]


def test_a38_single_analytic_shuffle(spark, sf_dir):
    """The lag flag, running island id, island agg, and closing
    lead() all reuse ONE user_id hashpartitioning (subset-key
    clustering satisfies the group-by distribution); the only other
    Exchange is the presentation ORDER BY rangepartitioning."""
    from bioio_spark.queries import REGISTRY

    plan = (REGISTRY["a38_scd2_intervals"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("hashpartitioning") <= 1
    assert plan.count("rangepartitioning") == 1
