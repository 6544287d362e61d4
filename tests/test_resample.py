"""E5 dense resample — designed-fixture forward-fill semantics."""
import datetime as dt

from bioio_spark.queries.streaming_batch import e5_dense_resample


def test_e5_gap_fill_semantics(spark, tmp_path):
    """Two types over a 4-hour span with designed gaps: leading gap
    reads 0 (no value to carry), interior gap carries the LAST
    observed hourly sum, and occupied cells read their own sum."""
    rows = [
        # type a: hours 1 and 3 occupied (hour 0 leading gap for b)
        (1, dt.datetime(2024, 1, 1, 0, 10), 7, "a", 1.00, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 20), 7, "a", 2.50, "{}"),
        (3, dt.datetime(2024, 1, 1, 3, 30), 7, "a", 4.00, "{}"),
        # type b: only hour 2 occupied -> hours 0-1 leading gap
        (4, dt.datetime(2024, 1, 1, 2, 40), 8, "b", 9.25, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sfres")
    df.write.parquet(d + "/events.parquet")

    out = {(r["event_type"], r["hr"].hour):
           (r["n_events"], r["ffill_cents"], r["is_gap"])
           for r in e5_dense_resample(spark, d).collect()}
    # full 2x4 grid materialized
    assert len(out) == 8
    assert out[("a", 0)] == (1, 100, 0)
    assert out[("a", 1)] == (1, 250, 0)
    assert out[("a", 2)] == (0, 250, 1)   # interior gap carries h1
    assert out[("a", 3)] == (1, 400, 0)
    assert out[("b", 0)] == (0, 0, 1)     # leading gap -> 0
    assert out[("b", 1)] == (0, 0, 1)
    assert out[("b", 2)] == (1, 925, 0)
    assert out[("b", 3)] == (0, 925, 1)   # trailing gap carries h2


def test_e6_median_mad_spike_detection(spark, tmp_path):
    """Single type over 5 hours with counts 1,2,3,4,100: exact lower
    median 3, MAD 1 (deviations 2,1,0,1,97 -> lower median 1), so
    only the planted 100-count spike exceeds 3*MAD."""
    import datetime as dt

    rows = []
    eid = 0
    for hour, n in enumerate((1, 2, 3, 4, 100)):
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1, hour, i % 60),
                         1, "a", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sfanom")
    df.write.parquet(d + "/events.parquet")

    from bioio_spark.queries.streaming_batch import e6_grid_anomalies
    out = [tuple(r) for r in e6_grid_anomalies(spark, d).collect()]
    assert out == [("a", dt.datetime(2024, 1, 1, 4), 100, 3, 1, 97)]
