"""E1/E1b event-funnel edge semantics: an EMPTY funnel stage must
yield NULL conversion ratios in BOTH engines (Spark's DIV nulls on
zero; DuckDB's // raises — the oracle therefore CASE-guards), pinned
here on a degenerate fixture the driver's events table never hits."""

import datetime

import duckdb
import pytest

from bioio_spark.queries import REGISTRY


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'")
    return con.execute(sql).fetchall()


@pytest.mark.parametrize("name", ["e1_event_funnel",
                                  "e1b_windowed_funnel"])
def test_funnel_empty_stage_is_null_both_engines(tmp_path, spark, name):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 1.0, ""),
        (2, t0 + datetime.timedelta(minutes=1), 7, "view", 1.0, ""),
        (3, t0, 8, "view", 1.0, ""),
        # no clicks, no purchases: n_click = n_purchase = 0
    ]
    _write_events(tmp_path, spark, rows)
    spec = REGISTRY[name]
    srow = spec.fn(spark, str(tmp_path)).collect()[0]
    assert srow["n_view"] == 2
    assert srow["n_click"] == 0
    assert srow["click_permille"] == 0          # 0 clicks / 2 views
    assert srow["purchase_permille"] is None    # x / 0 clicks -> NULL
    orow = _oracle(tmp_path, spec.oracle)[0]
    assert tuple(srow) == tuple(orow)

    # no views at all: every ratio's denominator stage is empty
    # (fresh directory — Spark caches the previous path's file listing)
    d2 = tmp_path / "noviews"
    d2.mkdir()
    _write_events(d2, spark, [(1, t0, 7, "purchase", 1.0, "")])
    srow = spec.fn(spark, str(d2)).collect()[0]
    assert srow["n_view"] == 0
    assert srow["click_permille"] is None
    assert srow["purchase_permille"] is None
    orow = _oracle(d2, spec.oracle)[0]
    assert tuple(srow) == tuple(orow)


def test_windowed_funnel_excludes_late_conversions(tmp_path, spark):
    """A click 25h after the first view converts in e1 but NOT in the
    24h-windowed e1b."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 1.0, ""),
        (2, t0 + datetime.timedelta(hours=25), 7, "click", 1.0, ""),
        (3, t0, 8, "view", 1.0, ""),
        (4, t0 + datetime.timedelta(hours=2), 8, "click", 1.0, ""),
        (5, t0 + datetime.timedelta(hours=3), 8, "purchase", 1.0, ""),
    ]
    _write_events(tmp_path, spark, rows)
    strict = REGISTRY["e1_event_funnel"].fn(
        spark, str(tmp_path)).collect()[0]
    windowed = REGISTRY["e1b_windowed_funnel"].fn(
        spark, str(tmp_path)).collect()[0]
    assert strict["n_click"] == 2 and windowed["n_click"] == 1
    assert strict["n_purchase"] == 1 and windowed["n_purchase"] == 1
    owin = _oracle(tmp_path,
                   REGISTRY["e1b_windowed_funnel"].oracle)[0]
    assert tuple(windowed) == tuple(owin)


def test_e4_transitions_on_designed_sequence(spark, tmp_path):
    """Designed corpus: user 1 walks view->click->purchase->view,
    user 2 walks view->click. Transition counts and permille shares
    are exact; ties in ts break on event_id (events 10/11 share a
    timestamp)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioio_spark.queries import REGISTRY

    rows = [
        # (event_id, ts_us, user_id, event_type)
        (1, 1_000_000, 1, "view"),
        (2, 2_000_000, 1, "click"),
        (10, 3_000_000, 1, "purchase"),   # same ts as 11: id order wins
        (11, 3_000_000, 1, "view"),
        (20, 1_000_000, 2, "view"),
        (21, 2_000_000, 2, "click"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us", tz="UTC")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    got = [tuple(r) for r in REGISTRY["e4_markov_transitions"].fn(
        spark, str(tmp_path)).collect()]
    # 4 transitions: view->click x2 (500 permille), click->purchase and
    # purchase->view x1 each (250 permille); the shared-ts pair orders
    # purchase(10) before view(11) by event_id
    assert got == [
        ("view", "click", 2, 500),
        ("click", "purchase", 1, 250),
        ("purchase", "view", 1, 250),
    ]
