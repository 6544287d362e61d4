"""L30 bottom-k quantile sketch + s21 streaming maintenance.

The sketch's load-bearing property is the semilattice merge: bottom-k
of a union equals bottom-k of the merged per-part bottom-ks, exactly.
That is what makes the streamed sketch set-equal to the batch sketch
for ANY arrival split, and what makes the 100 TB shape (per-partition
local top-k, k-row merge) correct rather than approximate.
"""
import os
import shutil

from pyspark.sql import functions as F


def _pairs(df):
    return sorted((r["v"], r["h"]) for r in df.collect())


def test_l30_bottomk_merge_is_semilattice(spark, sf_dir):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) as
    exact (v, h) multisets, for an arbitrary split of lineitem."""
    from bioio_spark.queries.base import load
    from bioio_spark.queries.llm import _BK_K, _bk_sample, _bk_vals

    vals = _bk_vals(load(spark, sf_dir, "lineitem"))
    whole = _pairs(_bk_sample(vals, _BK_K))

    a = vals.filter(F.col("v") % 3 == 0)
    b = vals.filter(F.col("v") % 3 != 0)
    merged = _pairs(_bk_sample(
        _bk_sample(a, _BK_K).unionByName(_bk_sample(b, _BK_K)), _BK_K))
    assert whole == merged and len(whole) > 0


def test_l30_sample_arm_is_takeordered(spark, sf_dir):
    """The sketch arm must be one TakeOrderedAndProject over the hash
    projection — map-side partial top-k, no Exchange of the data
    (the a4 top-k plan shape). A global Sort here would mean the
    'sample' costs a full shuffle at 100 TB."""
    from bioio_spark.queries.base import load
    from bioio_spark.queries.llm import _BK_K, _bk_sample, _bk_vals

    samp = _bk_sample(_bk_vals(load(spark, sf_dir, "lineitem")),
                      _BK_K)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # a global sort would show up as a rangepartitioning Exchange +
    # Sort pair; the only Exchange allowed is the loader's own
    # hash repartition below the projection
    assert "rangepartitioning" not in plan
    assert "Sort " not in plan


def test_l30_estimates_bounded_on_fixture(spark, sf_dir):
    """Gauge sanity at fixture scale: every estimate within 15% of
    the exact rank-statistic, and the tails (p90/p99) within 2% —
    the k=1024 binomial error envelope. A broken sample (wrong hash
    domain, wrong rank arithmetic) blows well past this."""
    from bioio_spark.queries import REGISTRY

    rows = {r["q_permille"]: r for r in
            REGISTRY["l30_bottomk_quantiles"].fn(spark, sf_dir)
            .collect()}
    assert set(rows) == {250, 500, 750, 900, 990}
    for q, r in rows.items():
        assert r["err_permille"] <= 150, (q, r)
    assert rows[900]["err_permille"] <= 20
    assert rows[990]["err_permille"] <= 20


def test_s21_stream_store_replay_idempotent(spark, sf_dir):
    """s21: each batch's partial is its own deterministic bottom-k
    written under its own group partition, so replaying every file
    after checkpoint loss converges to the identical partial set."""
    from bioio_spark.queries.streaming_batch import (
        _s21_fixture_dir, stream_bottomk_store)

    rows_dir = _s21_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(rows_dir), "s21_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_bottomk_store(spark, rows_dir, store)
    first = _pairs(spark.read.parquet(
        os.path.join(store, "partials")).select("v", "h"))
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_bottomk_store(spark, rows_dir, store)
    second = _pairs(spark.read.parquet(
        os.path.join(store, "partials")).select("v", "h"))
    assert first == second and len(first) > 0
    shutil.rmtree(store, ignore_errors=True)


def test_s21_streamed_sample_set_equals_batch_sample(spark, sf_dir):
    """The semilattice claim end-to-end: the bottom-k over the
    streamed partials is SET-EQUAL to the batch bottom-k over the
    same corpus (not just quantile-equal)."""
    from bioio_spark.queries.llm import _BK_K, _bk_sample, _bk_vals
    from bioio_spark.queries.streaming_batch import (
        _s21_fixture_dir, stream_bottomk_store)

    rows_dir = _s21_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(rows_dir), "s21_seteq_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_bottomk_store(spark, rows_dir, store)
    streamed = _pairs(_bk_sample(
        spark.read.parquet(os.path.join(store, "partials"))
        .select("v", "h"), _BK_K))
    batch = _pairs(_bk_sample(
        _bk_vals(spark.read.parquet(rows_dir)), _BK_K))
    assert streamed == batch and len(batch) == _BK_K
    shutil.rmtree(store, ignore_errors=True)
