"""Drift-estimation operator invariants (oracle parity covers the
registry query; these pin the recovery semantics on known shifts)."""
import numpy as np
import pyspark.sql.functions as F


def _frames(spark, planes):
    """planes: {t: 2D ndarray} -> (t, c, z, y, x, v) frame table."""
    rows = []
    for t, img in planes.items():
        h, w = img.shape
        for y in range(h):
            for x in range(w):
                rows.append((t, 0, 0, y, x, int(img[y, x])))
    return spark.createDataFrame(
        rows, "t int, c int, z int, y int, x int, v long")


def test_known_shift_recovered(spark):
    """Frame t+1 = frame t translated by (dy=1, dx=-2): the estimator
    must return exactly that shift (content is high-variance noise, so
    the aligned overlap dominates every misaligned one)."""
    from bioio_spark.operators.registration import estimate_drift

    rng = np.random.default_rng(21)
    base = rng.integers(1, 250, size=(12, 14))
    shifted = np.zeros_like(base)
    # b(y + 1, x - 2) == a(y, x)  =>  b[y, x] = a[y - 1, x + 2]
    shifted[1:, :-2] = base[:-1, 2:]
    out = estimate_drift(_frames(spark, {0: base, 1: shifted}),
                         radius=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t"], r["best_dy"], r["best_dx"]) == (0, 1, -2)


def test_identical_frames_zero_shift_by_tie_rule(spark):
    """Identical consecutive frames: (0, 0) wins only through the
    smallest-(dy, dx) tie rule against equally-scoring... actually a
    CONSTANT frame scores every overlap by area, so the largest overlap
    (0, 0) wins outright; a noise frame repeated wins (0, 0) because
    self-correlation dominates. Pin both."""
    from bioio_spark.operators.registration import estimate_drift

    rng = np.random.default_rng(5)
    noise = rng.integers(1, 250, size=(10, 10))
    for img in (np.full((10, 10), 7), noise):
        out = estimate_drift(
            _frames(spark, {0: img, 1: img.copy()}), radius=2).collect()
        assert (out[0]["best_dy"], out[0]["best_dx"]) == (0, 0)


def test_gapped_timepoints_skip_missing_pairs(spark):
    """Non-contiguous t values: only t with a t+1 present produce a
    row (t=0 pairs with nothing; t=2 pairs with t=3)."""
    from bioio_spark.operators.registration import estimate_drift

    rng = np.random.default_rng(9)
    img = rng.integers(1, 250, size=(8, 8))
    out = estimate_drift(
        _frames(spark, {0: img, 2: img, 3: img}), radius=1).collect()
    assert [r["t"] for r in out] == [2]
