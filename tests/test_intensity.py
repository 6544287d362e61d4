"""N5-N7 image ops (Sobel, integral image, histogram equalization)
cross-checked against numpy references, plus the L13 BPE trainer
against a pure-Python reference implementation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bioio_spark.operators.intensity import hist_equalize, integral_image
from bioio_spark.operators.stencil import sobel_pixels


def _pixels(spark, arr):
    t, c, y, x = arr.shape
    rows = [(int(ti), int(ci), int(yi), int(xi),
             float(arr[ti, ci, yi, xi]))
            for ti in range(t) for ci in range(c)
            for yi in range(y) for xi in range(x)]
    return spark.createDataFrame(
        rows, "t int, c int, y int, x int, value double")


@pytest.mark.parametrize("shape", [(1, 1, 4, 5), (2, 2, 5, 7)])
def test_sobel_matches_numpy(spark, shape):
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 100, shape).astype(float)
    Y, X = shape[-2:]
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    got = {}
    for r in sobel_pixels(_pixels(spark, arr), Y, X,
                          plane_cols=("t", "c")).collect():
        got[(r["t"], r["c"], r["y"], r["x"])] = (
            r["gx"], r["gy"], r["mag2"])
    n_interior = shape[0] * shape[1] * (Y - 2) * (X - 2)
    assert len(got) == n_interior
    for (t, c, y, x), (gx, gy, mag2) in got.items():
        win = arr[t, c, y - 1:y + 2, x - 1:x + 2]
        egx = int((win * kx).sum())
        egy = int((win * kx.T).sum())
        assert (gx, gy, mag2) == (egx, egy, egx * egx + egy * egy)


def test_integral_matches_numpy(spark):
    rng = np.random.default_rng(19)
    arr = rng.integers(0, 50, (2, 1, 4, 6)).astype(float)
    sat = arr.cumsum(axis=-1).cumsum(axis=-2)
    got = integral_image(_pixels(spark, arr),
                         plane_cols=("t", "c")).collect()
    assert len(got) == arr.size
    for r in got:
        assert r["sat"] == int(sat[r["t"], r["c"], r["y"], r["x"]])


def _ref_hist_eq(plane, levels=256):
    n = plane.size
    vals, counts = np.unique(plane, return_counts=True)
    cdf = counts.cumsum()
    cdf_min = int(cdf[0])
    out = np.zeros_like(plane, dtype=np.int64)
    for v, c in zip(vals, cdf):
        eq = (0 if n == cdf_min
              else (int(c) - cdf_min) * (levels - 1) // (n - cdf_min))
        out[plane == v] = eq
    return out


@pytest.mark.parametrize("gen", ["random", "constant"])
def test_hist_eq_matches_numpy(spark, gen):
    rng = np.random.default_rng(23)
    if gen == "constant":
        arr = np.full((1, 1, 3, 4), 7.0)
    else:
        arr = rng.integers(0, 12, (2, 1, 3, 4)).astype(float)
    Y, X = arr.shape[-2:]
    got = hist_equalize(_pixels(spark, arr), n_pixels=Y * X,
                        plane_cols=("t", "c")).collect()
    assert len(got) == arr.size
    for r in got:
        ref = _ref_hist_eq(arr[r["t"], r["c"]])
        assert r["eq"] == int(ref[r["y"], r["x"]])


def test_hist_eq_remap_is_broadcast(spark):
    arr = np.arange(24, dtype=float).reshape(1, 1, 4, 6)
    plan = hist_equalize(_pixels(spark, arr), n_pixels=24,
                         plane_cols=("t", "c"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# -- L13 BPE vs pure-Python reference ---------------------------------------

def _ref_bpe(word_freqs, n_merges):
    """Reference BPE trainer: dict word->freq, greedy leftmost apply."""
    seqs = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for s, f in seqs.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get(
                    (s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], " ".join(p)))
        merges.append((" ".join(best), "".join(best), counts[best]))
        nxt = {}
        for s, f in seqs.items():
            out, i = [], 0
            while i < len(s):
                if (i + 1 < len(s)
                        and (s[i], s[i + 1]) == best):
                    out.append("".join(best))
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        seqs = nxt
    return merges


def test_bpe_matches_reference(spark):
    from bioio_spark.functions.bpe import _word_freqs, bpe_vocab

    texts = ["the cat sat on the mat", "the hat and the cat",
             "aaa aa aaaa the", "banana bandana the the",
             "Mixed CASE words the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    wf = {r["word"]: r["freq"] for r in _word_freqs(docs).collect()}
    expected = _ref_bpe(wf, 5)
    got = [(r["pair"], r["token"], r["pair_count"])
           for r in bpe_vocab(docs, n_merges=5).collect()]
    assert got == expected


def test_bpe_scans_corpus_once(spark):
    """The round-8 verdict's directed fix, pinned directly: wrap the
    corpus in an accumulator-counting mapInPandas source (1 partition
    -> 1 batch per scan), train 6 merge rounds, and assert the source
    was scanned EXACTLY ONCE — the per-round argmax jobs must run over
    the persisted vocab table, never re-derive it from the corpus.
    Then assert the (cache_key, n_merges) memo: bpe_tokenize_stats on
    the same key re-uses the training without touching the source."""
    from bioio_spark.functions.bpe import (bpe_tokenize_stats,
                                           bpe_vocab)

    texts = ["the cat sat on the mat", "the hat and the cat",
             "banana bandana the the", "lower upper the mat"] * 5
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string").repartition(1)
    scans = spark.sparkContext.accumulator(0)

    def counting(batches):
        for b in batches:
            scans.add(1)
            yield b

    docs = raw.mapInPandas(counting, raw.schema)
    key = "test_bpe_scans_corpus_once"
    vocab = bpe_vocab(docs, n_merges=6, cache_key=key).collect()
    assert len(vocab) == 6
    assert scans.value == 1, (
        f"corpus scanned {scans.value}x across 6 merge rounds; the "
        "persisted-vocab contract requires exactly 1")
    stats = bpe_tokenize_stats(docs, n_merges=6,
                               cache_key=key).collect()
    assert stats[0]["n_symbols_after"] < stats[0]["n_symbols_before"]
    assert scans.value == 1, "memoized re-train touched the corpus"


def test_box_sum_integral_radius_edges(spark):
    """R=0 reduces to the pixel's own value; R >= plane extent yields
    the whole-plane sum everywhere; mid radii match a numpy clipped-box
    reference."""
    import numpy as np
    import pyspark.sql.functions as F

    from bioio_spark.operators.intensity import box_sum_integral

    rng = np.random.default_rng(13)
    H, W = 5, 7
    img = rng.integers(0, 100, size=(H, W))
    rows = [(0, 0, 0, y, x, float(img[y, x]))
            for y in range(H) for x in range(W)]
    px = spark.createDataFrame(
        rows, "t int, c int, z int, y int, x int, value double")

    for R in (0, 2, 10):
        got = {(r["y"], r["x"]): r["box_sum"]
               for r in box_sum_integral(px, radius=R).collect()}
        for y in range(H):
            for x in range(W):
                want = int(img[max(0, y - R):y + R + 1,
                               max(0, x - R):x + R + 1].sum())
                assert got[(y, x)] == want, (R, y, x)
