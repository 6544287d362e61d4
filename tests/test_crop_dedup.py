"""Crop-robust perceptual dedup (L5r/L5s, round 12): tile-wise 16-bit
hashes, any-tile-match candidates through the capped buckets, and
best-offset aligned-hamming verification. The twin fixture's three
arms (base / pure tile-aligned crop / crop with corrupted top rows)
must produce real accepts AND real candidate-then-reject rows."""

import pytest
from pyspark.sql import functions as F

N = 64


@pytest.fixture(scope="module")
def crop_pairs(spark):
    from bioio_spark.functions.multimodal import (AutoCodec,
                                                  crop_near_dups,
                                                  synth_crop_twins)

    media = synth_crop_twins(spark, N)
    return crop_near_dups(media, codec=AutoCodec).collect()


def test_all_pure_crops_accepted_at_zero(crop_pairs):
    """Tile-aligned crops leave interior tiles byte-identical, so every
    (base, crop-twin) pair must be found with best-offset hamming 0."""
    got = {(r["media_id_a"], r["media_id_b"]): r for r in crop_pairs}
    ids = [i for i in range(N) if i % 3 == 0]
    for i in ids:
        assert (i, i + N) in got, f"crop twin of {i} missed"
        r = got[(i, i + N)]
        assert r["ham_milli"] == 0
        # the crop removed CTWIN_ROWS=4 rows (1 tile row) and cw
        # columns, so the aligned offset is negative in both axes
        assert r["dy"] < 0 and r["dx"] <= 0


def test_candidate_then_reject_rows_exist(spark, crop_pairs):
    """The corrupt arm IS enumerated (its clean tiles still match the
    base exactly) but mostly fails the ham_milli gate — verification
    must be doing real work, not rubber-stamping candidates."""
    from bioio_spark.functions.dedup import _bucket_pairs
    from bioio_spark.functions.multimodal import (AutoCodec,
                                                  crop_tile_hashes,
                                                  synth_crop_twins)

    media = synth_crop_twins(spark, N)
    th = crop_tile_hashes(media, codec=AutoCodec)
    cand = {(r["doc_a"], r["doc_b"]) for r in _bucket_pairs(
        th.select("media_id", "v").distinct(), ["v"], "media_id",
        max_width=256).distinct().collect()}
    accepted = {(r["media_id_a"], r["media_id_b"]) for r in crop_pairs}
    ids = [i for i in range(N) if i % 3 == 0]
    corrupt_cand = [(i, i + 2 * N) for i in ids
                    if (i, i + 2 * N) in cand]
    corrupt_rejected = [p for p in corrupt_cand if p not in accepted]
    assert len(corrupt_cand) >= 10, "corrupt arm fell out of the buckets"
    assert len(corrupt_rejected) >= 10, (
        "verification accepted nearly every corrupt twin — the "
        "ham_milli gate stopped gating")


def test_no_cross_image_accepts(crop_pairs):
    """Different base images (decorrelated by the per-image stride)
    must never verify as crops of each other: every accepted pair
    relates the arms of ONE base id."""
    for r in crop_pairs:
        a, b = r["media_id_a"], r["media_id_b"]
        assert a % N == b % N, f"cross-image accept {a},{b}"


def test_recall_gauge_exact(spark, sf_dir):
    """Banding is exact on this fixture: every verified-true pair
    shares at least one identical tile, so the gauge reads 1000."""
    from bioio_spark.queries import REGISTRY

    [row] = REGISTRY["mm_crop_recall"].fn(spark, sf_dir).collect()
    assert row["recall_permille"] == 1000
    assert row["n_true"] == row["n_caught"] > 0
