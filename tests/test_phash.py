"""128-bit integer-DCT pHash invariants (oracle parity covers the
registry queries; these pin the fixed-point DCT arithmetic, the 8-band
pigeonhole guarantee, and the bucket cap on adversarial inputs)."""
import struct

import numpy as np
import pytest


def _fkc(media_id, img):
    from bioio_spark.functions.multimodal import _MAGIC

    h, w = img.shape
    header = struct.pack("<iii", w, h, 1)
    return (media_id, "image",
            _MAGIC + header + img.astype(np.uint8).tobytes(),
            (w, h, 1, 0, "fkc1"))


def _media(spark, rows):
    from bioio_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _np_phash(img):
    """Reference recomputation of the 128-bit fingerprint in numpy."""
    from bioio_spark.functions.multimodal import (DCT_T, PHASH_GRID,
                                                  PHASH_PAIRS)

    tu = np.asarray(DCT_T, dtype=np.int64)[:9, :]
    tv = np.asarray(DCT_T, dtype=np.int64)
    h, w = img.shape
    ys = (np.arange(h) * PHASH_GRID) // h
    xs = (np.arange(w) * PHASH_GRID) // w
    bid = (ys[:, None] * PHASH_GRID + xs[None, :]).ravel()
    bs = (np.bincount(bid, weights=img.astype(np.int64).ravel(),
                      minlength=PHASH_GRID ** 2)
          .astype(np.int64).reshape(PHASH_GRID, PHASH_GRID))
    coef = tu @ bs @ tv.T
    return np.asarray([coef[u, v] > 0 for u, v in PHASH_PAIRS])


def test_dct_table_properties():
    """Fixed-point DCT basis sanity: DC row is flat 1024, every AC row
    sums to ~0 (|sum| <= 8 rounding residue), table is u-symmetric the
    way cos((2y+1)u*pi/32) must be."""
    from bioio_spark.functions.multimodal import DCT_T, PHASH_PAIRS

    assert DCT_T[0] == [1024] * 16
    for u in range(1, 16):
        assert abs(sum(DCT_T[u])) <= 8
    assert len(PHASH_PAIRS) == 128
    assert len(set(PHASH_PAIRS)) == 128
    assert (0, 0) not in PHASH_PAIRS          # DC excluded


def test_phash_matches_numpy_reference(spark):
    from bioio_spark.functions.multimodal import PHASH_BANDS, phash_images

    rng = np.random.default_rng(5)
    imgs = {i: rng.integers(0, 251, size=(12, 16 + 8 * (i % 3)))
            for i in range(1, 5)}
    rows = [_fkc(i, img) for i, img in imgs.items()]
    got = {r["media_id"]: r for r in
           phash_images(_media(spark, rows)).collect()}
    for i, img in imgs.items():
        bits = _np_phash(img)
        for k in range(PHASH_BANDS):
            val = sum(1 << j for j in range(16) if bits[k * 16 + j])
            assert got[i][f"b{k}"] == val, (i, k)


def test_twin_within_threshold_found_unrelated_excluded(spark):
    from bioio_spark.functions.multimodal import phash_near_dups

    rng = np.random.default_rng(11)
    base = rng.integers(0, 200, size=(16, 16))
    twin = base.copy()
    twin[0, 0] += 30
    other = rng.integers(0, 200, size=(16, 16))
    d = int((_np_phash(base) != _np_phash(twin)).sum())
    assert d <= 7, "fixture drifted: twin must sit inside the threshold"
    rows = [_fkc(1, base), _fkc(2, twin), _fkc(3, other)]
    pairs = {(r["media_id_a"], r["media_id_b"]): r["hamming"]
             for r in phash_near_dups(_media(spark, rows)).collect()}
    assert pairs.get((1, 2)) == d
    assert (1, 3) not in pairs and (2, 3) not in pairs


@pytest.mark.parametrize("flips", [1, 4, 7])
def test_pigeonhole_exact_below_band_count(spark, flips):
    """Any pair within hamming < 8 of the 128-bit key MUST be found
    (absent cap pressure): construct a twin by flipping exactly `flips`
    fingerprint bits via targeted block edits is fragile, so instead
    verify the guarantee on random pairs that HAPPEN to land <= 7 —
    every such pair must appear in the output."""
    from bioio_spark.functions.multimodal import phash_near_dups

    rng = np.random.default_rng(100 + flips)
    rows, fps = [], {}
    for i in range(12):
        img = rng.integers(0, 251, size=(12, 24))
        if i % 2 == 1:   # perturb the previous image a little
            prev = fps[i - 1][1]
            img = prev.copy()
            img.ravel()[:flips] = (img.ravel()[:flips] + 25) % 251
        rows.append(_fkc(i, img))
        fps[i] = (_np_phash(img), img)
    want = set()
    for a in range(12):
        for b in range(a + 1, 12):
            if (fps[a][0] != fps[b][0]).sum() <= 7:
                want.add((a, b))
    got = {(r["media_id_a"], r["media_id_b"])
           for r in phash_near_dups(_media(spark, rows)).collect()}
    assert want <= got == want  # exact: nothing missed, nothing extra


def test_phash_cap_bounds_degenerate_image_corpus(spark):
    """40 identical flat images — one band bucket holds the whole
    corpus; with max_width=8 only the 8 lowest ids enumerate pairs
    (keep-lowest-id, O(cap^2)), exactly the SQL cap mirror."""
    from bioio_spark.functions.multimodal import phash_near_dups

    img = np.full((12, 16), 99)
    rows = [_fkc(i, img) for i in range(40)]
    out = phash_near_dups(_media(spark, rows), max_width=8).collect()
    pairs = {(r["media_id_a"], r["media_id_b"]) for r in out}
    assert pairs == {(a, b) for a in range(8) for b in range(8) if a < b}
    assert all(r["hamming"] == 0 for r in out)


def test_twin_fixture_shape(spark):
    """synth_image_twins: 2 rows per base image id, twins decode to the
    base content except the perturbed leading pixels."""
    from bioio_spark.functions.multimodal import (AutoCodec, TWIN_DELTA,
                                                  TWIN_NPIX,
                                                  synth_image_twins)

    media = synth_image_twins(spark, 12)
    rows = {r["media_id"]: r for r in media.collect()}
    base_ids = [i for i in range(12) if i % 3 == 0]
    assert set(rows) == set(base_ids) | {i + 12 for i in base_ids}
    for i in base_ids:
        b = AutoCodec.decode(rows[i]["payload"])[0].astype(np.int64)
        t = AutoCodec.decode(rows[i + 12]["payload"])[0].astype(np.int64)
        flat_b, flat_t = b.ravel(), t.ravel()
        assert ((flat_b[:TWIN_NPIX] + TWIN_DELTA) % 251
                == flat_t[:TWIN_NPIX]).all()
        assert (flat_b[TWIN_NPIX:] == flat_t[TWIN_NPIX:]).all()


def test_video_twin_fixture_and_wide_key(spark):
    """Video wide key: frame-0 perturbed twins resolve by the per-frame
    128-bit pHash — every reported pair is a (base, base+N) twin, the
    frame-count gate holds, and at least one over-threshold twin is
    rejected (the fixture spans hamming 2-16)."""
    from bioio_spark.functions.multimodal import (AutoCodec,
                                                  PHASH_BANDS,
                                                  phash_video_frames,
                                                  synth_video_twins,
                                                  video_near_dups)

    media = synth_video_twins(spark, 64)
    out = video_near_dups(media, codec=AutoCodec, max_frame_hamming=7,
                          n_bands=PHASH_BANDS,
                          fingerprint=phash_video_frames).collect()
    assert out, "no twin pairs found"
    base_ids = {i for i in range(64) if i % 3 == 2}
    for r in out:
        assert r["media_id_a"] in base_ids
        assert r["media_id_b"] == r["media_id_a"] + 64
        assert r["n_frames"] == 4 + (r["media_id_a"] // 3) % 3
    assert len(out) < len(base_ids)   # some twins exceed the boundary
