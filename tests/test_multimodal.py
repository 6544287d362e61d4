"""L5 multimodal plumbing: binary payload columns, typed metadata pruning,
Arrow-batched decode/resize/frame-sample/audio ops via mapInPandas."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bioio_spark.functions.multimodal import (
    FakeCodec,
    PillowCodec,
    audio_window_energy,
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 24).cache()


def test_codec_roundtrip():
    payload = FakeCodec.encode(7, "image", 16, 12, 1)
    arr = FakeCodec.decode(payload)
    assert arr.shape == (1, 12, 16)
    # deterministic: same id -> same bytes
    assert payload == FakeCodec.encode(7, "image", 16, 12, 1)
    with pytest.raises(ValueError):
        FakeCodec.decode(b"nope" + payload)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        PillowCodec.decode(b"anything")


def test_decode_features(media):
    feats = decode_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 24
    img = rows[0]
    assert img["kind"] == "image" and img["n_frames"] == 1
    vid = rows[2]
    assert vid["kind"] == "video" and vid["n_frames"] >= 4
    # stats match a local decode
    local = FakeCodec.decode(
        media.filter(F.col("media_id") == 0).collect()[0]["payload"])
    assert rows[0]["mean_value"] == pytest.approx(float(local.mean()))


def test_metadata_prunes_before_decode(media):
    # filter on typed metadata only — no decode required; plan has no
    # MapInPandas below the filter
    wide = media.filter(F.col("meta.width") >= 32).select("media_id")
    assert "MapInPandas" not in wide._jdf.queryExecution().executedPlan().toString()
    assert wide.count() > 0


def test_resize_images(media):
    resized = resize_images(media, 8, 6)
    out = {r["media_id"]: r for r in resized.collect()}
    assert len(out) == 24
    img_row = out[0]
    assert img_row["meta"]["width"] == 8 and img_row["meta"]["height"] == 6
    arr = FakeCodec.decode(bytes(img_row["payload"]))
    assert arr.shape == (1, 6, 8)
    # audio rows untouched
    assert out[1]["meta"]["width"] == 800


def test_sample_frames(media):
    frames = sample_frames(media, every_k=2).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    # video with 4 frames sampled every 2 -> frames 0, 2
    assert sorted(by_media[2]) == [0, 2]


def test_audio_window_energy(media):
    e = audio_window_energy(media, window=100).collect()
    assert len(e) > 0
    # 800 samples / 100 -> 8 windows per audio row
    counts = {}
    for r in e:
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
    assert set(counts.values()) == {8}
    # energy matches local computation for one row
    local = FakeCodec.decode(FakeCodec.encode(1, "audio", 800, 1, 1))
    want = local.reshape(-1)[:100].astype(np.float64).mean()
    got = [r["energy"] for r in e if r["media_id"] == 1 and r["window_idx"] == 0]
    assert got[0] == pytest.approx(want)


def test_binary_file_source_roundtrip(spark, tmp_path):
    """S9: write FakeCodec files, scan with binaryFile (glob-filtered),
    decode via mapInPandas; features must match direct in-memory decode."""
    import numpy as np

    from bioio_spark.functions.multimodal import FakeCodec
    from bioio_spark.sources.binary_media import (decode_media_files,
                                                  read_media_dir)

    for i in range(8):
        payload = FakeCodec.encode(i, "image", 8 + i, 6, 1)
        (tmp_path / f"{i}.fkc").write_bytes(payload)
    (tmp_path / "ignored.txt").write_text("not media")

    binary = read_media_dir(spark, str(tmp_path))
    assert binary.count() == 8  # glob filter excluded the .txt

    feats = {r["media_id"]: r for r in
             decode_media_files(binary).collect()}
    assert set(feats) == set(range(8))
    for i in range(8):
        arr = FakeCodec.decode(FakeCodec.encode(i, "image", 8 + i, 6, 1))
        assert feats[i]["width"] == 8 + i
        assert feats[i]["height"] == 6
        np.testing.assert_allclose(feats[i]["mean_value"], arr.mean())


def test_png_codec_media_roundtrip():
    """PngCodec payloads are genuine PNG files; AutoCodec dispatches on
    magic bytes between PNG and FKC1 containers."""
    import numpy as np

    from bioio_spark.formats.png import decode_png
    from bioio_spark.functions.multimodal import (AutoCodec, FakeCodec,
                                                  PngCodec)

    payload = PngCodec.encode(5, "image", 16, 12, 1)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    # the PNG content is the same closed-form samples FakeCodec carries
    want = ((np.arange(16 * 12, dtype=np.int64) * 31 + 5 * 7) % 251
            ).astype(np.uint8).reshape(12, 16)
    np.testing.assert_array_equal(decode_png(payload), want)
    np.testing.assert_array_equal(AutoCodec.decode(payload), want[None])
    fkc = FakeCodec.encode(5, "image", 16, 12, 1)
    np.testing.assert_array_equal(AutoCodec.decode(fkc), want[None])


def test_decode_features_mixed_codecs(spark):
    from bioio_spark.functions.multimodal import (AutoCodec,
                                                  decode_features,
                                                  synth_media)

    media = synth_media(spark, 12, image_format="png")
    fmts = {r["media_id"]: r["meta"]["format"] for r in media.collect()}
    assert all(v == "png" for k, v in fmts.items() if k % 3 == 0)
    assert all(v == "fkc1" for k, v in fmts.items() if k % 3 != 0)
    feats = decode_features(media, codec=AutoCodec).collect()
    assert len(feats) == 12
    base = {r["media_id"]: r for r in
            decode_features(synth_media(spark, 12)).collect()}
    for r in feats:  # PNG vs FKC1 containers, identical decoded stats
        b = base[r["media_id"]]
        assert (r["mean_value"], r["max_value"]) == \
            (b["mean_value"], b["max_value"])


# -- L5o cross-modal dedup (r11) --------------------------------------------

def test_crossmodal_adversarial_structure(spark):
    """The r10 verdict's adversarial bar: same image/different caption
    and same caption/different image BOTH resolve into one cluster, a
    bridge doc merges two clusters transitively, and edge-free docs
    stay singleton keepers."""
    from bioio_spark.queries import REGISTRY

    rows = {r["doc_id"]: r for r in
            REGISTRY["mm_crossmodal_dedup"]
            .fn(spark, "/root/testdata/sf0.001").collect()}
    # same image, different caption: docs 1 and 11 share imgidx 1
    assert rows[11]["cluster_rep"] == rows[1]["cluster_rep"]
    # same caption, different image: docs 1 and 16 share capbase 1
    assert rows[16]["cluster_rep"] == rows[1]["cluster_rep"]
    # NEAR caption (variant last word), different image: docs 5 and 20
    assert rows[20]["cluster_rep"] == rows[5]["cluster_rep"] == 5
    # the bridge: doc 25 is an image-twin of doc 0 AND a near-caption
    # of doc 3 — merging {0,10,15} with {3,13,18} into one cluster
    reps = {rows[d]["cluster_rep"] for d in (0, 3, 10, 13, 15, 18, 25)}
    assert reps == {0}
    assert rows[0]["cluster_size"] == 7
    # independent families stay apart
    assert rows[1]["cluster_rep"] != rows[2]["cluster_rep"]
    # singletons keep themselves
    for d in (26, 27):
        assert rows[d]["cluster_rep"] == d
        assert rows[d]["cluster_size"] == 1 and rows[d]["keep"] == 1
    # exactly one keeper per cluster
    keepers = [d for d, r in rows.items() if r["keep"] == 1]
    assert sorted(keepers) == sorted(
        {r["cluster_rep"] for r in rows.values()})


def test_crossmodal_images_distinct_unless_twinned(spark):
    """Fixture guard: distinct imgidx values must be >3 aHash bits
    apart (no accidental image edges blurring the caption-edge test)."""
    from bioio_spark.functions.multimodal import (AutoCodec,
                                                  CROSSMODAL_SPEC,
                                                  image_near_dups,
                                                  synth_crossmodal)

    media, _caps = synth_crossmodal(spark)
    imgidx = {d: i for d, i, _c, _v in CROSSMODAL_SPEC}
    for r in image_near_dups(media, codec=AutoCodec).collect():
        assert imgidx[r["media_id_a"]] == imgidx[r["media_id_b"]]
        assert r["hamming"] == 0
