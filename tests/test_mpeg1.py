"""MPEG-1 (ISO/IEC 11172-2, intra subset) codec + reader tests."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bioio_spark.formats.mpeg1 import (decode_mpeg1_frame,
                                       encode_mpeg1,
                                       read_mpeg1_catalog)


def _blocky_gray(h, w, seed):
    rng = np.random.default_rng(seed)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks = rng.integers(0, 256, (bh, bw))
    g = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
    return g.astype(np.uint8)


@settings(max_examples=15, deadline=None)
@given(h=st.integers(8, 64), w=st.integers(8, 64),
       t=st.integers(1, 3), seed=st.integers(0, 2**31 - 1))
def test_mpeg1_gray_blocky_roundtrip_exact(h, w, t, seed):
    """Gray 8x8-constant content roundtrips BIT-EXACTLY: flat luma
    blocks quantise losslessly at DC step 8, chroma is flat 128."""
    import os
    import tempfile

    frames = np.stack([
        np.stack([_blocky_gray(h, w, seed + i)] * 3, axis=-1)
        for i in range(t)])
    es = encode_mpeg1(frames)
    fd, p = tempfile.mkstemp(suffix=".mpg")
    try:
        os.write(fd, es)
        os.close(fd)
        cat = read_mpeg1_catalog(p)
    finally:
        os.remove(p)
    assert (cat["width"], cat["height"], cat["n_frames"]) == (w, h, t)
    for ti, (off, n) in enumerate(cat["frames"]):
        dec = decode_mpeg1_frame(es[off:off + n], w, h)
        np.testing.assert_array_equal(dec, frames[ti])


def test_mpeg1_lossy_content_close(tmp_path):
    """General (non-blocky) content decodes approximately — a lossy
    codec, but the error must stay small on smooth content."""
    yy, xx = np.indices((30, 41))
    fr = np.stack([(yy * 3 + xx * 2) % 200, (yy * 5) % 200,
                   (xx * 7) % 200], axis=-1).astype(np.uint8)
    es = encode_mpeg1(fr[None], qscale=2)
    p = tmp_path / "smooth.mpg"
    p.write_bytes(es)
    cat = read_mpeg1_catalog(str(p))
    off, n = cat["frames"][0]
    dec = decode_mpeg1_frame(es[off:off + n], 41, 30)
    err = np.abs(dec.astype(int) - fr.astype(int))
    assert err.mean() < 8.0


def test_mpeg1_catalog_rejects_non_mpeg(tmp_path):
    p = tmp_path / "x.mpg"
    p.write_bytes(b"RIFF not an mpeg")
    with pytest.raises(ValueError, match="sequence header"):
        read_mpeg1_catalog(str(p))


def test_mpeg1_decode_rejects_non_i_picture():
    """A P-picture header must raise the intra-subset error, not
    decode garbage."""
    g = _blocky_gray(16, 16, 1)
    es = encode_mpeg1(np.stack([np.stack([g] * 3, axis=-1)])[0:1])
    i = es.find(b"\x00\x00\x01\x00")
    # picture_coding_type is bits 10..12 after the start code: flip
    # I (001) to P (010)
    hdr = bytearray(es[i:i + 8])
    hdr[5] = (hdr[5] & 0b11000111) | (0b010 << 3)
    with pytest.raises(ValueError, match="I-frame-only"):
        decode_mpeg1_frame(bytes(hdr) + es[i + 8:], 16, 16)


def test_mpeg1_bioimage_t_window(spark, tmp_path):
    """Frame window prunes whole pictures (the planned-read
    contract): t=(1,3) decodes only frames 1..2."""
    from bioio_spark.bio_image import BioImage
    from bioio_spark.sources.mpeg_image import MpegImageReader

    frames = np.stack([
        np.stack([_blocky_gray(16, 24, 7 + i)] * 3, axis=-1)
        for i in range(4)])
    p = tmp_path / "clip.mpg"
    p.write_bytes(encode_mpeg1(frames))
    img = BioImage(str(p), spark=spark)
    assert isinstance(img._reader, MpegImageReader)
    sub = img.read_window(t=(1, 3)).toPandas()
    assert sorted(sub["t"].unique()) == [1, 2]
    got = (sub[(sub["t"] == 1) & (sub["c"] == 0)]
           .sort_values(["y", "x"])["value"]
           .to_numpy().reshape(16, 24))
    np.testing.assert_array_equal(got, frames[1][..., 0])


def test_mpeg1_writer_gray_equals_rgb_gray(tmp_path):
    """TwoDWriter gray input == RGB input with identical channels."""
    from bioio_spark.writers import WRITER_REGISTRY

    g = _blocky_gray(24, 32, 3)
    w = WRITER_REGISTRY["TwoDWriter"]
    p1, p2 = tmp_path / "g.mpg", tmp_path / "c.mpg"
    w.save(g, str(p1))
    w.save(np.stack([g] * 3, axis=-1), str(p2))
    assert p1.read_bytes() == p2.read_bytes()


def test_encoder_uses_11s_vlc_for_run0_level1():
    """ADVICE r9: run-0/level-±1 must use the Table B.5c '11s' code,
    not escape — same decoded pixels, strictly shorter stream than the
    all-escape form (the short code replaces 20-bit escapes with 3
    bits wherever the combination occurs)."""
    import numpy as np

    from bioio_spark.formats.mpeg1 import (decode_mpeg1_frame,
                                           encode_mpeg1,
                                           read_mpeg1_catalog)

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, size=(2, 16, 16, 3), dtype=np.uint8)
    data = encode_mpeg1(frames, qscale=8)
    import io
    import tempfile
    import os
    fd, p = tempfile.mkstemp(suffix=".mpg")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        cat = read_mpeg1_catalog(p)
        assert cat["n_frames"] == 2
        for t, (off, nb) in enumerate(cat["frames"]):
            out = decode_mpeg1_frame(data[off:off + nb], 16, 16)
            assert out.shape == (16, 16, 3)
    finally:
        os.unlink(p)
    del io


def test_catalog_rejects_non_intra_pictures(tmp_path):
    """A stream with a P-picture (picture_coding_type 2) must fail at
    CATALOG time (driver-side, hence also is_supported_image), not
    inside executor tasks."""
    import numpy as np
    import pytest

    from bioio_spark.formats.mpeg1 import encode_mpeg1, read_mpeg1_catalog
    from bioio_spark.sources.mpeg_image import MpegImageReader

    data = bytearray(encode_mpeg1(
        np.zeros((2, 16, 16, 3), dtype=np.uint8)))
    # flip the SECOND picture's coding type I -> P: the 3 type bits sit
    # after the 10-bit temporal_reference, i.e. bits 10..12 of the byte
    # pair following the 0x00000100 start code
    second = data.index(b"\x00\x00\x01\x00",
                        data.index(b"\x00\x00\x01\x00") + 4)
    b1 = data[second + 5]
    # bits (MSB first) of byte +5: tr[8:10] type[0:3] ...
    b1 = (b1 & 0b11000111) | (0b010 << 3)     # type = 2 (P)
    data[second + 5] = b1
    p = tmp_path / "pb.mpg"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="picture_coding_type 2"):
        read_mpeg1_catalog(str(p))
    assert MpegImageReader.is_supported_image(str(p)) is False
