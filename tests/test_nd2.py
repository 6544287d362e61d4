"""ND2 (Nikon) codec + reader — the reference's bioio-nd2 plugin tier
(ref README.md:63); chunk/chunk-map layout per the public nd2
container docs."""

import struct

import numpy as np
import pytest

from bioio_spark import BioImage
from bioio_spark.formats.nd2 import (CHUNK_MAGIC, decode_lv, decode_nd2,
                                     encode_lv, encode_nd2,
                                     read_nd2_attributes,
                                     read_nd2_chunkmap, read_nd2_frame)
from bioio_spark.sources.nd2_image import Nd2ImageReader


def test_lv_roundtrip():
    d = {"SLx": {"uiWidth": 5, "dCal": 0.25, "name": "héllo",
                 "nested": {"a": 1, "b": 2.5}}}
    assert decode_lv(encode_lv(d)) == d


def test_container_layout_pinned(tmp_path):
    """Chunk magic 0x0ABECEDA, signature chunk first, chunk-map offset
    in the file's last 8 bytes."""
    p = tmp_path / "a.nd2"
    p.write_bytes(encode_nd2(np.zeros((1, 2, 3), np.uint8)))
    data = p.read_bytes()
    magic, nlen, dlen = struct.unpack_from("<IIQ", data, 0)
    assert magic == CHUNK_MAGIC
    assert data[16:16 + nlen] == b"ND2 FILE SIGNATURE CHUNK NAME01!"
    (map_pos,) = struct.unpack_from("<Q", data, len(data) - 8)
    assert struct.unpack_from("<I", data, map_pos)[0] == CHUNK_MAGIC


def test_codec_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 65535, (4, 5, 6)).astype(np.uint16)
    p = tmp_path / "g.nd2"
    p.write_bytes(encode_nd2(frames, pixel_um=0.25))
    back, attrs = decode_nd2(str(p))
    np.testing.assert_array_equal(back, frames)
    assert attrs["dCalibration"] == pytest.approx(0.25)
    np.testing.assert_array_equal(
        read_nd2_frame(str(p), 2), frames[2])


def test_codec_roundtrip_interleaved(tmp_path):
    rng = np.random.default_rng(4)
    fc = rng.integers(0, 256, (3, 4, 5, 2)).astype(np.uint8)
    p = tmp_path / "c.nd2"
    p.write_bytes(encode_nd2(fc, channel_names=["DAPI", "GFP"]))
    back, attrs = decode_nd2(str(p))
    np.testing.assert_array_equal(back, fc)
    assert attrs["uiComp"] == 2


def test_chunkmap_tail_seek(tmp_path):
    p = tmp_path / "m.nd2"
    p.write_bytes(encode_nd2(np.zeros((3, 2, 2), np.uint8)))
    cmap = read_nd2_chunkmap(str(p))
    assert {f"ImageDataSeq|{t}!" for t in range(3)} <= set(cmap)
    assert "ImageAttributesLV!" in cmap


def test_rejects_bad_map(tmp_path):
    p = tmp_path / "bad.nd2"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_nd2_chunkmap(str(p))
    assert not Nd2ImageReader.is_supported_image(str(p))


def test_bioimage_nd2_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(6)
    fc = rng.integers(0, 65535, (3, 4, 5, 2)).astype(np.uint16)
    p = tmp_path / "cells.nd2"
    p.write_bytes(encode_nd2(fc, pixel_um=0.16,
                             channel_names=["DAPI", "GFP"]))
    img = BioImage(str(p), spark=spark)     # extension-routed
    assert type(img.reader).__name__ == "Nd2ImageReader"
    assert (img.dims.T, img.dims.C, img.dims.Z) == (3, 2, 1)
    assert img.channel_names == ["DAPI", "GFP"]
    assert img.physical_pixel_sizes.X == pytest.approx(0.16)
    got = img.get_image_data("TCYX").astype(np.uint16)
    np.testing.assert_array_equal(got, fc.transpose(0, 3, 1, 2))
