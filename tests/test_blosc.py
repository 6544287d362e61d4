"""Blosc1 container codec + blosc-compressed Zarr v2 stores — the
compressor wild OME-NGFF 0.4 stores use by default (zarr-python 2's
``Blosc(cname='lz4', shuffle=SHUFFLE)``)."""

import json
import struct

import numpy as np
import pytest

from bioio_spark.formats.blosc import (blosc_decode, blosc_encode,
                                       CODE_OF_CNAME)


@pytest.mark.parametrize("cname", ["lz4", "zstd", "zlib", "snappy"])
@pytest.mark.parametrize("shuffle", [0, 1])
@pytest.mark.parametrize("dtype", ["uint8", "uint16", "float64"])
def test_roundtrip_matrix(cname, shuffle, dtype):
    rng = np.random.default_rng(3)
    if np.dtype(dtype).kind == "f":
        a = rng.random(777).astype(dtype)
    else:
        a = rng.integers(0, 200, 777).astype(dtype)
    raw = a.tobytes()
    frame = blosc_encode(raw, typesize=a.itemsize, cname=cname,
                         shuffle=shuffle)
    assert blosc_decode(frame) == raw


def test_multiblock_and_split():
    """Several blocks + per-byte-plane splits (lz4, typesize 2,
    blocksize forcing 4 blocks) survive; the header carries the real
    blocksize and the offset table resolves every block."""
    a = (np.arange(40000, dtype=np.uint16) % 1000).astype(np.uint16)
    raw = a.tobytes()
    frame = blosc_encode(raw, typesize=2, cname="lz4", shuffle=1,
                         blocksize=20480)
    version, _vlz, flags, typesize = frame[0], frame[1], frame[2], \
        frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    assert (nbytes, blocksize) == (80000, 20480)
    assert typesize == 2 and flags & 0x1          # shuffle flag
    assert (flags >> 5) == CODE_OF_CNAME["lz4"]
    assert cbytes == len(frame) < nbytes
    assert blosc_decode(frame) == raw


def test_incompressible_stores_raw_splits():
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    frame = blosc_encode(raw, typesize=1, cname="lz4", shuffle=0)
    assert blosc_decode(frame) == raw


def test_memcpy_frame():
    raw = b"tiny"
    frame = blosc_encode(raw, typesize=1)
    assert frame[2] & 0x2                          # memcpy flag
    assert blosc_decode(frame) == raw


def test_unsupported_paths_raise():
    with pytest.raises(ValueError, match="cname"):
        blosc_encode(b"x" * 100, cname="nope")
    # bitshuffle flag rejected with a clear message
    frame = bytearray(blosc_encode(b"y" * 4096, typesize=2,
                                   cname="lz4"))
    frame[2] |= 0x4
    with pytest.raises(ValueError, match="bitshuffle"):
        blosc_decode(bytes(frame))
    # blosclz codec code (0) rejected on decode
    frame2 = bytearray(blosc_encode(b"z" * 4096, typesize=1,
                                    cname="lz4", shuffle=0))
    frame2[2] = (frame2[2] & 0x1F) | (0 << 5)
    with pytest.raises(ValueError, match="blosclz"):
        blosc_decode(bytes(frame2))


def test_zarr_v2_blosc_store_roundtrip(spark, tmp_path):
    """save_ome_zarr with the numcodecs blosc config writes a store
    whose .zarray carries the blosc id and whose chunks decode back
    through the full BioImage path."""
    import os

    from bioio_spark import BioImage
    from bioio_spark.sources.zarr_image import ZarrImageReader
    from bioio_spark.writers import save_ome_zarr

    rng = np.random.default_rng(7)
    block = rng.integers(0, 65535, (1, 2, 2, 6, 8)).astype(np.uint16)
    out = str(tmp_path / "blosc_out")
    save_ome_zarr(BioImage(block, spark=spark), out,
                  chunks=(1, 1, 1, 4, 4),
                  compressor={"id": "blosc", "cname": "lz4",
                              "clevel": 5, "shuffle": 1})
    zarray = json.loads(open(os.path.join(
        out, "scene_0.zarr", "0", ".zarray")).read())
    assert zarray["compressor"]["id"] == "blosc"
    assert zarray["compressor"]["cname"] == "lz4"
    back = BioImage(out, reader=ZarrImageReader, spark=spark)
    np.testing.assert_array_equal(
        back.get_image_data("TCZYX").astype(np.uint16), block)


def test_wild_blosc_store_reads(spark, tmp_path):
    """A handcrafted store with zarr-python-2-style metadata
    (``{"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
    "blocksize": 0}``) and blosc-framed chunks reads through
    BioImage."""
    from bioio_spark import BioImage
    from bioio_spark.formats.zarr import build_zarray

    root = tmp_path / "wildb.zarr"
    arr = root / "0"
    arr.mkdir(parents=True)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / ".zattrs").write_text(json.dumps({"multiscales": [{
        "version": "0.4",
        "axes": [{"name": n, "type": "space"} for n in "zyx"],
        "datasets": [{"path": "0"}]}]}))
    zdoc = json.loads(build_zarray((4, 6, 8), (2, 3, 4), "uint16"))
    zdoc["compressor"] = {"id": "blosc", "cname": "lz4", "clevel": 5,
                          "shuffle": 1, "blocksize": 0}
    (arr / ".zarray").write_text(json.dumps(zdoc))
    rng = np.random.default_rng(9)
    full = rng.integers(0, 65535, (4, 6, 8)).astype(np.uint16)
    for gz in range(2):
        for gy in range(2):
            for gx in range(2):
                sl = (slice(gz * 2, gz * 2 + 2),
                      slice(gy * 3, gy * 3 + 3),
                      slice(gx * 4, gx * 4 + 4))
                (arr / f"{gz}.{gy}.{gx}").write_bytes(blosc_encode(
                    np.ascontiguousarray(full[sl]).tobytes(),
                    typesize=2, cname="lz4", shuffle=1))
    img = BioImage(str(root), spark=spark)
    np.testing.assert_array_equal(
        img.get_image_data("ZYX").astype(np.uint16), full)


@pytest.mark.parametrize("mutation", ["truncate_header", "truncate_body",
                                      "huge_cbytes"])
def test_malformed_frames_raise_cleanly(mutation):
    """Corrupt frames must raise ValueError, not index off the end."""
    frame = bytearray(blosc_encode(
        (np.arange(2000) % 251).astype(np.uint8).tobytes(),
        typesize=1, cname="zstd"))
    if mutation == "truncate_header":
        bad = bytes(frame[:10])
    elif mutation == "truncate_body":
        bad = bytes(frame[:len(frame) // 2])
    else:
        frame[12:16] = struct.pack("<i", 2 ** 30)
        bad = bytes(frame)
    with pytest.raises((ValueError, Exception)):
        blosc_decode(bad)
