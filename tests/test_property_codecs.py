"""Property-based roundtrips for the pure-Python codecs: any payload the
strategies can produce must survive encode -> decode bit-for-bit (JPEG is
excluded — lossy by design; its bounds live in test_jpeg.py)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_lzw_roundtrip_any_bytes(data):
    from bioio_spark.formats.tiff import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    dtype=st.sampled_from(["uint8", "uint16", "int16", "float32"]),
    comp=st.sampled_from([1, 5, 8]),
    seed=st.integers(0, 2 ** 16),
)
def test_tiff_plane_roundtrip(h, w, dtype, comp, seed):
    from bioio_spark.formats.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        plane = rng.random((h, w)).astype(dtype)
        predictor = 1
    else:
        info = np.iinfo(dtype)
        plane = rng.integers(info.min, info.max, (h, w), dtype=dtype)
        predictor = 2 if comp == 5 else 1
    out, _ = decode_tiff(encode_tiff([plane], compression=comp,
                                     predictor=predictor))
    np.testing.assert_array_equal(out[0], plane)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20), w=st.integers(1, 20),
    depth=st.sampled_from([np.uint8, np.uint16]),
    rgb=st.booleans(), seed=st.integers(0, 2 ** 16),
)
def test_png_roundtrip(h, w, depth, rgb, seed):
    from bioio_spark.formats.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    hi = 255 if depth == np.uint8 else 65535
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, hi, shape).astype(depth)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    channels=st.integers(1, 4),
    bits16=st.booleans(),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2 ** 16),
)
def test_wav_roundtrip(n, channels, bits16, rate, seed):
    from bioio_spark.formats.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    if bits16:
        s = rng.integers(-32768, 32767, (channels, n), dtype=np.int16)
    else:
        s = rng.integers(0, 255, (channels, n), dtype=np.uint8)
    back, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    np.testing.assert_array_equal(back, s)


@settings(max_examples=25, deadline=None)
@given(
    rank=st.integers(1, 4),
    comp=st.sampled_from(["zlib", None]),
    seed=st.integers(0, 2 ** 16),
)
def test_zarr_chunk_roundtrip(rank, comp, seed):
    from bioio_spark.formats.zarr import decode_chunk, encode_chunk

    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(1, 6)) for _ in range(rank))
    block = rng.integers(0, 65535, shape).astype(np.uint16)
    back = decode_chunk(encode_chunk(block, compressor=comp),
                        block.dtype, shape, compressor=comp)
    np.testing.assert_array_equal(back, block)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096),
       rb=st.integers(1, 64))
def test_packbits_roundtrip_any_bytes(data, rb):
    from bioio_spark.formats.tiff import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data, row_bytes=rb)) == data


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096),
       mcs=st.integers(2, 8))
def test_gif_lzw_roundtrip_any_bytes(data, mcs):
    from bioio_spark.formats.gif import lzw_decode_gif, lzw_encode_gif

    data = bytes(b % (1 << mcs) for b in data)   # codes must fit
    assert lzw_decode_gif(lzw_encode_gif(data, mcs), mcs) == data


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 20), w=st.integers(1, 20),
       n=st.integers(1, 4), rgb=st.booleans(),
       interlace=st.booleans(), seed=st.integers(0, 2 ** 16))
def test_gif_roundtrip(h, w, n, rgb, interlace, seed):
    from bioio_spark.formats.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    if rgb:
        # bounded palette: channel values from a 4-element set
        frames = rng.choice([0, 85, 170, 255],
                            (n, h, w, 3)).astype(np.uint8)
        # gray coincidences collapse the output; force one color px
        frames[0, 0, 0] = (85, 0, 255)
    else:
        frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    out, delays = decode_gif(encode_gif(frames, interlace=interlace))
    np.testing.assert_array_equal(out, frames)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 20), w=st.integers(1, 20),
       rgb=st.booleans(), seed=st.integers(0, 2 ** 16))
def test_bmp_roundtrip(h, w, rgb, seed):
    from bioio_spark.formats.bmp import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16),
       rgb=st.booleans(), wide=st.booleans(),
       ascii_form=st.booleans(), seed=st.integers(0, 2 ** 16))
def test_pnm_roundtrip(h, w, rgb, wide, ascii_form, seed):
    from bioio_spark.formats.pnm import decode_pnm, encode_pnm

    rng = np.random.default_rng(seed)
    dtype = np.uint16 if wide else np.uint8
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, np.iinfo(dtype).max + 1, shape).astype(dtype)
    np.testing.assert_array_equal(
        decode_pnm(encode_pnm(img, ascii_form=ascii_form)), img)


@settings(max_examples=20, deadline=None)
@given(t=st.integers(1, 3), w_n=st.integers(1, 4), z=st.integers(1, 3),
       h=st.integers(1, 10), w=st.integers(1, 10),
       seq=st.sampled_from([0, 1, 2]),
       dtype=st.sampled_from(["uint8", "uint16", "int16", "float32"]),
       seed=st.integers(0, 2 ** 16))
def test_dv_roundtrip(t, w_n, z, h, w, seq, dtype, seed):
    from bioio_spark.formats.dv import decode_dv, encode_dv

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        block = rng.random((t, w_n, z, h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        block = rng.integers(info.min, info.max,
                             (t, w_n, z, h, w)).astype(dtype)
    out, _ = decode_dv(encode_dv(block, img_sequence=seq))
    np.testing.assert_array_equal(out, block)


@settings(max_examples=20, deadline=None)
@given(shape=st.tuples(st.integers(1, 6), st.integers(1, 8),
                       st.integers(1, 8)),
       inner=st.tuples(st.integers(1, 3), st.integers(1, 4),
                       st.integers(1, 4)),
       seed=st.integers(0, 2 ** 16))
def test_zarr_shard_roundtrip(shape, inner, seed):
    from bioio_spark.formats.zarr import encode_shard, iter_decoded_blocks

    # shard shape = smallest multiple of inner covering `shape`
    shard = tuple(-(-s // i) * i for s, i in zip(shape, inner))
    rng = np.random.default_rng(seed)
    block = np.zeros(shard, np.uint16)
    block[tuple(slice(0, s) for s in shape)] = rng.integers(
        1, 999, shape)
    data = encode_shard(block, inner, compressor="zlib")
    info = {"shape": shape, "chunks": shard, "dtype": "<u2",
            "compressor": "zlib", "gzip_member": True,
            "shard": {"inner_chunks": inner, "crc": True,
                      "index_location": "end"}}
    out = np.zeros(shape, np.uint16)
    for origin, b in iter_decoded_blocks(data, info, (0, 0, 0)):
        sl = tuple(slice(o, o + n) for o, n in zip(origin, b.shape))
        out[sl] = b
    np.testing.assert_array_equal(
        out, block[tuple(slice(0, s) for s in shape)])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    dtype=st.sampled_from(["uint8", "uint16", "float32", "int32",
                           "float64"]),
    comp=st.sampled_from([0, 5, 6]),
    seed=st.integers(0, 2 ** 16),
)
def test_czi_subblock_roundtrip_any(h, w, dtype, comp, seed):
    """Any plane x any supported compression (raw/zstd0/zstd1) survives
    the ZISRAW encode -> directory walk -> subblock decode bit-exact."""
    import os
    import tempfile

    from bioio_spark.formats.czi import (encode_czi, read_czi_directory,
                                         read_czi_subblock)

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        plane = rng.random((h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        plane = rng.integers(info.min, info.max, (h, w)).astype(dtype)
    data = encode_czi([{"data": plane}], compression=comp)
    fd, p = tempfile.mkstemp(suffix=".czi")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        e = read_czi_directory(p)[0]
        assert e["compression"] == comp
        np.testing.assert_array_equal(read_czi_subblock(p, e), plane)
    finally:
        os.unlink(p)


@settings(max_examples=50, deadline=None)
@given(
    loops=st.lists(
        st.tuples(st.sampled_from([1, 4, 2, 8]), st.integers(1, 4)),
        min_size=1, max_size=3),
    seed=st.integers(0, 2 ** 16),
)
def test_nd2_seq_coords_bijective(loops, seed):
    """Mixed-radix frame decomposition is a bijection: every sequence
    index maps to a unique (p, t, z) and the per-kind sizes multiply
    back to the frame count."""
    import math

    from bioio_spark.formats.nd2 import (nd2_seq_coords,
                                         resolve_nd2_loops)

    n = math.prod(c for _, c in loops)
    kinds = resolve_nd2_loops(loops, n)
    assert kinds is not None
    sizes = {"t": 1, "z": 1, "p": 1}
    for kind, count in kinds:
        sizes[kind] *= count
    seen = set()
    for seq in range(n):
        co = nd2_seq_coords(kinds, seq)
        assert 0 <= co["t"] < sizes["t"]
        assert 0 <= co["z"] < sizes["z"]
        assert 0 <= co["p"] < sizes["p"]
        seen.add((co["p"], co["t"], co["z"]))
    assert len(seen) == n


@settings(max_examples=20, deadline=None)
@given(t=st.integers(1, 3), c=st.integers(1, 3), z=st.integers(1, 3),
       h=st.integers(1, 12), w=st.integers(1, 12),
       dtype=st.sampled_from(["uint8", "uint16", "int32", "float32",
                              "float64"]),
       seed=st.integers(0, 2 ** 16))
def test_zvi_gray_roundtrip_property(t, c, z, h, w, dtype, seed):
    import os
    import tempfile

    from bioio_spark.formats.zvi import decode_zvi, encode_zvi

    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        block = rng.random((t, c, z, h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        block = rng.integers(info.min, info.max, (t, c, z, h, w),
                             dtype=dtype)
    np.testing.assert_array_equal(decode_zvi(encode_zvi(block)), block)
    del os, tempfile


@settings(max_examples=15, deadline=None)
@given(pf=st.sampled_from([1, 2, 7]), t=st.integers(1, 3),
       z=st.integers(1, 2), h=st.integers(1, 10), w=st.integers(1, 10),
       seed=st.integers(0, 2 ** 16))
def test_zvi_bgr_roundtrip_property(pf, t, z, h, w, seed):
    from bioio_spark.formats.zvi import (PIXEL_FORMATS, decode_zvi,
                                         encode_zvi)

    dt, samples, _ = PIXEL_FORMATS[pf]
    rng = np.random.default_rng(seed)
    hi = np.iinfo(dt).max
    block = rng.integers(0, hi, (t, samples, z, h, w), dtype=dt)
    np.testing.assert_array_equal(
        decode_zvi(encode_zvi(block, pixel_format=pf)), block)


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 5), h=st.integers(1, 12), w=st.integers(1, 12),
       wide=st.booleans(), axis_t=st.booleans(),
       seed=st.integers(0, 2 ** 16))
def test_pic_roundtrip_property(n, h, w, wide, axis_t, seed):
    from bioio_spark.formats.pic import decode_pic, encode_pic

    rng = np.random.default_rng(seed)
    dt = np.uint16 if wide else np.uint8
    stack = rng.integers(0, np.iinfo(dt).max, (n, h, w), dtype=dt)
    data = encode_pic(stack, axis4="t" if axis_t else "z")
    np.testing.assert_array_equal(decode_pic(data), stack)


@settings(max_examples=20, deadline=None)
@given(t=st.integers(1, 4), h=st.integers(1, 12), w=st.integers(1, 13),
       fps=st.integers(1, 60), seed=st.integers(0, 2 ** 16))
def test_avi_rgb_roundtrip_property(t, h, w, fps, seed):
    """Any frame shape (incl. odd widths exercising row padding and
    odd chunk sizes exercising word alignment) roundtrips bit-exact
    through the DIB path."""
    import os
    import tempfile

    from bioio_spark.formats.avi import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)
    p = tempfile.mktemp(suffix=".avi")
    try:
        with open(p, "wb") as f:
            f.write(encode_avi(frames, codec="rgb", fps=fps))
        np.testing.assert_array_equal(decode_avi(p), frames)
    finally:
        os.remove(p)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    precision=st.integers(2, 16),
    predictor=st.integers(1, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_ljpeg_roundtrip(h, w, precision, predictor, seed):
    from bioio_spark.formats.ljpeg import decode_ljpeg, encode_ljpeg

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << precision, (h, w)).astype(np.uint16)
    got = decode_ljpeg(encode_ljpeg(a, precision=precision,
                                    predictor=predictor))
    assert got.shape == a.shape
    assert (got.astype(np.int64) == a.astype(np.int64)).all()


def test_ljpeg_rejects_restart_interval():
    """A DRI segment with a nonzero interval means RSTn markers sit in
    the entropy stream; the explicit subset must refuse rather than
    decode corrupt pixels silently. DRI=0 (disabled) stays accepted."""
    import pytest

    from bioio_spark.formats.ljpeg import decode_ljpeg, encode_ljpeg

    a = np.arange(12, dtype=np.uint16).reshape(3, 4)
    enc = encode_ljpeg(a, precision=8)
    dri = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x10])
    with pytest.raises(ValueError, match="restart interval"):
        decode_ljpeg(enc[:2] + dri + enc[2:])
    dri0 = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x00])
    got = decode_ljpeg(enc[:2] + dri0 + enc[2:])
    assert (got.astype(np.int64) == a.astype(np.int64)).all()


def test_ljpeg_missing_sof3_is_valueerror():
    """A stream whose SOF3 is absent (SOS still present) must hit the
    explicit missing-SOF3/SOS ValueError, not an unbound-local error."""
    import pytest
    import struct as _struct

    from bioio_spark.formats.ljpeg import decode_ljpeg, encode_ljpeg

    enc = encode_ljpeg(np.arange(12, dtype=np.uint16).reshape(3, 4),
                       precision=8)
    # splice the SOF3 segment out
    i = enc.index(b"\xFF\xC3")
    (ln,) = _struct.unpack(">H", enc[i + 2:i + 4])
    hollow = enc[:i] + enc[i + 2 + ln:]
    with pytest.raises(ValueError, match="missing SOF3/SOS"):
        decode_ljpeg(hollow)
