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
