"""Property tests for the round-7 container codecs: MS-CFB (OIB) and
the native HDF5 subset (IMS) — random stream sizes / dataset shapes /
chunk grids must roundtrip bit-exactly, mini/FAT and contiguous/
chunked boundaries included."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bioio_spark.formats.cfb import CfbFile, build_cfb
from bioio_spark.formats.hdf5 import H5Node, H5Reader, build_hdf5


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9000),
                min_size=1, max_size=8),
       st.integers(0, 2 ** 32 - 1))
def test_cfb_random_stream_sizes(tmp_path_factory, sizes, seed):
    """Sizes straddle the 4096-byte mini/FAT cutoff and 64/512-byte
    sector boundaries; every stream must read back bit-exact."""
    rng = np.random.default_rng(seed)
    streams = [(f"s{i:02d}", rng.bytes(n))
               for i, n in enumerate(sizes)]
    p = tmp_path_factory.mktemp("cfb") / "t.cfb"
    p.write_bytes(build_cfb(streams))
    c = CfbFile(str(p))
    assert sorted(c.stream_names()) == sorted(n for n, _ in streams)
    for name, data in streams:
        assert c.read_stream(name) == data
        # extents cover exactly the stream's bytes
        assert sum(n for _o, n in c.stream_extents(name)) == len(data)


@settings(max_examples=20, deadline=None)
@given(
    st.tuples(st.integers(1, 7), st.integers(1, 23),
              st.integers(1, 19)),
    st.sampled_from(["uint8", "uint16", "int16", "float32"]),
    st.one_of(st.none(),
              st.tuples(st.integers(1, 4), st.integers(1, 9),
                        st.integers(1, 9))),
    st.booleans(),
    st.integers(0, 2 ** 32 - 1),
)
def test_hdf5_random_datasets(tmp_path_factory, shape, dtype, chunks,
                              gzip, seed):
    """Any shape x dtype x (contiguous | chunked[xgzip]) roundtrips;
    edge chunks trim, never leak."""
    if chunks is None:
        gzip = False
    rng = np.random.default_rng(seed)
    if dtype.startswith("float"):
        arr = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, shape).astype(dtype)
    root = H5Node()
    root.group("g").dataset("d", arr, chunks=chunks, gzip=gzip)
    p = tmp_path_factory.mktemp("h5") / "t.h5"
    p.write_bytes(build_hdf5(root))
    with H5Reader(str(p)) as r:
        back = r.read_dataset("g/d")
        assert back.shape == shape
        np.testing.assert_array_equal(back, arr)
