"""Scheme-dispatched ranged IO (bioio_spark.fsio) — the one place
planned sources touch bytes, so object-store URIs work by swapping the
opener, not rewriting readers."""

import io
import sys
import types

import pytest

from bioio_spark.fsio import (open_binary, ranged_read, read_bytes,
                              read_range)


def test_local_read_range(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(bytes(range(100)))
    assert read_range(str(p), 10, 5) == bytes(range(10, 15))
    assert read_bytes(str(p)) == bytes(range(100))
    assert ranged_read(str(p), [0, 90], [3, 4]) == \
        bytes([0, 1, 2, 90, 91, 92, 93])


def test_file_uri_is_local(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    assert read_range("file://" + str(p), 6, 5) == b"world"


def test_windows_drive_path_is_local():
    # "C://..." must not be mistaken for a scheme; single-letter
    # schemes are not valid URLs in practice, but our regex would
    # match "C://" — pin that plain relative/absolute paths with no
    # scheme stay local
    from bioio_spark.fsio import _is_remote

    assert not _is_remote("/data/a.tiff")
    assert not _is_remote("relative/path.czi")
    assert not _is_remote("file:///data/a.tiff")
    assert _is_remote("s3://bucket/key.zarr")
    assert _is_remote("https://host/object.lif")


def test_remote_uri_routes_through_fsspec(monkeypatch, tmp_path):
    """A fake fsspec module proves the dispatch without network."""
    store = {"s3://bucket/plane.bin": bytes(range(64))}

    class _Opened:
        def __init__(self, path):
            self._path = path

        def open(self):
            return io.BytesIO(store[self._path])

    fake = types.ModuleType("fsspec")
    fake.open = lambda path, mode: _Opened(path)
    monkeypatch.setitem(sys.modules, "fsspec", fake)
    assert read_range("s3://bucket/plane.bin", 8, 4) == \
        bytes(range(8, 12))
    assert ranged_read("s3://bucket/plane.bin", [0, 60], [2, 4]) == \
        bytes([0, 1, 60, 61, 62, 63])


def test_remote_uri_without_fsspec_raises(monkeypatch):
    monkeypatch.setitem(sys.modules, "fsspec", None)
    with pytest.raises(ImportError, match="fsspec"):
        open_binary("s3://bucket/missing.bin")
