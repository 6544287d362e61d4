"""Registry/routing semantics pinned to ref tests/test_plugins.py:66-177 and
ref tests/test_bio_image.py:45-259."""

import numpy as np
import pytest

from bioio_spark import plugins as P
from bioio_spark.bio_image import UnsupportedFileFormatError
from bioio_spark.sources.array_like import ArrayLikeReader


@pytest.fixture(autouse=True)
def clean_registry():
    P.clear_plugins()
    yield
    P.clear_plugins()


def test_normalize_extensions():
    assert P.normalize_extensions(["TIFF", ".tif", "tiff", ""]) == \
        [".tiff", ".tif"]


@pytest.mark.parametrize("exts,families", [
    ([".ome.tiff", ".tiff"], 1),          # suffix family
    ([".ome.tif", ".tif", ".czi"], 2),
    ([".a", ".b", ".c"], 3),
    ([".ome.tiff", ".tiff", ".ome.tif", ".tif"], 2),
])
def test_count_extension_families(exts, families):
    assert P.count_extension_families(exts) == families


def _entry(name, exts, probe_ok=True):
    return P.PluginEntry(
        name=name, reader=ArrayLikeReader, extensions=exts,
        is_supported_image=lambda image, ok=probe_ok: ok)


def test_key_ordering_longest_extension_first():
    P.register_plugin(_entry("a", [".tif"]))
    P.register_plugin(_entry("b", [".ome.tif"]))
    keys = list(P.get_plugins(use_cache=False))
    assert keys.index(".ome.tif") < keys.index(".tif")


def test_plugin_ordering_family_count_then_name():
    # more extension families ranks first; alphabetical tiebreak
    P.register_plugin(_entry("z_plugin", [".tif"]))
    P.register_plugin(_entry("a_plugin", [".tif"]))
    P.register_plugin(_entry("multi", [".tif", ".czi"]))
    order = [e.name for e in P.get_plugins(use_cache=False)[".tif"]]
    assert order == ["multi", "a_plugin", "z_plugin"]


def test_path_has_extension_query_string():
    assert P.path_has_extension("s3://b/x.TIFF?versionId=7", ".tiff")
    assert not P.path_has_extension("s3://b/x.czi", ".tiff")


def test_routing_first_probe_wins():
    P.register_plugin(_entry("broken", [".tif"], probe_ok=False))
    P.register_plugin(_entry("works", [".tif"]))
    # both advertise .tif; 'broken' sorts first alphabetically but its probe
    # rejects -> 'works' wins
    assert P.determine_reader("file.tif") is ArrayLikeReader


def test_routing_array_goes_to_arraylike():
    assert P.determine_reader(np.zeros((4, 5))) is ArrayLikeReader


def test_routing_no_match_raises():
    with pytest.raises(UnsupportedFileFormatError):
        P.determine_reader("file.unknown")


def test_feasibility_report():
    P.register_plugin(_entry("good", [".tif"]))
    P.register_plugin(P.PluginEntry(
        name="explodes", reader=ArrayLikeReader, extensions=[".tif"],
        is_supported_image=lambda image: 1 / 0))
    rep = P.plugin_feasibility_report("x.tif")
    assert rep["good"].supported is True
    assert rep["explodes"].supported is False
    assert rep["explodes"].error is not None
    assert rep["ArrayLike"].supported is False


def test_parse_version_range():
    assert P.parse_version_range(">=1.2,<2") == ((1, 2, 0), (2, 0, 0))
    assert P.parse_version_range("==1.0.3") == ((1, 0, 3), (1, 0, 3))


def test_s3_anon_retry(clean_registry):
    """S7 (ref bio_image.py:397-410, tests/test_bio_image.py:73-99): a
    failed selection for an s3:// path retries the whole selection with
    anon=True; non-s3 paths do not retry."""
    import pytest as _pt

    from bioio_spark.bio_image import UnsupportedFileFormatError
    from bioio_spark.plugins import (PluginEntry, anon_s3a_conf,
                                     determine_reader, register_plugin)

    seen = []

    def probe(image, **fs_kwargs):
        seen.append(dict(fs_kwargs))
        return fs_kwargs.get("anon", False)

    register_plugin(PluginEntry(
        name="anonreader", reader=object, extensions=[".czi"],
        is_supported_image=probe))

    rd = determine_reader("s3://bucket/img.czi")
    assert rd is object
    assert seen == [{}, {"anon": True}]

    seen.clear()
    with _pt.raises(UnsupportedFileFormatError):
        determine_reader("/local/img.czi")
    assert seen == [{}]

    assert "AnonymousAWSCredentialsProvider" in list(
        anon_s3a_conf().values())[0]
