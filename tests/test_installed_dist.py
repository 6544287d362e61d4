"""S1/S13 against the REAL installed distribution (round 13).

The fabricated-dist tests in test_plugins.py prove the discovery
mechanics; these prove them against genuine importlib.metadata state:
the repo is installed (``python setup.py develop``, offline-safe — the
container lacks ``wheel`` so the PEP 660 pip path is unavailable) with
entry points in pyproject.toml, plus a second REAL distribution
(plugins/demo_reader) that declares ``bioio-spark>=0.1,<1.0`` via
Requires-Dist — the reference's one-dist-per-plugin ecosystem shape
(ref bioio/plugins.py:230-300).

Env-gated: skipped when the dists aren't installed (e.g. a bare
checkout without the develop step).
"""

from __future__ import annotations

import pytest

md = pytest.importorskip("importlib.metadata")


def _installed(dist: str) -> bool:
    try:
        md.version(dist)
        return True
    except md.PackageNotFoundError:
        return False


core_installed = pytest.mark.skipif(
    not _installed("bioio-spark"),
    reason="bioio-spark not installed (run: python setup.py develop)")
demo_installed = pytest.mark.skipif(
    not _installed("bioio-spark-demo-reader"),
    reason="demo plugin dist not installed")


@core_installed
def test_installed_core_version_matches_package():
    import bioio_spark
    from bioio_spark.plugins import _core_version_tuple

    assert md.version("bioio-spark") == bioio_spark.__version__
    assert _core_version_tuple() == tuple(
        int(p) for p in bioio_spark.__version__.split("."))


@core_installed
def test_core_entry_points_advertised():
    names = {ep.name for ep in
             md.entry_points(group="bioio_spark.readers")}
    assert {"bioio-spark-tiff", "bioio-spark-png",
            "bioio-spark-zarr", "bioio-spark-czi"} <= names
    wnames = {ep.name for ep in
              md.entry_points(group="bioio_spark.writers")}
    assert {"OmeTiffWriterPlugin", "PngWriterPlugin"} <= wnames


@core_installed
def test_discover_plugins_against_installed_dist():
    """The real entry points register at `import bioio_spark` (the
    import-time discovery call), keyed on ENTRY-POINT name for the
    core dist (the several-readers-one-dist rule) — assert the
    post-import registry state and the idempotence of rediscovery."""
    import bioio_spark  # noqa: F401 - triggers import-time discovery
    import bioio_spark.plugins as P

    names = {e.name for e in P._REGISTRY}
    assert {"bioio-spark-tiff", "bioio-spark-png",
            "bioio-spark-zarr", "bioio-spark-czi"} <= names
    assert "bioio-spark" not in names
    tiff = next(e for e in P._REGISTRY
                if e.name == "bioio-spark-tiff")
    assert ".ome.tiff" in P.normalize_extensions(tiff.extensions)
    from bioio_spark.sources.tiff_image import TiffImageReader

    assert tiff.reader is TiffImageReader
    # idempotent rediscovery registers nothing new
    assert not [e for e in P.discover_plugins()
                if e.name.startswith("bioio-spark-")]


@demo_installed
def test_s13_range_parsed_from_real_requires_dist():
    from bioio_spark.plugins import (
        get_dependency_version_range_for_distribution,
        plugin_core_requirement)

    lo, hi, hi_incl = plugin_core_requirement("bioio-spark-demo-reader")
    assert (lo, hi, hi_incl) == ((0, 1, 0), (1, 0, 0), False)
    assert get_dependency_version_range_for_distribution(
        "bioio-spark-demo-reader") == ("0.1.0", "1.0.0")


@demo_installed
def test_s13_filter_accepts_and_rejects_on_real_metadata(monkeypatch):
    """The demo dist's REAL Requires-Dist range (>=0.1,<1.0) admits the
    running core 0.1.0 and must reject a hypothetical core 1.0.0 — the
    exclusive-upper-bound semantics, exercised end-to-end through
    discover_plugins on installed metadata."""
    import bioio_spark
    import bioio_spark.plugins as P

    # accepted at import time (real core 0.1.0 is inside [0.1, 1.0))
    demo = next(e for e in P._REGISTRY
                if e.name == "bioio-spark-demo-reader")
    assert demo.version == "1.0.0"
    assert P.normalize_extensions(demo.extensions) == [".demo.ome.tiff"]

    # reject path on the SAME real metadata: hypothetical core 1.0.0
    # hits the exclusive upper bound
    kept = [e for e in P._REGISTRY
            if e.name != "bioio-spark-demo-reader"]
    monkeypatch.setattr(P, "_REGISTRY", kept)
    monkeypatch.setattr(P, "_plugins_by_ext_cache", None)
    monkeypatch.setattr(bioio_spark, "__version__", "1.0.0")
    got = P.discover_plugins()
    assert "bioio-spark-demo-reader" not in {e.name for e in got}
    # un-register anything the call added to the patched list copy is
    # unnecessary: the original _REGISTRY is restored by monkeypatch


@core_installed
def test_discover_writers_against_installed_dist():
    """Writer entry points register at import time; the registry maps
    entry-point names onto the real writer classes, and rediscovery is
    idempotent."""
    import bioio_spark  # noqa: F401 - triggers import-time discovery
    import bioio_spark.writers as W

    assert W.WRITER_REGISTRY["OmeTiffWriterPlugin"] is W.OmeTiffWriter
    assert W.WRITER_REGISTRY["PngWriterPlugin"] is W.PngWriter
    # reference semantics: discovered writers become module attrs
    assert getattr(W, "OmeTiffWriterPlugin") is W.OmeTiffWriter
    assert W.discover_writers() == []
