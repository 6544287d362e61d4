"""A REAL plugin distribution (installed editable next to the core) so
S1 discovery and the S13 version-compat filter are exercised against
genuine importlib.metadata state, not fabricated dist-infos — the
reference's plugin ecosystem shape (ref bioio/plugins.py:230-300: one
distribution per reader, core range declared via Requires-Dist)."""


class ReaderMetadata:
    @staticmethod
    def get_supported_extensions():
        return [".demo.ome.tiff"]

    @staticmethod
    def get_reader():
        from bioio_spark.sources.tiff_image import TiffImageReader

        return TiffImageReader
