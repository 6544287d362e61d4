"""Leica LOF (.lof) reader — native coverage for the single-object
LAS X export the reference routes to bioio-bioformats (ref
README.md:74 routes .lof). The container shares LIF's block framing
and XML vocabulary (bioio_spark.formats.lof), and parse_lif_header
transparently delegates to the LOF parser — so this reader IS the LIF
reader with LOF routing: same planned per-plane stride reads, same
windowed path (read_lif_window works on .lof paths directly).
"""

from __future__ import annotations

from bioio_spark.sources.lif_image import LifImageReader


class LofImageReader(LifImageReader):
    """BioImage reader over Leica LOF single-object files."""

    @staticmethod
    def is_supported_image(image) -> bool:
        if not isinstance(image, str) or not \
                image.lower().endswith(".lof"):
            return False
        try:
            from bioio_spark.formats.lof import parse_lof_header
            parse_lof_header(image)
            return True
        except Exception:
            return False
