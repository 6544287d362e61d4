"""Hamamatsu NDPI (.ndpi) codec — the NanoZoomer whole-slide dialect of
TIFF that the reference routes to bioio-bioformats (the `.ndpi` row of
the Bio-Formats long tail; ref README.md:74). The layout is public
(OpenSlide "Hamamatsu format" documentation; tifffile's NDPI notes):

- classic little-endian TIFF whose pages are STRIPED (not tiled)
  images of the slide at successive magnifications
- private tag 65420 (SourceLens, FLOAT): positive values are the
  objective magnification of a pyramid page; -1 flags the MACRO photo
  and -2 the MAP/mask page
- XResolution/YResolution (ResolutionUnit=3, centimeters) carry the
  level-0 pixel pitch

Classification: SourceLens>0 pages in file order are the pyramid
(dims must follow ceil-halving for the catalog's level-dim rule, as
with SVS); macro and map become associated scenes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

SOURCE_LENS_TAG = 65420
_X_RESOLUTION = 282
_Y_RESOLUTION = 283
_RESOLUTION_UNIT = 296


def encode_ndpi(image: np.ndarray,
                n_levels: int = 3,
                source_lens: float = 40.0,
                um_per_px: float = 0.23,
                macro: Optional[np.ndarray] = None,
                map_image: Optional[np.ndarray] = None) -> bytes:
    """YX (gray) or YXS (RGB) uint8 image -> .ndpi bytes: striped
    pyramid pages with halving SourceLens per level, cm-unit
    resolution tags on level 0, optional SourceLens=-1 macro and -2
    map pages."""
    from bioio_spark.formats.svs import _halve
    from bioio_spark.formats.tiff_pages import PageSpec, compose_tiff

    px_per_cm = int(round(10000.0 / um_per_px))
    pages = []
    lvl = image
    for r in range(n_levels):
        if r:
            lvl = _halve(lvl)
        extra = [(SOURCE_LENS_TAG, 11, [source_lens / (2 ** r)])]
        if r == 0:
            extra += [(_X_RESOLUTION, 5, [(px_per_cm, 1)]),
                      (_Y_RESOLUTION, 5, [(px_per_cm, 1)]),
                      (_RESOLUTION_UNIT, 3, [3])]
        pages.append(PageSpec(lvl, extra_tags=extra))
    if macro is not None:
        pages.append(PageSpec(macro,
                              extra_tags=[(SOURCE_LENS_TAG, 11,
                                           [-1.0])]))
    if map_image is not None:
        pages.append(PageSpec(map_image,
                              extra_tags=[(SOURCE_LENS_TAG, 11,
                                           [-2.0])]))
    data, _ = compose_tiff(pages)
    return data


def read_ndpi_catalog(path: str) -> dict:
    """Driver-side catalog: IFD walk + SourceLens classification.
    Returns {levels, macro, map, source_lens, um_per_px, pages}."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(
        path, keep_tags=(SOURCE_LENS_TAG, _X_RESOLUTION,
                         _RESOLUTION_UNIT))
    if not any(SOURCE_LENS_TAG in pg["vendor"] for pg in pages):
        raise ValueError(f"{path}: no SourceLens tag (65420) — not NDPI")
    levels, macro, map_pg = [], None, None
    for pg in pages:
        lens_vals = pg["vendor"].get(SOURCE_LENS_TAG)
        lens = float(lens_vals[0]) if lens_vals else 0.0
        if lens > 0:
            levels.append((lens, pg))
        elif lens == -1.0 and macro is None:
            macro = pg
        elif lens == -2.0 and map_pg is None:
            map_pg = pg
    if not levels:
        raise ValueError(f"{path}: no positive-SourceLens pages")
    levels.sort(key=lambda t: -t[0])
    base = levels[0][1]
    eh, ew = base["h"], base["w"]
    for i, (_lens, pg) in enumerate(levels[1:], start=1):
        eh, ew = -(-eh // 2), -(-ew // 2)
        if (pg["h"], pg["w"]) != (eh, ew):
            raise ValueError(
                f"{path}: level {i} is {pg['w']}x{pg['h']}, expected "
                f"ceil-half {ew}x{eh}; non-dyadic NDPI pyramids are "
                f"not supported")
    um = None
    xres = base["vendor"].get(_X_RESOLUTION)
    unit = base["vendor"].get(_RESOLUTION_UNIT, [2])
    if xres and xres[0]:
        scale = {2: 25400.0, 3: 10000.0}.get(unit[0])
        if scale:
            um = scale / float(xres[0])
    return {"levels": [pg for _l, pg in levels],
            "source_lens": levels[0][0],
            "macro": macro, "map": map_pg,
            "um_per_px": um, "pages": pages}
