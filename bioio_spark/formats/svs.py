"""Aperio SVS (.svs) codec — the whole-slide dialect of TIFF that the
reference routes to bioio-bioformats (the `.svs` row of the Bio-Formats
long tail; ref README.md:74). The container layout is public (OpenSlide
"Aperio format" documentation; Bio-Formats SVSReader):

- page 0: full-resolution TILED image (classically JPEG-compressed
  RGB), ImageDescription starting "Aperio Image Library" followed by
  pipe-delimited ``key = value`` metadata (``MPP`` microns-per-pixel,
  ``AppMag`` objective magnification)
- page 1: STRIPED thumbnail
- subsequent TILED pages: reduced-resolution pyramid levels in
  decreasing size
- trailing STRIPED pages: the slide ``label`` and gross ``macro``
  photos, identified by those words in their descriptions

Classification rule (the OpenSlide/Bio-Formats one): tiled pages in
file order are the pyramid; non-tiled pages are associated images —
"label"/"macro" by description, the first remaining one the thumbnail.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_APERIO_HEADER = "Aperio Image Library v12.0.15"


def parse_svs_description(desc: Optional[str]) -> dict:
    """Pipe-delimited Aperio metadata -> dict (numbers coerced)."""
    out: dict = {}
    if not desc:
        return out
    for part in desc.split("|")[1:]:
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        k, v = k.strip(), v.strip()
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def classify_svs_pages(pages: list[dict]) -> dict:
    """iter_tiff_chunks pages -> {"levels": [...], "thumbnail": pg|None,
    "label": pg|None, "macro": pg|None} per the classification rule."""
    levels = [pg for pg in pages if pg["tiled"]]
    if not levels:
        raise ValueError("SVS files carry at least one tiled page")
    out = {"levels": levels, "thumbnail": None, "label": None,
           "macro": None}
    for pg in pages:
        if pg["tiled"]:
            continue
        desc = (pg.get("page_desc") or "").lower()
        if "label" in desc and out["label"] is None:
            out["label"] = pg
        elif "macro" in desc and out["macro"] is None:
            out["macro"] = pg
        elif out["thumbnail"] is None:
            out["thumbnail"] = pg
    return out


def _halve(a: np.ndarray) -> np.ndarray:
    """2x2 block mean with ceil-division edges (matches the catalog's
    per-level dim rule)."""
    h, w = a.shape[:2]
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    pad = [(0, ph - h), (0, pw - w)] + \
        ([(0, 0)] if a.ndim == 3 else [])
    ap = np.pad(a, pad, mode="edge").astype(np.float64)
    out = (ap[0::2, 0::2] + ap[0::2, 1::2]
           + ap[1::2, 0::2] + ap[1::2, 1::2]) / 4.0
    return np.round(out).astype(a.dtype)


def encode_svs(image: np.ndarray,
               n_levels: int = 3,
               mpp: float = 0.5,
               app_mag: int = 20,
               tile: tuple = (64, 64),
               jpeg: bool = False,
               label: Optional[np.ndarray] = None,
               macro: Optional[np.ndarray] = None,
               thumbnail: bool = True) -> bytes:
    """YX (gray) or YXS (RGB uint8) image -> .svs bytes in the Aperio
    layout: tiled baseline + 2x-downsampled tiled levels (block mean,
    ceil edges), striped thumbnail/label/macro with identifying
    descriptions, pipe metadata on every page."""
    from bioio_spark.formats.tiff_pages import PageSpec, compose_tiff

    h, w = image.shape[:2]
    meta = f"|AppMag = {app_mag}|MPP = {mpp}"
    pages = [PageSpec(
        image,
        description=(f"{_APERIO_HEADER}\n{w}x{h} [0,0 {w}x{h}] "
                     f"({tile[1]}x{tile[0]}) "
                     f"{'JPEG' if jpeg else 'RAW'}/"
                     f"{'RGB' if image.ndim == 3 else 'Gray'}{meta}"),
        tile=tile, jpeg=jpeg)]
    if thumbnail:
        thumb = image
        while thumb.shape[0] > 64 or thumb.shape[1] > 64:
            thumb = _halve(thumb)
        pages.append(PageSpec(
            thumb,
            description=(f"{_APERIO_HEADER}\n{w}x{h} -> "
                         f"{thumb.shape[1]}x{thumb.shape[0]} "
                         f"- {meta}")))
    lvl = image
    for _ in range(1, n_levels):
        lvl = _halve(lvl)
        pages.append(PageSpec(
            lvl,
            description=(f"{_APERIO_HEADER}\n{w}x{h} -> "
                         f"{lvl.shape[1]}x{lvl.shape[0]} {meta}"),
            tile=tile, jpeg=jpeg))
    if label is not None:
        pages.append(PageSpec(
            label,
            description=(f"{_APERIO_HEADER}\nlabel "
                         f"{label.shape[1]}x{label.shape[0]}")))
    if macro is not None:
        pages.append(PageSpec(
            macro,
            description=(f"{_APERIO_HEADER}\nmacro "
                         f"{macro.shape[1]}x{macro.shape[0]}")))
    data, _ = compose_tiff(pages)
    return data


def read_svs_catalog(path: str) -> dict:
    """Driver-side catalog: IFD walk + page classification + pipe
    metadata. No pixel IO (D8 contract)."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(path)
    desc = pages[0].get("page_desc") or pages[0].get("description") or ""
    if not desc.startswith("Aperio"):
        raise ValueError(f"{path}: no Aperio ImageDescription — not SVS")
    cls = classify_svs_pages(pages)
    # pyramid levels must follow the catalog's ceil-halving rule so
    # resolution_level_dims answers from level-0 sizes alone
    base = cls["levels"][0]
    eh, ew = base["h"], base["w"]
    for lv, pg in enumerate(cls["levels"][1:], start=1):
        eh, ew = -(-eh // 2), -(-ew // 2)
        if (pg["h"], pg["w"]) != (eh, ew):
            raise ValueError(
                f"{path}: level {lv} is {pg['w']}x{pg['h']}, expected "
                f"ceil-half {ew}x{eh}; non-dyadic SVS pyramids are not "
                f"supported")
    cls["meta"] = parse_svs_description(desc)
    cls["pages"] = pages
    return cls
