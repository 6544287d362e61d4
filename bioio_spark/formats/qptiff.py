"""PerkinElmer/Akoya QPTIFF (.qptiff) codec — the Vectra multiplexed-
fluorescence whole-slide dialect of TIFF that the reference routes to
bioio-bioformats (the `.qptiff` row of the Bio-Formats long tail; ref
README.md:74). The layout is publicly described (Akoya "QPTIFF" format
notes; QuPath/Bio-Formats readers):

- standard tiled TIFF; at each resolution level the file carries ONE
  PAGE PER CHANNEL (the multiplexed-fluorescence axis), every page's
  ImageDescription an XML ``<PerkinElmer-QPI-ImageDescription>``
  document with ``<Name>`` (the channel / biomarker) and
  ``<ImageType>`` (FullResolution / ReducedResolution / Thumbnail)
- full-resolution pages come first, then the striped RGB thumbnail,
  then the reduced levels (each again one page per channel)

So unlike SVS/NDPI the page grouping carries a C axis: channel count =
number of FullResolution pages, and each reduced level must repeat the
same channel order.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional, Sequence

import numpy as np


def build_qpi_xml(name: str, image_type: str) -> str:
    root = ET.Element("PerkinElmer-QPI-ImageDescription")
    ET.SubElement(root, "DescriptionVersion").text = "2"
    ET.SubElement(root, "ImageType").text = image_type
    ET.SubElement(root, "Name").text = name
    return ET.tostring(root, encoding="unicode")


def parse_qpi_xml(desc: Optional[str]) -> Optional[dict]:
    if not desc or "PerkinElmer-QPI" not in desc:
        return None
    root = ET.fromstring(desc)
    out = {}
    for child in root:
        tag = child.tag.rsplit("}", 1)[-1]
        out[tag] = child.text
    return out


def encode_qptiff(stack: np.ndarray,
                  channel_names: Optional[Sequence[str]] = None,
                  n_levels: int = 2,
                  tile: tuple = (64, 64),
                  thumbnail: bool = True) -> bytes:
    """CYX stack (uint8/uint16 fluorescence planes) -> .qptiff bytes:
    per level one tiled page per channel with QPI XML descriptions,
    ceil-half block-mean levels, optional striped RGB thumbnail after
    the full-resolution pages."""
    from bioio_spark.formats.svs import _halve
    from bioio_spark.formats.tiff_pages import PageSpec, compose_tiff

    if stack.ndim != 3:
        raise ValueError("encode_qptiff takes a CYX channel stack")
    c_n = stack.shape[0]
    names = list(channel_names) if channel_names else \
        [f"Channel {i + 1}" for i in range(c_n)]
    if len(names) != c_n:
        raise ValueError("channel_names length != C")
    pages = []
    for c in range(c_n):
        pages.append(PageSpec(
            stack[c], tile=tile,
            description=build_qpi_xml(names[c], "FullResolution")))
    if thumbnail:
        thumb = stack.mean(axis=0).astype(stack.dtype)
        while thumb.shape[0] > 64 or thumb.shape[1] > 64:
            thumb = _halve(thumb)
        rgb = np.repeat(thumb[:, :, None], 3, axis=2).astype(np.uint8)
        pages.append(PageSpec(
            rgb, description=build_qpi_xml("Thumbnail", "Thumbnail")))
    lvls = [stack[c] for c in range(c_n)]
    for _r in range(1, n_levels):
        lvls = [_halve(a) for a in lvls]
        for c in range(c_n):
            pages.append(PageSpec(
                lvls[c], tile=tile,
                description=build_qpi_xml(names[c],
                                          "ReducedResolution")))
    data, _ = compose_tiff(pages)
    return data


def read_qptiff_catalog(path: str) -> dict:
    """Driver-side catalog: IFD walk + QPI XML classification.
    Returns {channels, levels: [[page per channel] per level],
    thumbnail, pages}; reduced levels must repeat the channel count
    and follow ceil-halving."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(path)
    metas = []
    for pg in pages:
        desc = pg.get("page_desc") or (
            pg.get("description") if pg["page"] == 0 else None)
        metas.append(parse_qpi_xml(desc))
    if not metas[0]:
        raise ValueError(f"{path}: no QPI ImageDescription — not QPTIFF")
    full = [(pg, m) for pg, m in zip(pages, metas)
            if m and m.get("ImageType") == "FullResolution"]
    reduced = [(pg, m) for pg, m in zip(pages, metas)
               if m and m.get("ImageType") == "ReducedResolution"]
    thumb = next((pg for pg, m in zip(pages, metas)
                  if m and m.get("ImageType") == "Thumbnail"), None)
    if not full:
        raise ValueError(f"{path}: no FullResolution pages")
    c_n = len(full)
    names = [m.get("Name") or f"Channel {i + 1}"
             for i, (_pg, m) in enumerate(full)]
    if len(reduced) % c_n:
        raise ValueError(
            f"{path}: {len(reduced)} reduced pages not a multiple of "
            f"{c_n} channels")
    levels = [[pg for pg, _m in full]]
    for r in range(len(reduced) // c_n):
        grp = reduced[r * c_n:(r + 1) * c_n]
        gnames = [m.get("Name") for _pg, m in grp]
        if gnames != names:
            raise ValueError(
                f"{path}: level {r + 1} channel order {gnames} != "
                f"{names}")
        levels.append([pg for pg, _m in grp])
    base = levels[0][0]
    eh, ew = base["h"], base["w"]
    for r, grp in enumerate(levels[1:], start=1):
        eh, ew = -(-eh // 2), -(-ew // 2)
        for pg in grp:
            if (pg["h"], pg["w"]) != (eh, ew):
                raise ValueError(
                    f"{path}: level {r} is {pg['w']}x{pg['h']}, "
                    f"expected ceil-half {ew}x{eh}")
    return {"channels": names, "levels": levels, "thumbnail": thumb,
            "pages": pages}
