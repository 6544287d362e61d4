"""Typed OME metadata model (D2 tier 2 — the reference's `ome_types.OME`
analog, ref bio_image.py:1021-1036: raw format metadata -> a typed object
model a user can walk as `ome.images[0].pixels.channels[1].name`).

ome_types is not installed in this container; this is a self-contained
dataclass model covering the OME elements the engine produces and consumes
(Image/Pixels/Channel/TiffData with the 2016-06 attribute set), parsed
with the standard-library ElementTree, namespace-agnostic. The relational
D2 query (queries/meta.py) cross-checks the same fields against a DuckDB
regex oracle; this module is the driver-side object surface over them.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Optional


def _tag(el: ET.Element) -> str:
    """Local tag name with any xmlns stripped."""
    return el.tag.rsplit("}", 1)[-1]


def _get(el: ET.Element, name: str, cast=str):
    v = el.get(name)
    return cast(v) if v is not None else None


@dataclass
class OMEChannel:
    id: Optional[str] = None
    name: Optional[str] = None
    samples_per_pixel: Optional[int] = None


@dataclass
class OMEPlane:
    """Per-plane acquisition record (ref bio_image.py:1021-1036 exposes
    the full ome_types tree incl. Plane TheT/TheC/TheZ + stage
    positions; this is the same surface)."""

    the_t: Optional[int] = None
    the_c: Optional[int] = None
    the_z: Optional[int] = None
    position_x: Optional[float] = None
    position_y: Optional[float] = None
    position_z: Optional[float] = None
    position_x_unit: Optional[str] = None
    position_y_unit: Optional[str] = None
    position_z_unit: Optional[str] = None
    delta_t: Optional[float] = None
    exposure_time: Optional[float] = None


@dataclass
class OMEObjective:
    id: Optional[str] = None
    model: Optional[str] = None
    nominal_magnification: Optional[float] = None
    lens_na: Optional[float] = None


@dataclass
class OMEInstrument:
    id: Optional[str] = None
    microscope_model: Optional[str] = None
    objectives: list[OMEObjective] = field(default_factory=list)


@dataclass
class OMETiffData:
    ifd: Optional[int] = None
    first_t: Optional[int] = None
    first_c: Optional[int] = None
    first_z: Optional[int] = None
    plane_count: Optional[int] = None


@dataclass
class OMEPixels:
    id: Optional[str] = None
    dimension_order: Optional[str] = None
    type: Optional[str] = None
    big_endian: Optional[bool] = None
    size_t: Optional[int] = None
    size_c: Optional[int] = None
    size_z: Optional[int] = None
    size_y: Optional[int] = None
    size_x: Optional[int] = None
    physical_size_x: Optional[float] = None
    physical_size_y: Optional[float] = None
    physical_size_z: Optional[float] = None
    physical_size_x_unit: Optional[str] = None
    physical_size_y_unit: Optional[str] = None
    physical_size_z_unit: Optional[str] = None
    interleaved: Optional[bool] = None
    channels: list[OMEChannel] = field(default_factory=list)
    tiff_data: list[OMETiffData] = field(default_factory=list)
    planes: list[OMEPlane] = field(default_factory=list)


@dataclass
class OMEImage:
    id: Optional[str] = None
    name: Optional[str] = None
    acquisition_date: Optional[str] = None
    instrument_ref: Optional[str] = None
    pixels: Optional[OMEPixels] = None


@dataclass
class OME:
    """Root of the typed model; `from_xml` accepts a full <OME> document
    or a bare <Image> fragment (both appear as raw metadata in the wild)."""

    images: list[OMEImage] = field(default_factory=list)
    instruments: list[OMEInstrument] = field(default_factory=list)

    @classmethod
    def from_xml(cls, xml: str) -> "OME":
        root = ET.fromstring(xml)
        if _tag(root) == "Image":
            return cls(images=[cls._parse_image(root)])
        if _tag(root) != "OME":
            raise ValueError(
                f"not an OME document (root element <{_tag(root)}>)")
        return cls(
            images=[cls._parse_image(el) for el in root
                    if _tag(el) == "Image"],
            instruments=[cls._parse_instrument(el) for el in root
                         if _tag(el) == "Instrument"])

    @staticmethod
    def _parse_instrument(el: ET.Element) -> OMEInstrument:
        inst = OMEInstrument(id=_get(el, "ID"))
        for child in el:
            if _tag(child) == "Microscope":
                inst.microscope_model = _get(child, "Model")
            elif _tag(child) == "Objective":
                inst.objectives.append(OMEObjective(
                    id=_get(child, "ID"),
                    model=_get(child, "Model"),
                    nominal_magnification=_get(
                        child, "NominalMagnification", float),
                    lens_na=_get(child, "LensNA", float)))
        return inst

    @staticmethod
    def _parse_image(el: ET.Element) -> OMEImage:
        img = OMEImage(id=_get(el, "ID"), name=_get(el, "Name"))
        for child in el:
            if _tag(child) == "AcquisitionDate":
                img.acquisition_date = (child.text or "").strip() or None
                continue
            if _tag(child) == "InstrumentRef":
                img.instrument_ref = _get(child, "ID")
                continue
            if _tag(child) != "Pixels":
                continue
            be = child.get("BigEndian")
            px = OMEPixels(
                id=_get(child, "ID"),
                dimension_order=_get(child, "DimensionOrder"),
                type=_get(child, "Type"),
                big_endian=(be.lower() == "true") if be else None,
                size_t=_get(child, "SizeT", int),
                size_c=_get(child, "SizeC", int),
                size_z=_get(child, "SizeZ", int),
                size_y=_get(child, "SizeY", int),
                size_x=_get(child, "SizeX", int),
                physical_size_x=_get(child, "PhysicalSizeX", float),
                physical_size_y=_get(child, "PhysicalSizeY", float),
                physical_size_z=_get(child, "PhysicalSizeZ", float),
                physical_size_x_unit=_get(child, "PhysicalSizeXUnit"),
                physical_size_y_unit=_get(child, "PhysicalSizeYUnit"),
                physical_size_z_unit=_get(child, "PhysicalSizeZUnit"),
                interleaved=(
                    child.get("Interleaved").lower() == "true"
                    if child.get("Interleaved") else None),
            )
            for g in child:
                if _tag(g) == "Channel":
                    px.channels.append(OMEChannel(
                        id=_get(g, "ID"), name=_get(g, "Name"),
                        samples_per_pixel=_get(g, "SamplesPerPixel", int)))
                elif _tag(g) == "TiffData":
                    px.tiff_data.append(OMETiffData(
                        ifd=_get(g, "IFD", int),
                        first_t=_get(g, "FirstT", int),
                        first_c=_get(g, "FirstC", int),
                        first_z=_get(g, "FirstZ", int),
                        plane_count=_get(g, "PlaneCount", int)))
                elif _tag(g) == "Plane":
                    px.planes.append(OMEPlane(
                        the_t=_get(g, "TheT", int),
                        the_c=_get(g, "TheC", int),
                        the_z=_get(g, "TheZ", int),
                        position_x=_get(g, "PositionX", float),
                        position_y=_get(g, "PositionY", float),
                        position_z=_get(g, "PositionZ", float),
                        position_x_unit=_get(g, "PositionXUnit"),
                        position_y_unit=_get(g, "PositionYUnit"),
                        position_z_unit=_get(g, "PositionZUnit"),
                        delta_t=_get(g, "DeltaT", float),
                        exposure_time=_get(g, "ExposureTime", float)))
            img.pixels = px
        return img

    def to_numpy_dtype(self, image_index: int = 0):
        """numpy dtype of an image's pixel type (ValueError on unknown,
        same contract as ome_utils, ref ome_utils.py:121-137)."""
        from bioio_spark.types import ome_to_numpy_dtype

        px = self.images[image_index].pixels
        if px is None or px.type is None:
            raise ValueError("image has no Pixels Type")
        return ome_to_numpy_dtype(px.type)
