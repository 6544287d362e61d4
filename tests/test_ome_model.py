"""Typed OME metadata model (D2 tier 2, ref bio_image.py:1021-1036)."""

import numpy as np
import pytest

from bioio_spark.formats.tiff import build_ome_xml
from bioio_spark.ome_model import OME
from bioio_spark.types import PhysicalPixelSizes


def test_from_generated_xml():
    xml = build_ome_xml(2, 3, 4, 5, 6, "uint16", image_id="Image:0",
                        image_name="demo",
                        channel_names=["DAPI", "GFP", "RFP"],
                        physical_pixel_sizes=PhysicalPixelSizes(
                            Z=2.0, Y=0.5, X=0.5))
    ome = OME.from_xml(xml)
    assert len(ome.images) == 1
    img = ome.images[0]
    assert img.id == "Image:0" and img.name == "demo"
    px = img.pixels
    assert (px.size_t, px.size_c, px.size_z, px.size_y, px.size_x) \
        == (2, 3, 4, 5, 6)
    assert px.type == "uint16" and px.dimension_order == "XYZCT"
    assert px.big_endian is False
    assert (px.physical_size_z, px.physical_size_y, px.physical_size_x) \
        == (2.0, 0.5, 0.5)
    assert [c.name for c in px.channels] == ["DAPI", "GFP", "RFP"]
    assert px.channels[1].id == "Channel:0:1"
    assert len(px.tiff_data) == 2 * 3 * 4
    assert px.tiff_data[0].ifd == 0 and px.tiff_data[-1].plane_count == 1
    assert ome.to_numpy_dtype() == np.dtype("uint16")


def test_image_fragment_and_namespaced():
    frag = ('<Image ID="Image:3" Name="f"><Pixels SizeT="1" SizeC="1" '
            'SizeZ="1" SizeY="2" SizeX="2" Type="double"/></Image>')
    ome = OME.from_xml(frag)
    assert ome.images[0].id == "Image:3"
    assert ome.to_numpy_dtype() == np.dtype("float64")

    ns = ('<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
          + frag + '</OME>')
    assert OME.from_xml(ns).images[0].pixels.size_y == 2


def test_rejects_non_ome():
    with pytest.raises(ValueError, match="not an OME"):
        OME.from_xml("<Other/>")


def test_bioimage_ome_metadata_roundtrip(spark, tmp_path):
    """BioImage over a written OME-TIFF exposes the typed model; an
    ArrayLike image (no raw metadata) raises like the reference."""
    from bioio_spark import BioImage
    from bioio_spark.writers import OmeTiffWriter

    a = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    path = str(tmp_path / "m.ome.tiff")
    OmeTiffWriter.save(a, path, dim_order="ZYX", image_name="meta-demo")
    img = BioImage(path, spark=spark)
    ome = img.ome_metadata
    assert ome.images[0].name == "meta-demo"
    assert ome.images[0].pixels.size_z == 2
    assert ome.to_numpy_dtype() == img.dtype

    arr_img = BioImage(np.zeros((2, 2)), spark=spark)
    with pytest.raises(NotImplementedError):
        arr_img.ome_metadata


def test_planes_units_and_acquisition_date():
    """Tier-2 depth (ref bio_image.py:1021-1036 exposes the full ome_types
    tree): Plane grid, physical-size units, AcquisitionDate."""
    xml = build_ome_xml(2, 1, 3, 4, 4, "uint8", image_id="Image:0",
                        physical_pixel_sizes=PhysicalPixelSizes(
                            Z=1.5, Y=0.25, X=0.25),
                        planes=True, acquisition_date="2024-01-02T03:04:05")
    ome = OME.from_xml(xml)
    img = ome.images[0]
    assert img.acquisition_date == "2024-01-02T03:04:05"
    px = img.pixels
    assert px.physical_size_x_unit == "µm"
    assert px.physical_size_z_unit == "µm"
    assert len(px.planes) == 2 * 1 * 3
    # XYZCT page order: z fastest
    assert (px.planes[0].the_t, px.planes[0].the_c,
            px.planes[0].the_z) == (0, 0, 0)
    assert (px.planes[4].the_t, px.planes[4].the_c,
            px.planes[4].the_z) == (1, 0, 1)


def test_instrument_and_stage_positions():
    doc = (
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Instrument ID="Instrument:0">'
        '<Microscope Model="SpinningDisk"/>'
        '<Objective ID="Objective:0" Model="60x/1.4"'
        ' NominalMagnification="60.0" LensNA="1.4"/>'
        '</Instrument>'
        '<Image ID="Image:0"><InstrumentRef ID="Instrument:0"/>'
        '<Pixels ID="Pixels:0" Type="uint16" SizeT="1" SizeC="1"'
        ' SizeZ="1" SizeY="2" SizeX="2" PhysicalSizeX="0.1"'
        ' PhysicalSizeXUnit="nm" Interleaved="false">'
        '<Plane TheT="0" TheC="0" TheZ="0" PositionX="12.5"'
        ' PositionY="-3.25" PositionZ="0.5" PositionXUnit="µm"'
        ' DeltaT="0.75" ExposureTime="0.02"/>'
        '</Pixels></Image></OME>')
    ome = OME.from_xml(doc)
    assert len(ome.instruments) == 1
    inst = ome.instruments[0]
    assert inst.microscope_model == "SpinningDisk"
    assert inst.objectives[0].nominal_magnification == 60.0
    assert inst.objectives[0].lens_na == 1.4
    img = ome.images[0]
    assert img.instrument_ref == "Instrument:0"
    px = img.pixels
    assert px.physical_size_x_unit == "nm" and px.interleaved is False
    p = px.planes[0]
    assert (p.position_x, p.position_y, p.position_z) == (12.5, -3.25, 0.5)
    assert p.position_x_unit == "µm"
    assert p.delta_t == 0.75 and p.exposure_time == 0.02
