"""P7: standardization to TCZYX(+M,S) at the BioImage tier.

Mirrors ref bioio/bio_image.py:500-546
(`_transform_data_array_to_bioio_image_standard`):
- target order chosen among TCZYX / TCZYXS / MTCZYX / MTCZYXS by present dims
- non-standard dims are sliced at index 0 and removed; missing standard dims
  inserted with size 1 (pinned by ref tests/test_array_like_reader.py:1028-1047)
- a Channel coordinate is *guaranteed* (generated if absent)

In the relational model non-standard dims were already sliced at ingest
(sources/array_like.py), so standardization is pure selector algebra on the
catalog dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bioio_spark.dimensions import Dimensions, target_standard_order
from bioio_spark.operators.selectors import apply_selectors


def standardized_dims(raw_order: str, raw_shape: tuple[int, ...]) -> Dimensions:
    """Compute the standardized Dimensions for a raw (order, shape)."""
    standard = set("TCZYXMS")
    present = "".join(d for d in raw_order if d in standard)
    target = target_standard_order(present)
    shape = []
    for letter in target:
        if letter in raw_order:
            shape.append(raw_shape[raw_order.index(letter)])
        else:
            shape.append(1)
    return Dimensions(target, tuple(shape))


def standardize_pixels(
    pixels: DataFrame, raw_order: str, raw_shape: tuple[int, ...]
) -> tuple[DataFrame, Dimensions]:
    """Standardize a raw scene's pixel frame to canonical order.

    Non-standard dims were index-0 sliced at ingest; here we project the
    standard dim columns present in the data, insert missing ones as size-1,
    and order columns canonically.
    """
    standard = set("TCZYXMS")
    present_letters = "".join(d for d in raw_order if d in standard)
    present_shape = tuple(
        raw_shape[raw_order.index(d)] for d in present_letters)
    dims_in = Dimensions(present_letters, present_shape)
    target = target_standard_order(present_letters)
    return apply_selectors(pixels, dims_in, target, {})
