"""bioio_spark — a PySpark-native analytics engine with the capabilities of
bioio-devs/bioio (microscopy image I/O + metadata normalization), re-expressed
relationally, plus the relational / LLM-data-pipeline operator contract from
SURVEY.md §2.

Design: images are long-form pixel tables + catalog dimension tables
(`scenes`, `channels`, `tiles`, `coords`); every axis operation the reference
performs on ndarrays (`/root/reference/bioio/bio_image.py`) becomes a Spark
DataFrame plan, so it is lazy, Catalyst-optimized, and oracle-checkable.
"""

from bioio_spark.session import get_session
from bioio_spark.dimensions import Dimensions, DEFAULT_DIMENSION_ORDER
from bioio_spark.types import PhysicalPixelSizes, TimeInterval, Scale
from bioio_spark.bio_image import BioImage, imread, imread_df

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "Dimensions",
    "DEFAULT_DIMENSION_ORDER",
    "PhysicalPixelSizes",
    "TimeInterval",
    "Scale",
    "BioImage",
    "imread",
    "imread_df",
]
