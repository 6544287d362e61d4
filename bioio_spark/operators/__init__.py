from bioio_spark.operators.selectors import apply_selectors
from bioio_spark.operators.standardize import standardize_pixels
from bioio_spark.operators.mosaic import stitch_mosaic

__all__ = ["apply_selectors", "standardize_pixels", "stitch_mosaic"]
