"""Streaming image ingestion: a growing acquisition directory as an
unbounded source (SURVEY §2.10 extension — the reference is fully batch;
live-microscopy pipelines append files as the instrument writes them).

`read_image_stream` watches a directory through the binaryFile file
source (explicit schema — the streaming file source requires one), and
`streaming_decode_pixels` turns each micro-batch of newly arrived TIFF
files into long-form pixel rows through the same Arrow-batched decode the
batch reader uses — so a downstream windowed aggregate / sink sees pixels
within one trigger of a file landing.

Scale: each micro-batch parallelizes over its files; the decode is the
batch path's mapInPandas (per-page emission bounds executor memory), and
the file-source checkpoint gives exactly-once file processing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_BINARY_SCHEMA = ("path string, modificationTime timestamp, "
                  "length long, content binary")


def read_image_stream(spark: SparkSession, path: str,
                      pattern: str = "*.tif*",
                      max_files_per_trigger: int = 8) -> DataFrame:
    """Unbounded binaryFile source over an acquisition directory."""
    from bioio_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    return (spark.readStream.format("binaryFile")
            .schema(_BINARY_SCHEMA)
            .option("pathGlobFilter", pattern)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(path))


def streaming_decode_pixels(stream: DataFrame) -> DataFrame:
    """Micro-batch TIFF decode to long-form pixel rows. The scene id is
    the FILE STEM (acquisition convention: one file per scene as written
    by the instrument), so arriving files never collide."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        from bioio_spark.formats.tiff import decode_tiff
        from bioio_spark.sources.tiff_image import local_path

        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = os.path.basename(local_path(path)).split(".")[0]
                planes, _xml = decode_tiff(bytes(content))
                for i, plane in enumerate(planes):
                    y_n, x_n = plane.shape[0], plane.shape[1]
                    yield pd.DataFrame({
                        "scene": stem,
                        "page": np.int32(i),
                        "y": np.repeat(np.arange(y_n, dtype=np.int32),
                                       x_n),
                        "x": np.tile(np.arange(x_n, dtype=np.int32),
                                     y_n),
                        "value": plane.ravel().astype(np.float64),
                    })

    return stream.select("path", "content").mapInPandas(
        batches,
        schema="scene string, page int, y int, x int, value double")


def streaming_scene_stats(pixels: DataFrame) -> DataFrame:
    """Per-scene arrival stats — the live-QC aggregate an acquisition
    dashboard reads (complete/update mode; one state row per scene)."""
    from pyspark.sql import functions as F

    return (pixels.groupBy("scene")
            .agg(F.count(F.lit(1)).alias("n_px"),
                 F.sum("value").alias("sum_val"),
                 F.max("value").alias("max_val")))
