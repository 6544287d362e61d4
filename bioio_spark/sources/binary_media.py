"""Custom format reader over Spark's binaryFile source (S9 / §2.9).

The reference reads arbitrary formats through plugin Reader classes
(ref bio_image.py:158-282 routing; fsspec URIs docs/OVERVIEW.md:360-389).
The Spark-cluster analog: `spark.read.format("binaryFile")` scans any
Hadoop-FS URI scheme (file:/ s3a:/ gs:/ https:/), yielding (path, content)
rows, and an Arrow-batched `mapInPandas` decode turns payloads into typed
rows — decode runs on executors, parallel over files, nothing moves through
the driver.

`pathGlobFilter` restricts the scan to the format's extensions (the S5
suffix predicate pushed into the file listing); partition count follows the
file split, so decode parallelism scales with the file count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from bioio_spark.functions.multimodal import DECODE_SCHEMA, FakeCodec


def read_media_dir(spark: SparkSession, path: str,
                   glob: str = "*.fkc") -> DataFrame:
    """binaryFile scan of a directory of FakeCodec files."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob)
            .load(path)
            .select("path", "length", "content"))


def decode_media_files(binary_df: DataFrame, codec=FakeCodec) -> DataFrame:
    """mapInPandas decode of binaryFile rows to per-media feature rows.

    media_id is recovered from the file name stem; the decode batch shape
    mirrors functions.multimodal.decode_features so a real codec slots in
    unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = [codec.decode(bytes(p)) for p in pdf["content"]]
            ids = [int(p.rsplit("/", 1)[-1].split(".")[0])
                   for p in pdf["path"]]
            yield pd.DataFrame({
                "media_id": ids,
                "kind": ["image"] * len(ids),
                "height": [f.shape[1] for f in frames],
                "width": [f.shape[2] for f in frames],
                "n_frames": [f.shape[0] for f in frames],
                "mean_value": [float(f.mean()) for f in frames],
                "max_value": [int(f.max()) for f in frames],
            })

    return binary_df.mapInPandas(batches, schema=DECODE_SCHEMA)
