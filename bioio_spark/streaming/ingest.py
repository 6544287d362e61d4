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

from contextlib import contextmanager
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_BINARY_SCHEMA = ("path string, modificationTime timestamp, "
                  "length long, content binary")


@contextmanager
def bounded_stream_partitions(spark: SparkSession, default: int = 8):
    """Size a stream's shuffle/state partitions to its bounded
    per-trigger volume instead of the batch shuffle default (r13,
    guide §2.2/§2.4 applied to micro-batches).

    Every stateful operator creates one state store per shuffle
    partition and commits ALL of them every micro-batch, and every
    batch-side aggregation inside foreachBatch schedules one task per
    shuffle partition — so an ingest/gauge stream whose micro-batches
    carry a few hundred rows pays 32+ task launches and store commits
    per trigger for work that fits in a handful. Spark pins the state
    partition count into the checkpoint at first start
    (OffsetSeqMetadata), making the value per-stream and
    core-count-independent. The stateful gauge stores (s14/s16/s17/
    s19/s20) already size this via their state_partitions parameter;
    this context manager is the same discipline for the image-ingest
    streams (s8/s9 and the bench ingest), whose stateful scene
    aggregate holds a handful of rows. The foreachBatch band/model/
    sketch stores deliberately do NOT use it: their per-batch work
    (minhash, tokenization, CMS hashing) is compute-bound and wants
    the full batch parallelism (measured: s10/s12 regress under a
    small fixed count). Production sizing derives from peak state
    rows / per-trigger volume (SCALING.md capacity models) and is
    overridable via spark.bioio.stream.statePartitions. Measured on
    the s8 ingest fixture: 32 -> 8 state partitions cuts the
    3-trigger run 2.7x with identical output (state metrics are
    partition-count-free totals).

    Single-threaded by design: this mutates the session-global
    spark.sql.shuffle.partitions for the duration of the stream run, so
    a concurrent batch query on the same SparkSession would inherit the
    reduced count, and nested/overlapping uses restore a stale value.
    All call sites (s8/s9 query paths, the bench ingest twin) run their
    streams sequentially on a dedicated session; keep it that way, or
    scope the setting to the stream's own writer instead."""
    key = "spark.sql.shuffle.partitions"
    try:
        n = int(spark.conf.get("spark.bioio.stream.statePartitions",
                               str(default)))
    except Exception:
        n = default
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


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


def streaming_ngff_sink(pixels: DataFrame, store: str,
                        shape: tuple, chunks: tuple,
                        dtype: str = "float64",
                        checkpoint: str = None,
                        image_name: str = "live"):
    """Live acquisition -> OME-Zarr: stream long-form pixel rows
    (t, c, z, y, x, value) into an NGFF 0.4 store, chunk by chunk.

    The store's metadata (.zgroup/.zattrs/.zarray) is written ONCE,
    driver-side, from the declared final `shape` — NGFF has no append
    metadata, so a live store declares its full extent up front and
    chunks materialize as data arrives (readers see fill_value where
    nothing has landed yet, the standard sparse-Zarr semantics).

    Exactly-once WITHOUT a transaction log: a chunk's filename is a
    pure function of its grid position, and each foreachBatch call
    rewrites its chunks from the batch's full row set — so a replayed
    micro-batch (post-crash re-run from the file-source checkpoint)
    overwrites identical bytes instead of duplicating. The invariant a
    caller must keep is chunk-batch ALIGNMENT: every pixel of a chunk
    arrives in one micro-batch (acquisition convention: chunks no
    larger than one file's plane set — e.g. chunks=(1,1,1,Y,X) when
    each arriving file is one plane). Misaligned chunks would be
    half-written; align chunk geometry to the per-file unit.

    Returns the StreamingQuery (caller awaits/stops)."""
    import os

    from pyspark.sql import functions as F

    from bioio_spark.formats.zarr import (ZGROUP, build_ngff_attrs,
                                          build_zarray, chunk_key,
                                          encode_chunk)

    t_n, c_n, z_n, y_n, x_n = shape
    root = store
    os.makedirs(os.path.join(root, "0"), exist_ok=True)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        f.write(ZGROUP)
    with open(os.path.join(root, ".zattrs"), "w") as f:
        f.write(build_ngff_attrs(image_name, None))
    with open(os.path.join(root, "0", ".zarray"), "w") as f:
        f.write(build_zarray(shape, chunks, dtype))

    cs = tuple(int(c) for c in chunks)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        import numpy as np
        import pandas as pd

        grid_cols = [(F.col(d) / cs[i]).cast("int").alias(f"g{d}")
                     for i, d in enumerate("tczyx")]

        def encode_one(pdf: pd.DataFrame) -> pd.DataFrame:
            grid = tuple(int(pdf[f"g{d}"].iloc[0]) for d in "tczyx")
            off = tuple(g * c for g, c in zip(grid, cs))
            block = np.zeros(cs, dtype=dtype)
            flat = ((pdf["t"].to_numpy() - off[0])
                    * (cs[1] * cs[2] * cs[3] * cs[4])
                    + (pdf["c"].to_numpy() - off[1])
                    * (cs[2] * cs[3] * cs[4])
                    + (pdf["z"].to_numpy() - off[2]) * (cs[3] * cs[4])
                    + (pdf["y"].to_numpy() - off[3]) * cs[4]
                    + (pdf["x"].to_numpy() - off[4]))
            block.ravel()[flat] = pdf["value"].to_numpy()
            path = os.path.join(root, "0", chunk_key(grid))
            with open(path, "wb") as f:
                f.write(encode_chunk(block))
            return pd.DataFrame({"n": [len(pdf)]})

        (batch_df.select("t", "c", "z", "y", "x", "value", *grid_cols)
         .groupBy(*[f"g{d}" for d in "tczyx"])
         .applyInPandas(encode_one, "n long")
         .count())

    return (pixels.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation",
                    checkpoint or os.path.join(root, "_checkpoint"))
            .trigger(availableNow=True)
            .start())
