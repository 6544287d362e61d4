"""Exactly-once streaming sinks via foreachBatch (SURVEY §2.10).

Structured Streaming delivers micro-batches at-least-once to foreachBatch
(a batch is re-run after a failure between sink write and checkpoint
commit). Exactly-once therefore has to come from the SINK being idempotent
per (batch_id): replaying a batch must leave the target unchanged.

Two standard patterns, both plain-parquet (no transactional table format
required):

- `idempotent_batch_sink`: each micro-batch overwrites its own
  deterministic `batch_id=N` partition directory. A replayed batch
  rewrites the same directory with the same rows — idempotent by
  construction. Readers take the union of partitions.
- `upsert_batch_sink`: keyed "latest wins" — each batch writes key-rows
  stamped with batch_id; `read_upserted` compacts to the highest-batch_id
  row per key (a max_by aggregate). This is MERGE-style upsert semantics
  without a table format; swapping the target for Delta/Iceberg turns the
  compaction into a real MERGE with no caller change.

Scale: foreachBatch runs the write as a normal distributed batch job —
partitioned parquet writes, no driver collection. The compaction read is
one partial-combining max_by aggregate on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_batch_sink(stream_df: DataFrame, target_dir: str,
                          checkpoint_dir: str, query_name: str):
    """Start a foreachBatch writer where each batch overwrites its own
    batch_id partition — replays are no-ops. Returns the StreamingQuery.

    The clobber is mode("overwrite") on the batch's own directory —
    Spark's committer handles the replace through the Hadoop FileSystem
    API, so the sink works identically on an object store (the 100 TB
    deployment target has no driver-local path to rmtree)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite-by-directory: a replayed batch_id clobbers its own
        # previous (possibly partial) output and nothing else
        out = f"{target_dir}/batch_id={batch_id}"
        batch_df.write.mode("overwrite").parquet(out)

    return (stream_df.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start())


def read_batches(spark: SparkSession, target_dir: str) -> DataFrame:
    """Union of all batch partitions written by idempotent_batch_sink."""
    return (spark.read.option("basePath", target_dir)
            .parquet(f"{target_dir}/batch_id=*").drop("batch_id"))


def upsert_batch_sink(stream_df: DataFrame, key_cols: list[str],
                      target_dir: str, checkpoint_dir: str,
                      query_name: str):
    """Keyed upsert sink: update-mode rows land stamped with their
    batch_id; the merged view is resolved at read time (latest batch
    wins per key). Idempotent: a replayed batch re-writes identical
    rows into the same batch_id partition."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = f"{target_dir}/batch_id={batch_id}"
        batch_df.write.mode("overwrite").parquet(out)

    return (stream_df.writeStream
            .outputMode("update")
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start())


def read_upserted(spark: SparkSession, target_dir: str,
                  key_cols: list[str]) -> DataFrame:
    """Compact the upsert log to the latest row per key: one max_by
    aggregate keyed on key_cols (partial-combining, single shuffle)."""
    log = (spark.read.option("basePath", target_dir)
           .parquet(f"{target_dir}/batch_id=*"))
    val_cols = [c for c in log.columns
                if c not in key_cols and c != "batch_id"]
    picked = [F.max_by(F.struct(*val_cols), F.col("batch_id")).alias("_v")]
    return (log.groupBy(*key_cols).agg(*picked)
            .select(*key_cols, *[F.col(f"_v.{c}").alias(c)
                                 for c in val_cols]))
