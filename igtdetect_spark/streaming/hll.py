"""Streaming distinct-count via the mergeable HLL sketch.

The batch side (``operators/sketches.py``) makes registers an ordinary
relation; streaming then needs NO new state machinery: each micro-batch
writes its OWN register relation to a ``batch_id=`` partition of a
parquet store, and the live estimate is ``hll_merge`` over the whole
store. Because union+max is associative, commutative and idempotent,

* a REPLAYED batch (crash between write and checkpoint commit)
  dynamic-overwrites its own partition with identical rows — the
  merged sketch is unchanged (pinned by test);
* a batch backfill and the stream agree bit-for-bit (same register
  kernel — pinned by test);
* readers never block writers: any prefix of partitions is a valid
  (under-counting only by the missing batches) sketch.

State bound: each partition is ≤ m·|groups| rows (m = 2^p registers),
so the store grows by a bounded sliver per batch regardless of batch
row count — the whole point of sketching a 10¹²-doc stream. Compaction
(collapsing old partitions through :func:`hll_merge_registers` into
one) is an offline maintenance job, not correctness-relevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    hll_estimate,
    hll_merge_registers,
    hll_registers,
)


def write_hll_batch(
    registers: DataFrame, store_dir: str, batch_id: int
) -> None:
    """Idempotent per-batch register write: dynamic partition overwrite
    keyed by batch_id (same replay discipline as ``write_spans_batch``),
    plus the max-merge algebra making even a DIFFERENTLY-split replay
    harmless to the merged sketch."""
    (
        registers.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def start_hll_stream(
    stream_df: DataFrame,
    key,
    group_cols: list[str],
    store_dir: str,
    checkpoint_dir: str,
    p: int = 9,
    available_now: bool = False,
):
    """Stream → per-batch HLL register partitions. ``foreachBatch`` is
    the seam because the register build is a plain batch aggregate and
    the store write needs batch_id-keyed idempotency."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_hll_batch(
            hll_registers(batch_df, key, group_cols, p),
            store_dir,
            batch_id,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_store(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    p: int = 9,
) -> DataFrame:
    """The live estimate: merge every batch partition's registers and
    estimate — equals the single-pass batch estimate over all data
    streamed so far, bit-for-bit."""
    regs = spark.read.parquet(store_dir).select(*group_cols, "bucket", "rho")
    merged = hll_merge_registers(regs)
    return hll_estimate(merged, group_cols, p)
