"""Incremental page ingestion via Structured Streaming (SURVEY.md §2.9).

The reference is batch-only; this is the engine's incremental path for a
continuously-crawled pages table: ``readStream`` on the pages directory →
the same fused detection stages (document-local, so they run unchanged
inside ``foreachBatch``) → idempotent append of spans keyed by batch id.
Watermarked per-window counters bound state for the monitoring aggregate.

Checkpointing: the streaming checkpoint directory plays the role of the
reference's feature-file cache (``DocData.load`` overwrite-or-reuse,
igtdetect.py:122-132) — a restarted job resumes from the last committed
batch without re-detecting earlier pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import DetectContext, detect_spans_fused
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession,
    pages_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def write_spans_batch(spans: DataFrame, out_dir: str, batch_id: int) -> None:
    """Idempotent sink for one micro-batch: the output is partitioned by
    batch_id and written with DYNAMIC partition overwrite, so a replayed
    batch (job died after the write but before the streaming checkpoint
    committed) overwrites its own ``batch_id=<id>`` partition instead of
    appending a duplicate copy. Other batches' partitions are untouched."""
    (
        spans.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def start_detect_stream(
    pages_stream: DataFrame,
    ctx: DetectContext,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Stream pages → spans parquet, exactly-once per micro-batch.

    ``foreachBatch`` is the right seam: the detection pipeline is a batch
    transformation over whole documents, and each page appears in exactly
    one micro-batch. Exactly-once = streaming checkpoint (replay point) +
    ``write_spans_batch`` (replay-idempotent dynamic partition overwrite
    keyed by batch_id) — a plain append would duplicate spans when a batch
    is replayed after a crash between the write and the checkpoint commit.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_spans_batch(detect_spans_fused(batch_df, ctx), out_dir, batch_id)

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ingest_monitor(
    pages_stream: DataFrame,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked event-time monitoring aggregate: pages per crawl-time
    window per lang. The watermark on ``warc_ts`` bounds state; late pages
    beyond it are dropped (the only cross-document aggregation in the
    engine, hence the only place a watermark is needed)."""
    agg = (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ingest_monitor")
        .option("checkpointLocation", checkpoint_dir)
    )
