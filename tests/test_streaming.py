"""Structured Streaming ingestion tests: streamed detection equals the
batch run; restart resumes from checkpoint without duplicating spans;
watermarked monitor aggregates."""

import pytest

from igtdetect_spark.flagship import get_lexicons, get_synthetic_model


@pytest.fixture(scope="module")
def ctx(spark):
    from igtdetect_spark.plans.pipeline import DetectContext

    return DetectContext(spark, get_synthetic_model(), get_lexicons())


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from igtdetect_spark.sources.pages import synthetic_pages

    d = str(tmp_path_factory.mktemp("pages_stream"))
    # several files so maxFilesPerTrigger yields multiple micro-batches
    synthetic_pages(spark, 30, n_partitions=6).write.mode("overwrite").parquet(d)
    return d


def test_streamed_detection_matches_batch(spark, ctx, pages_dir, tmp_path_factory):
    from igtdetect_spark.plans.pipeline import detect_spans_fused
    from igtdetect_spark.streaming.ingest import (
        read_pages_stream,
        start_detect_stream,
    )

    out = str(tmp_path_factory.mktemp("spans_stream"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_stream"))
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = start_detect_stream(stream, ctx, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out).drop("batch_id")
    want = detect_spans_fused(spark.read.parquet(pages_dir), ctx)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # restart with the same checkpoint: nothing new → no duplicates
    q2 = start_detect_stream(
        read_pages_stream(spark, pages_dir), ctx, out, ckpt, available_now=True
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == want.count()


def test_replayed_batch_is_idempotent(spark, ctx, pages_dir, tmp_path_factory):
    """foreachBatch replay (crash after write, before checkpoint commit):
    re-writing the same batch_id must overwrite its own partition, not
    append a second copy."""
    from igtdetect_spark.plans.pipeline import detect_spans_fused
    from igtdetect_spark.streaming.ingest import write_spans_batch

    out = str(tmp_path_factory.mktemp("spans_replay"))
    spans = detect_spans_fused(spark.read.parquet(pages_dir), ctx)
    n = spans.count()
    write_spans_batch(spans, out, batch_id=7)
    write_spans_batch(spans, out, batch_id=7)  # the replay
    assert spark.read.parquet(out).count() == n
    write_spans_batch(spans, out, batch_id=8)  # a different batch appends
    assert spark.read.parquet(out).count() == 2 * n


def test_ingest_monitor_watermark(spark, pages_dir, tmp_path_factory):
    from igtdetect_spark.streaming.ingest import (
        read_pages_stream,
        start_ingest_monitor,
    )

    ckpt = str(tmp_path_factory.mktemp("ckpt_mon"))
    stream = read_pages_stream(spark, pages_dir)
    q = start_ingest_monitor(stream, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(300)
    rows = spark.sql("select * from ingest_monitor").collect()
    assert sum(r["n_pages"] for r in rows) == 30
    assert all(r["window"]["start"] is not None for r in rows)
