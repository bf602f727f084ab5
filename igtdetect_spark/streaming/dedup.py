"""Streaming deduplication (SURVEY.md §2.9 + the LLM-pipeline family).

A continuously-crawled pages/documents stream re-delivers content: the
same url re-fetched, mirrored hosts, syndicated boilerplate. The batch
engine dedups with a hash-groupBy (``operators/dedup.py``); the
incremental path must do it ONLINE with bounded state. Two operators:

- ``dedup_stream_exact``: drop re-deliveries of the same content
  fingerprint using ``dropDuplicatesWithinWatermark`` — state holds one
  entry per fingerprint seen inside the watermark horizon and the
  engine evicts expired keys, so state is O(corpus-per-horizon), not
  O(corpus-ever). Exactly the semantics a crawl pipeline wants: a
  re-crawl days later is a NEW observation (content may differ, the
  old state is gone), while the duplicate burst around a crawl event
  is collapsed.
- ``fingerprint_stream``: the narrow md5 fingerprint projection shared
  with the batch path (same expression ⇒ same values ⇒ a batch backfill
  and the stream agree bit-for-bit).

At cluster scale the dedup state is hash-partitioned by fingerprint
across executors (the engine shuffles on the dedup key); the watermark
bounds both state size and the re-delivery window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_stream(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(url, ts, fp): md5 content fingerprint per streamed page — the
    same expression the batch `doc_fingerprints` uses, so stream and
    backfill agree exactly. NULL text fingerprints as md5('') (matching
    the batch kernel's treatment of empty content)."""
    return pages.select(
        "url",
        F.col(ts_col).alias("ts"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
    )


def dedup_stream_exact(
    pages: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: first delivery of each content fingerprint
    inside the watermark horizon passes, replays are dropped.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    deliberate: the plain form keeps every key forever (unbounded state
    — a non-starter for an always-on crawl consumer), while the
    watermark form lets the engine evict keys older than the horizon.
    Dedup is on the CONTENT fingerprint only, so the same text arriving
    from two urls inside the horizon is also collapsed (first one
    wins), matching the batch exact-dedup semantics.
    """
    return (
        fingerprint_stream(pages, ts_col, text_col)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
