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

- ``neardup_stream``: ONLINE near-duplicate candidate detection — each
  arriving document's MinHash LSH bands (the SAME native band kernel as
  the batch path, so a backfill agrees bit-for-bit) probe a
  (band, band_hash)-keyed state holding the first document that produced that
  band inside the horizon; any band hit marks the newcomer a near-dup
  candidate of that holder. State is one entry per DISTINCT band hash
  within the horizon with event-time-timeout eviction.

At cluster scale the dedup state is hash-partitioned by fingerprint /
band hash across executors (the engine shuffles on the state key); the
watermark bounds both state size and the re-delivery window.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def fingerprint_stream(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(url, ts, fp): md5 content fingerprint per streamed page — md5
    over NORMALIZED text, the same expression the batch
    `doc_fingerprints` / `fingerprint_docs` kernels use, so a stream
    and a batch backfill produce bit-identical fingerprints (pinned
    end-to-end by the streaming-funnel parity test). NULL text
    fingerprints as md5('') — the batch kernel yields NULL there, so a
    null-text page is the ONE row the two disagree on; a streaming
    dedup key must be non-null for state keying."""
    from ..operators.dedup import normalized_text

    return pages.select(
        "url",
        F.col(ts_col).alias("ts"),
        F.md5(
            F.coalesce(normalized_text(F.col(text_col)), F.lit(""))
        ).alias("fp"),
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


_NEARDUP_SCHEMA = StructType(
    [
        StructField("band_hash", StringType(), False),
        StructField("url", StringType(), False),
        StructField("ts", LongType(), False),          # epoch sec
        StructField("band", LongType(), False),
        StructField("is_first", BooleanType(), False),
        StructField("first_url", StringType(), False),
        StructField("first_ts", LongType(), False),    # epoch sec
    ]
)

_NEARDUP_STATE = StructType(
    [
        StructField("first_url", StringType(), False),
        StructField("first_ts", LongType(), False),
        StructField("last_seen", LongType(), False),
    ]
)


def neardup_stream(
    pages: DataFrame,
    horizon_sec: int = 3600,
    watermark: str = "0 seconds",
    n_perms: int = 16,
    band_size: int = 4,
    shingle_n: int = 3,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Online near-duplicate candidate detection over a document stream.

    Plan: the batch MinHash band kernel (pure native expressions —
    ``minhash_band_hashes`` with the event time as a pass-through
    column) fans each doc into its LSH bands; ``applyInPandasWithState``
    keyed by ``(band, band_hash)`` (the batch LSH equality) holds the
    first document that produced the band within ``horizon_sec``.

    FIRST-HOLDER IDENTITY IS ARRIVAL-ORDER DETERMINISTIC, NOT
    EVENT-TIME DETERMINISTIC: rows are ordered by (event time, url)
    only WITHIN a micro-batch. With a nonzero watermark delay, a late
    cross-batch arrival whose event time precedes the current holder's
    does NOT reclaim the holder slot — it is reported as a candidate of
    the later-timestamped holder, so ``first_url`` can depend on
    micro-batch boundaries for out-of-order deliveries. This is the
    standard online-dedup contract (state answers "have I seen this
    band before?", not "which sighting is event-time-minimal?"); a
    backfill needing event-time-minimal holders should use the batch
    ``neardup_clusters`` (min doc_id representative) instead. Every
    (url, band) emits a row: ``is_first`` for the state holder,
    otherwise a candidate match against ``first_url`` — a downstream
    consumer flags a doc as near-dup iff any of its bands matched
    (exactly the batch LSH-pairs criterion, evaluated online).

    State: one entry per distinct band hash seen inside the horizon;
    an event-time timeout at ``last_seen + horizon`` evicts idle bands,
    so a re-delivery after the horizon becomes a fresh first (the
    streaming-exact-dedup eviction contract, same as
    ``dedup_stream_exact``). Batch/stream parity of the band values
    themselves is pinned in tests (same kernel ⇒ same md5 strings).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import minhash_band_hashes

    bands = minhash_band_hashes(
        pages.select(
            F.col("url"),
            F.col(ts_col).cast("timestamp").alias("_ts"),
            F.col(text_col),
        ),
        n_perms=n_perms,
        band_size=band_size,
        shingle_n=shingle_n,
        id_col="url",
        text_col=text_col,
        extra_cols=("_ts",),
    ).select(
        F.col("doc_id").alias("url"),
        F.col("_ts").alias("ts"),
        F.col("band").cast("long").alias("band"),
        "band_hash",
    )

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # state is keyed by (band, band_hash) — the batch LSH criterion
        # requires equality on BOTH (the band hash does not encode the
        # band index, so keying by hash alone could merge different
        # bands' entries on degenerate inputs).
        (band, band_hash) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=[f.name for f in _NEARDUP_SCHEMA])
            return
        batches = [p for p in pdfs if len(p)]
        if not batches:
            yield pd.DataFrame([], columns=[f.name for f in _NEARDUP_SCHEMA])
            return
        pdf = pd.concat(batches, ignore_index=True)
        pdf["_epoch"] = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        )
        pdf = pdf.sort_values(["_epoch", "url"])
        if state.exists:
            first_url, first_ts, last_seen = state.get
        else:
            first_url, first_ts, last_seen = None, None, None
        # Expiry is decided in EVENT time inside the function, not left
        # to the (lazy, watermark-scheduled) timer: a row arriving more
        # than `horizon` after the band's last sighting starts a fresh
        # first even if the engine has not fired the cleanup timer yet —
        # behavior is then deterministic in the data, independent of
        # micro-batch boundaries. The timer below only garbage-collects
        # state for bands that never reappear.
        rows = []
        for url, epoch in zip(
            pdf["url"].astype(str), pdf["_epoch"].astype("int64")
        ):
            if first_url is None or epoch - last_seen > horizon_sec:
                first_url, first_ts = url, int(epoch)
            last_seen = int(epoch) if last_seen is None else max(
                last_seen, int(epoch)
            )
            # is_first by URL, not (url, ts): an at-least-once
            # RE-DELIVERY of the holder inside the horizon must not
            # report the document as a near-dup candidate of ITSELF —
            # the batch criterion (doc_a < doc_b) has no self-pairs.
            rows.append(
                (band_hash, url, int(epoch), int(band),
                 url == first_url, first_url, first_ts)
            )
        state.update((first_url, first_ts, last_seen))
        # GC when the watermark passes last_seen + horizon (strictly
        # beyond the current watermark, as the engine requires)
        state.setTimeoutTimestamp(
            max((last_seen + horizon_sec) * 1000,
                state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            rows, columns=[f.name for f in _NEARDUP_SCHEMA]
        )

    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "band_hash")
        .applyInPandasWithState(
            fn,
            _NEARDUP_SCHEMA,
            _NEARDUP_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
