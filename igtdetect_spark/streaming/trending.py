"""Streaming trending-term counts — the watermark + hopping-window
aggregate shape (the one Structured Streaming primitive the rest of the
streaming family doesn't exercise: windowed groupBy with append-mode
finalization).

A crawl monitor wants "what terms are spiking in the last N minutes,
updated every M" — a hopping (sliding) window over event time.  The
batch engine answers it with ``groupBy(window(...))`` over history
(``hopping_counts``); the incremental path must emit each window ONCE,
when the watermark guarantees no more late arrivals can change it.

Scale shape: tokenization is a narrow flat map fused into the stream
scan; the windowed count is the engine's streaming hash aggregate whose
state is one entry per (window, term) inside the watermark horizon —
bounded by vocabulary-per-horizon, evicted by the engine as the
watermark passes window end.  Late rows inside the horizon still count
(that is the point of the watermark); rows later than the horizon are
dropped by the engine before the aggregate.  Top-k per window is NOT
done here: rank-over-window is unsupported on streaming aggregates and
belongs to the consumer of the finalized rows — the ``min_count``
threshold keeps the emitted relation bounded instead (hapax noise never
leaves the executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trending_terms_stream(
    pages: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    min_count: int = 2,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Hopping-window term counts over an event-timestamped page
    stream; append-mode ready (each window finalizes once the
    watermark passes its end).

    Output: (window_start, window_end, term, n) with ``n ≥
    min_count``.  The same expression chain works on a BATCH frame
    (minus the watermark), which is how the parity test pins
    stream == backfill.
    """
    toks = (
        pages.withWatermark(ts_col, watermark)
        if pages.isStreaming
        else pages
    )
    toks = toks.select(
        F.col(ts_col),
        F.explode(
            F.split(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                r"[ \t\n\r\f\x0b]+",
            )
        ).alias("term"),
    ).filter(F.length("term") >= 3)
    agg = toks.groupBy(
        F.window(F.col(ts_col), window, slide).alias("w"), "term"
    ).agg(F.count(F.lit(1)).alias("n"))
    return agg.filter(F.col("n") >= min_count).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "term",
        F.col("n").cast("long").alias("n"),
    )
