"""As-of (most-recent-match) join — a standard warehouse operator Spark
has no native form of.

``left ASOF JOIN right`` pairs every left row with the single right row
having the greatest timestamp ≤ the left row's timestamp, per key. The
naive SQL (equi-join on key + ``r.ts <= l.ts`` + per-left max) explodes
quadratically per key — a left row matches EVERY earlier right row
before the aggregate prunes. The scale-correct plan used here is the
union-window form:

1. tag and union both sides into one relation (key, t, tag, payload),
2. ONE shuffle on key,
3. a running ``last(right_payload, ignorenulls=True)`` over
   (partition key, order t, tag) carries the latest right payload
   forward into each left row.

Cost is one exchange + one sort — the same as a plain equi-join — and
the window never materializes the per-key cross product. Ties: right
rows sorting before left rows at equal t makes the bound inclusive;
equal-timestamp right rows are broken by the ordered tiebreak column
(largest wins), so the result is deterministic.

Skew note: one hot key serializes its window partition. The standard
cure mirrors the sessionize/top-N pattern — pre-bucket time into
coarse ranges, run the union-window per (key, bucket), then stitch the
per-bucket carry-in (the last right row of bucket b-1) with one more
tiny window. Not wired here because as-of keys (user, instrument,
device) are near-uniform in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every row of ``left``, plus ``right_cols`` from
    the latest ``right`` row with ``right_ts`` ≤ ``left_ts`` on the same
    ``on`` key (NULLs when no such row). ``tiebreak`` orders right rows
    sharing a timestamp (largest value wins); required for a
    deterministic result when such ties exist."""
    carry = [c for c in right_cols if c != right_ts]
    l = left.select(
        F.lit(1).alias("_tag"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in carry],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r = right.select(
        F.lit(0).alias("_tag"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        F.col(on),
        *carry,
        F.col(right_ts).cast("timestamp").alias("_rts"),
    ).select(*l.columns)  # align column order for the union

    order = [F.col("_t"), F.col("_tag")]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w)
         for c in carry + ["_rts"]}
    )
    return (
        filled.filter(F.col("_tag") == 1)
        .select(*left.columns, *carry,
                F.col("_rts").alias(f"asof_{right_ts}"))
    )
