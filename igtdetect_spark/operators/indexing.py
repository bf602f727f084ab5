"""Search-tier index construction over a document corpus: inverted
postings lists (term → sorted document ids with frequencies).

This is the step after extraction/cleaning when the corpus feeds a
search or retrieval stack (a CC-style pipeline's other consumer besides
LLM training): build, per term, the document-frequency statistics and a
bounded posting sample.

Scale shape (the part that matters at 10¹² documents):

* term-frequency grain first — ONE hash aggregate on (term, doc_id)
  with map-side partial combine, so a stopword occurring 10⁹ times
  collapses to one row per document before anything term-global runs;
* every term-global statistic (df, total tf, the posting sample) is
  computed per-partition-of-``term`` in ONE window pass over that
  relation, and the posting sample is CAPPED at ``top_postings`` rows
  *before* any ``collect_list`` — the unbounded
  ``collect_list``-per-term (a stopword's full posting list) is the
  classic index-build OOM and never happens here;
* hapax terms (df < ``min_df``) are dropped AFTER the stats window so
  ``df`` is exact, which is also where a ``max_df`` stopword cut would
  slot in;
* total exchanges: (term, doc_id) hash agg → ``term`` hash exchange for
  the window; the final group-by-``term`` reuses the window's
  partitioning (AQE exchange reuse — asserted in tests/test_plans).

The truncation is DISCLOSED in the output: ``df`` is the exact distinct
document count even when ``postings`` holds only the first
``top_postings`` document ids, so a consumer can see what was dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cleaning import tokenized


def term_frequencies(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — per-document term counts over whitespace
    tokens (the cleaning family's tokenizer, so every index query
    shares one congruent token definition with the oracles)."""
    return (
        tokenized(docs)
        .select("doc_id", F.explode("tk").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(
    docs: DataFrame, min_df: int = 2, top_postings: int = 16
) -> DataFrame:
    """Build the inverted index: per term, exact df / total tf and the
    posting sample of the ``top_postings`` smallest document ids in
    ascending order (deterministic, merge-friendly — real shards
    concatenate sorted runs).

    Output: (term, df, tf_total, postings: array<bigint>).
    """
    tf = term_frequencies(docs)
    by_term = Window.partitionBy("term")
    ordered = by_term.orderBy("doc_id")
    stats = tf.select(
        "term",
        "doc_id",
        "tf",
        F.row_number().over(ordered).alias("_rk"),
        F.count("*").over(by_term).alias("df"),
        F.sum("tf").over(by_term).alias("tf_total"),
    )
    return (
        stats.filter(
            (F.col("_rk") <= top_postings) & (F.col("df") >= min_df)
        )
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),
            F.first("tf_total").alias("tf_total"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
    )
