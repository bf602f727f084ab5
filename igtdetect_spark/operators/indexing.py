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


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 retrieval over the corpus for a bounded query workload —
    the scoring half of the search tier, consuming the same (term,
    doc_id, tf) grain :func:`inverted_index` builds.  ``queries`` is a
    (query_id, term) relation with unique rows (a query repeating a
    term should pre-aggregate its weight; this operator treats each
    row as one query term).

    Scoring is Robertson/Lucene BM25:
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` and
    ``w(t,d) = idf·tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

    Cross-engine exactness: each TERM contribution is floored to e6
    micro-units FIRST and the per-(query, doc) score is the BIGINT sum
    of those integers — summing doubles would hash-differ between
    engines in summation order alone.  Inside one contribution every
    multiply/divide is correctly-rounded IEEE and the expression tree
    is written congruently on both engines; ``ln`` may differ in the
    last ulp, which the e6 floor absorbs (same argument as
    ``tfidf_top_terms``).  Ties break on doc_id.

    Scale shape: the query relation is TINY BY CONSTRUCTION (a
    benchmark workload, not user traffic) and is broadcast; the
    corpus-side (term, doc_id, tf) relation is filtered by that
    broadcast join BEFORE anything per-document joins it, so the
    expensive relations (doc lengths, df) only meet query-relevant
    rows.  df and dl stay EXACT over the full corpus: df is one
    map-side-combinable aggregate on term immediately reduced by the
    query-term join; dl is one aggregate on doc_id joined against the
    already-filtered hit set (AQE broadcasts the small side).  The
    global (N, Σdl) pair is a 1-row broadcast cross join.

    Output: (query_id, rank, doc_id, matched_terms, score_e6),
    ``rank ≤ top_k`` per query by (score desc, doc_id).
    """
    tf = term_frequencies(docs)
    qt = F.broadcast(queries)
    hits = tf.join(qt, "term")
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    nd = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_tok")
    )
    qdf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(qt.select("term").distinct(), "term")
    )
    avgdl = F.col("_tok").cast("double") / F.col("_n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = F.floor(
        F.lit(1e6) * idf * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
    ).cast("long")
    scored = (
        hits.join(dl, "doc_id")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(nd))
        .select("query_id", "doc_id", contrib.alias("_c"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.sum("_c").alias("score_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e6"), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.col("matched_terms").cast("long").alias("matched_terms"),
            F.col("score_e6").cast("long").alias("score_e6"),
        )
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
