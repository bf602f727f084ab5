"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on whole: the standard preprocessing
step caps each stratum (language, source, domain) at a budget, drawn
uniformly but REPRODUCIBLY so reruns and incremental rebuilds select
the same documents. Hash-ordering (md5 of the id) gives exactly that —
a seedable uniform permutation both engines can reproduce bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    docs: DataFrame,
    n_per_group: int = 50,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt_parts: int = 0,
) -> DataFrame:
    """(group, doc_id, sample_rank): at most ``n_per_group`` docs per
    stratum, drawn by md5-hash order of the id (deterministic uniform
    draw; ties — impossible in practice — break on the id itself).

    Skew posture: a plain ``row_number`` window shuffles every row of a
    stratum into ONE partition — a mega-stratum (one language dominating
    the crawl) serializes there. With ``salt_parts=S`` the operator runs
    the standard two-phase top-N: per-(group, salt) local top-N first
    (S ways parallel, each emitting ≤ N rows), then the global window
    over ≤ N·S survivors per group. Output is IDENTICAL (the global
    top-N of a union of per-salt top-Ns is the global top-N); only the
    plan changes. Default 0 keeps the single-window plan for
    small-stratum corpora.
    """
    key = F.md5(F.col(id_col).cast("string"))
    src = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        key.alias("_k"),
    )
    if salt_parts > 1:
        w1 = Window.partitionBy("grp", "_s").orderBy("_k", "doc_id")
        src = (
            src.withColumn(
                "_s", F.pmod(F.hash(F.col("doc_id")), F.lit(salt_parts))
            )
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= n_per_group)
            .drop("_s", "_r1")
        )
    w = Window.partitionBy("grp").orderBy("_k", "doc_id")
    return (
        src.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
        .select(
            F.col("grp").alias(group_col), "doc_id", "sample_rank"
        )
    )
