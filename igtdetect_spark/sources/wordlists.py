"""Wordlist / gram / language-name dimension tables as DataFrames
(SURVEY §2.1 wordlist scans). The broadcast-set loaders in ``lexicons.py``
are the hot path; these DataFrame variants exist for provenance-style
joins (explode tokens → left-semi join against the dimension)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def wordlist_df(spark: SparkSession, path: str) -> DataFrame:
    """First whitespace token per non-blank line (WordlistFile,
    env.py:109-115)."""
    return (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(F.split(F.col("value"), r"\s+")[0].alias("word"))
        .distinct()
    )


def gram_list_df(spark: SparkSession, path: str) -> DataFrame:
    """Stripped non-blank lines (read_wl, igtdetect.py:1919-1926)."""
    return (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(F.trim("value").alias("gram"))
        .distinct()
    )


def langnames_df(spark: SparkSession, path: str) -> DataFrame:
    """Columns 4+ of langs.txt, comma-split, '[' stripped, lowercased,
    length ≥ 5 (parse_langnames, igtdetect.py:798-813) — entirely native
    expressions."""
    cols_4_plus = F.array_join(
        F.slice(F.split(F.trim("value"), r"\s+"), 4, 1 << 20), " "
    )
    return (
        spark.read.text(path)
        .select(F.explode(F.split(cols_4_plus, ",")).alias("raw"))
        .select(F.lower(F.replace(F.col("raw"), F.lit("["), F.lit(""))).alias("name"))
        .filter(F.length("name") >= 5)
        .distinct()
    )


def has_langname_join(
    lines: DataFrame, langnames: DataFrame
) -> DataFrame:
    """Provenance variant of the has_langname feature: explode tokens →
    broadcast left-semi join (SURVEY §2.3). Adds ``has_langname`` bool."""
    toks = lines.select(
        "url", "line_no",
        F.explode(
            F.split(F.lower(F.regexp_replace("text", r"\W+", " ")), " ")
        ).alias("name"),
    )
    hits = toks.join(F.broadcast(langnames), "name", "left_semi").select(
        "url", "line_no"
    ).distinct().withColumn("has_langname", F.lit(True))
    return lines.join(hits, ["url", "line_no"], "left").na.fill(
        {"has_langname": False}
    )
