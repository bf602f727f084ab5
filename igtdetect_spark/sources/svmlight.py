"""svmlight-style feature file reader/writer (reference feature-file
cache, igtdetect.py:376-406 / :529-540): ``LABEL\\tfeat:1\\t…`` lines,
only-true features, optionally gzipped. The parquet ``features`` table is
the real checkpoint at scale; this text format exists for byte-parity
fixtures and for interoperating with reference-produced feature files."""

from __future__ import annotations

import gzip as _gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_svmlight_line(line: str) -> tuple[str, list[str]]:
    """One svmlight record → (label, fired feature names). The reference
    reads values with ``bool(value)`` — the string '1' (or any non-empty
    string, even '0') is truthy, faithfully kept (load_feats :395-396)."""
    parts = line.split()
    label = parts[0] if parts else ""
    feats = []
    for pair in parts[1:]:
        feat, _, value = pair.rpartition(":")
        if bool(value):
            feats.append(feat)
    return label, feats


def read_svmlight(spark: SparkSession, path: str) -> DataFrame:
    """svmlight(.gz) file(s) → (line_no, label, features). Distributed
    text scan; line numbers are per-file 1-based via a window (svmlight
    files carry no explicit ids — position is identity, like the
    reference's list order)."""
    from pyspark.sql import Window

    raw = spark.read.text(path).withColumn("_file", F.input_file_name())
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    split = F.split(F.col("value"), r"\s+")
    return (
        raw.filter(F.trim("value") != "")
        .withColumn("line_no", F.row_number().over(w))
        .select(
            "line_no",
            F.element_at(split, 1).alias("label"),
            F.filter(
                F.transform(
                    F.slice(split, 2, 1 << 20),
                    lambda p: F.substring_index(p, ":", 1),
                ),
                lambda x: x != "",
            ).alias("features"),
        )
    )


def write_svmlight_local(rows, path: str, gzip: bool = True) -> None:
    """Driver-side writer for parity fixtures: iterable of
    (label, sorted fired names) → svmlight text, optionally gzipped
    (reference write_training_vector + GzipFile plumbing)."""
    opener = _gzip.open if gzip else open
    with opener(path, "wt", encoding="utf-8") as f:
        for label, feats in rows:
            f.write(label)
            for feat in feats:
                f.write(f"\t{feat}:1")
            f.write("\n")
