"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the IGT detection pipeline's classified-lines
output over the sf0.001 documents table hosted as Common-Crawl-style pages
(url, warc_ts, html, text, lang), classified by the deterministic
synthetic-trained flagship model in one narrow (shuffle-free) stage.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators; registry lives in
``igtdetect_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from igtdetect_spark.entry_queries import q_igt_classify_lines

    return q_igt_classify_lines(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from igtdetect_spark.entry_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from igtdetect_spark.entry_queries import oracle_sql as _o

    return _o()
