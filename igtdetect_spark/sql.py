"""SQL surface: register the engine's tables as temp views so every stage
is queryable with ``spark.sql`` (the DataFrame plans and the SQL text
compile to the same Catalyst plans — users of either API get the same
physical execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.pipeline import (
    DetectContext,
    classify_lines_fused,
    detect_spans_fused,
)
from .operators.segment import segment_pages


def register_engine_views(
    spark: SparkSession,
    pages: DataFrame,
    ctx: DetectContext,
    prefix: str = "",
) -> dict[str, str]:
    """Create temp views ``{prefix}pages/lines/classified_lines/spans``.
    Views are lazy — a SQL query over ``spans`` runs the fused pipeline
    with full Catalyst pushdown into the pages scan."""
    names = {}
    for name, df in (
        ("pages", pages),
        ("lines", segment_pages(pages, ctx.cfg.html_main_content)),
        ("classified_lines", classify_lines_fused(pages, ctx)),
        ("spans", detect_spans_fused(pages, ctx)),
    ):
        view = prefix + name
        df.createOrReplaceTempView(view)
        names[name] = view
    return names
