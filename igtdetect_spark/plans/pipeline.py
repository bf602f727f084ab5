"""End-to-end IGT detection pipelines (reference `test` lifecycle,
SURVEY.md §3.1).

Two physical strategies, identical results (parity-tested):

- **fused** (flagship): pages → spans in ONE narrow ``mapInPandas`` stage.
  Each input row is a whole document, so segmentation, features, scoring
  and span assembly are document-local — zero shuffles, zero windows,
  zero joins. On a 1000-executor cluster over 100 TB this is a pure scan
  → scan-shaped job: throughput = executors × per-core kernel speed, no
  skew interactions between documents (a mega-doc only occupies one task
  slot while it lasts; AQE-balanced input splits keep slots busy).
- **staged**: the relational composition (segment → window features →
  grouped scoring → span windows) for when the input is an already-
  sharded ``lines`` table — one shuffle on url.

Model + lexicons travel as broadcast variables (~2 MB).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..featurespec import Lexicons
from ..refmodel import ModelWeights
from ..operators.schema import LINES_SCHEMA, SPANS_SCHEMA
from ..operators.segment import _plain_frame, batch_to_columns, segment_pages
from ..operators.score import score_lines
from ..operators.spans import assign_spans_df, detected_span_text
from ..operators.vectorized import (
    base_feature_matrix,
    score_matrix,
    spans_from_labels,
)


class DetectContext:
    """Broadcast bundle for the detection pipeline."""

    def __init__(self, spark: SparkSession, model: ModelWeights,
                 lex: Lexicons, cfg: PipelineConfig = DEFAULT_CONFIG):
        sc = spark.sparkContext
        self.cfg = cfg
        self.model_bc = sc.broadcast(model.as_broadcastable())
        self.lex_bc = sc.broadcast(lex)

    @classmethod
    def from_reference(cls, spark: SparkSession,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> "DetectContext":
        from ..config import REF_MODEL_PATH
        from ..lexicons import load_reference_lexicons
        from ..refmodel import load_reference_model

        return cls(
            spark,
            load_reference_model(REF_MODEL_PATH),
            load_reference_lexicons(),
            cfg,
        )


_LINE_COLS = [f.name for f in LINES_SCHEMA.fields]
_SPAN_COLS = [f.name for f in SPANS_SCHEMA.fields]


def detect_spans_fused(pages: DataFrame, ctx: DetectContext) -> DataFrame:
    """pages → spans, one narrow stage (no shuffle)."""
    cfg = ctx.cfg
    model_bc, lex_bc = ctx.model_bc, ctx.lex_bc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = ModelWeights.from_broadcastable(model_bc.value)
        lex = lex_bc.value
        for pdf in batches:
            cols, slices = batch_to_columns(
                pdf["url"], pdf["html"], pdf["text"], cfg.html_main_content
            )
            if not slices:
                yield pd.DataFrame(columns=_SPAN_COLS)
                continue
            lines = _plain_frame(cols)
            X = base_feature_matrix(lines, lex, cfg, model)
            labels: list[str] = []
            for url, a, b in slices:
                lab, _ = score_matrix(X[a:b], model, cfg)
                labels.extend(lab)
            span_rows = spans_from_labels(
                cols["url"],
                cols["line_no"],
                cols["block_id"],
                cols["text"],
                labels,
                slices,
                cfg,
            )
            yield pd.DataFrame(span_rows, columns=_SPAN_COLS)

    return pages.select("url", "html", "text").mapInPandas(
        gen, schema=SPANS_SCHEMA
    )


def classify_lines_fused(pages: DataFrame, ctx: DetectContext) -> DataFrame:
    """pages → per-line predictions (url, line_no, page, block_id, text,
    pred) in one narrow stage — the flagship classified-lines sink."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    cfg = ctx.cfg
    model_bc, lex_bc = ctx.model_bc, ctx.lex_bc
    out_schema = StructType([
        StructField("url", StringType(), False),
        StructField("line_no", IntegerType(), False),
        StructField("page", IntegerType(), True),
        StructField("block_id", StringType(), True),
        StructField("text", StringType(), True),
        StructField("pred", StringType(), True),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = ModelWeights.from_broadcastable(model_bc.value)
        lex = lex_bc.value
        for pdf in batches:
            cols, slices = batch_to_columns(
                pdf["url"], pdf["html"], pdf["text"], cfg.html_main_content
            )
            if not slices:
                yield pd.DataFrame(
                    columns=[f.name for f in out_schema.fields]
                )
                continue
            lines = _plain_frame(cols)
            X = base_feature_matrix(lines, lex, cfg, model)
            labels: list[str] = []
            for url, a, b in slices:
                lab, _ = score_matrix(X[a:b], model, cfg)
                labels.extend(lab)
            out = lines[["url", "line_no", "page", "block_id", "text"]].copy()
            out["pred"] = labels
            yield out

    return pages.select("url", "html", "text").mapInPandas(
        gen, schema=out_schema
    )


def detect_spans_staged(pages: DataFrame, ctx: DetectContext) -> DataFrame:
    """pages → spans via the relational operator chain (one url shuffle)."""
    lines = segment_pages(pages, ctx.cfg.html_main_content)
    scored = score_lines(lines, ctx.model_bc, ctx.lex_bc, ctx.cfg)
    joined = lines.select(
        "url", "line_no", "block_id", "text"
    ).join(scored.select("url", "line_no", "pred"), ["url", "line_no"])
    with_ids = assign_spans_df(joined, tag_col="pred")
    return detected_span_text(with_ids, ctx.cfg)


def detect_spans_salted(
    pages: DataFrame,
    ctx: DetectContext,
    chunk_lines: int = 20_000,
    mega_doc_chars: int = 1_000_000,
) -> DataFrame:
    """Skew-safe pages → spans: documents under ``mega_doc_chars`` take the
    zero-shuffle fused path; mega-documents are segmented, salt-chunked
    with halo for scoring, and span-assembled with window operators —
    results identical to the fused path (parity-tested), wall-clock no
    longer bounded by the largest document.

    The split predicate is a native ``length(text)`` filter — both sides
    prune at the scan."""
    from ..operators.score import score_lines_salted

    is_mega = (F.length(F.coalesce(F.col("text"), F.lit(""))) >= mega_doc_chars) | (
        F.length(F.coalesce(F.col("html"), F.lit(b""))) >= mega_doc_chars
    )
    small = pages.filter(~is_mega)
    mega = pages.filter(is_mega)

    small_spans = detect_spans_fused(small, ctx)

    from ..operators.spans import detected_span_text_grouped

    lines = segment_pages(mega, ctx.cfg.html_main_content)
    scored = score_lines_salted(
        lines, ctx.model_bc, ctx.lex_bc, ctx.cfg, chunk_lines=chunk_lines
    )
    mega_spans = detected_span_text_grouped(scored, ctx.cfg)
    return small_spans.unionByName(mega_spans)


def detect_with_metrics(pages: DataFrame, ctx: DetectContext):
    """Fused detection instrumented with ``Observation`` counters — the
    map-side lineage metrics (no extra job): pages/bytes in, spans/lines
    out. Returns (spans_df, metrics_fn); call ``metrics_fn()`` after an
    action on the returned DataFrame."""
    from pyspark.sql import Observation

    obs_in = Observation("pages_in")
    obs_out = Observation("spans_out")
    observed_pages = pages.observe(
        obs_in,
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(
            F.length(F.coalesce(F.col("text"), F.lit("")))
            + F.length(F.coalesce(F.col("html"), F.lit(b"")))
        ).alias("n_content_bytes"),
    )
    spans = detect_spans_fused(observed_pages, ctx).observe(
        obs_out,
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.size("tags")).alias("n_span_lines"),
    )

    def metrics() -> dict:
        return {**obs_in.get, **obs_out.get}

    return spans, metrics


def detected_text_df(spans: DataFrame) -> DataFrame:
    from ..operators.spans import detected_text_per_url

    return detected_text_per_url(spans)
