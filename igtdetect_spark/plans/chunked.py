"""Chunked mega-document detection: the scalable skew path.

``detect_spans_salted`` (line-level chunk scoring + windowed assembly)
pays two full-data shuffles and a doc-serial span-assembly task. This
strategy keeps everything *narrow* except one balance repartition of text
chunks:

1. **split** (mapInPandas, narrow): segment each mega page once
   (columnar), cut at block boundaries near every ``chunk_lines`` mark
   (blocks never straddle chunks), and emit chunk rows carrying the text
   slice, a ≤2-line feature halo with its ORIGINAL block identity/llx
   (so the first real lines' adjacency/layout context is exact), and the
   document-global line/block offsets.
2. **repartition** the chunk rows (the only full-data shuffle) so one
   document's chunks spread across the cluster.
3. **fused kernel per chunk** (narrow): re-segmentation of the slice +
   offsets reproduces document-global line numbers and block ids
   (blocks are chunk-contained, so per-block llx matches the original);
   halo rows provide n−2/n−1 context and are dropped before span
   assembly; chunk-local spans are assembled with the EOF flush forced
   on.
4. **stitch** (groupBy url over SPANS only — a few rows per document):
   merge spans adjacent across chunk boundaries, renumber, re-apply the
   reference EOF quirk doc-globally.

Batch-mode models only (sequential decode cannot cross chunks — refused,
like the salted path); ``cfg.word_overlap`` is refused too (the 2-line
halo cannot reproduce unbounded backward overlap context). Mega documents
containing form-feed page breaks fall back to the fused whole-document
path (the chunk frame hardcodes page=1; web text has no \\f, so the
fallback is cold). Bit-parity with the fused path is tested with forced
multi-chunk documents.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..operators.schema import SPANS_SCHEMA
from ..operators.segment import _plain_frame
from ..operators.vectorized import (
    base_feature_matrix,
    score_matrix,
    spans_from_labels,
)
from ..refmodel import ModelWeights
from ..segmentation import extract_page_text, segment_text_columns
from .pipeline import DetectContext, detect_spans_fused

_HALO_TYPE = StructType(
    [
        StructField("text", StringType()),
        StructField("block_no", IntegerType()),   # doc-global block ordinal
        StructField("block_llx", DoubleType()),
        StructField("line_llx", DoubleType()),
        # true neighbors OUTSIDE the chunk frame (frame-edge adjacency —
        # these rows feed context into real lines, so their own
        # prev/next_line_same_block features must be exact)
        StructField("prev_block_no", IntegerType(), True),
        StructField("next_block_no", IntegerType(), True),
    ]
)

_CHUNK_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("chunk_no", IntegerType(), False),
        StructField("line_offset", IntegerType(), False),
        StructField("block_offset", IntegerType(), False),
        StructField("doc_last_line", IntegerType(), False),
        StructField("doc_llx_mode", DoubleType(), True),
        StructField("halo_pre", ArrayType(_HALO_TYPE), False),
        StructField("halo_post", ArrayType(_HALO_TYPE), False),
        StructField("text", StringType(), False),
    ]
)

_SPAN_COLS = [f.name for f in SPANS_SCHEMA.fields]


def split_mega_pages(
    pages: DataFrame, chunk_lines: int, html_main_content: bool = False
) -> DataFrame:
    """mega pages → chunk rows (one segmentation pass per doc, narrow)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..oracle.freki import safe_mode

        for pdf in batches:
            rows = []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                content = extract_page_text(
                    bytes(html) if html is not None else None, text,
                    html_main_content=html_main_content,
                )
                c = segment_text_columns(content)
                n = len(c["line_no"])
                if n == 0:
                    continue
                llx_mode = safe_mode(c["block_llx"])
                texts, bids = c["text"], c["block_id"]
                bllx, lllx = c["block_llx"], c["line_llx"]
                # doc-global block ordinal per line
                block_ord = [0] * n
                for i in range(1, n):
                    block_ord[i] = block_ord[i - 1] + (bids[i] != bids[i - 1])
                # cut AFTER the block containing each chunk_lines mark
                cuts = [0]
                k = chunk_lines
                while k < n:
                    j = k
                    while j < n and bids[j] == bids[j - 1]:
                        j += 1
                    if j >= n:
                        break
                    cuts.append(j)
                    k = j + chunk_lines
                cuts.append(n)
                for ci in range(len(cuts) - 1):
                    a, b = cuts[ci], cuts[ci + 1]
                    def mk_halo(lo, hi):
                        return [
                            {
                                "text": texts[i],
                                "block_no": block_ord[i],
                                "block_llx": bllx[i],
                                "line_llx": lllx[i],
                                "prev_block_no": block_ord[i - 1] if i > 0 else None,
                                "next_block_no": block_ord[i + 1] if i + 1 < n else None,
                            }
                            for i in range(max(0, lo), min(hi, n))
                        ]

                    # prev/prev_prev context for the first lines + next
                    # context for the last line
                    halo = mk_halo(a - 2, a)
                    halo_post = mk_halo(b, b + 1)
                    # block-aware slice text: re-insert the blank-line
                    # separators so re-segmentation reproduces the original
                    # block structure
                    parts: list[str] = []
                    for i in range(a, b):
                        if i > a and bids[i] != bids[i - 1]:
                            parts.append("")
                        parts.append(texts[i])
                    rows.append(
                        {
                            "url": url,
                            "chunk_no": ci,
                            "line_offset": a,
                            "block_offset": block_ord[a] if a < n else 0,
                            "doc_last_line": n,
                            "doc_llx_mode": llx_mode,
                            "halo_pre": halo,
                            "halo_post": halo_post,
                            "text": "\n".join(parts),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _CHUNK_SCHEMA.fields]
            )

    return pages.select("url", "html", "text").mapInPandas(
        gen, schema=_CHUNK_SCHEMA
    )


def chunking_refusal(ctx: DetectContext) -> str | None:
    """Why this model/config cannot be chunked (None = chunkable).
    Shared by detect_spans_chunked (raises) and detect_spans_auto
    (falls back to the fused whole-document path)."""
    probe = ModelWeights.from_broadcastable(ctx.model_bc.value)
    if ctx.cfg.prev_tag and any(
        k.startswith("prev_tag_") for k in probe.base_index
    ):
        return (
            "detect_spans_chunked cannot chunk a sequential (prev_tag) "
            "model — use the whole-document paths"
        )
    if ctx.cfg.word_overlap:
        # The 2-line pre-halo gives the first halo line no previous line,
        # so its overlap features (and the first body line's prev_prev_
        # context) can diverge from the fused path. Refuse rather than
        # silently mis-score.
        return (
            "detect_spans_chunked does not support cfg.word_overlap — "
            "overlap features need unbounded backward context; use the "
            "whole-document paths"
        )
    return None


def detect_spans_chunked(
    pages: DataFrame,
    ctx: DetectContext,
    chunk_lines: int = 20_000,
    mega_doc_chars: int = 1_000_000,
    chunk_waves: int = 4,
) -> DataFrame:
    """Skew-safe pages → spans with chunk-parallel everything (see module
    docstring). Small docs keep the zero-shuffle fused path."""
    cfg = ctx.cfg
    model_bc, lex_bc = ctx.model_bc, ctx.lex_bc
    reason = chunking_refusal(ctx)
    if reason:
        raise ValueError(reason)

    is_mega = (
        F.length(F.coalesce(F.col("text"), F.lit(""))) >= mega_doc_chars
    ) | (F.length(F.coalesce(F.col("html"), F.lit(b""))) >= mega_doc_chars)
    # Form-feed page breaks break the chunk frame's page=1 assumption —
    # mega docs containing \f (in text OR raw html, conservatively) fall
    # back to the fused whole-document path instead of silently diverging.
    has_ff = F.coalesce(F.col("text"), F.lit("")).contains("\f") | F.coalesce(
        F.col("html").cast("string"), F.lit("")
    ).contains("\f")
    is_chunkable = is_mega & ~has_ff
    # Mega docs are RARE by definition — running the split over the
    # input table's full partition count means hundreds of empty Python
    # tasks that each still pay the worker boot round-trip. Coalesce
    # (narrow, no shuffle) to ~cores tasks; the per-doc split work is
    # what parallelizes, not the scan. The chunk shuffle likewise gets
    # an explicit width: 2 waves per core beats inheriting
    # spark.sql.shuffle.partitions (128 mostly-empty tasks when a corpus
    # has a handful of megas).
    par = pages.sparkSession.sparkContext.defaultParallelism
    # The SMALL-doc branch needs the same treatment: a skewed corpus is
    # typically few docs + a straggler, so inheriting the input table's
    # partition count (e.g. 256) turns ~2k small docs into hundreds of
    # near-empty Python tasks whose boot round-trips dominate the branch
    # (measured: 2.39 s → ~1.1 s at 8 cores on the deep-skew ladder
    # corpus). Two waves per core keeps full parallelism.
    # The .repartition(par) of the (tiny) span rows is NOT for balance —
    # it puts the whole small-doc scan+score on the MAP side of an
    # exchange, making it an independent shuffle query stage that AQE
    # materializes CONCURRENTLY with the mega split stage. Without it
    # the fused branch is narrow all the way into the result stage and
    # runs only after split+score complete — measured: the whole job
    # serializes split(1.3 s, one busy task) → score → small+stitch,
    # with 7 idle cores during the split straggler.
    small_spans = detect_spans_fused(
        pages.filter(~is_chunkable).coalesce(max(2, 2 * par)), ctx
    ).repartition(max(2, par))
    chunks = split_mega_pages(
        pages.filter(is_chunkable).coalesce(max(2, par)),
        chunk_lines,
        cfg.html_main_content,
    ).repartition(chunk_waves * par, "url", "chunk_no")
    # ^ hash balance with OVERDECOMPOSITION (default 4 waves/core): a mega doc
    # yields few chunks relative to cores (e.g. 20 chunks at 8 cores),
    # and hash placement is balls-into-bins — at 2 bins/core the
    # expected max bin holds ~3 chunks (score stage runs at ~2/3
    # parallelism); at 4 bins/core bins hold ≤2 and the scheduler
    # load-balances the tail dynamically. The two non-hash balancers
    # were MEASURED WORSE and rejected: round-robin repartition pays
    # Spark's determinism sort comparing whole rows (megabyte text
    # columns included), and repartitionByRange pays a sampling pass
    # that re-executes the split mapInPandas a second time.

    def score_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = ModelWeights.from_broadcastable(model_bc.value)
        lex = lex_bc.value
        flush_cfg = cfg.with_(flush_eof_span=True)
        for pdf in batches:
            out_frames = []
            for r in pdf.itertuples(index=False):
                halo = list(r.halo_pre)
                post = list(r.halo_post)
                n_halo = len(halo)
                n_post = len(post)
                c = segment_text_columns(r.text)
                n_body = len(c["line_no"])
                if n_body == 0:
                    continue
                n = n_halo + n_body + n_post
                # document-global ids: halo carries its original identity;
                # body blocks are chunk-contained so re-segmentation + the
                # block offset reproduces the original block structure
                def h(f, x):
                    return x[f] if isinstance(x, dict) else getattr(x, f)

                line_no = (
                    [r.line_offset - n_halo + i + 1 for i in range(n_halo)]
                    + [x + r.line_offset for x in c["line_no"]]
                    + [r.line_offset + n_body + i + 1 for i in range(n_post)]
                )
                block_key = (
                    [f"1-{h('block_no', x) + 1}" for x in halo]
                    + [
                        f"1-{int(b.split('-', 1)[1]) + r.block_offset}"
                        for b in c["block_id"]
                    ]  # matches the fused path's single-page numbering
                    + [f"1-{h('block_no', x) + 1}" for x in post]
                )
                llx = (
                    [h("block_llx", x) for x in halo]
                    + c["block_llx"]
                    + [h("block_llx", x) for x in post]
                )
                line_llx = (
                    [h("line_llx", x) for x in halo]
                    + c["line_llx"]
                    + [h("line_llx", x) for x in post]
                )
                texts = (
                    [h("text", x) for x in halo]
                    + c["text"]
                    + [h("text", x) for x in post]
                )
                prev_ids = [None] + block_key[:-1]
                next_ids = block_key[1:] + [None]
                # frame-edge adjacency from the halo's true neighbors
                if halo and h("prev_block_no", halo[0]) is not None:
                    prev_ids[0] = f"1-{h('prev_block_no', halo[0]) + 1}"
                if post and h("next_block_no", post[-1]) is not None:
                    next_ids[-1] = f"1-{h('next_block_no', post[-1]) + 1}"
                frame = _plain_frame(
                    {
                        "url": [r.url] * n,
                        "line_no": line_no,
                        "page": [1] * n,
                        "block_id": block_key,
                        "llx": llx,
                        "line_llx": line_llx,
                        "text": texts,
                        "prev_block_id": prev_ids,
                        "next_block_id": next_ids,
                        "doc_llx_mode": [r.doc_llx_mode] * n,
                    }
                )
                X = base_feature_matrix(frame, lex, cfg, model)
                labels, _ = score_matrix(X, model, cfg)
                body = slice(n_halo, n_halo + n_body)
                rows = spans_from_labels(
                    [r.url] * n_body,
                    line_no[body],
                    block_key[body],
                    texts[body],
                    labels[body],
                    [(r.url, 0, n_body)],
                    flush_cfg,
                )
                for row in rows:
                    row["_doc_last"] = r.doc_last_line
                if rows:
                    out_frames.append(pd.DataFrame(rows))
            cols = _SPAN_COLS + ["_doc_last"]
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)[cols]
            else:
                yield pd.DataFrame(columns=cols)

    chunk_spans_schema = StructType(
        list(SPANS_SCHEMA.fields) + [StructField("_doc_last", IntegerType())]
    )
    chunk_spans = chunks.mapInPandas(score_chunk, schema=chunk_spans_schema)

    # Stitch NATIVELY (round-5: was a groupBy(url).applyInPandas — the
    # deep-skew Amdahl decomposition put ~1 s of the serial tail in the
    # 4-stage split→balance→score→stitch barrier chain, and the stitch
    # stage's Python-worker boot + Arrow round-trip was the removable
    # part). The span relation is a few rows per document, so the whole
    # merge is a gaps-and-islands window + one aggregate: adjacent
    # chunk-local spans (prev end_line + 1 == start_line) join into one
    # island; per island the chunk pieces concatenate in start_line
    # order (spans are disjoint per url, so start_line is a total
    # order); the reference EOF quirk drops a doc's LAST merged span
    # when it touches the final line and flush is off. One exchange on
    # url — the island aggregate and the renumber window reuse its
    # partitioning.
    w = Window.partitionBy("url").orderBy("start_line")
    flagged = (
        chunk_spans.withColumn("_pe", F.lag("end_line").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_pe").isNull()
                | (F.col("_pe") + 1 != F.col("start_line")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    pieces = F.array_sort(
        F.collect_list(
            F.struct("start_line", "tags", "block_ids", "text")
        )
    )
    islands = flagged.groupBy("url", "_isl").agg(
        F.min("start_line").alias("start_line"),
        F.max("end_line").alias("end_line"),
        pieces.alias("_ps"),
        F.first("_doc_last").alias("_doc_last"),
    )
    merged = islands.select(
        "url",
        "start_line",
        "end_line",
        F.flatten(F.col("_ps.tags")).alias("tags"),
        F.flatten(F.col("_ps.block_ids")).alias("block_ids"),
        F.array_join(F.col("_ps.text"), "\n").alias("text"),
        "_doc_last",
    )
    if not cfg.flush_eof_span:
        w_url = Window.partitionBy("url")
        merged = merged.withColumn(
            "_last_start", F.max("start_line").over(w_url)
        ).filter(
            ~(
                (F.col("start_line") == F.col("_last_start"))
                & (F.col("end_line") >= F.col("_doc_last"))
            )
        )
    mega_spans = merged.select(
        "url",
        F.row_number().over(w).alias("span_no"),
        "start_line",
        "end_line",
        "tags",
        "block_ids",
        "text",
    )
    return small_spans.unionByName(mega_spans)


# Auto path-selection cost model. All quantities in characters of page
# content:
#   fused_wall   ≈ max(tot/C, mx) · rate
#   chunked_wall ≈ (seg_serial(mx) ≈ 0.2·mx + ~1.5·tot/C) · rate + fixed
# ⇒ chunk pays only when the straggler's scoring time clears both its
# fair share and the chunk machinery's fixed overhead (split pass +
# chunk shuffle + stitch ≈ 8M chars of scoring). Re-measured round 3
# at local[8] AFTER the worker boot-tax fix (pydaemon) + the coalesced
# split (both paths were previously carrying ~6 s of hidden per-task
# boot): ten 4M-char megas — fused 6.4 s vs chunked 8.1 s (fused
# correctly chosen); one 16M-char mega — fused 13.6 s vs chunked 6.6 s
# (chunked correctly chosen). Span counts bit-identical across paths.
AUTO_OVERHEAD_CHARS = 8_000_000
AUTO_FAIRSHARE_FACTOR = 0.6


def choose_detect_path(
    max_chars: int,
    total_chars: int,
    cores: int,
    overhead_chars: int = AUTO_OVERHEAD_CHARS,
    fairshare_factor: float = AUTO_FAIRSHARE_FACTOR,
) -> str:
    """'fused' or 'chunked' from corpus shape (pure function — unit
    tested). Chunk iff the biggest document exceeds a core's fair share
    by more than the chunk machinery's fixed overhead."""
    if cores < 2:
        return "fused"
    fair = total_chars / cores
    if max_chars > fairshare_factor * fair + overhead_chars:
        return "chunked"
    return "fused"


def corpus_char_stats(pages: DataFrame) -> tuple[int, int]:
    """(max_chars, total_chars) of page content — ONE narrow aggregate.
    At warehouse scale these are table statistics (ANALYZE TABLE /
    Iceberg column metrics); compute once and pass to detect_spans_auto
    rather than re-scanning per invocation."""
    ln = F.greatest(
        F.length(F.coalesce(F.col("text"), F.lit(""))),
        F.length(F.coalesce(F.col("html"), F.lit(b""))),
    )
    st = pages.select(
        F.max(ln).alias("mx"), F.sum(ln).alias("tot")
    ).collect()[0]
    return int(st["mx"] or 0), int(st["tot"] or 0)


def detect_spans_auto(
    pages: DataFrame,
    ctx: DetectContext,
    cores: int | None = None,
    chunk_lines: int | None = None,
    overhead_chars: int = AUTO_OVERHEAD_CHARS,
    stats: "tuple[int, int] | None" = None,
) -> DataFrame:
    """Skew-aware pages → spans: pick fused vs chunked from the corpus
    shape instead of always paying chunk overhead.

    Corpus shape comes from ``stats=(max_chars, total_chars)`` when the
    caller has table statistics (the warehouse case — Iceberg column
    metrics are free), else from one narrow ``corpus_char_stats`` pass.
    The decision feeds ``choose_detect_path``; models the chunk frame
    cannot reproduce (sequential decode, word_overlap) always take the
    fused path. When chunking wins, ``chunk_lines`` defaults to spreading
    the biggest document over ~2 chunks per core (floor 2,500 so
    per-chunk overhead stays amortized), and only docs beyond twice their
    fair share are chunked.

    A straggler-first rearrangement (round-robin the big docs into the
    stage's first partitions so they start at t=0 — LPT via partition
    order) was measured and REJECTED: the repartition introduces a
    stage barrier plus a full extra scan, costing ~2× more than the
    packing win at realistic skew (8 cores, ten 4M-char megas: plain
    5.1 s vs rearranged 10.0 s, identical spans). With hundreds of
    partitions the scheduler's dynamic packing already absorbs most of
    the straggler tail; the packing bound that remains is the corpus's
    own (see BENCH/BASELINE.md).
    """
    spark = pages.sparkSession
    cores = cores or spark.sparkContext.defaultParallelism
    mx, tot = stats if stats is not None else corpus_char_stats(pages)

    if (
        chunking_refusal(ctx) is None
        and choose_detect_path(mx, tot, cores, overhead_chars) == "chunked"
    ):
        est_mx_lines = max(mx // 40, 1)  # ~40 chars/line of web text
        chunk_lines = chunk_lines or max(2_500, est_mx_lines // (2 * cores))
        mega_doc_chars = max(int(2 * tot / cores), 200_000)
        return detect_spans_chunked(
            pages, ctx, chunk_lines=chunk_lines,
            mega_doc_chars=mega_doc_chars,
        )

    return detect_spans_fused(pages, ctx)
