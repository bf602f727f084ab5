"""Segmentation operator: ``pages`` → ``lines`` (SURVEY.md §2.1 Freki scan).

``mapInPandas`` over pages batches — each input row is a whole document, so
segmentation, doc-level stats (llx mode / default font, deterministic
first-occurrence tie-break) and line adjacency (prev/next block id) are all
computed document-locally and denormalized onto the emitted rows. The
feature stage downstream therefore needs **no shuffle, no window, no join**
— the one shape that survives a 1000-executor 100 TB scan unchanged.

A generic window/agg path for pre-sharded line tables lives in
``doc_stats.py``; both are parity-tested against the oracle.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.freki import FrekiDoc, parse_freki, safe_mode
from ..segmentation import DEFAULT_FONT, extract_page_text, segment_text
from .schema import LINES_SCHEMA

_COLS = [f.name for f in LINES_SCHEMA.fields]


def _rows_for_text(url: str, text: str) -> Iterable[dict]:
    segs = segment_text(text)
    if not segs:
        return
    # plain text carries no font info → every line gets the default font,
    # which is then also the doc default (font features can never fire,
    # like a single-font freki doc)
    llx_mode = safe_mode([s.block_llx for s in segs])
    fid, fsize = DEFAULT_FONT
    n = len(segs)
    for i, s in enumerate(segs):
        yield {
            "url": url,
            "line_no": s.line_no,
            "page": s.page,
            "block_id": s.block_id,
            "llx": s.block_llx,
            "line_llx": s.line_llx,
            "text": s.text,
            "fonts": [{"font_id": fid, "size": fsize}],
            "tag": "O",
            "span_id": None,
            "lang_name": None,
            "lang_code": None,
            "iscore": None,
            "attrs": None,
            "prev_block_id": segs[i - 1].block_id if i > 0 else None,
            "next_block_id": segs[i + 1].block_id if i < n - 1 else None,
            "doc_llx_mode": llx_mode,
            "def_font_id": fid,
            "def_font_size": fsize,
        }


def rows_for_freki_doc(url: str, doc: FrekiDoc) -> Iterable[dict]:
    """Flatten a parsed FrekiDoc into lines rows (freki-file parity path)."""
    lines = list(doc.lines())
    if not lines:
        return
    def_font = safe_mode(doc.fonts())
    llx_mode = safe_mode(doc.llxs())
    n = len(lines)
    for i, ln in enumerate(lines):
        iscore = ln.attrs.get("iscore")
        yield {
            "url": url,
            "line_no": ln.lineno,
            "page": ln.block.page,
            "block_id": ln.block.block_id,
            "llx": ln.block.llx,
            "line_llx": ln.block.llx,
            "text": ln.text,
            "fonts": [{"font_id": f, "size": s} for f, s in ln.fonts],
            "tag": ln.tag,
            "span_id": ln.span_id,
            "lang_name": ln.lang_name,
            "lang_code": ln.lang_code,
            "iscore": float(iscore) if iscore is not None else None,
            "attrs": dict(ln.attrs) if ln.attrs else None,
            "prev_block_id": lines[i - 1].block.block_id if i > 0 else None,
            "next_block_id": lines[i + 1].block.block_id if i < n - 1 else None,
            "doc_llx_mode": llx_mode,
            "def_font_id": def_font[0] if def_font else None,
            "def_font_size": def_font[1] if def_font else None,
        }


def segment_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → lines DataFrame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                content = extract_page_text(
                    bytes(html) if html is not None else None, text
                )
                rows.extend(_rows_for_text(url, content))
            yield pd.DataFrame(rows, columns=_COLS)

    # only the columns segmentation needs reach Python (column pruning)
    return pages.select("url", "html", "text").mapInPandas(
        gen, schema=LINES_SCHEMA
    )


def segment_freki_files(spark, paths: list[str]) -> DataFrame:
    """Read freki text files (one doc per file) → lines DataFrame.

    Files are read distributed (``spark.read.text`` wholetext) so the
    parser runs on executors.
    """
    raw = spark.read.text(paths, wholetext=True).withColumn(
        "path", F.input_file_name()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, value in zip(pdf["path"], pdf["value"]):
                doc = parse_freki(value)
                url = doc.doc_id or path
                rows.extend(rows_for_freki_doc(url, doc))
            yield pd.DataFrame(rows, columns=_COLS)

    return raw.mapInPandas(gen, schema=LINES_SCHEMA)
