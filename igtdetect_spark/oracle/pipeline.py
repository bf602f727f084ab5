"""Single-node oracle pipeline: freki doc → features → predictions → spans.

Mirrors the reference's ``test`` lifecycle (SURVEY.md §3.1) line-for-line in
pure Python. This is the executable specification the Spark engine is
byte-compared against.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..featurespec import (
    Lexicons,
    EMPTY_LEXICONS,
    fired,
    overlap_features,
    freki_features,
    render_svmlight,
    split_words,
    text_features,
    widen_context,
)
from ..labels import handle_label, prev_label_feat
from ..refmodel import ModelWeights, split_prefix
from .freki import FrekiDoc, FrekiInfo


@dataclass
class LineInstance:
    lineno: int
    label: str          # full (possibly BI-rewritten, starred) label
    norm_label: str     # handle_label()-normalized label
    feats: dict[str, bool]

    def fired(self) -> list[str]:
        return fired(self.feats)

    def svmlight(self) -> str:
        return render_svmlight(self.label, self.feats)


def extract_doc_features(
    doc: FrekiDoc,
    lex: Lexicons = EMPTY_LEXICONS,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[LineInstance]:
    """Per-line widened feature dicts + (BI-rewritten) labels for one doc —
    the reference ``write_instances`` (igtdetect.py:409-526), including its
    in-place ``line.tag`` BI mutation and the prev_tag feature drawn from
    the *mutated* previous tag."""
    fi = FrekiInfo.from_doc(doc)
    lines = list(doc.lines())

    # pass 1: per-line base features (igtdetect.py:443-476)
    feat_dict: dict[int, dict[str, bool]] = {}
    prev_words: Optional[set[str]] = None
    for line in lines:
        feats: dict[str, bool] = {}
        if cfg.text_feats_enabled:
            cur_words = split_words(line.text)
            feats = text_features(line.text, lex, cfg, words=cur_words)
            feats.update(overlap_features(cur_words, prev_words, cfg))
            prev_words = set(cur_words)
        if cfg.freki_feats_enabled:
            prev_line = doc.get_line(line.lineno - 1)
            next_line = doc.get_line(line.lineno + 1)
            iscore = line.attrs.get("iscore")
            feats.update(
                freki_features(
                    page=line.block.page,
                    block_id=line.block.block_id,
                    llx=line.block.llx,
                    fonts=line.fonts,
                    iscore=float(iscore) if iscore is not None else None,
                    prev_block_id=prev_line.block.block_id if prev_line else None,
                    next_block_id=next_line.block.block_id if next_line else None,
                    doc_llx_mode=fi.llx,
                    doc_def_font=fi.def_font,
                    cfg=cfg,
                )
            )
        feat_dict[line.lineno] = feats

    # pass 2: BI label rewrite + context widening + prev_tag (:479-523)
    instances: list[LineInstance] = []
    for idx, line in enumerate(lines):
        label = line.tag
        noisy = label.startswith("*")
        if noisy:
            label = label.replace("*", "")

        if "O" not in label:
            prev_line = doc.get_line(line.lineno - 1)
            if (
                line.span_id
                and prev_line
                and prev_line.span_id
                and line.span_id == prev_line.span_id
            ):
                bi_status = "I"
            else:
                bi_status = "B"
            label = f"{bi_status}-{label}"
            if noisy:
                label = "*" + label
            line.tag = label  # reference mutates the doc (igtdetect.py:504)

        all_feats = widen_context(feat_dict, line.lineno, cfg)

        if cfg.prev_tag:
            prev_tag = "O" if idx == 0 else lines[idx - 1].tag
            all_feats[prev_label_feat(prev_tag)] = True

        instances.append(
            LineInstance(
                lineno=line.lineno,
                label=label,
                norm_label=handle_label(label, cfg),
                feats=all_feats,
            )
        )
    return instances


# ---------------------------------------------------------------------------
# Scoring / decode
# ---------------------------------------------------------------------------

def _base_matrix(instances: list[LineInstance], model: ModelWeights) -> np.ndarray:
    """L×B indicator matrix over *base* (unprefixed, non-prev_tag) fired
    features. Context prefixes are reapplied by the weight decomposition."""
    X = np.zeros((len(instances), model.n_base), dtype=np.float64)
    idx = model.base_index
    for i, inst in enumerate(instances):
        for name, v in inst.feats.items():
            if not v:
                continue
            ctx, base = split_prefix(name)
            # context copies are re-derived from the weight decomposition;
            # stored prev_tag* features are filtered before scoring
            # (feat_filter, igtdetect.py:1144)
            if ctx != "cur" or base.startswith("prev_tag_"):
                continue
            j = idx.get(base)
            if j is not None:
                X[i, j] = 1.0
    return X


def score_doc(
    instances: list[LineInstance],
    model: ModelWeights,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[list[str], np.ndarray]:
    """Predict per-line labels for one document.

    Batch path (exact when the model vocabulary has no ``prev_tag_*``
    features — true for the reference pretrained models): one numpy matrix
    product chain. Sequential path otherwise: strict left-to-right greedy
    decode feeding each predicted label forward as ``prev_tag_<cls>``
    (reference cw.test with prev_label_func, igtdetect.py:1140-1146).

    Returns (labels, probability matrix L×C).
    """
    X = _base_matrix(instances, model)
    has_prev_tag = any(n.startswith("prev_tag_") for n in model.base_index)
    use_sequential = cfg.prev_tag and has_prev_tag

    if not use_sequential:
        d = model.decision_doc(X)
        probs = model.probabilities(d)
        labels = [model.classes[i] for i in d.argmax(axis=1)]
        return labels, probs

    # sequential greedy decode
    L = X.shape[0]
    d_static = model.decision_doc(X)  # context terms are label-independent
    labels: list[str] = []
    probs = np.zeros_like(d_static)
    prev_label = "O"
    for n in range(L):
        dn = d_static[n].copy()
        j = model.base_index.get(prev_label_feat(prev_label))
        if j is not None:
            dn += model.w_cur[:, j]
        k = int(dn.argmax())
        probs[n] = model.probabilities(dn[None, :])[0]
        prev_label = model.classes[k]
        labels.append(prev_label)
    return labels, probs


# ---------------------------------------------------------------------------
# Span assignment + detected-text assembly
# ---------------------------------------------------------------------------

def assign_spans(doc: FrekiDoc, tags: list[str]) -> None:
    """Contiguous non-O runs get ``s1, s2, …`` span ids; O lines get None
    (reference assign_spans, igtdetect.py:906-933 — note ids are 1-based
    here, while gold spans in the samples start at s0; ids are never
    compared across systems, only line-number tuples are)."""
    num_spans = 0
    last_tag = "O"
    for i, line in enumerate(doc.lines()):
        if "O" not in tags[i]:
            if "O" in last_tag or tags[i].startswith("B-"):
                num_spans += 1
            line.span_id = f"s{num_spans}"
        else:
            line.span_id = None
        last_tag = tags[i]


@dataclass
class DetectedSpan:
    span_no: int
    start_line: int
    end_line: int
    tags: list[str]
    block_ids: list[str]   # distinct, first-occurrence order
    text: str              # rendered span text (block-level, deduped)


def detect_spans(
    doc: FrekiDoc,
    tags: list[str],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[DetectedSpan]:
    """Detected-IGT assembly (reference classify_docs loop,
    igtdetect.py:1241-1276): accumulate blocks of consecutive non-O lines
    keyed by block_id (OrderedDict dedup), flush when an O line is hit.

    Reference quirk kept by default: a span still open at EOF is never
    flushed (no post-loop flush in the reference) — ``cfg.flush_eof_span``
    enables the fix.
    """
    lines = list(doc.lines())
    spans: list[DetectedSpan] = []
    cur_blocks: "OrderedDict[str, object]" = OrderedDict()
    cur_lines: list[tuple[int, str]] = []

    def flush():
        if not cur_blocks:
            return
        text = "\n".join(b.render_text() for b in cur_blocks.values())
        spans.append(
            DetectedSpan(
                span_no=len(spans) + 1,
                start_line=cur_lines[0][0],
                end_line=cur_lines[-1][0],
                tags=[t for _, t in cur_lines],
                block_ids=list(cur_blocks.keys()),
                text=text,
            )
        )

    for line, tag in zip(lines, tags):
        if tag == "O":
            if cur_blocks:
                flush()
                cur_blocks = OrderedDict()
                cur_lines = []
        else:
            cur_blocks[line.block.block_id] = line.block
            cur_lines.append((line.lineno, tag))

    if cfg.flush_eof_span and cur_blocks:
        flush()

    return spans


def detected_text(spans: list[DetectedSpan]) -> str:
    """Per-url concatenated detected text — the byte-parity unit
    (BASELINE.json north_star). Blank line after each span mirrors the
    reference's file layout (igtdetect.py:1269-1271)."""
    return "".join(s.text + "\n\n" for s in spans)


def run_doc(
    doc: FrekiDoc,
    model: ModelWeights,
    lex: Lexicons = EMPTY_LEXICONS,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Full oracle `test` lifecycle for one document."""
    instances = extract_doc_features(doc, lex, cfg)
    labels, probs = score_doc(instances, model, cfg)
    spans = detect_spans(doc, labels, cfg)
    return instances, labels, spans
