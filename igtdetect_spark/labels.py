"""Label micro-grammar (reference handle_label, igtdetect.py:307-345).

Base classes ``O,L,G,T,M``; ``*`` prefix = noisy auto label; ``B-``/``I-``
span-position prefix; ``-``-joined multi-labels (``G-T``); ``+FLAG``
suffixes (``+AC``, ``+LN``, ``+CN``). Pure functions shared by the oracle
and by the Spark column expression in ``functions/labels.py``.
"""

from __future__ import annotations

from .config import DEFAULT_CONFIG, PipelineConfig

LABEL_ORDER = ["O", "B", "I", "L", "L-T", "G", "T", "M"]


def handle_label(label: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Normalize a raw tag according to the label options."""
    new_label = label
    # 1) noisy '*' prefix
    if new_label.startswith("*"):
        if cfg.skip_noisy:
            new_label = "O"
        else:
            new_label = new_label[1:]
    # 2) '+FLAG' suffixes
    if cfg.strip_flags and "+" in new_label:
        new_label = new_label.split("+")[0]
    # 3) B-/I- prefixes
    if not cfg.use_bi_labels and new_label[0:2] in ("B-", "I-"):
        new_label = new_label[2:]
    # 4) multi-labels
    if not cfg.use_multi_labels:
        if new_label[0:2] in ("B-", "I-"):
            new_label = new_label[0:2] + new_label[2:].split("-")[0]
        else:
            new_label = new_label.split("-")[0]
    return new_label


_BASIC_CFG = PipelineConfig(
    use_bi_labels=False, use_multi_labels=False, strip_flags=True, skip_noisy=True
)


def basic_label(label: str) -> str:
    """strip everything → one of O/L/G/T/M (igtdetect.py:297-302)."""
    return handle_label(label, _BASIC_CFG)


def prev_label_feat(label: str) -> str:
    return "prev_tag_" + basic_label(label)


def label_sort_key(label: str) -> float:
    """Custom class order, unknown → +inf (igtdetect.py:862-867)."""
    try:
        return LABEL_ORDER.index(label)
    except ValueError:
        return float("inf")
