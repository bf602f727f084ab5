"""Label normalization as native Column expressions (SQL-visible).

Mirrors ``labels.handle_label`` (reference igtdetect.py:307-345) with
nested when/otherwise + regexp/substring expressions — runs in Tungsten,
no Python. Parity-tested against the pure-Python ``labels.handle_label``
over the full observed label alphabet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def normalize_label_col(
    col: Column,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> Column:
    # 1) noisy '*' prefix
    if cfg.skip_noisy:
        lab = F.when(col.startswith("*"), F.lit("O")).otherwise(col)
    else:
        lab = F.when(
            col.startswith("*"), F.substring(col, 2, 1 << 20)
        ).otherwise(col)
    # 2) '+FLAG' suffixes
    if cfg.strip_flags:
        lab = F.when(lab.contains("+"), F.substring_index(lab, "+", 1)).otherwise(lab)
    # 3) B-/I- prefixes
    if not cfg.use_bi_labels:
        lab = F.regexp_replace(lab, "^[BI]-", "")
    # 4) multi-labels: keep only the first '-'-joined class (preserving a
    #    retained B-/I- prefix)
    if not cfg.use_multi_labels:
        lab = F.when(
            lab.rlike("^[BI]-"),
            F.concat(
                F.substring(lab, 1, 2),
                F.substring_index(F.substring(lab, 3, 1 << 20), "-", 1),
            ),
        ).otherwise(F.substring_index(lab, "-", 1))
    return lab


def basic_label_col(col: Column) -> Column:
    """strip everything → O/L/G/T/M (reference basic_label :297-302)."""
    lab = F.when(col.startswith("*"), F.lit("O")).otherwise(col)
    lab = F.when(lab.contains("+"), F.substring_index(lab, "+", 1)).otherwise(lab)
    lab = F.regexp_replace(lab, "^[BI]-", "")
    return F.substring_index(lab, "-", 1)
