"""Flagship model: a classifier trained on the deterministic synthetic
corpus (seed 42, 40 docs) — used by the driver entry, tests and benches so
that span detection produces meaningful non-trivial output on synthetic
pages (the reference pretrained model relies on ODIN layout cues that
plain webtext lacks; it remains the parity model for the freki sample
docs).

Training is deterministic → the model is identical across processes; it is
trained once per process and memoized.
"""

from __future__ import annotations

import os
from functools import lru_cache

from .config import DEFAULT_CONFIG
from .lexicons import load_reference_lexicons
from .oracle.corpus import doc_from_text, make_corpus
from .oracle.pipeline import extract_doc_features
from .refmodel import ModelWeights, load_model as _load, save_model as _save
from .training import train_model

TRAIN_DOCS = 40
TRAIN_SEED = 42
MODEL_VERSION = 3  # bump when training inputs/config change
_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", f"flagship_model_v{MODEL_VERSION}.npz",
)


@lru_cache(maxsize=1)
def get_lexicons():
    return load_reference_lexicons()


def _train_flagship() -> ModelWeights:
    # Trained WITHOUT the prev_tag feature (like the reference pretrained
    # nobio model): scoring then takes the fully-vectorized batch path
    # everywhere, and the salted chunked-halo skew path is exactly valid
    # (the sequential greedy decode cannot cross chunk boundaries).
    cfg = DEFAULT_CONFIG.with_(prev_tag=False)
    lex = get_lexicons()
    fds, labels = [], []
    for d in make_corpus(TRAIN_DOCS, seed=TRAIN_SEED):
        doc = doc_from_text(d.url, d.text, d.gold_tags)
        for li in extract_doc_features(doc, lex, cfg):
            fds.append(li.feats)
            labels.append(li.norm_label)
    return train_model(fds, labels, max_features=5000, iters=200)


@lru_cache(maxsize=1)
def get_synthetic_model() -> ModelWeights:
    """Deterministic flagship model, cached on disk so every driver
    process (entry smoke / correctness / bench) skips retraining. Training
    is seeded → the artifact is reproducible bit-for-bit (tested)."""
    if os.path.exists(_CACHE_PATH):
        try:
            return _load(_CACHE_PATH)
        except Exception:
            pass  # corrupt/stale cache → retrain
    model = _train_flagship()
    try:
        _save(model, _CACHE_PATH)
    except OSError:
        pass  # read-only checkout → in-memory only
    return model
