"""n-fold cross-validation (reference `nfold`, igtdetect.py:1579-1664):
seeded shuffle of the document list, ``nfold_ratio`` train/test split
rotated ``nfold_iters`` times, features extracted ONCE and reused across
iterations (the reference's one explicit cache-this-subplan optimization →
``persist()`` here), mean/σ of the per-iteration metrics.

The shuffle is the deterministic Spark mirror of the reference's seeded
``Random.shuffle``: ``orderBy(xxhash64(url, lit(seed)))`` — stable across
cluster sizes and partitionings.
"""

from __future__ import annotations

import statistics
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..featurespec import Lexicons
from ..labels import handle_label
from ..training import train_model


@dataclass
class NfoldResult:
    iteration: int
    accuracy: float
    non_o_precision: float
    non_o_recall: float
    non_o_f1: float


def seeded_doc_order(urls: list[str], seed: int) -> list[str]:
    """Deterministic shuffle by hash — same result on any cluster."""
    import hashlib

    def h(u):
        return hashlib.md5(f"{seed}|{u}".encode()).hexdigest()

    return sorted(urls, key=h)


def run_nfold(
    widened: DataFrame,
    ratio: float = 0.9,
    iters: int = 10,
    seed: int = 232,
    max_features: int = 5000,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[list[NfoldResult], dict]:
    """``widened``: the training features DF (url, line_no, features_ctx,
    bi_tag, norm_label) — extracted once, persisted, rotated.

    Returns per-iteration metrics + mean/σ summary (reference
    igtdetect.py:1652-1664)."""
    widened = widened.persist()
    urls = [r["url"] for r in widened.select("url").distinct().collect()]
    order = seeded_doc_order(urls, seed)
    n = len(order)
    n_test = max(1, int(round(n * (1 - ratio))))

    results: list[NfoldResult] = []
    for it in range(iters):
        # rotation: shift the test window (reference rotates
        # extracted_docs = test + train each iteration)
        start = (it * n_test) % n
        test_urls = set(
            order[(start + k) % n] for k in range(n_test)
        )
        rows = widened.select(
            "url", "line_no", "features_ctx", "norm_label"
        ).orderBy("url", "line_no").collect()
        train_fds, train_labels = [], []
        test_by_url: dict[str, list] = {}
        for r in rows:
            fd = {f: True for f in r["features_ctx"]}
            if r["url"] in test_urls:
                # rows arrive (url, line_no)-ordered → doc line order holds
                test_by_url.setdefault(r["url"], []).append(
                    (fd, r["norm_label"])
                )
            else:
                train_fds.append(fd)
                train_labels.append(r["norm_label"])
        model = train_model(
            train_fds, train_labels, max_features=max_features, iters=300
        )

        import numpy as np

        from ..refmodel import split_prefix

        ok = tot = 0
        dno = gno = ono = 0
        for url, items in test_by_url.items():
            X = np.zeros((len(items), model.n_base))
            for i, (fd, _) in enumerate(items):
                for name in fd:
                    ctx, base = split_prefix(name)
                    if ctx == "cur" and not base.startswith("prev_tag_"):
                        j = model.base_index.get(base)
                        if j is not None:
                            X[i, j] = 1.0
            preds = model.predict_doc(X)
            for (fd, gold), p in zip(items, preds):
                tot += 1
                ok += gold == p
                if gold == p and gold != "O":
                    dno += 1
                if p != "O":
                    gno += 1
                if gold != "O":
                    ono += 1
        p = dno / gno if gno else 0
        r = dno / ono if ono else 0
        f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0
        results.append(
            NfoldResult(it, ok / tot if tot else 0, p, r, f1)
        )

    def mean_std(vals):
        return (
            statistics.mean(vals),
            statistics.stdev(vals) if len(vals) > 1 else 0.0,
        )

    summary = {
        "accuracy": mean_std([x.accuracy for x in results]),
        "non_o_f1": mean_std([x.non_o_f1 for x in results]),
        "iters": iters,
        "ratio": ratio,
        "seed": seed,
    }
    widened.unpersist()
    return results, summary
