"""Microbench: the winnowing kernel's vectorized codepoint extraction
(np.frombuffer over utf-32-le) vs the per-char ord() loop it replaced
(same outputs, pinned in
tests/test_misc_operators.py::test_winnow_frombuffer_matches_ord_loop).

Runs both on one Arrow-batch-sized corpus in-process (no Spark) and
prints a JSON line with throughputs + speedup.
"""

from __future__ import annotations

import hashlib
import json
import random
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from igtdetect_spark.operators.text_analysis import (  # noqa: E402
    WINNOW_BASE,
    WINNOW_MOD,
    winnow_batch,
)


def ord_loop_batch(texts: pd.Series, k: int = 5, window: int = 4
                   ) -> pd.DataFrame:
    """The round-2 kernel: identical except codepoints come from a
    per-char Python loop."""
    n_grams_out, n_sel_out, sig_out = [], [], []
    powers = np.array(
        [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)],
        dtype=np.int64,
    )
    for t in texts.fillna(""):
        if len(t) < k:
            n_grams_out.append(0)
            n_sel_out.append(0)
            sig_out.append(hashlib.md5(b"").hexdigest())
            continue
        cp = np.array([ord(c) for c in t], dtype=np.int64)
        n = len(cp) - k + 1
        h = np.zeros(n, dtype=np.int64)
        for j in range(k):
            h = (h + cp[j:j + n] * powers[j]) % WINNOW_MOD
        if n >= window:
            mins = h[:n - window + 1].copy()
            for j in range(1, window):
                np.minimum(mins, h[j:j + n - window + 1], out=mins)
        else:
            mins = np.array([h.min()], dtype=np.int64)
        sel = np.unique(mins)
        n_grams_out.append(n)
        n_sel_out.append(len(sel))
        sig_out.append(
            hashlib.md5(",".join(str(int(x)) for x in sel).encode())
            .hexdigest()
        )
    return pd.DataFrame(
        {"n_grams": n_grams_out, "n_selected": n_sel_out,
         "winnow_sig": sig_out}
    )


def main():
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(3000)] + ["日本語", "текст", "ümläut"]
    texts = pd.Series(
        [
            " ".join(rng.choices(vocab, k=rng.randint(100, 1200)))
            for _ in range(500)
        ]
    )
    n_chars = int(texts.str.len().sum())

    t0 = time.time()
    want = ord_loop_batch(texts)
    loop_sec = time.time() - t0

    winnow_batch(texts.head(5))  # warm numpy
    t0 = time.time()
    got = winnow_batch(texts)
    kern_sec = time.time() - t0

    print(json.dumps({
        "docs": len(texts),
        "chars": n_chars,
        "ord_loop_sec": round(loop_sec, 3),
        "frombuffer_sec": round(kern_sec, 3),
        "ord_loop_chars_per_sec": round(n_chars / loop_sec),
        "frombuffer_chars_per_sec": round(n_chars / kern_sec),
        "speedup": round(loop_sec / kern_sec, 1),
        "mismatches": int((got != want).any(axis=1).sum()),
    }))


if __name__ == "__main__":
    main()
