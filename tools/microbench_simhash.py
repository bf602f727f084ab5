"""Microbench: vectorized simhash kernel vs the definitional
per-token×per-bit loop (same outputs, pinned in
tests/test_misc_operators.py::test_simhash_kernel_matches_reference_loop).

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

sys.path.insert(0, "/root/repo")


def reference_loop(texts, bits=64):
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        acc = np.zeros(bits, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            for b in range(bits):
                acc[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(bits):
            if acc[b] > 0:
                v |= 1 << b
        out[i] = np.int64(np.uint64(v).astype(np.int64))
    return out


def main():
    import pandas as pd

    from igtdetect_spark.operators.dedup import simhash_batch

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(5000)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(50, 400)))
        for _ in range(2000)
    ]
    n_tokens = sum(len(t.split()) for t in texts)

    t0 = time.time()
    want = reference_loop(texts)
    loop_sec = time.time() - t0

    s = pd.Series(texts)
    simhash_batch(s.head(10))  # warm numpy/BLAS
    t0 = time.time()
    got = simhash_batch(s)
    kern_sec = time.time() - t0

    print(json.dumps({
        "docs": len(texts),
        "tokens": n_tokens,
        "loop_sec": round(loop_sec, 2),
        "kernel_sec": round(kern_sec, 3),
        "loop_tokens_per_sec": round(n_tokens / loop_sec),
        "kernel_tokens_per_sec": round(n_tokens / kern_sec),
        "speedup": round(loop_sec / kern_sec, 1),
        "mismatches": int((got != want).sum()),
    }))


if __name__ == "__main__":
    main()
