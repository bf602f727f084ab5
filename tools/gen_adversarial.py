"""Adversarial exact-ratio corpus for cross-engine arithmetic audits.

Round-6 session-2 finding: a Spark expression and its frozen DuckDB
oracle can agree on every driver SF yet disagree on inputs that hit
IEEE boundaries — ``floor((sum/n)·1e6)`` vs ``floor(sum·1e6/n)`` differ
by one ulp exactly when the true ratio is a short decimal that is
inexact in binary (41/10, 3/5, ...), and Java's ``\\s`` matches ``\\x0b``
while RE2's (DuckDB's) does not.  This generator builds a small
documents table CRAFTED to hit those boundaries (exact-ratio token/char
counts, shared-shingle pairs with decimal jaccards, ``\\x0b``/``\\t``
bearing docs, dup groups, empty/unicode/long-doc edges) next to copies
of the sf0.001 relational tables, so the full 130-query mirror
(tools/check_correctness.py) doubles as a cross-engine arithmetic
audit:

    python tools/gen_adversarial.py /root/testdata_gen/adversarial
    python tools/check_correctness.py /root/testdata_gen/adversarial

Found (and fixed) on first run: token_stats and ngram_jaccard floored
divide-first against multiply-first oracles; layout_columns tokenized
with Java \\s against an RE2-\\s oracle.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "bb", "ccc", "dddd", "eeeee", "the", "of", "in", "word",
         "data", "spark", "join", "scan"]


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_gen/adversarial"
    src = "/root/testdata/sf0.001"
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    rng = np.random.default_rng(7)
    texts = []
    # exact-decimal averages: 41/10 = 4.1, 2.0, 65/25 = 2.6, 11/10 = 1.1
    texts.append("aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii aaaaa")
    texts.append(" ".join(["ab"] * 10))
    texts.append(" ".join(["abc"] * 20 + ["a"] * 5))
    texts.append(" ".join(["a"] * 9 + ["ab"]))
    # duplicate / near-duplicate groups
    base = ("the quick brown fox jumps over the lazy dog today again "
            "more words here now")
    texts += [base, base, base + " extra", base + " other"]
    # jaccard boundary pairs (shared 3-gram prefix)
    texts.append("one two three x1 y1 z1 w1")
    texts.append("one two three x2 y2 z2 w2")
    # repetition boundaries
    texts.append(" ".join(["pair word"] * 10))
    texts.append("s s s s s s s s s s")
    # whitespace-class and unicode edges
    texts += ["", "   ", "Héllo Wörld mixed CASE",
              "\x0b tab\tsplit \x0b", "a" * 577]
    texts.append(("the of in and is are was " * 5).strip())
    # bulk: token counts that divide 1e6 (ratio denominators 10..64)
    for _ in range(180):
        n = int(rng.choice([10, 16, 20, 25, 32, 40, 50, 64]))
        texts.append(" ".join(rng.choice(VOCAB, n)))

    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": rng.choice(["en", "zh", "es", "fr", "de"], n,
                           p=[.41, .15, .15, .15, .14]),
        "source": np.char.add("src", rng.integers(0, 20, n).astype(str)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{dst}/documents.parquet", compression="snappy",
        row_group_size=1 << 31)
    print(f"adversarial corpus: {n} docs -> {dst}")


if __name__ == "__main__":
    main()
