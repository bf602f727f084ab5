"""Measurement-scale synthetic data generator (round-6 tooling).

The driver's own testdata (sf0.001/0.01/0.1) is read-only and its
generator is not shipped; the driver's round-end bench runs at a
larger, driver-generated SF (sf1.0 in BENCH_r05.json).  This tool
regenerates a DISTRIBUTION-MATCHED sf for local measurement only:
same schemas, same single-row-group snappy parquet layout, same
empirical distributions as /root/testdata/sf0.1 (vocab, doc-length,
lang mix, dup-pair rate, label/value/date ranges), deterministic
(numpy seed 42).  It is NOT byte-identical to driver data — never use
it for oracle fingerprints, only for before/after timing.

Usage: python tools/gen_sf.py SF OUTDIR   (e.g. 1.0 /root/testdata_gen/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ETYPES = ["error", "view", "signup", "click", "purchase"]
SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "dark", "light"]
P_NOUN = ["ring", "bolt", "screw", "nut", "plate", "wheel", "gear", "pin"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(outdir, f"{name}.parquet"),
        compression="snappy", row_group_size=1 << 31,
    )
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    # --- documents ------------------------------------------------------
    n_docs = int(50000 * sf)
    lens = rng.integers(10, 101, n_docs)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    voc = np.array(VOCAB)
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(voc[words[off:off + ln]]))
        off += ln
    # exact-duplicate pairs at the sf0.1 rate (8 pairs / 5000 docs)
    n_pairs = max(1, int(round(n_docs * 8 / 5000)))
    srcs = rng.choice(n_docs, 2 * n_pairs, replace=False)
    for a, b in zip(srcs[:n_pairs], srcs[n_pairs:]):
        texts[int(b)] = texts[int(a)]
    langs = rng.choice(LANGS, n_docs, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, 20, n_docs).astype(str))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings -----------------------------------------------------
    n_emb = int(20000 * sf)
    vecs = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    # --- events ---------------------------------------------------------
    n_ev = int(1_000_000 * sf)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    ts.sort()
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, int(15000 * sf), n_ev), pa.int64()),
        "event_type": rng.choice(ETYPES, n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype(str)), "}"
        ),
    }))

    # --- TPC-H-ish ------------------------------------------------------
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_li = int(6_000_000 * sf)

    d95 = np.datetime64("1995-01-01", "us")
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(
            d95 + (rng.integers(0, 2404, n_ord)
                   * 86400_000_000).astype("timedelta64[us]")),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(np.sort(rng.integers(0, n_ord, n_li)), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": pa.array(
            d95 + (rng.integers(0, 2500, n_li)
                   * 86400_000_000).astype("timedelta64[us]")),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_ADJ[i % 8]} {P_NOUN[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": np.char.add(
            "Brand#", rng.integers(1, 26, n_part).astype(str)),
        "p_type": rng.choice(P_TYPES, n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    }))
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    print(f"done: {outdir} (sf={sf})")


if __name__ == "__main__":
    main()
