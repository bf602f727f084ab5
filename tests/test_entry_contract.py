"""Driver-contract tests: entry() smoke + queries()/oracle_sql() parity
against DuckDB at sf0.001 (the full sweep runs via
tools/check_correctness.py at sf0.01 — this locks the contract shape into
the fast suite)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# fast queries with full SQL mirrors
CHECKED = [
    "igt_segment_lines", "span_islands_events", "deterministic_mode",
    "confusion_pivot", "topk_parts", "label_normalize", "tpch_q1",
    "dedup_exact", "fingerprints", "token_stats", "quality_scores",
    "lang_id", "embedding_stats", "ann_cosine_topk", "media_meta",
    "simhash", "ann_lsh", "media_embeddings", "subword_stats",
    "media_frames", "embedding_neardup", "winnowing", "media_resize",
    "ann_ivf_fixed",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _norm(v):
    from datetime import date, datetime
    from decimal import Decimal

    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d 00:00:00.000000")
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "line_no", "pred"}
    assert all(r["pred"] in ("O", "L", "G", "T", "M") for r in rows[:50])


def test_registry_consistency():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    # every oracle-less query is a documented rows-only check
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "igt_classify_lines", "igt_detect_spans", "ann_ivf",
    }


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_duckdb(spark, con, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_DIR)
    got = _canon(df.columns, [tuple(r) for r in df.collect()])
    rel = con.sql(e.oracle_sql()[name])
    want = _canon([d[0] for d in rel.description], rel.fetchall())
    assert got == want, f"{name}: {len(got)} vs {len(want)} rows"
