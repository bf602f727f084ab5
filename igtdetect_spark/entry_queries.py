"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each entry exposes one engine operator (SURVEY.md §2 + the training-data
pipeline ops) over the driver's test tables at ``/root/testdata/sf*``.
Column names/aliases match between the Spark result and the oracle SQL
(the driver's compare sorts columns by name and value-hashes).

Float discipline: cross-engine value-hashing needs bit-stable numbers, so
every floating quantity is emitted as ``floor(x·1e6)::bigint`` (and money
sums are integer-accumulated) — summation-order noise (~1e-16) cannot move
a floor at that scale except on exact boundaries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .operators.scale import spread_small_scan
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)  # executors import the zipped package
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Round 6: the driver tables are single-row-group parquet at every
    # SF, so every map stage over a bare scan runs as ONE task no
    # matter how many file splits the planner cuts. For the TEXT and
    # VECTOR tables — whose consumers do expensive per-row kernel work
    # before their first exchange — round-robin the scan across the
    # default parallelism (a no-op past 64 MB, so cluster-scale inputs
    # keep their native splits; operators/scale.py:spread_small_scan).
    # The relational tables stay raw: their consumers' first operation
    # is a keyed aggregate/window, where the spread just inserts a
    # second full exchange before the keyed one (measured +0.6-1.6 s
    # on span_islands_events / revenue_topk and friends).
    if name in ("documents", "embeddings"):
        df = spread_small_scan(df)
    return df


def _t_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Un-spread scan for consumers where the round-robin spread was
    measured a LOSS: the iterative graph kernels derive their edge
    tables from doc_id alone (no text crosses any map stage) and
    re-execute the base subtree once per iteration — each re-execution
    would pay the exchange while the per-iteration stage barriers, not
    scan parallelism, are the wall (hits_scores 5.6 → 8.3 s with the
    spread, same-session A/B)."""
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# IGT pipeline (flagship; scoring is not SQL-expressible → rows-only checks
# except segmentation, which has a full SQL mirror)
# ---------------------------------------------------------------------------

def _detect_ctx(spark: SparkSession):
    from .flagship import get_lexicons, get_synthetic_model
    from .plans.pipeline import DetectContext
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)

    if not hasattr(_detect_ctx, "_cache"):
        _detect_ctx._cache = {}
    key = id(spark)
    if key not in _detect_ctx._cache:
        _detect_ctx._cache[key] = DetectContext(
            spark, get_synthetic_model(), get_lexicons()
        )
    return _detect_ctx._cache[key]


def q_igt_classify_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.pipeline import classify_lines_fused
    from .sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    return classify_lines_fused(pages, _detect_ctx(spark)).select(
        "url", "line_no", "pred"
    )


def q_igt_detect_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.pipeline import detect_spans_fused
    from .sources.pages import pages_with_planted_igt

    pages = pages_with_planted_igt(spark, sf_dir)
    spans = detect_spans_fused(pages, _detect_ctx(spark))
    return spans.select("url", "span_no", "start_line", "end_line", "text")


def q_igt_segment_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.segment import segment_pages
    from .sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    return segment_pages(pages).select(
        "url", "line_no", "page", "block_id", "text"
    )


# documents.text carries no form-feeds; the SQL mirror reimplements the
# blank-line block segmentation (blocks = runs of non-blank lines, line_no
# over non-blank lines only).
SQL_SEGMENT_LINES = r"""
WITH raw AS (
  SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
         string_split(text, chr(10)) AS ls
  FROM documents
),
exploded AS (
  SELECT url, CAST(i AS INT) AS idx,
         rtrim(ls[CAST(i AS INT)], chr(13)) AS raw_line
  FROM raw, LATERAL unnest(generate_series(1, len(ls))) AS t(i)
),
flagged AS (
  SELECT url, idx, raw_line,
         regexp_matches(raw_line, '^\s*$') AS is_blank,
         coalesce(
           lag(regexp_matches(raw_line, '^\s*$'))
             OVER (PARTITION BY url ORDER BY idx),
           TRUE
         ) AS prev_blank
  FROM exploded
),
blocks AS (
  SELECT url, idx, raw_line, is_blank,
         SUM(CASE WHEN NOT is_blank AND prev_blank THEN 1 ELSE 0 END)
           OVER (PARTITION BY url ORDER BY idx
                 ROWS UNBOUNDED PRECEDING) AS block_no
  FROM flagged
)
SELECT url,
       CAST(row_number() OVER (PARTITION BY url ORDER BY idx) AS INT)
         AS line_no,
       1 AS page,
       '1-' || CAST(block_no AS VARCHAR) AS block_id,
       raw_line AS text
FROM blocks WHERE NOT is_blank
"""


# ---------------------------------------------------------------------------
# Relational engine ops over the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_span_islands_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization over events (≡ IGT span assignment:
    'error' events are the O separators) using the engine's
    assign_spans_df operator."""
    from .operators.spans import assign_spans_df

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lines = ev.select(
        F.col("user_id").cast("string").alias("url"),
        F.row_number().over(w).alias("line_no"),
        F.when(F.col("event_type") == "error", F.lit("O"))
        .otherwise(F.lit("L"))
        .alias("pred"),
        "event_id",
    )
    with_ids = assign_spans_df(lines, tag_col="pred")
    return (
        with_ids.filter(F.col("span_id").isNotNull())
        .groupBy("url", "span_id")
        .agg(
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("url").cast("long").alias("user_id"),
            "span_id", "first_event", "last_event", "n_events",
        )
    )


SQL_SPAN_ISLANDS = """
WITH lines AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS line_no,
         CASE WHEN event_type = 'error' THEN 'O' ELSE 'L' END AS pred
  FROM events
),
flagged AS (
  SELECT *,
         coalesce(lag(pred) OVER (PARTITION BY user_id ORDER BY line_no),
                  'O') AS prev_pred
  FROM lines
),
numbered AS (
  SELECT *,
         SUM(CASE WHEN pred != 'O' AND prev_pred = 'O' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY line_no
                 ROWS UNBOUNDED PRECEDING) AS span_no
  FROM flagged
)
SELECT user_id,
       's' || CAST(span_no AS VARCHAR) AS span_id,
       MIN(event_id) AS first_event,
       MAX(event_id) AS last_event,
       COUNT(*) AS n_events
FROM numbered WHERE pred != 'O'
GROUP BY user_id, span_no
"""


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-gap sessionization: a >30-minute gap starts a new session
    (event-time variant of gaps-and-islands). Window lag + running sum."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.withColumn(
        "session_no",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # Per-row floor BEFORE the sum (float discipline, module docstring):
    # floor-after-sum can move on boundary values when summation order
    # differs between engines.
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


SQL_SESSION_WINDOWS = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id,
       -- the window SUM yields HUGEINT -> float64 in pandas without a cast
       CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM s GROUP BY user_id, session_no
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (Spark `percentile` ≡ DuckDB
    quantile_cont, linear interpolation)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.floor(F.expr("percentile(value, 0.5)") * 1e6).cast("long")
        .alias("p50_e6"),
        F.floor(F.expr("percentile(value, 0.9)") * 1e6).cast("long")
        .alias("p90_e6"),
        F.floor(F.expr("percentile(value, 0.99)") * 1e6).cast("long")
        .alias("p99_e6"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type, COUNT(*) AS n,
       CAST(floor(quantile_cont(value, 0.5) * 1e6) AS BIGINT) AS p50_e6,
       CAST(floor(quantile_cont(value, 0.9) * 1e6) AS BIGINT) AS p90_e6,
       CAST(floor(quantile_cont(value, 0.99) * 1e6) AS BIGINT) AS p99_e6
FROM events GROUP BY event_type
"""


def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N (row_number window): each customer's 3 largest
    orders, deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey", "rank", "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long")
            .alias("price_cents"),
        )
    )


SQL_TOPN_PER_GROUP = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank
  FROM orders
)
SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
FROM r WHERE rank <= 3
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function surface: parse events.props, aggregate the
    extracted key per event type (get_json_object ≡ json_extract)."""
    from .operators.scale import spread_small_scan

    # per-row JSON parse before the first exchange → spread
    ev = spread_small_scan(_t(spark, sf_dir, "events"))
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


SQL_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


def q_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal mktsegment per nation, first-occurrence (min custkey)
    tie-break (≡ doc default-font/llx mode, SURVEY §2.5)."""
    from .operators.doc_stats import deterministic_mode

    cust = _t(spark, sf_dir, "customer")
    return deterministic_mode(
        cust, ["c_nationkey"], "c_mktsegment", "c_custkey",
        out_col="mode_segment",
    )


SQL_DETERMINISTIC_MODE = """
WITH counted AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS cnt, MIN(c_custkey) AS first_seen
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY c_nationkey
    ORDER BY cnt DESC, first_seen ASC, c_mktsegment ASC) AS rn
  FROM counted
)
SELECT c_nationkey, c_mktsegment AS mode_segment FROM ranked WHERE rn = 1
"""


def q_interval_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with ≥1 lineitem shipped within 30 days of the order date —
    the partial-span interval-overlap left-semi join shape (SURVEY §2.3)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return orders.join(li, cond, "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


SQL_INTERVAL_SEMIJOIN = """
SELECT o_orderkey, o_orderpriority
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate >= o.o_orderdate
    AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
)
"""


def q_confusion_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form confusion counts (≡ LabelEvaluator matrix, SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_orderstatus")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderstatus").alias("gold"),
            F.col("l_returnflag").alias("pred"),
        )
        .agg(F.count("*").alias("n"))
    )


SQL_CONFUSION_PIVOT = """
SELECT o.o_orderstatus AS gold, l.l_returnflag AS pred, COUNT(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


def q_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (≡ chi²-top-k / show_weights shape, §2.6)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
        .select(
            "p_partkey", "p_name",
            F.floor(F.col("p_retailprice") * 100).cast("long")
            .alias("price_cents"),
        )
    )


SQL_TOPK_PARTS = """
SELECT p_partkey, p_name,
       CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 20
"""


def q_label_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The label micro-grammar as a native expression over synthetic raw
    labels derived from lineitem flags (≡ handle_label, §2.2)."""
    from .functions.labels import normalize_label_col
    from .operators.scale import spread_small_scan

    # per-row label-grammar regexes before the first exchange → spread
    li = spread_small_scan(_t(spark, sf_dir, "lineitem"))
    raw = F.concat(
        F.when(F.col("l_returnflag") == "R", F.lit("*")).otherwise(F.lit("")),
        F.when(F.col("l_linestatus") == "O", F.lit("B-")).otherwise(F.lit("I-")),
        F.col("l_returnflag"), F.lit("-"), F.col("l_linestatus"),
        F.lit("+AC"),
    )
    return (
        li.select(raw.alias("raw_label"))
        .withColumn("norm_label", normalize_label_col(F.col("raw_label")))
        .groupBy("raw_label", "norm_label")
        .agg(F.count("*").alias("n"))
    )


SQL_LABEL_NORMALIZE = """
WITH raw AS (
  SELECT (CASE WHEN l_returnflag = 'R' THEN '*' ELSE '' END)
      || (CASE WHEN l_linestatus = 'O' THEN 'B-' ELSE 'I-' END)
      || l_returnflag || '-' || l_linestatus || '+AC' AS raw_label
  FROM lineitem
),
norm AS (
  SELECT raw_label,
         -- 1) noisy '*' → 'O' (skip_noisy); 2) strip +flags;
         -- 3) strip B-/I-; 4) first multi-label component
         CASE WHEN raw_label LIKE '*%' THEN 'O'
              ELSE split_part(
                     regexp_replace(split_part(raw_label, '+', 1),
                                    '^[BI]-', ''),
                     '-', 1)
         END AS norm_label
  FROM raw
)
SELECT raw_label, norm_label, COUNT(*) AS n FROM norm GROUP BY 1, 2
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (integer-cents accumulation for
    cross-engine determinism)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_c"),
            F.sum(F.floor(disc_price * 100).cast("long")).alias("sum_disc_c"),
            F.sum(F.floor(charge * 100).cast("long")).alias("sum_charge_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       -- CAST around SUM: DuckDB SUM(BIGINT) returns HUGEINT, which
       -- fetchdf() converts to float64 and breaks the value hash.
       CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_c,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
           AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
           * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way broadcast join + agg + deterministic top-k (Q3 shape)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_REVENUE_TOPK = """
SELECT o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue_c DESC, o_orderkey ASC LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join (region→nation→customer+supplier→orders→
    lineitem) with local-supplier predicate — broadcast dim chain, integer
    cents."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    dims = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("revenue_c"), F.count("*").alias("n_items"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT r.r_name, n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT)) AS BIGINT) AS revenue_c,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Training-data pipeline ops over documents / embeddings
# ---------------------------------------------------------------------------

_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = f"""
SELECT md5({_SQL_NORM}) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import doc_fingerprints

    return doc_fingerprints(_t(spark, sf_dir, "documents"))


SQL_FINGERPRINTS = f"""
SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents
"""


_SQL_SHINGLES = f"""
  norm AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
  toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM norm),
  sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(tk, CAST(i AS INT),
                                      CAST(i AS INT) + 2), ' ') AS shingle
    FROM toks,
         LATERAL unnest(generate_series(1, greatest(len(tk) - 2, 1))) s(i)
  )
"""


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_band_hashes

    return minhash_band_hashes(_t(spark, sf_dir, "documents"))


def _sql_minhash_bands_cte(n_perms: int = 16) -> str:
    """Affine-rehash mirror (operators/dedup.py minhash scheme='affine'):
    one md5 per shingle, perm p = (a_p·h32 + b_p) mod 2^31−1 — coefficient
    lists inlined; every product < 2^62 so BIGINT math is exact."""
    from .operators.dedup import MINHASH_PRIME, minhash_affine_params

    a, b = minhash_affine_params(n_perms)
    a_lit = "[" + ", ".join(str(x) for x in a) + "]"
    b_lit = "[" + ", ".join(str(x) for x in b) + "]"
    h8 = _SQL_HEX12.replace(
        "generate_series(1, 12)", "generate_series(1, 8)"
    ).replace("((12 - i) * 4)", "((8 - i) * 4)").format(
        H="substring(md5(shingle), 1, 8)"
    )
    return f"""
hv AS (
  SELECT doc_id, ({h8}) % {MINHASH_PRIME} AS hm FROM sh
),
perms AS (
  SELECT doc_id, CAST(p AS INT) AS perm,
         (({a_lit})[CAST(p AS INT) + 1] * hm
          + ({b_lit})[CAST(p AS INT) + 1]) % {MINHASH_PRIME} AS v
  FROM hv, LATERAL unnest(generate_series(0, {n_perms - 1})) t(p)
),
minh AS (SELECT doc_id, perm, MIN(v) AS minh FROM perms GROUP BY 1, 2),
bands AS (
  -- COALESCE: NULL text → NULL shingle → all-NULL minima; string_agg
  -- over all-NULLs is NULL, but the Spark side's concat_ws drops null
  -- args and hashes '' — md5('') per band on BOTH engines.
  SELECT doc_id, CAST(perm // 4 AS INT) AS band,
         md5(COALESCE(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY perm),
                      '')) AS band_hash
  FROM minh GROUP BY doc_id, perm // 4
)"""


def _sql_minhash_bands() -> str:
    return (
        f"WITH {_SQL_SHINGLES},{_sql_minhash_bands_cte()}\n"
        "SELECT doc_id, band, band_hash FROM bands"
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def _sql_minhash_lsh_pairs() -> str:
    return (
        f"WITH {_SQL_SHINGLES},{_sql_minhash_bands_cte()}\n"
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        "FROM bands a JOIN bands b\n"
        "  ON a.band = b.band AND a.band_hash = b.band_hash\n"
        " AND a.doc_id < b.doc_id"
    )


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the MinHash
    LSH candidate pairs — the pairs → clusters → keep-one step of a dedup
    pipeline. cluster_id = min doc_id in the component; the dedup filter
    is ``WHERE is_representative``. The Spark side iterates min-label
    propagation with pointer jumping (O(log diameter) rounds, each one
    shuffle on node keys); the oracle is a recursive CTE computing min
    reachable doc_id — identical fixpoints."""
    from .operators.dedup import neardup_clusters

    return neardup_clusters(_t(spark, sf_dir, "documents"))


# LSH pairs → undirected edges → recursive-CTE connected components →
# per-doc cluster assignment. Shared between the neardup_clusters oracle
# and the curation-funnel oracle (which needs the is_representative flag
# as one of its gates).
_SQL_CC_CTES = (
    "pairs AS (\n"
    "  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
    "  FROM bands a JOIN bands b\n"
    "    ON a.band = b.band AND a.band_hash = b.band_hash\n"
    "   AND a.doc_id < b.doc_id\n"
    "),\n"
    "und AS (\n"
    "  SELECT doc_a AS u, doc_b AS v FROM pairs\n"
    "  UNION ALL SELECT doc_b, doc_a FROM pairs\n"
    "),\n"
    "-- reach(x, lab): lab is connected to x; UNION dedups, so the\n"
    "-- recursion terminates at the transitive closure per component\n"
    "reach(u, lab) AS (\n"
    "  SELECT u, u FROM (SELECT DISTINCT u FROM und)\n"
    "  UNION\n"
    "  SELECT r.u, e.v FROM reach r JOIN und e ON e.u = r.lab\n"
    "),\n"
    "comp AS (SELECT u AS doc_id, MIN(lab) AS cluster_id\n"
    "         FROM reach GROUP BY u),\n"
    "assigned AS (\n"
    "  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id\n"
    "  FROM documents d LEFT JOIN comp c USING (doc_id)\n"
    ")"
)


def _sql_neardup_clusters() -> str:
    return (
        f"WITH RECURSIVE {_SQL_SHINGLES},{_sql_minhash_bands_cte()},\n"
        f"{_SQL_CC_CTES}\n"
        "SELECT doc_id, cluster_id,\n"
        "       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,\n"
        "       doc_id = cluster_id AS is_representative\n"
        "FROM assigned"
    )


_NGRAM_MAX_DF = 10


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded n-gram Jaccard: ``max_df`` prunes frequent shingles BEFORE
    the self-join so one stop-shingle can't make it quadratic at scale
    (recall-safe: well above the near-duplicate group size)."""
    from .operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5,
        max_df=_NGRAM_MAX_DF,
    )
    # ×1e6 BEFORE the divide, exactly like the oracle: n_common·1e6 is
    # exact in doubles, while floor(jaccard·1e6) of the pre-divided
    # double loses an ulp on exact decimal ratios (the token_stats
    # lesson; the threshold FILTER compares the plain quotient on both
    # engines, so it stays on the operator's jaccard column)
    out = pairs.select(
        "doc_a", "doc_b", "n_common", "n_a", "n_b",
        F.floor(
            F.col("n_common") * 1e6
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        ).cast("long").alias("jaccard_e6"),
    )
    # propagate the shingle-relation cache handle so callers can release
    # it after the consuming action (operators/dedup.release_plan_caches)
    out._plan_cache_handles = getattr(pairs, "_plan_cache_handles", [])
    return out


SQL_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES},
-- max_df pruning mirror: shingles in more than {_NGRAM_MAX_DF} docs are
-- dropped BEFORE sizes/self-join, exactly as the operator does
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING COUNT(*) <= {_NGRAM_MAX_DF}
),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.n_common,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(floor(c.n_common * 1e6 /
                  (sa.n_sh + sb.n_sh - c.n_common)) AS BIGINT) AS jaccard_e6
FROM common c
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (vectorized Arrow kernel). md5-based token
    hashes make the 64-bit signature fully SQL-expressible, so this has a
    complete DuckDB oracle (bit extraction from md5 hex nibbles)."""
    from .operators.dedup import simhash_docs

    return simhash_docs(_t(spark, sf_dir, "documents"))


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole banding (4 × 16-bit bands —
    hamming ≤ 3 implies an exact match on ≥ 1 band), per-band
    equi-self-join, exact bit_count(XOR) rescore. Arithmetic shiftright
    + mask band extraction is chosen because Spark and DuckDB BIGINT >>
    agree exactly (the mask discards sign-extension)."""
    from .operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_t(spark, sf_dir, "documents"))


def _sql_simhash_neardup() -> str:
    return (
        f"WITH sig AS ({SQL_SIMHASH}),\n"
        "bands AS (\n"
        "  SELECT doc_id, b AS band,\n"
        "         (simhash >> (CAST(b AS INT) * 16)) & 65535 AS band_val\n"
        "  FROM sig, LATERAL unnest(generate_series(0, 3)) g(b)\n"
        "),\n"
        "cand AS (\n"
        "  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        "  FROM bands a JOIN bands b\n"
        "    ON a.band = b.band AND a.band_val = b.band_val\n"
        "   AND a.doc_id < b.doc_id\n"
        ")\n"
        "SELECT c.doc_a, c.doc_b,\n"
        "       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT)\n"
        "         AS hamming\n"
        "FROM cand c\n"
        "JOIN sig sa ON sa.doc_id = c.doc_a\n"
        "JOIN sig sb ON sb.doc_id = c.doc_b\n"
        "WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3"
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left as-of join (orders × latest prior event per customer) via
    the union-window plan — ONE shuffle, no per-key cross product. The
    oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, i.e. a fully
    independent implementation of the semantics. Events are deduped to
    one row per (user_id, ts) — keep max event_id — in both engines so
    equal-timestamp ties cannot make either side nondeterministic.

    SKEW: this bench corpus's user keys are near-uniform, so the
    single-window plan is used. If YOUR key distribution has hot keys
    (one user/instrument dominating), pass ``bucket_width_sec`` — or
    ``bucket_width_sec="auto"`` to let ``auto_bucket_width`` probe the
    key counts and decide (see operators/asof.py) — the output is
    pinned identical either way."""
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    ev = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "ts", "user_id", "event_type")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return asof_join(
        orders.withColumnRenamed("o_custkey", "user_id"),
        ev,
        on="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        right_cols=["event_id", "event_type", "ts"],
        tiebreak="event_id",
    ).select(
        "o_orderkey",
        F.col("user_id").alias("o_custkey"),
        "o_orderdate",
        "event_id",
        "event_type",
        F.col("asof_ts").alias("event_ts"),
    )


SQL_ASOF_JOIN = """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, ts ORDER BY event_id DESC
    ) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       e.event_id, e.event_type, e.ts AS event_ts
FROM orders o
ASOF LEFT JOIN ev e
  ON o.o_custkey = e.user_id
 AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP)
"""


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus mixture report — doc counts, byte and
    whitespace-token totals, and each cell's share of the corpus in
    exact parts-per-million (integer div — no float rounding to
    diverge). The curation step that decides sampling rates."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(
        F.trim(F.regexp_replace(F.col("text"), r"[ \t\n\r\f\x0b]+", " ")),
        " ",
    ))
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(toks.cast("long")).alias("total_tokens"),
    )
    w = Window.partitionBy()
    return g.select(
        "lang", "source", "n_docs", "total_chars", "total_tokens",
        F.expr("n_docs * 1000000 div sum(n_docs) over ()")
        .alias("share_docs_ppm"),
        F.expr("total_chars * 1000000 div sum(total_chars) over ()")
        .alias("share_chars_ppm"),
    )


SQL_CORPUS_MIXTURE = r"""
WITH g AS (
  SELECT lang, source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(len(string_split(trim(regexp_replace(text, '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY 1, 2
)
SELECT lang, source, n_docs, total_chars, total_tokens,
       CAST((n_docs * 1000000) // SUM(n_docs) OVER () AS BIGINT) AS share_docs_ppm,
       CAST((total_chars * 1000000) // SUM(total_chars) OVER () AS BIGINT) AS share_chars_ppm
FROM g
"""


def q_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping event-time windows (30-minute windows sliding every 15):
    Spark's native `F.window` fan-out (each event lands in exactly 2
    windows) vs an oracle that derives both window starts with pure
    integer epoch math. Boundaries stay timezone-naive on BOTH engines
    (Spark TIMESTAMP_NTZ from the parquet scan; DuckDB `make_timestamp`
    is naive) — no session-timezone conversion anywhere. Money sums as
    floored cents (IEEE multiply + floor is deterministic cross-engine)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.floor(F.col("value") * 100).cast("long")
            ).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "value_cents",
        )
    )


SQL_HOPPING_COUNTS = """
WITH e AS (
  SELECT event_type, user_id, value,
         CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS b
  FROM events
),
fanout AS (
  SELECT event_type, user_id, value, b - s.k * 900 AS ws
  FROM e, (VALUES (0), (1)) s(k)
)
SELECT make_timestamp(ws * 1000000) AS window_start,
       make_timestamp((ws + 1800) * 1000000) AS window_end,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM fanout
GROUP BY 1, 2, 3
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by tf·idf. Ranking is done
    on the e6-FLOORED score (not the raw double), and ties break on the
    term string — so the ordering is identical on both engines even if
    ln() differs in the last ulp. Plan: one explode + two hash
    aggregations (term-frequency, document-frequency) + a SIZE-AWARE
    join of the document-frequency relation back onto tf: df_rel is
    vocabulary-sized, so the broadcast hint is emitted only when the
    corpus scan's Catalyst size bound (a sound upper bound on the
    vocabulary bytes) fits under ``igtdetect.broadcastBoundBytes``
    (default 64 MB); above it — i.e. at 100 TB, where Heaps' law puts
    the vocabulary at 10^8-10^9 terms — the planner gets a plain
    shuffle join on term instead (see operators/scale.py)."""
    from .operators.scale import maybe_broadcast, plan_size_bytes

    docs = _t_raw(spark, sf_dir, "documents")
    _vocab_bound = plan_size_bytes(docs)
    toks = docs.select(
        "source",
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), r"[ \t\n\r\f\x0b]+", " "
                    )
                ),
                " ",
            )
        ).alias("term"),
    ).filter(F.length("term") >= 3)
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_rel = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_src = docs.agg(
        F.countDistinct("source").cast("double").alias("_n")
    )
    scored = (
        tf.join(maybe_broadcast(df_rel, bound_bytes=_vocab_bound), "term")
        .crossJoin(F.broadcast(n_src))  # 1-row scalar, stays lazy
        .select(
            "source",
            "term",
            "tf",
            "df",
            F.floor(
                F.col("tf") * F.log(F.col("_n") / F.col("df")) * 1e6
            ).cast("long").alias("tfidf_e6"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("tfidf_e6"), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "rank", "term", "tf", "df", "tfidf_e6")
    )


def _sql_tfidf_top_terms() -> str:
    return r"""
WITH toks AS (
  SELECT source, unnest(string_split(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT source, term, COUNT(*) AS tf FROM toks
  WHERE length(term) >= 3 GROUP BY 1, 2
),
dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nsrc AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf, dfr.df,
         CAST(floor(tf.tf * ln(CAST(nsrc.n AS DOUBLE) / dfr.df) * 1e6)
              AS BIGINT) AS tfidf_e6
  FROM tf JOIN dfr USING (term), nsrc
)
SELECT source, rank, term, tf, df, tfidf_e6
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY tfidf_e6 DESC, term
  ) AS rank
  FROM scored
)
WHERE rank <= 5
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (≤ 50 docs per lang by
    md5-of-id order) with the two-phase salted top-N plan (salt_parts=8)
    — output identical to the single-window form the oracle uses; the
    salting only changes the physical plan (mega-stratum rows never
    serialize into one partition)."""
    from .operators.sampling import stratified_sample

    return stratified_sample(
        _t_raw(spark, sf_dir, "documents"), n_per_group=50, salt_parts=8
    )


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, sample_rank
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 50
"""


# bit b (LSB order) of the big-endian first 8 md5 bytes lives in hex nibble
# 16 - b//4 (1-indexed), bit b%4 — extracted with pure integer math.
SQL_SIMHASH = f"""
WITH norm AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm WHERE t <> ''
),
bits AS (
  SELECT doc_id, b,
         ((strpos('0123456789abcdef', substring(md5(tok), 16 - b // 4, 1))
           - 1)
          // (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                         WHEN 2 THEN 4 ELSE 8 END)) % 2 AS bit
  FROM toks, LATERAL unnest(generate_series(0, 63)) g(b)
),
acc AS (
  SELECT doc_id, b, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS a
  FROM bits GROUP BY 1, 2
),
v AS (
  SELECT doc_id,
         SUM(CASE WHEN a > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS uv
  FROM acc GROUP BY 1
)
SELECT d.doc_id,
       CAST(CASE WHEN COALESCE(v.uv, 0) >= (CAST(1 AS HUGEINT) << 63)
                 THEN COALESCE(v.uv, 0) - (CAST(1 AS HUGEINT) << 64)
                 ELSE COALESCE(v.uv, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import token_stats

    # the e6 average MUST apply ×1e6 BEFORE the divide, like the
    # oracle: sum·1e6 is exact in doubles, so floor(sum·1e6/n) is the
    # true fixed-point value, while floor((sum/n)·1e6) loses an ulp on
    # exact ratios (41/10 → 4099999; 5 docs at sf0.1 hit this)
    return token_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_distinct", "n_chars",
        F.floor(F.col("sum_token_len") * 1e6 / F.col("n_tokens"))
        .cast("long").alias("avg_token_len_e6"),
    )


SQL_TOKEN_STATS = r"""
WITH toks AS (
  SELECT doc_id, length(text) AS n_chars,
         string_split(trim(regexp_replace(text, '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ') AS tk
  FROM documents
)
SELECT doc_id,
       len(tk) AS n_tokens,
       len(list_distinct(tk)) AS n_distinct,
       n_chars,
       CAST(floor(list_sum(list_transform(tk, x -> length(x))) * 1e6
                  / len(tk)) AS BIGINT) AS avg_token_len_e6
FROM toks
"""


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/structure gates. The Spark side computes
    the per-doc bigram mode with a shuffle-free run-length aggregate
    over the sorted bigram array; the oracle uses the relational
    unnest + GROUP BY shape — same value, different plan."""
    from .operators.text_analysis import gopher_filters

    return gopher_filters(_t(spark, sf_dir, "documents"))


SQL_GOPHER_FILTERS = r"""
WITH toks AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(text, '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ') AS tk
  FROM documents
),
bg AS (
  SELECT doc_id, tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bigram
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) s(i)
),
topbg AS (
  SELECT doc_id, MAX(cnt) AS top_cnt
  FROM (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
  GROUP BY doc_id
),
scalars AS (
  SELECT doc_id,
         len(tk) AS n_words,
         -- divide-then-scale ordering matches the Spark side exactly
         -- (IEEE double rounding order matters at the floor boundary)
         CAST(floor((list_sum(list_transform(tk, x -> length(x)))
                     / len(tk)) * 1e6) AS BIGINT) AS mean_word_len_e6,
         CAST(floor((len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]')))
                     / len(tk)) * 1e6) AS BIGINT) AS frac_alpha_e6,
         CAST(floor((((length(text) - length(replace(text, '#', '')))
                      + (length(text) - length(replace(text, '...', ''))) / 3)
                     / len(tk)) * 1e6) AS BIGINT) AS symbol_ratio_e6,
         len(tk) - 1 AS n_bigrams
  FROM toks
),
joined AS (
  SELECT s.doc_id, s.n_words, s.mean_word_len_e6, s.frac_alpha_e6,
         s.symbol_ratio_e6,
         CAST(floor((COALESCE(t.top_cnt, 0) / s.n_bigrams) * 1e6) AS BIGINT)
           AS top_bigram_frac_e6
  FROM scalars s LEFT JOIN topbg t USING (doc_id)
)
SELECT *,
       (n_words BETWEEN 20 AND 100000
        AND mean_word_len_e6 BETWEEN 3000000 AND 10000000
        AND frac_alpha_e6 >= 800000
        AND symbol_ratio_e6 <= 100000
        AND COALESCE(top_bigram_frac_e6, 0) <= 200000) AS gopher_pass
FROM joined
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def _sql_stopwords() -> str:
    from .operators.text_analysis import EN_STOPWORDS

    return ", ".join(f"'{w}'" for w in EN_STOPWORDS)


SQL_QUALITY_SCORES = rf"""
WITH toks AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(text, '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ') AS tk,
         string_split(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ')
           AS ltk
  FROM documents
),
m AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         len(list_distinct(tk)) * 1.0 / len(tk) AS distinct_ratio,
         len(list_filter(list_distinct(ltk),
                         x -> x IN ({{SW}}))) AS stopword_hits,
         length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) * 1.0
           / length(text) AS alnum_ratio
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(floor(distinct_ratio * 1e6) AS BIGINT) AS distinct_ratio_e6,
       stopword_hits,
       CAST(floor(alnum_ratio * 1e6) AS BIGINT) AS alnum_ratio_e6,
       CAST((CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END)
          + (CASE WHEN distinct_ratio >= 0.3 THEN 1 ELSE 0 END)
          + (CASE WHEN stopword_hits >= 2 THEN 1 ELSE 0 END)
          + (CASE WHEN alnum_ratio >= 0.8 THEN 1 ELSE 0 END) AS INT)
         AS quality
FROM m
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


SQL_LANG_ID = rf"""
WITH toks AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ')
           AS ltk
  FROM documents
),
m AS (
  SELECT doc_id, text,
         len(list_filter(list_distinct(ltk),
                         x -> x IN ({{SW}}))) AS sw_hits
  FROM toks
)
SELECT doc_id, sw_hits,
       CASE WHEN regexp_matches(text, '[가-힣]') THEN 'ko'
            WHEN regexp_matches(text, '[一-鿿぀-ヿ]') THEN 'ja'
            WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
            WHEN sw_hits >= 2 THEN 'en'
            ELSE 'und' END AS pred_lang
FROM m
"""


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS scheme) — polynomial
    char-k-gram hash + sliding-window minima, exact integer math."""
    from .operators.text_analysis import winnowing_fingerprints

    return winnowing_fingerprints(_t(spark, sf_dir, "documents"))


def _sql_winnowing(k: int = 5, window: int = 4) -> str:
    from .operators.text_analysis import WINNOW_BASE, WINNOW_MOD

    pows = "[" + ", ".join(
        str(pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD)) for j in range(k)
    ) + "]"
    return f"""
WITH norm AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST(list_sum(list_transform(generate_series(0, {k - 1}),
              j -> CAST(unicode(substring(t, CAST(i + j AS INT), 1))
                        AS BIGINT)
                   * ({pows})[CAST(j AS INT) + 1]))
              % {WINNOW_MOD} AS BIGINT) AS h,
         len(t) - {k} + 1 AS n
  FROM norm, LATERAL unnest(generate_series(1, len(t) - {k} + 1)) g(i)
  WHERE len(t) >= {k}
),
wins AS (
  SELECT doc_id, i, n,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW
                      AND {window - 1} FOLLOWING) AS m
  FROM grams
),
sel AS (
  SELECT DISTINCT doc_id, m FROM wins
  WHERE i <= greatest(n - {window} + 1, 1)
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_selected,
         md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY m)) AS winnow_sig
  FROM sel GROUP BY 1
),
sizes AS (
  SELECT doc_id, greatest(len(t) - {k} + 1, 0) AS n_grams FROM norm
)
SELECT s.doc_id, CAST(s.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(a.n_selected, 0) AS BIGINT) AS n_selected,
       COALESCE(a.winnow_sig, md5('')) AS winnow_sig
FROM sizes s LEFT JOIN agg a USING (doc_id)
"""


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata extraction over opaque binary payloads (the
    codec-independent part — byte length + content hash), SQL-mirrored."""
    from .operators.multimodal import media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.sha2(F.col("payload"), 256), 1, 16).alias("sha"),
    )


SQL_MEDIA_META = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       substring(sha256(coalesce(text, '')), 1, 16) AS sha
FROM documents
"""


def q_media_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decoded media embeddings. The fake codec is integer-exact
    (md5-keyed lattice), so the per-vector signature is fully
    SQL-checkable; the raw array<float> stays behind the operator API
    (the driver canonicalizer can't hash lists)."""
    from .operators.multimodal import extract_media_features, media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "sha", "emb_sig"
    )


# Mirrors _fake_embedding_e6 (operators/multimodal.py): element j of the
# fake embedding = (48-bit prefix of md5(md5(payload)||'|'||j)) % 2000001
# - 1000000; signature = md5 of the comma-joined integers. Pure integer
# math → bit-identical across engines.
_SQL_HEX12 = (
    "list_sum(list_transform(generate_series(1, 12), i -> "
    "CAST(strpos('0123456789abcdef', substring({H}, i, 1)) - 1 AS BIGINT)"
    " << ((12 - i) * 4)))"
)

SQL_MEDIA_EMBEDDINGS = f"""
WITH m AS (
  -- coalesce: the operator treats NULL text as empty payload
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(coalesce(text, ''))) AS n_bytes,
         substring(sha256(coalesce(text, '')), 1, 16) AS sha,
         md5(coalesce(text, '')) AS seed_hex
  FROM documents
)
SELECT media_id, kind, n_bytes, sha,
       md5(array_to_string(
         list_transform(generate_series(0, 15), j -> CAST(
           {_SQL_HEX12.format(H="substring(md5(seed_hex || '|' || CAST(j AS VARCHAR)), 1, 12)")}
           % 2000001 - 1000000 AS VARCHAR)),
         ',')) AS emb_sig
FROM m
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    return cosine_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=3
    )


SQL_ANN_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM q, embeddings e WHERE e.vec_id != q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         CAST(floor(sim * 1e6) AS BIGINT) AS cos_sim_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1e6) DESC, neighbor_id)
           AS rank
  FROM s
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim_e6
FROM r WHERE rank <= 3
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    vector, the top-5 most-cosine-similar vectors of a DIFFERENT
    label — the near-miss negatives that carry the gradient; same
    broadcast-query brute-force baseline as ann_cosine_topk with the
    label exclusion applied before ranking."""
    from .operators.similarity import hard_negatives

    return hard_negatives(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    )


SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(label AS BIGINT) AS query_label,
         embedding AS qv
  FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
         CAST(e.label AS BIGINT) AS neighbor_label,
         list_sum(list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM q, embeddings e WHERE CAST(e.label AS BIGINT) != q.query_label
),
r AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         CAST(floor(sim * 1e6) AS BIGINT) AS cos_sim_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1e6) DESC, neighbor_id)
           AS rank
  FROM s
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       CAST(rank AS INT) AS rank, cos_sim_e6
FROM r WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN. The hyperplanes are deterministic (seeded numpy),
    so the oracle inlines them as SQL double literals and reproduces the
    bucket assignment + rescoring exactly."""
    from .operators.similarity import lsh_bucketed_ann

    return lsh_bucketed_ann(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=3
    )


def _sql_bucket_expr(n_planes: int = 6, seed: int = 42,
                     dim: int = 64) -> str:
    """The seeded hyperplane sign-bucket (similarity.py:83-84) as a DuckDB
    expression over a list column ``v`` — planes inlined as repr'd double
    literals (shortest round-trip → bit-identical doubles)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket_terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        dot = (f"list_sum(list_transform(generate_series(1, {dim}), "
               f"i -> v[i] * ({lit})[i]))")
        bucket_terms.append(
            f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(bucket_terms)


def _sql_ann_lsh(n_planes: int = 6, seed: int = 42, dim: int = 64,
                 k: int = 3, query_ids=(0, 1, 2, 3, 4)) -> str:
    """Full DuckDB mirror of lsh_bucketed_ann."""
    bucket = _sql_bucket_expr(n_planes, seed, dim)
    ids = ", ".join(str(q) for q in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM b
  WHERE vec_id IN ({ids})
),
s AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(b.v)),
             i -> q.qv[i] * b.v[i]))
         / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
          * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS sim
  FROM q JOIN b ON b.bucket = q.qb AND b.vec_id != q.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         CAST(floor(sim * 1e6) AS BIGINT) AS cos_sim_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1e6) DESC, neighbor_id)
           AS rank
  FROM s
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim_e6
FROM r WHERE rank <= {k}
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with seeded FIXED centroids: the whole search path
    (nearest-list assignment → n_probe probing → exact rescore → top-k)
    is deterministic integer/double math, so it gets a complete DuckDB
    oracle. The k-means-TRAINED quantizer stays a library API
    (similarity.kmeans_centroids + ivf_ann) with pytest recall bounds —
    iterative training is legitimately not SQL-expressible, so grading
    the search path on fixed centroids is the stronger check."""
    from .operators.similarity import ivf_ann, seeded_centroids

    return ivf_ann(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=3,
        n_lists=8, n_probe=2, centroids=seeded_centroids(8, 64),
    )


def _sql_ann_ivf_fixed(n_lists: int = 8, n_probe: int = 2, k: int = 3,
                       dim: int = 64, seed: int = 7,
                       query_ids=(0, 1, 2, 3, 4)) -> str:
    from .operators.similarity import seeded_centroids

    C = seeded_centroids(n_lists, dim, seed)
    values = ", ".join(
        "(" + str(cid) + ", ["
        + ", ".join(repr(float(x)) for x in c) + "])"
        for cid, c in enumerate(C)
    )
    ids = ", ".join(str(q) for q in query_ids)
    d2 = (f"list_sum(list_transform(generate_series(1, {dim}), "
          f"i -> (v[i] - c[i]) * (v[i] - c[i])))")
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents(cid, c) AS (VALUES {values}),
d AS (
  SELECT e.vec_id, e.v, cents.cid, {d2} AS d2
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, cid AS list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn FROM d
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cid AS list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS prn
    FROM d WHERE vec_id IN ({ids})
  ) WHERE prn <= {n_probe}
),
s AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(a.v)),
             i -> p.qv[i] * a.v[i]))
         / (sqrt(list_sum(list_transform(p.qv, y -> y * y)))
          * sqrt(list_sum(list_transform(a.v, y -> y * y)))) AS sim
  FROM probes p JOIN assigned a
    ON a.list_id = p.list_id AND a.vec_id != p.query_id
),
r AS (
  SELECT query_id, neighbor_id,
         CAST(floor(sim * 1e6) AS BIGINT) AS cos_sim_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1e6) DESC, neighbor_id)
           AS rank
  FROM s
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim_e6
FROM r WHERE rank <= {k}
"""


# Graded banding: small corpus → few planes per band so buckets stay
# populated; the operator's defaults (8×16) are the 10^9-vector sizing.
_NEARDUP_BANDS = 4
_NEARDUP_BAND_PLANES = 4


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (banded-LSH candidates +
    one exact rescore) — the vector-space dedup mode."""
    from .operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35,
        n_bands=_NEARDUP_BANDS, band_planes=_NEARDUP_BAND_PLANES,
    )


def _sql_banded_bucket_exprs(n_bands: int, band_planes: int,
                             seed: int = 42, dim: int = 64) -> list[str]:
    """Per-band sign-buckets (similarity.py banded_hyperplane_buckets) as
    DuckDB expressions over a list column ``v`` — band b uses planes
    [b·r, (b+1)·r) of one seeded standard-normal draw, inlined as repr'd
    double literals (shortest round-trip → bit-identical doubles)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_bands * band_planes, dim))
    exprs = []
    for b in range(n_bands):
        terms = []
        for j in range(band_planes):
            p = planes[b * band_planes + j]
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            dot = (f"list_sum(list_transform(generate_series(1, {dim}), "
                   f"i -> v[i] * ({lit})[i]))")
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
        exprs.append(" + ".join(terms))
    return exprs


def _sql_embedding_neardup(threshold: float = 0.35,
                           n_bands: int = _NEARDUP_BANDS,
                           band_planes: int = _NEARDUP_BAND_PLANES,
                           seed: int = 42, dim: int = 64) -> str:
    buckets = _sql_banded_bucket_exprs(n_bands, band_planes, seed, dim)
    bb = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS bucket, {i} AS band FROM e"
        for i, b in enumerate(buckets)
    )
    thr_e6 = int(threshold * 1e6)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bb AS (
  {bb}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, x.vec_id AS vec_b
  FROM bb a JOIN bb x
    ON a.band = x.band AND a.bucket = x.bucket AND a.vec_id < x.vec_id
),
p AS (
  SELECT c.vec_a, c.vec_b,
         CAST(floor(
           list_sum(list_transform(generate_series(1, len(ea.v)),
               i -> ea.v[i] * eb.v[i]))
           / (sqrt(list_sum(list_transform(ea.v, y -> y * y)))
            * sqrt(list_sum(list_transform(eb.v, y -> y * y)))) * 1e6
         ) AS BIGINT) AS cos_sim_e6
  FROM cand c
  JOIN e ea ON ea.vec_id = c.vec_a
  JOIN e eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cos_sim_e6 FROM p WHERE cos_sim_e6 >= {thr_e6}
"""


def q_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting (regexp_extract_all, JVM-side)."""
    from .operators.text_analysis import subword_token_stats

    return subword_token_stats(_t(spark, sf_dir, "documents"))


def _sql_subword_stats() -> str:
    from .operators.text_analysis import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    return rf"""
WITH p AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{pat}', 0) AS pieces,
         string_split(trim(regexp_replace(lower(coalesce(text, '')),
                                          '[ \t\n\r\f\x0b]+', ' ', 'g')),
                      ' ') AS ws
  FROM documents
)
SELECT doc_id,
       len(pieces) AS n_subwords,
       len(list_distinct(pieces)) AS n_distinct_subwords,
       len(ws) AS n_ws_tokens,
       CAST(floor(len(pieces) * 1e6 / len(ws)) AS BIGINT)
         AS subwords_per_ws_token_e6
FROM p
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (posexplode over duration metadata)."""
    from .operators.multimodal import frame_sample, media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return frame_sample(media, every_ms=1000, max_frames=4)


SQL_MEDIA_FRAMES = """
WITH v AS (
  -- meta_duration_ms = n_chars * 10 (media_from_documents)
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         least(CAST(n_chars * 10 // 1000 AS INT) + 1, 4) AS n_frames
  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
)
SELECT media_id, CAST(f AS INT) AS frame_no,
       CAST(f * 1000 AS INT) AS ts_ms
FROM v, LATERAL unnest(generate_series(0, n_frames - 1)) t(f)
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (exact integer dimension math;
    the pixel resample is the stubbed codec step). Payload column stays
    behind the API — the driver hashes the dimension columns."""
    from .operators.multimodal import media_from_documents, resize_media

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return resize_media(media).select("media_id", "w", "h", "new_w", "new_h")


SQL_MEDIA_RESIZE = """
WITH m AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CAST(doc_id % 1920 AS INT) AS w,
         CAST(doc_id % 1080 AS INT) AS h
  FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
)
SELECT media_id, w, h,
       CAST(CASE WHEN w <= 640 AND h <= 480 THEN w
                 WHEN w * 480 >= h * 640 THEN 640
                 ELSE greatest((w * 480) // h, 1) END AS INT) AS new_w,
       CAST(CASE WHEN w <= 640 AND h <= 480 THEN h
                 WHEN w * 480 >= h * 640 THEN greatest((h * 640) // w, 1)
                 ELSE 480 END AS INT) AS new_h
FROM m
"""


def q_confusion_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix WITH margins in one pass — cube('gold','pred')
    (SURVEY §2.5: the eval report's matrix + per-label margins is the one
    rollup-shaped output). NULL dims = margin rows."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_orderstatus")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .cube(
            F.col("o_orderstatus").alias("gold"),
            F.col("l_returnflag").alias("pred"),
        )
        .agg(F.count("*").alias("n"))
    )


SQL_CONFUSION_CUBE = """
SELECT o.o_orderstatus AS gold, l.l_returnflag AS pred, COUNT(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY CUBE (1, 2)
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import embedding_stats

    return embedding_stats(_t(spark, sf_dir, "embeddings"))


SQL_EMBEDDING_STATS = """
SELECT label, COUNT(*) AS n_vectors,
       CAST(floor(AVG(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 1e6) AS BIGINT)
         AS avg_norm_e6
FROM embeddings GROUP BY label
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_SUBSTR_N = 13


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2021 semantics under a
    fixed-n gram cover): maximal token spans covered by 13-grams that
    occur ≥ 2 times anywhere in the corpus. Two shuffles total (gram
    hash-agg, per-doc window+agg); span offsets are 1-based inclusive
    integers so the cross-engine hash is exact."""
    from .operators.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(
        _t(spark, sf_dir, "documents"), n=_SUBSTR_N, min_count=2
    )


def q_substring_dup_spans_i64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shuffle-shrink variant of `substring_dup_spans`:
    identical span semantics with grams hashed to BIGINT via native
    xxhash64 instead of md5 hex (8-byte vs 32-byte shuffle key —
    measured 2.88× less shuffle write at sf0.1). The OUTPUT contains no
    gram values, only span offsets, so the md5-based oracle applies
    verbatim — a driver hash match here proves the two schemes pick
    exactly the same spans on real data, not just the planted pytest
    fixture."""
    from .operators.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(
        _t(spark, sf_dir, "documents"), n=_SUBSTR_N, min_count=2,
        gram_hash="i64",
    )


SQL_SUBSTRING_DUP_SPANS = f"""
WITH norm AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM norm),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(list_slice(tk, CAST(i AS INT),
                                        CAST(i AS INT) + {_SUBSTR_N - 1}),
                             ' ')) AS gram
  FROM toks,
       LATERAL unnest(generate_series(1, len(tk) - {_SUBSTR_N - 1})) s(i)
  WHERE len(tk) >= {_SUBSTR_N}
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w IS NULL
                OR pos - LAG(pos) OVER w > {_SUBSTR_N} THEN 1
              ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
  FROM flagged
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SUBSTR_N - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_SUBSTR_N - 1} - MIN(pos) + 1 AS BIGINT) AS n_tokens,
       COUNT(*) AS n_dup_grams
FROM isl GROUP BY doc_id, isl_id
"""


def q_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of substring dedup: corpus text with every
    duplicated-13-gram span dropped (remove-all policy), plus
    removed/kept token counts. Chains the span detector with the native
    exists-filter reconstruction — still two shuffles end-to-end.

    Round 6 (§2.4): the detector's gram kernel and the removal's token
    reconstruction both start from the same normalize+split projection
    (~1.5 s per pass at sf1.0) — ONE persisted token relation now feeds
    both via the ``tokens=`` hook."""
    from .operators.dedup import (
        doc_tokens,
        duplicated_ngram_spans,
        remove_duplicated_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = doc_tokens(docs).persist()
    spans = duplicated_ngram_spans(
        docs, n=_SUBSTR_N, min_count=2, tokens=toks
    )
    out = remove_duplicated_spans(docs, spans, tokens=toks)
    out._plan_cache_handles = (
        getattr(spans, "_plan_cache_handles", []) + [toks]
    )
    return out


def _sql_substring_dedup_clean() -> str:
    body = SQL_SUBSTRING_DUP_SPANS.strip()
    assert body.startswith("WITH ") and body.rstrip().endswith(
        "FROM isl GROUP BY doc_id, isl_id"
    )
    ctes = body[len("WITH "):body.index("\nSELECT doc_id,")]
    return f"""
WITH {ctes},
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SUBSTR_N - 1} AS e
  FROM isl GROUP BY doc_id, isl_id
),
pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, tk[CAST(i AS INT)] AS tok
  FROM toks, LATERAL unnest(generate_series(1, len(tk))) s(i)
),
kept AS (
  SELECT p.doc_id, p.p, p.tok
  FROM pos p
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id AND p.p BETWEEN s.s AND s.e)
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CASE WHEN t.tk IS NULL THEN NULL
            ELSE COALESCE(a.clean_text, '') END AS clean_text,
       CASE WHEN t.tk IS NULL THEN NULL
            ELSE CAST(len(t.tk) - COALESCE(a.n_kept, 0) AS BIGINT)
       END AS n_removed_tokens,
       CASE WHEN t.tk IS NULL THEN NULL
            ELSE CAST(COALESCE(a.n_kept, 0) AS BIGINT)
       END AS n_kept_tokens
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture resampling toward a UNIFORM (lang, source) share — the
    action `corpus_mixture`'s report feeds. Integer-ppm acceptance rates
    and an md5 draw keep the decision bit-equal across engines; the
    corpus is scanned once with cell rates broadcast back on (no corpus
    shuffle)."""
    from .operators.sampling import mixture_resample

    # _t_raw: first op is a keyed cell aggregate + broadcast verdict
    # map — the small-scan spread just inserts an extra exchange
    return mixture_resample(_t_raw(spark, sf_dir, "documents"))


def _sql_mixture_resample() -> str:
    # proven nibble-sum hex→BIGINT (same helper the minhash oracle uses)
    h8 = _SQL_HEX12.replace(
        "generate_series(1, 12)", "generate_series(1, 8)"
    ).replace("((12 - i) * 4)", "((8 - i) * 4)").format(
        H="substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
    )
    return f"""
WITH counts AS (
  SELECT lang, source, COUNT(*) AS n_cell
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n_cell) AS BIGINT) AS n_total,
         COUNT(*) AS n_cells
  FROM counts
),
cells AS (
  SELECT lang, source,
         CAST(least(
           1000000,
           ((n_total * 1000000) // n_cells) // n_cell
         ) AS BIGINT) AS accept_ppm
  FROM counts, tot
),
draws AS (
  SELECT doc_id, lang, source,
         CAST(({h8}) % 1000000 AS BIGINT) AS draw_ppm
  FROM documents
)
SELECT d.doc_id, d.lang, d.source, d.draw_ppm, c.accept_ppm,
       d.draw_ppm < c.accept_ppm AS accepted
FROM draws d JOIN cells c USING (lang, source)
"""


def q_mixture_resample_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture resampling toward an EXPLICIT non-uniform recipe — the
    ``target_ppm`` path of ``mixture_resample`` (the uniform query
    exercises only the default). The recipe is synthesized
    deterministically from the observed cells so both engines build the
    identical relation: cells ranked alphabetically by (lang, source),
    cell i targeting share i/Σranks in integer ppm — a strictly
    increasing, non-uniform ladder that forces both the thin-everything
    (low-rank) and keep-everything (high-rank) branches. The ranking
    window runs on the DISTINCT cell relation (dozens of rows), not the
    corpus; the corpus itself is still scanned once with the cell rates
    broadcast back on."""
    from .operators.sampling import mixture_resample

    docs = _t_raw(spark, sf_dir, "documents")
    cells = docs.select("lang", "source").distinct()
    w = Window.orderBy("lang", "source")
    rec = cells.withColumn("_r", F.row_number().over(w).cast("long"))
    rsum = rec.agg(F.sum("_r").alias("_sr"))
    recipe = rec.join(F.broadcast(rsum)).select(
        "lang", "source",
        F.expr("(_r * 1000000L) div _sr").alias("target_ppm"),
    )
    return mixture_resample(docs, target_ppm=recipe)


def _sql_mixture_resample_recipe() -> str:
    h8 = _SQL_HEX12.replace(
        "generate_series(1, 12)", "generate_series(1, 8)"
    ).replace("((12 - i) * 4)", "((8 - i) * 4)").format(
        H="substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
    )
    return f"""
WITH counts AS (
  SELECT lang, source, COUNT(*) AS n_cell
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n_total FROM counts),
rec AS (
  SELECT lang, source,
         CAST(ROW_NUMBER() OVER (ORDER BY lang, source) AS BIGINT) AS r
  FROM (SELECT DISTINCT lang, source FROM documents)
),
rsum AS (SELECT CAST(SUM(r) AS BIGINT) AS sr FROM rec),
recipe AS (
  SELECT lang, source, (r * 1000000) // sr AS target_ppm
  FROM rec, rsum
),
cells AS (
  SELECT c.lang, c.source,
         CAST(least(
           1000000,
           (t.n_total * coalesce(rp.target_ppm, 0)) // c.n_cell
         ) AS BIGINT) AS accept_ppm
  FROM counts c LEFT JOIN recipe rp USING (lang, source), tot t
),
draws AS (
  SELECT doc_id, lang, source,
         CAST(({h8}) % 1000000 AS BIGINT) AS draw_ppm
  FROM documents
)
SELECT d.doc_id, d.lang, d.source, d.draw_ppm, c.accept_ppm,
       d.draw_ppm < c.accept_ppm AS accepted
FROM draws d JOIN cells c USING (lang, source)
"""


def q_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: flag corpus docs sharing ≥ 1
    13-gram with an eval-set item (GPT-3 appendix-C style hygiene
    check). The eval set is synthesized deterministically from the
    corpus itself — tokens 5..30 of every doc_id ≡ 0 (mod 41) — so the
    screen provably catches at least each item's source doc. The tiny
    eval shingle relation is broadcast: the corpus side streams through
    a broadcast hash join, never an all-pairs comparison."""
    from .operators.dedup import contamination_screen, normalized_text

    docs = _t(spark, sf_dir, "documents")
    norm_toks = F.split(normalized_text(F.col("text")), " ")
    evalset = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(norm_toks, 5, 26), " ").alias("text"),
    )
    return contamination_screen(docs, evalset, n=_SUBSTR_N)


SQL_CONTAMINATION_SCREEN = f"""
WITH norm AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM norm),
doc_sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, CAST(i AS INT),
                                    CAST(i AS INT) + {_SUBSTR_N - 1}),
                         ' ') AS shingle
  FROM toks,
       LATERAL unnest(generate_series(1, greatest(len(tk) - {_SUBSTR_N - 1},
                                                  1))) s(i)
),
ev AS (
  SELECT doc_id AS eval_id,
         string_split(array_to_string(list_slice(tk, 5, 30), ' '), ' ') AS tk
  FROM toks WHERE doc_id % 41 = 0
),
ev_sh AS (
  SELECT DISTINCT eval_id,
         array_to_string(list_slice(tk, CAST(i AS INT),
                                    CAST(i AS INT) + {_SUBSTR_N - 1}),
                         ' ') AS shingle
  FROM ev,
       LATERAL unnest(generate_series(1, greatest(len(tk) - {_SUBSTR_N - 1},
                                                  1))) s(i)
)
SELECT d.doc_id, e.eval_id, COUNT(*) AS n_shared_grams
FROM doc_sh d JOIN ev_sh e USING (shingle)
GROUP BY 1, 2
"""


def q_unigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative familiarity score with head/middle/tail buckets —
    the LM-free analogue of CCNet's perplexity bucketing. Per token,
    familiarity = floor(log2(corpus unigram count)) (an INTEGER that is
    cross-engine exact: log2 is exactly k at 2^k on both engines and
    irrational elsewhere, so 1-ulp libm differences cannot cross the
    floor boundary); per doc, the mean familiarity in integer e6 via
    `div`. Buckets split at fixed thresholds so the output is pure
    integers/strings. Plan: one explode + one unigram hash aggregate
    (map-side combine) joined back onto the token stream + one per-doc
    aggregate — the corpus is scanned once.  The counts relation is
    vocabulary-sized, so the join is SIZE-AWARE: broadcast only while
    the corpus scan's Catalyst size bound (a sound upper bound on
    vocabulary bytes — every distinct term occurs in the text) fits
    under ``igtdetect.broadcastBoundBytes`` (default 64 MB); at corpus
    scales where Heaps' law breaks that bound, the planner gets a
    plain shuffle join on term (see operators/scale.py)."""
    from .operators.scale import maybe_broadcast, plan_size_bytes

    docs = _t(spark, sf_dir, "documents")
    _vocab_bound = plan_size_bytes(docs)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), r"[ \t\n\r\f\x0b]+", " "
                    )
                ),
                " ",
            )
        ).alias("term"),
    ).filter(F.length("term") >= 1)
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    fam = toks.join(
        maybe_broadcast(counts, bound_bytes=_vocab_bound), "term"
    ).select(
        "doc_id",
        F.expr("CAST(floor(log2(cnt)) AS BIGINT)").alias("_fam"),
    )
    per_doc = fam.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr("CAST(sum(_fam) * 1000000 div count(1) AS BIGINT)")
        .alias("familiarity_e6"),
    )
    return per_doc.select(
        "doc_id", "n_tokens", "familiarity_e6",
        F.when(F.col("familiarity_e6") >= 4_000_000, F.lit("head"))
        .when(F.col("familiarity_e6") >= 2_000_000, F.lit("middle"))
        .otherwise(F.lit("tail")).alias("bucket"),
    )


SQL_UNIGRAM_FAMILIARITY = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text),
                '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
ft AS (SELECT doc_id, term FROM toks WHERE length(term) >= 1),
counts AS (SELECT term, COUNT(*) AS cnt FROM ft GROUP BY 1),
fam AS (
  SELECT f.doc_id, CAST(floor(log2(c.cnt)) AS BIGINT) AS fam
  FROM ft f JOIN counts c USING (term)
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST((SUM(fam) * 1000000) // COUNT(*) AS BIGINT)
           AS familiarity_e6
  FROM fam GROUP BY doc_id
)
SELECT doc_id, n_tokens, familiarity_e6,
       CASE WHEN familiarity_e6 >= 4000000 THEN 'head'
            WHEN familiarity_e6 >= 2000000 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM per_doc
"""


def q_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-signal family (duplicate-line fraction and
    char fraction, top bi/trigram char coverage) — zero-shuffle native
    per-doc expressions on the Spark side (sorted-array run-length
    aggregates), relational unnest + GROUP BY on the oracle side; both
    break the top-gram tie toward the lexicographically largest gram
    and ratio-then-scale in the same association so the e6 floors
    agree bit-for-bit."""
    from .operators.text_analysis import repetition_ratios

    return repetition_ratios(_t(spark, sf_dir, "documents"))


SQL_REPETITION_RATIOS = r"""
WITH lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id,
               unnest(string_split(coalesce(text, ''), chr(10))) AS l
        FROM documents)
  WHERE length(trim(l)) > 0
),
lstats AS (
  SELECT doc_id, COUNT(*) AS n_lines,
         CAST(SUM(length(line)) AS BIGINT) AS tot_chars,
         COUNT(DISTINCT line) AS n_distinct
  FROM lines GROUP BY 1
),
ldup AS (
  SELECT doc_id, CAST(SUM((cnt - 1) * len) AS BIGINT) AS dup_chars
  FROM (SELECT doc_id, line, COUNT(*) AS cnt, length(line) AS len
        FROM lines GROUP BY doc_id, line)
  GROUP BY 1
),
toks AS (
  SELECT doc_id,
         list_filter(
           string_split(trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk
  FROM documents
),
tstats AS (
  SELECT doc_id, len(tk) AS n_tok,
         length(array_to_string(tk, ' ')) AS tok_chars
  FROM toks
),
g2 AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, CAST(i AS INT),
                                    CAST(i AS INT) + 1), ' ') AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) s(i)
  WHERE len(tk) >= 2
),
top2 AS (
  SELECT doc_id, CAST(cnt * length(gram) AS BIGINT) AS mass
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram DESC
               ) AS rn
        FROM g2 GROUP BY doc_id, gram)
  WHERE rn = 1
),
g3 AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, CAST(i AS INT),
                                    CAST(i AS INT) + 2), ' ') AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 2)) s(i)
  WHERE len(tk) >= 3
),
top3 AS (
  SELECT doc_id, CAST(cnt * length(gram) AS BIGINT) AS mass
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram DESC
               ) AS rn
        FROM g3 GROUP BY doc_id, gram)
  WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(ls.n_lines, 0) AS n_lines,
       CAST(floor((CAST(ls.n_lines - ls.n_distinct AS DOUBLE) / ls.n_lines)
                  * 1e6) AS BIGINT) AS dup_line_frac_e6,
       CAST(floor((CAST(ld.dup_chars AS DOUBLE) / ls.tot_chars)
                  * 1e6) AS BIGINT) AS dup_line_char_frac_e6,
       CAST(floor((CAST(t2.mass AS DOUBLE) / ts.tok_chars)
                  * 1e6) AS BIGINT) AS top_bigram_char_frac_e6,
       CAST(floor((CAST(t3.mass AS DOUBLE) / ts.tok_chars)
                  * 1e6) AS BIGINT) AS top_trigram_char_frac_e6
FROM documents d
LEFT JOIN lstats ls USING (doc_id)
LEFT JOIN ldup ld USING (doc_id)
LEFT JOIN tstats ts USING (doc_id)
LEFT JOIN top2 t2 USING (doc_id)
LEFT JOIN top3 t3 USING (doc_id)
"""


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel — the whole pipeline's gates composed
    on one corpus, reported as cumulative survivor counts: quality
    (Gopher gates) → exact-dup keep-one → near-dup representative →
    benchmark-contamination clean. One row of five BIGINTs; every gate
    reuses the exact operator the standalone query grades.

    Round 6 (§2.4): the fingerprint subtree fed BOTH the keep-one
    aggregate and the per-doc join — Catalyst re-executes duplicated
    subtrees, so normalize+md5 ran twice over the corpus (noop-isolated
    6.1 s of the funnel's 12 s); the narrow (doc_id, md5) relation is
    now persisted and released per invocation. The flags join starts
    from gopher's 1:1 output instead of a fifth corpus scan, and the
    contamination gate — whose shared-gram COUNTS the funnel prunes
    anyway — joins against the eval set's DISTINCT shingles and
    dedups doc_id in ONE exchange instead of two (pair aggregate +
    distinct). The near-dup kernel's persist handles are carried to
    the returned frame (the q_clustering_coeffs lesson)."""
    from .operators.dedup import (
        attach_plan_cache,
        doc_tokens,
        neardup_clusters,
        word_shingles,
    )
    from .operators.text_analysis import gopher_filters

    docs = _t(spark, sf_dir, "documents")
    gt = gopher_filters(docs).select("doc_id", "gopher_pass")
    # ONE persisted tokenize pass feeds the fingerprint, the minhash
    # kernel, the corpus 13-gram shingles AND the eval-set slice —
    # md5(array_join(_toks, " ")) == md5(normalized_text) exactly
    # (normalize output is trimmed/single-spaced, so split⁻¹ == join)
    toks = doc_tokens(docs).persist()
    fp = toks.select(
        "doc_id", F.md5(F.array_join("_toks", " ")).alias("fingerprint")
    )
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("_keep"))
    ex = fp.join(keep, "fingerprint").select(
        "doc_id", (F.col("doc_id") == F.col("_keep")).alias("exact_keep")
    )
    ndf = neardup_clusters(docs, tokens=toks)
    nd = ndf.select("doc_id", F.col("is_representative").alias("is_rep"))
    ev_toks = toks.filter(F.col("doc_id") % 41 == 0).select(
        "doc_id",
        F.split(
            F.array_join(F.slice("_toks", 5, 26), " "), " "
        ).alias("_toks"),
    )
    # same kernel the contamination_screen operator uses; a doc is
    # contaminated iff it shares ANY shingle with ANY eval item, so the
    # distinct-shingle probe yields the identical doc_id set
    ev_sh = (
        word_shingles(None, _SUBSTR_N, tokens=ev_toks)
        .select("shingle").distinct()
    )
    cont = (
        word_shingles(None, _SUBSTR_N, tokens=toks)
        .join(F.broadcast(ev_sh), "shingle")
        .select("doc_id").distinct().withColumn("_c", F.lit(1))
    )
    flags = (
        gt.join(ex, "doc_id")
        .join(nd, "doc_id")
        .join(cont, "doc_id", "left")
    )
    q, e = F.col("gopher_pass"), F.col("exact_keep")
    r, nc = F.col("is_rep"), F.col("_c").isNull()
    out = flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(q.cast("long")).alias("n_quality"),
        F.sum((q & e).cast("long")).alias("n_after_exact"),
        F.sum((q & e & r).cast("long")).alias("n_after_neardup"),
        F.sum((q & e & r & nc).cast("long")).alias("n_clean"),
    )
    attach_plan_cache(out, toks)
    for h in getattr(ndf, "_plan_cache_handles", []):
        attach_plan_cache(out, h)
    return out


def _sql_curation_funnel() -> str:
    import re as _re

    # gopher CTEs, renamed g_* to avoid collision with the shingle CTEs
    g = SQL_GOPHER_FILTERS.strip()
    assert g.startswith("WITH ")
    head, tail = g[len("WITH "):].rsplit("\nSELECT *,", 1)
    for name in ("toks", "bg", "topbg", "scalars", "joined"):
        head = _re.sub(rf"\b{name}\b", f"g_{name}", head)
    gopher_bool = tail.rsplit("FROM", 1)[0].strip()  # "(...) AS gopher_pass"

    # contamination CTEs minus its norm/toks (identical to the shared
    # shingle norm/toks already in scope)
    c = SQL_CONTAMINATION_SCREEN
    cont_ctes = c[c.index("doc_sh AS"):c.index("\nSELECT")].rstrip()

    return f"""
WITH RECURSIVE {_SQL_SHINGLES},{_sql_minhash_bands_cte()},
{_SQL_CC_CTES},
nd AS (SELECT doc_id, doc_id = cluster_id AS is_rep FROM assigned),
{head},
gt AS (SELECT doc_id, {gopher_bool} FROM g_joined),
fps AS (SELECT doc_id, md5({_SQL_NORM}) AS fp FROM documents),
keepx AS (SELECT fp, MIN(doc_id) AS keep_id FROM fps GROUP BY 1),
ex AS (SELECT f.doc_id, f.doc_id = k.keep_id AS exact_keep
       FROM fps f JOIN keepx k USING (fp)),
{cont_ctes},
cont AS (SELECT DISTINCT d.doc_id
         FROM doc_sh d JOIN ev_sh e USING (shingle)),
flags AS (
  SELECT d.doc_id, gt.gopher_pass, ex.exact_keep, nd.is_rep,
         (c.doc_id IS NULL) AS not_contaminated
  FROM documents d
  JOIN gt USING (doc_id)
  JOIN ex USING (doc_id)
  JOIN nd USING (doc_id)
  LEFT JOIN cont c USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(SUM(CASE WHEN gopher_pass AND exact_keep
                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_exact,
       CAST(SUM(CASE WHEN gopher_pass AND exact_keep AND is_rep
                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_neardup,
       CAST(SUM(CASE WHEN gopher_pass AND exact_keep AND is_rep
                     AND not_contaminated
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM flags
"""


# ---------------------------------------------------------------------------
# Corpus-cleaning family: C4 rules, corpus line dedup, PII redaction, DSIR
# ---------------------------------------------------------------------------

# Shared oracle CTE: whitespace tokens per document (mirror of
# operators.cleaning._words — same explicit WS class as the Spark side).
_SQL_CLEAN_TOKS = r"""
toks AS (
  SELECT doc_id,
         list_filter(
           string_split(trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk
  FROM documents)
"""

# Shared oracle CTE fragment: 8-token pseudo-line chunks (mirror of
# operators.cleaning.pseudo_lines — chunk i covers 1-based tokens
# i*8+1 .. i*8+8; empty docs emit one empty chunk, like posexplode of
# the Spark side's singleton-[''] chunk array).
_SQL_PSEUDO_LINES = r"""
lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         coalesce(array_to_string(list_slice(tk, CAST(i * 8 + 1 AS INT),
                                    CAST(i * 8 + 8 AS INT)), ' '), '')
           AS line
  FROM toks, LATERAL unnest(generate_series(
         0, greatest(CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1, 0))) s(i))
"""


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule cleaning (terminal-punctuation + min-word line
    gates, lorem-ipsum / curly-brace / min-kept-lines page gates) over
    documents re-rendered as deterministic pseudo-lines: 8-token
    chunks, with a terminal '.' on every line where
    (doc_id + pos) % 3 == 0 so each gate has both passing and failing
    population (the driver corpus itself carries no newlines or
    punctuation). Zero shuffles — one per-row codegen stage."""
    from .operators.cleaning import c4_clean, paged_text

    return c4_clean(paged_text(_t(spark, sf_dir, "documents")))


SQL_C4_CLEAN = r"""
WITH
""" + _SQL_CLEAN_TOKS + r""",
paged AS (
  SELECT doc_id,
         string_agg(
           -- coalesce: DuckDB's array_to_string over an EMPTY slice is
           -- NULL where Spark's array_join is '' (empty/NULL docs)
           coalesce(array_to_string(list_slice(tk, CAST(i * 8 + 1 AS INT),
                                      CAST(i * 8 + 8 AS INT)), ' '), '')
           || CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END,
           chr(10) ORDER BY i) AS text
  FROM toks, LATERAL unnest(generate_series(
         0, greatest(CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1, 0))) s(i)
  GROUP BY doc_id),
split AS (
  SELECT doc_id, text,
         list_transform(string_split(coalesce(text, ''), chr(10)),
                        l -> trim(l)) AS lines
  FROM paged),
gated AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]$') AND
           len(list_filter(
                 string_split(trim(regexp_replace(l,
                   '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
                 w -> length(w) > 0)) >= 5) AS kept
  FROM split),
flags AS (
  SELECT doc_id, lines, kept,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{') AS has_brace,
         (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{')) AS page_kept
  FROM gated)
SELECT doc_id,
       CASE WHEN page_kept THEN array_to_string(kept, chr(10))
            ELSE '' END AS clean_text,
       CAST(len(lines) AS INTEGER) AS n_lines,
       CAST(len(kept) AS INTEGER) AS n_kept,
       CAST(has_lorem AS INTEGER) AS has_lorem,
       CAST(has_brace AS INTEGER) AS has_brace,
       CAST(page_kept AS INTEGER) AS page_kept
FROM flags
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style corpus-level duplicated-line removal over the
    same 8-token pseudo-lines: any line occurring in ≥ 2 distinct
    documents is removed from every document (boilerplate semantics).
    The duplicated-line relation is corpus-derived, so the join uses
    the size-aware broadcast-XOR-shuffle_hash helper with the corpus
    scan's Catalyst bytes as the sound bound — never an unconditional
    broadcast of a corpus-sized relation (operators/scale.py)."""
    from .operators.cleaning import corpus_line_dedup, pseudo_lines
    from .operators.scale import plan_size_bytes

    docs = _t(spark, sf_dir, "documents")
    return corpus_line_dedup(
        pseudo_lines(docs), min_docs=2,
        corpus_bound_bytes=plan_size_bytes(docs),
    )


SQL_LINE_DEDUP = r"""
WITH
""" + _SQL_CLEAN_TOKS + "," + _SQL_PSEUDO_LINES + r""",
dup AS (
  SELECT line FROM lines WHERE length(line) > 0
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (
  SELECT l.doc_id, l.pos, l.line, d.line IS NOT NULL AS is_dup
  FROM lines l LEFT JOIN dup d ON l.line = d.line)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM marked
GROUP BY doc_id
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails → <EMAIL>, IPv4 → <IP>, +N-NNN-NNNN
    phones → <PHONE>) with per-kind counts. The driver corpus contains
    no PII, so the query plants a deterministic contact trailer derived
    from doc_id on BOTH engines before redacting — every pattern fires
    on every row and the redaction cascade (email, then IP on the
    email-redacted text, then phone) is exercised end-to-end. Zero
    shuffles; patterns restricted to the Java∩RE2 regex subset."""
    from .operators.cleaning import pii_redact

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"), d.cast("string"),
            F.lit("@mail.example.com ip 10."),
            (d % 256).cast("string"), F.lit(".0."),
            ((d * 7) % 256).cast("string"),
            F.lit(" tel +1-555-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_redact(aug)


SQL_PII_REDACT = r"""
WITH aug AS (
  SELECT doc_id,
         coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@mail.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
         || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         || ' tel +1-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents),
steps AS (
  SELECT doc_id, text,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS after_email
  FROM aug),
steps2 AS (
  SELECT *,
         regexp_replace(after_email,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
           AS after_ip
  FROM steps)
SELECT doc_id,
       regexp_replace(after_ip, '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g')
         AS redacted_text,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(after_ip,
         '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(after_email,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
FROM steps2
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023):
    score every document by Σ_grams log(p_target/p_raw) over 1024 md5
    hash buckets of unigrams+bigrams, target = lang='en'. Per-bucket
    log-ratios are floored to integer micro-units BEFORE the per-doc
    sum, so the aggregate is an order-independent integer sum — exact
    cross-engine hashing without float-summation drift. The per-bucket
    stats relation is bounded at 1024 rows by construction, so its
    broadcast is safe at any corpus scale."""
    from .operators.sampling import dsir_weights

    return dsir_weights(
        _t(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def _sql_dsir_weights(n_buckets: int = 1024) -> str:
    h8 = _SQL_HEX12.replace(
        "generate_series(1, 12)", "generate_series(1, 8)"
    ).replace("((12 - i) * 4)", "((8 - i) * 4)").format(
        H="substring(md5(gram), 1, 8)"
    )
    B = n_buckets
    return r"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         list_filter(
           string_split(trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk
  FROM documents),
grams AS (
  SELECT doc_id, is_target, unnest(tk) AS gram FROM toks
  UNION ALL
  SELECT doc_id, is_target,
         list_extract(tk, CAST(i AS INT)) || ' '
           || list_extract(tk, CAST(i + 1 AS INT)) AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) s(i)
  WHERE len(tk) >= 2),
""" + f"""
b AS (
  SELECT doc_id, is_target, ({h8}) % {B} AS bucket FROM grams),
stats AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
           AS ct
  FROM b GROUP BY 1),
tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt
  FROM stats),
bw AS (
  SELECT bucket,
         CAST(floor(ln(
           (CAST(ct + 1 AS DOUBLE) * CAST(tr + {B} AS DOUBLE))
           / (CAST(cr + 1 AS DOUBLE) * CAST(tt + {B} AS DOUBLE))
         ) * 1e6) AS BIGINT) AS w_e6
  FROM stats, tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(w_e6) AS BIGINT) AS weight_e6
FROM b JOIN bw USING (bucket)
GROUP BY doc_id
"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-then-chunk into 512-token
    training windows per (lang, source) stratum): where every document
    lands in the packed token stream — start pack, offset, and how many
    windows it spans. Pure integer arithmetic (BIGINT cumsum + integral
    DIV) so offsets stay exact past 2^53 total tokens; one shuffle on
    the stratum key, cumsum parallel across strata."""
    from .operators.sampling import sequence_pack

    return sequence_pack(_t(spark, sf_dir, "documents"))


SQL_SEQUENCE_PACK = r"""
WITH t AS (
  SELECT doc_id, lang, source,
         CAST(len(list_filter(
           string_split(trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY lang, source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM t)
SELECT doc_id, lang, source, n_tokens,
       CAST((cum_end - n_tokens) // 512 AS BIGINT) AS start_pack,
       CAST((cum_end - n_tokens) % 512 AS BIGINT) AS start_offset,
       CAST(CASE WHEN n_tokens = 0 THEN 0
                 ELSE (cum_end - 1) // 512
                      - (cum_end - n_tokens) // 512 + 1
            END AS BIGINT) AS n_chunks
FROM c
"""


def q_cleaning_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning gates COMPOSED end-to-end (the cleaning-family
    analogue of curation_funnel): deterministic paged rendering →
    corpus-level boilerplate line removal → C4 page gates on the
    deduped text, reported as one summary row (doc/line totals,
    boilerplate lines removed, pages and lines surviving C4). Every
    stage reuses the exact operator its standalone query grades; the
    oracle composes the same CTE fragments. Deliberately NOT in bench
    (it would double-count already-timed work)."""
    from .operators.cleaning import c4_clean, corpus_line_dedup, paged_text
    from .operators.scale import plan_size_bytes

    docs = _t(spark, sf_dir, "documents")
    paged = paged_text(docs)
    lines = paged.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
    )
    deduped = corpus_line_dedup(
        lines, min_docs=2, corpus_bound_bytes=plan_size_bytes(docs)
    )
    cleaned = c4_clean(
        deduped.select("doc_id", F.col("clean_text").alias("text"))
    )
    joined = deduped.select("doc_id", "n_lines", "n_removed").join(
        cleaned.select("doc_id", "n_kept", "page_kept"), "doc_id"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines").alias("n_lines"),
        F.sum("n_removed").alias("n_boiler_removed"),
        F.sum(F.col("page_kept").cast("long")).alias("n_pages_kept"),
        F.sum(
            F.when(F.col("page_kept") == 1, F.col("n_kept").cast("long"))
            .otherwise(F.lit(0))
        ).alias("n_lines_kept"),
    )


SQL_CLEANING_FUNNEL = r"""
WITH
""" + _SQL_CLEAN_TOKS + r""",
paged AS (
  SELECT doc_id,
         string_agg(
           -- coalesce: DuckDB's array_to_string over an EMPTY slice is
           -- NULL where Spark's array_join is '' (empty/NULL docs)
           coalesce(array_to_string(list_slice(tk, CAST(i * 8 + 1 AS INT),
                                      CAST(i * 8 + 8 AS INT)), ' '), '')
           || CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END,
           chr(10) ORDER BY i) AS text
  FROM toks, LATERAL unnest(generate_series(
         0, greatest(CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1, 0))) s(i)
  GROUP BY doc_id),
plines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         list_extract(ls, CAST(i AS INT)) AS line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM paged),
       LATERAL unnest(generate_series(1, len(ls))) s(i)),
dup AS (
  SELECT line FROM plines WHERE length(line) > 0
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (
  SELECT l.doc_id, l.pos, l.line, d.line IS NOT NULL AS is_dup
  FROM plines l LEFT JOIN dup d ON l.line = d.line),
deduped AS (
  SELECT doc_id,
         coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                             chr(10) ORDER BY pos), '') AS text,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM marked GROUP BY doc_id),
c4split AS (
  SELECT doc_id, text, n_lines, n_removed,
         list_transform(string_split(coalesce(text, ''), chr(10)),
                        l -> trim(l)) AS lines
  FROM deduped),
c4gated AS (
  SELECT doc_id, text, n_lines, n_removed,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]$') AND
           len(list_filter(
                 string_split(trim(regexp_replace(l,
                   '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
                 w -> length(w) > 0)) >= 5) AS kept
  FROM c4split),
flags AS (
  SELECT doc_id, n_lines, n_removed, len(kept) AS n_kept,
         (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{')) AS page_kept
  FROM c4gated)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(n_removed) AS BIGINT) AS n_boiler_removed,
       CAST(SUM(CASE WHEN page_kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pages_kept,
       CAST(SUM(CASE WHEN page_kept THEN n_kept ELSE 0 END) AS BIGINT)
         AS n_lines_kept
FROM flags
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup of a crawl increment against an existing
    corpus's fingerprint store (historical corpus never re-scanned).
    Deterministic split: docs with doc_id % 3 == 0 play the existing
    corpus, the full table plays the increment — so a third of the
    increment is flagged seen and the rest admitted. Seen-relation join
    is size-aware broadcast-XOR-shuffle (operators/scale.py)."""
    from .operators.dedup import (
        attach_plan_cache, fingerprint_docs, incremental_dedup,
    )
    from .operators.scale import plan_size_bytes

    docs = _t(spark, sf_dir, "documents")
    # ONE persisted fingerprint scan serves increment AND store: the
    # doc_id filter commutes with the md5 projection, so filtering the
    # fingerprinted relation yields exactly fingerprint_docs(filtered
    # docs) — the normalize+md5 pass over the corpus runs once instead
    # of three times (increment join, keep-first, store derivation).
    fp = fingerprint_docs(docs).persist()
    seen = fp.filter(F.col("doc_id") % 3 == 0).select("fingerprint")
    out = incremental_dedup(
        docs, seen, corpus_bound_bytes=plan_size_bytes(docs),
        fingerprints=fp,
    )
    return attach_plan_cache(out, fp)


SQL_INCREMENTAL_DEDUP = f"""
WITH fp AS (
  SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents),
seen AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 3 = 0),
first AS (
  SELECT fingerprint, MIN(doc_id) AS first_id FROM fp GROUP BY 1)
SELECT f.doc_id, f.fingerprint,
       CAST(s.fingerprint IS NOT NULL AS INTEGER) AS seen_in_corpus,
       CAST(f.doc_id = fi.first_id AS INTEGER) AS first_in_increment,
       CAST(s.fingerprint IS NULL AND f.doc_id = fi.first_id AS INTEGER)
         AS is_new
FROM fp f
LEFT JOIN seen s USING (fingerprint)
JOIN first fi USING (fingerprint)
"""


def q_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup — EXACT same output contract
    as `incremental_dedup` (graded against the same oracle), but the
    increment probes a fixed-size broadcast Bloom bitset built from the
    historical store first, so only the hit fraction (true dups + ~0.8%
    false positives at 10 bits/key) pays the store join; misses are
    definitively new with no join at all. The false-positive rate costs
    extra join rows, never correctness (operators/dedup.py
    incremental_dedup_bloom)."""
    from .operators.dedup import (
        attach_plan_cache, fingerprint_docs, incremental_dedup_bloom,
    )
    from .operators.scale import plan_size_bytes

    docs = _t(spark, sf_dir, "documents")
    # Same single-persisted-fingerprint-scan shape as
    # q_incremental_dedup; the Bloom bitset build also collects from
    # the cached relation instead of re-hashing the corpus.
    fp = fingerprint_docs(docs).persist()
    seen = fp.filter(F.col("doc_id") % 3 == 0).select("fingerprint")
    out = incremental_dedup_bloom(
        docs, seen, corpus_bound_bytes=plan_size_bytes(docs),
        fingerprints=fp,
    )
    return attach_plan_cache(out, fp)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLM-style temperature-sampling mixture shares per language
    (alpha=0.3): observed share_ppm and the flattened temp_share_ppm —
    the integer-ppm recipe convention mixture_resample consumes
    (distribute a language's share across its cells to feed it
    directly). One tiny group
    aggregate; the only float op (pow) is floored to integer nano-units
    per group before any summation, so the shares are exact BIGINT
    arithmetic cross-engine."""
    from .operators.sampling import temperature_mixture

    return temperature_mixture(_t(spark, sf_dir, "documents"))


SQL_TEMPERATURE_MIXTURE = r"""
WITH counts AS (
  SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM counts),
wts AS (
  SELECT grp, n_docs, total,
         CAST(floor(pow(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE),
                        0.3) * 1e9) AS BIGINT) AS w_e9
  FROM counts, tot),
s AS (SELECT *, CAST(SUM(w_e9) OVER () AS BIGINT) AS w_sum FROM wts)
SELECT grp AS lang, n_docs,
       CAST((n_docs * 1000000) // total AS BIGINT) AS share_ppm,
       CAST((w_e9 * 1000000) // w_sum AS BIGINT) AS temp_share_ppm
FROM s
"""


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection ("keep the best 25% of tokens"):
    admit documents in (quality score DESC, doc_id) order while the
    inclusive running token sum fits 250000 ppm of the corpus's total
    tokens. The score is all-integer (distinct-token ratio + alnum
    ratio, exact `x*1e6 div y` millionths) so there is no float
    anywhere in the contract. The Spark plan is the two-pass HISTOGRAM
    threshold — per-score-bucket token masses (≤201 rows by
    construction) pick the cut, only the single boundary bucket pays a
    window — instead of the global sort the oracle spells, so the
    output is identical while the shuffle is ~1/201 of the corpus
    (operators/sampling.py:budget_select for the full argument)."""
    from .operators.sampling import budget_select

    return budget_select(_t(spark, sf_dir, "documents"))


SQL_BUDGET_SELECT = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(
           string_split(trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk,
         coalesce(text, '') AS txt
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(coalesce(len(list_distinct(tk)) * 1000000 // len(tk), 0)
              + coalesce(length(regexp_replace(txt, '[^a-zA-Z0-9 ]',
                                               '', 'g'))
                         * 1000000 // nullif(length(txt), 0), 0)
              AS BIGINT) AS score_e6
  FROM t),
c AS (
  SELECT m.*,
         CAST(SUM(n_tokens) OVER (
           ORDER BY score_e6 DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n_tokens) OVER () * 250000 // 1000000 AS BIGINT)
           AS budget
  FROM m)
SELECT doc_id, n_tokens, score_e6 FROM c WHERE cum <= budget
"""


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised perplexity filter: per-document NLL under a
    Laplace-smoothed corpus bigram LM, bucketed head/middle/tail —
    the CCNet gate without an external model. Per-bigram-TYPE log-prob
    floored to integer micro-units once, per-doc NLL an integer sum
    (dsir float discipline). Every vocabulary-sized join (unigram
    counts into bigram counts, LM relation onto the bigram stream) is
    size-aware broadcast-XOR-shuffle via operators/scale.py."""
    from .operators.text_analysis import bigram_lm_scores

    return bigram_lm_scores(_t(spark, sf_dir, "documents"))


SQL_BIGRAM_LM_SCORE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           string_split(trim(regexp_replace(lower(coalesce(text, '')),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk
  FROM documents),
uni AS (SELECT unnest(tk) AS term FROM toks),
c1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM c1),
bg AS (
  SELECT doc_id,
         list_extract(tk, CAST(i AS INT)) AS w1,
         list_extract(tk, CAST(i + 1 AS INT)) AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) s(i)
  WHERE len(tk) >= 2),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
rel AS (
  SELECT w1, w2,
         CAST(floor(ln(CAST(c2 + 1 AS DOUBLE)
                       / CAST(c1.c1 + v.nv AS DOUBLE)) * 1e6)
              AS BIGINT) AS w_e6
  FROM c2 JOIN c1 ON c2.w1 = c1.term CROSS JOIN v),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(-SUM(w_e6) AS BIGINT) AS nll_e6
  FROM bg JOIN rel USING (w1, w2) GROUP BY doc_id)
SELECT doc_id, n_bigrams, nll_e6,
       CAST(nll_e6 // n_bigrams AS BIGINT) AS avg_nll_e6,
       CASE WHEN nll_e6 // n_bigrams < 3390000 THEN 'head'
            WHEN nll_e6 // n_bigrams < 3420000 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM per_doc
"""


def q_nb_domain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-supervised multinomial Naive Bayes domain classifier
    trained on the corpus's own `source` labels and applied back to
    every document (the DCLM/CCNet routing trick). Unseen (term,label)
    pairs get true Laplace smoothing via a complete vocabulary×labels
    grid; every log is floored to integer micro-units on the bounded
    relation so per-doc scores are exact integer sums; the grid join is
    size-aware broadcast-XOR-shuffle (operators/scale.py). Ties break
    toward the lexicographically smallest label."""
    from .operators.text_analysis import nb_domain_scores

    return nb_domain_scores(_t(spark, sf_dir, "documents"))


SQL_NB_DOMAIN_SCORE = r"""
WITH toks AS (
  SELECT doc_id, source AS lab,
         list_filter(
           string_split(trim(regexp_replace(lower(coalesce(text, '')),
                        '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
           x -> length(x) > 0) AS tk
  FROM documents),
stream AS (SELECT doc_id, lab, unnest(tk) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM stream GROUP BY 1, 2),
vocab AS (SELECT DISTINCT term FROM stream),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM vocab),
lab AS (
  SELECT lab AS label, CAST(COUNT(*) AS BIGINT) AS d_l
  FROM toks GROUP BY 1),
dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM toks),
tl AS (
  SELECT lab AS label, CAST(COUNT(*) AS BIGINT) AS t_l
  FROM stream GROUP BY 1),
labels AS (
  SELECT l.label, t_l, nv,
         CAST(floor(ln(CAST(d_l AS DOUBLE) / CAST(d AS DOUBLE)) * 1e6)
              AS BIGINT) AS prior_e6
  FROM lab l JOIN tl USING (label) CROSS JOIN dd CROSS JOIN v),
ctl AS (
  SELECT term, lab AS label, CAST(COUNT(*) AS BIGINT) AS ctl
  FROM stream GROUP BY 1, 2),
grid AS (
  SELECT vocab.term, labels.label, labels.prior_e6,
         CAST(floor(ln(CAST(coalesce(ctl.ctl, 0) + 1 AS DOUBLE)
                       / CAST(labels.t_l + labels.nv AS DOUBLE)) * 1e6)
              AS BIGINT) AS w_e6
  FROM vocab CROSS JOIN labels
  LEFT JOIN ctl ON ctl.term = vocab.term AND ctl.label = labels.label),
per_label AS (
  SELECT tf.doc_id, g.label,
         CAST(g.prior_e6 + SUM(tf.tf * g.w_e6) AS BIGINT) AS score_e6
  FROM tf JOIN grid g USING (term)
  GROUP BY 1, 2, g.prior_e6),
ranked AS (
  SELECT doc_id, label, score_e6,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score_e6 DESC, label) AS rn,
         LEAD(score_e6) OVER (
           PARTITION BY doc_id ORDER BY score_e6 DESC, label) AS nxt
  FROM per_label)
SELECT doc_id, label AS pred_label, score_e6,
       CAST(score_e6 - coalesce(nxt, score_e6) AS BIGINT) AS margin_e6
FROM ranked WHERE rn = 1
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) on fixed seeded centroids: cluster
    the embeddings, then inside each cluster drop the closer-to-centroid
    member of every pair above the cosine threshold (keep-the-outlier).
    k = 64 ~ sqrt(n) at sf0.1 (the paper's sizing), with centroids
    SAMPLED FROM THE DATA (the 64 smallest vec_ids — a bounded 64-row
    collect at plan build, the same class as a model load): seeded
    random centroids sat nowhere near the embedding distribution, so
    every vector fell into ONE cluster and the pair stage ran the full
    n²/2 — the measured 50 s round-5 wall. Data-sampled centroids make
    the quantizer actually split, which is the whole point of
    quantizer-as-salt; both engines read the same 64 seed rows.
    Fixed quantizer → the ENTIRE verdict (assignment, pair gate,
    dominance, survivor flags) is deterministic and gets a full DuckDB
    oracle; the k-means-trained quantizer is the same code path via
    ``kmeans_centroids`` (pytest-covered)."""
    import numpy as np

    from .operators.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    seeds = emb.orderBy("vec_id").limit(64).select("embedding").collect()
    C = np.array([r["embedding"] for r in seeds], dtype=float)
    return semdedup(emb, threshold=0.35, n_lists=len(C), centroids=C)


def _sql_semdedup(threshold: float = 0.35, n_lists: int = 64,
                  dim: int = 64) -> str:
    d2 = (f"list_sum(list_transform(generate_series(1, {dim}), "
          f"i -> (v[i] - c[i]) * (v[i] - c[i])))")
    thr_e6 = int(threshold * 1e6)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {n_lists})
),
d AS (
  SELECT e.vec_id, e.v, cents.cid, {d2} AS d2
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, cid AS cluster_id,
         CAST(floor(d2 * 1e6) AS BIGINT) AS d2_e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn FROM d
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, a.d2_e6 AS d2_a,
         b.vec_id AS id_b, b.d2_e6 AS d2_b,
         CAST(floor(
           list_sum(list_transform(generate_series(1, len(a.v)),
               i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(a.v, y -> y * y)))
            * sqrt(list_sum(list_transform(b.v, y -> y * y)))) * 1e6
         ) AS BIGINT) AS sim_e6
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
),
removed AS (
  SELECT CASE WHEN d2_a > d2_b THEN id_b
              WHEN d2_b > d2_a THEN id_a
              ELSE greatest(id_a, id_b) END AS vec_id,
         MAX(sim_e6) AS dup_sim_e6
  FROM pairs WHERE sim_e6 >= {thr_e6} GROUP BY 1
)
SELECT a.vec_id, CAST(a.cluster_id AS INT) AS cluster_id,
       r.dup_sim_e6 IS NULL AS kept, r.dup_sim_e6
FROM assigned a LEFT JOIN removed r USING (vec_id)
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + freshest-crawl dedup (CC-Net/RefinedWeb
    curation step) over a deterministic synthetic page-URL table derived
    from md5(doc_id) nibbles identically on both engines — scheme/www/
    default-port/tracking-param/param-order/fragment/trailing-slash
    variants all collapse; the survivor is the latest fetch (smallest
    doc_id on a timestamp tie)."""
    from .operators.webpages import synthetic_page_urls, url_dedup

    return url_dedup(synthetic_page_urls(_t(spark, sf_dir, "documents")))


#: Shared DuckDB prefix: synthetic page-URL table (mirror of
#: ``webpages.synthetic_page_urls``) canonicalized into
#: ``c(doc_id, fetch_ts_sec, canonical_url)``.
_SQL_CANON_PAGES = r"""
WITH n AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
g AS (
  SELECT doc_id,
         strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS n1,
         strpos('0123456789abcdef', substring(h, 2, 1)) - 1 AS n2,
         strpos('0123456789abcdef', substring(h, 3, 1)) - 1 AS n3,
         strpos('0123456789abcdef', substring(h, 4, 1)) - 1 AS n4,
         ((strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 16
          + strpos('0123456789abcdef', substring(h, 6, 1)) - 1) % 40
           AS pid,
         strpos('0123456789abcdef', substring(h, 7, 1)) - 1 AS n7,
         strpos('0123456789abcdef', substring(h, 8, 1)) - 1 AS n8,
         strpos('0123456789abcdef', substring(h, 9, 1)) - 1 AS n9
  FROM n
),
u AS (
  SELECT doc_id,
         CASE WHEN n3 % 2 = 0 THEN 'http' ELSE 'https' END || '://'
         || CASE WHEN n2 % 2 = 0 THEN 'www.' ELSE '' END
         || 'site' || CAST(n1 % 4 AS VARCHAR) || '.example.org'
         || CASE WHEN n4 % 4 = 0 THEN
              (CASE WHEN n3 % 2 = 0 THEN ':80' ELSE ':443' END)
            ELSE '' END
         || '/a/' || CAST(pid AS VARCHAR)
         || CASE WHEN n7 % 2 = 0 THEN '/' ELSE '' END
         || CASE WHEN n8 % 4 = 0
              THEN '?id=' || CAST(pid AS VARCHAR) || '&utm_source=rss'
            WHEN n8 % 4 = 1
              THEN '?utm_campaign=x&id=' || CAST(pid AS VARCHAR)
            WHEN n8 % 4 = 2 THEN '?id=' || CAST(pid AS VARCHAR)
            ELSE '' END
         || CASE WHEN n9 % 2 = 0 THEN '#frag' ELSE '' END AS url,
         CAST(1735689600 + (doc_id * 7919) % 8640000 AS BIGINT)
           AS fetch_ts_sec
  FROM g
),
c AS (
  SELECT doc_id, fetch_ts_sec,
         regexp_replace(regexp_replace(u4, '\?.*$', ''), '/$', '')
         || CASE WHEN len(params) > 0
              THEN '?' || array_to_string(list_sort(params), '&')
              ELSE '' END AS canonical_url
  FROM (
    SELECT doc_id, fetch_ts_sec, u4,
           list_filter(
             string_split(regexp_extract(u4, '\?(.*)$', 1), '&'),
             p -> length(p) > 0 AND NOT regexp_matches(
               p, '^(utm_[a-z]+|fbclid|gclid)=')) AS params
    FROM (
      SELECT doc_id, fetch_ts_sec,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(url, '#.*$', ''),
                   '^http://', 'https://'),
                 '^https://www\.', 'https://'),
               '^(https://[^/?#:]+):(443|80)([/?].*)?$', '\1\3') AS u4
      FROM u
    )
  )
)
"""

SQL_URL_DEDUP = _SQL_CANON_PAGES + r""",
r AS (
  SELECT canonical_url, doc_id, fetch_ts_sec,
         row_number() OVER (PARTITION BY canonical_url
                            ORDER BY fetch_ts_sec DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY canonical_url) AS n_variants
  FROM c
)
SELECT canonical_url, CAST(n_variants AS BIGINT) AS n_variants,
       doc_id AS kept_doc_id, fetch_ts_sec AS latest_ts_sec
FROM r WHERE rn = 1
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over boilerplate-wrapped HTML pages (the
    north-rule stage: density-based HTML boilerplate strip with
    byte-identical extracted text per url). The synthetic page builder
    wraps each document's escaped text in nav/promo/footer link farms
    plus a constant second paragraph, deterministically on both engines,
    so the expected extract is provable: boilerplate blocks fail the
    link-fraction/stopword/mass gates by construction, and the document
    block survives iff it has ≥ 25 stripped chars and ≥ 1 English
    function word (453/47 split at sf0.01 — both branches graded).
    Plan: ONE projection + ONE Arrow-batched map, zero exchanges."""
    from .operators.webpages import main_content_pages, synthetic_html_pages

    return main_content_pages(
        synthetic_html_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_html_extract() -> str:
    from .operators.webpages import ARTICLE_TRAILER
    from .segmentation import _EN_STOP_SMALL

    sw = ", ".join(f"'{w}'" for w in sorted(_EN_STOP_SMALL))
    return rf"""
WITH base AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         replace(replace(replace(coalesce(text, ''), chr(10), ' '),
                 chr(2), ' '), chr(3), ' ') AS norm
  FROM documents
),
v AS (
  SELECT doc_id,
         'https://site'
           || CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                   % 4 AS VARCHAR)
           || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
         rtrim(norm, ' ' || chr(9) || chr(11) || chr(12) || chr(13))
           AS vis
  FROM base
),
k AS (
  SELECT doc_id, url, vis,
         length(trim(vis, ' ' || chr(9) || chr(11) || chr(12)
                          || chr(13))) >= 25
         AND len(list_filter(regexp_extract_all(vis, '[A-Za-z'']+'),
                 t -> list_contains([{sw}], lower(t)))) >= 1 AS keep1
  FROM v
)
SELECT doc_id, url,
       CASE WHEN keep1
            THEN vis || chr(10) || chr(10) || '{ARTICLE_TRAILER}'
            ELSE '{ARTICLE_TRAILER}' END AS main_text,
       CAST(CASE WHEN keep1 THEN 2 ELSE 1 END AS BIGINT) AS kept_blocks
FROM k
"""


def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain HTML boilerplate strip (the north-rule's non-density
    extraction mode) over the same synthetic page table as
    ``html_extract``: ALL visible text survives — nav/promo/footer link
    text included — with block-tag paragraph structure, entity
    unescape, and per-line rstrip, byte-identical per url. The oracle
    reconstructs the full expected text (template visible blocks are
    compile-time constants; the document block is provable as in
    ``html_extract``). Plan: one Arrow-batched map, zero exchanges."""
    from .operators.webpages import strip_html_pages, synthetic_html_pages

    return strip_html_pages(
        synthetic_html_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_html_strip() -> str:
    from .operators.webpages import ARTICLE_TRAILER

    return rf"""
WITH base AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         replace(replace(replace(coalesce(text, ''), chr(10), ' '),
                 chr(2), ' '), chr(3), ' ') AS norm
  FROM documents
),
v AS (
  SELECT doc_id,
         'https://site'
           || CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                   % 4 AS VARCHAR)
           || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) % 3
           WHEN 0 THEN 'HomeNews'
           WHEN 1 THEN 'HomeNewsTags'
           ELSE 'HomeNewsTagsRSS' END AS nav,
         rtrim(norm, ' ' || chr(9) || chr(11) || chr(12) || chr(13))
           AS vis
  FROM base
),
j AS (
  SELECT doc_id, url,
         array_to_string(
           list_filter(
             [nav, 'Buy nowWin big', vis, '{ARTICLE_TRAILER}',
              'ContactLegalSiteCorp 2026'],
             b -> b <> ''),
           chr(10) || chr(10)) AS text_full
  FROM v
)
SELECT doc_id, url, text_full,
       CAST(length(text_full) AS BIGINT) AS n_chars
FROM j
"""


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph construction (the CC web-graph step): href extraction
    from the html column as a pure native flat map (decode +
    regexp_extract_all + explode — NO Python), then per-target
    in-degree / distinct-source aggregate and internal-vs-dangling
    resolution against the crawl's own url set. The synthetic page
    table gives each page 1-3 md5-nibble-ragged outlinks with provable
    targets, so the whole graph is SQL-reconstructable."""
    from .operators.webpages import link_graph, synthetic_linked_pages

    return link_graph(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_link_graph(targets_mod: int = 256) -> str:
    return rf"""
WITH links AS (
  SELECT d.doc_id AS src_id, j.j,
         (d.doc_id * 31 + j.j * 97) % {targets_mod} AS tgt
  FROM documents d,
       (SELECT unnest([1, 2, 3]) AS j) j
  WHERE j.j <= 1 + (strpos('0123456789abcdef',
        substring(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) % 3
),
agg AS (
  SELECT CASE WHEN j = 3
           THEN 'https://ext' || CAST(tgt AS VARCHAR) || '.example.net/'
           ELSE 'https://site'
             || CAST((strpos('0123456789abcdef',
                  substring(md5(CAST(tgt AS VARCHAR)), 1, 1)) - 1) % 4
                  AS VARCHAR)
             || '.example.org/p/' || CAST(tgt AS VARCHAR) END AS dst_url,
         tgt, j = 3 AS ext,
         CAST(count(*) AS BIGINT) AS in_degree,
         CAST(count(DISTINCT src_id) AS BIGINT) AS n_src
  FROM links GROUP BY 1, 2, 3
)
SELECT dst_url, in_degree, n_src,
       NOT ext AND tgt IN (SELECT doc_id FROM documents) AS is_internal
FROM agg
"""


#: DuckDB fragment: the synthetic page url for integer column/expr ``{x}``
#: (md5-nibble site shard — mirror of ``webpages._page_url``).
_SQL_PAGE_URL = (
    "'https://site' || CAST((strpos('0123456789abcdef', "
    "substring(md5(CAST({x} AS VARCHAR)), 1, 1)) - 1) % 4 AS VARCHAR) "
    "|| '.example.org/p/' || CAST({x} AS VARCHAR)"
)

#: DuckDB fragment: outlink slots of ``documents d`` (j, tgt), 1-3 per
#: page by md5 nibble 2 — mirror of ``webpages.synthetic_linked_pages``.
def _sql_link_slots(mod: int = 256) -> str:
    """Oracle mirror of ``synthetic_linked_pages``' link slots,
    parameterized on ``targets_mod`` (the graph-density knob — the
    triangle/closeness queries use a denser mod-48 hub graph)."""
    return f"""
  SELECT d.doc_id AS src_id, j.j,
         (d.doc_id * 31 + j.j * 97) % {mod} AS tgt
  FROM documents d,
       (SELECT unnest([1, 2, 3]) AS j) j
  WHERE j.j <= 1 + (strpos('0123456789abcdef',
        substring(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) % 3
"""


_SQL_LINK_SLOTS = _sql_link_slots()


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt disallow application over the synthetic crawl: rules
    pre-grouped to one array row per host, size-aware host join, then
    a higher-order prefix filter per page — match count + greatest
    matched prefix as evidence, no per-rule row fan-out."""
    from .operators.webpages import (
        robots_filter,
        robots_rules_df,
        synthetic_linked_pages,
    )

    return robots_filter(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents")),
        robots_rules_df(spark),
    )


def _sql_robots_filter() -> str:
    from .operators.webpages import ROBOTS_RULES

    vals = ", ".join(f"('{h}', '{d}')" for h, d in ROBOTS_RULES)
    url = _SQL_PAGE_URL.format(x="d.doc_id")
    return f"""
WITH rules(host, disallow) AS (VALUES {vals}),
per_host AS (
  SELECT host, list(disallow) AS rs FROM rules GROUP BY host
),
pg AS (
  SELECT {url} AS url FROM documents d
),
base AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS path
  FROM pg
),
j AS (
  SELECT b.url, b.host,
         list_filter(coalesce(p.rs, []),
                     r -> starts_with(b.path, r)) AS hits
  FROM base b LEFT JOIN per_host p ON p.host = b.host
)
SELECT url, host,
       CAST(len(hits) AS BIGINT) AS n_rules_matched,
       list_aggregate(hits, 'max') AS matched_rule,
       len(hits) = 0 AS allowed
FROM j
"""


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 response-record container split (the first step of
    every CC pipeline): synthesize one deterministic record per
    document, then recover every header + the exact payload with
    native byte arithmetic — Content-Length integrity and payload md5
    both graded. Zero shuffles end to end."""
    from .sources.warc import parse_warc, synthetic_warc_records

    return parse_warc(synthetic_warc_records(_t(spark, sf_dir, "documents")))


def _sql_warc_parse() -> str:
    url = _SQL_PAGE_URL.format(x="d.doc_id")
    return f"""
WITH rec AS (
  SELECT 'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || {url} || chr(13) || chr(10)
      || 'WARC-Date: '
      || strftime(make_timestamp(
           (1735689600 + (d.doc_id * 7919) % 8640000) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') || chr(13) || chr(10)
      || 'WARC-Record-ID: <urn:md5:'
      || md5(CAST(d.doc_id AS VARCHAR)) || '>' || chr(13) || chr(10)
      || 'Content-Type: application/http; msgtype=response'
      || chr(13) || chr(10)
      || 'Content-Length: '
      || CAST(octet_length(encode(coalesce(d.text, ''))) AS VARCHAR)
      || chr(13) || chr(10)
      || chr(13) || chr(10) || coalesce(d.text, '') AS s
  FROM documents d
),
cutp AS (
  SELECT s, strpos(s, chr(13) || chr(10) || chr(13) || chr(10)) AS cut
  FROM rec
),
sp AS (
  SELECT substring(s, 1, cut - 1) AS head,
         substring(s, cut + 4) AS payload
  FROM cutp
)
SELECT regexp_extract(head, 'WARC-Target-URI: ([^\r]+)', 1) AS url,
       regexp_extract(head, 'WARC-Type: ([^\r]+)', 1) AS warc_type,
       CAST(epoch(strptime(
         regexp_extract(head, 'WARC-Date: ([^\r]+)', 1),
         '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS warc_date_ts,
       CAST(regexp_extract(head, 'Content-Length: ([^\r]+)', 1)
            AS BIGINT) AS content_length,
       CAST(octet_length(encode(payload)) AS BIGINT) AS payload_octets,
       md5(payload) AS payload_md5,
       octet_length(encode(payload)) = CAST(
         regexp_extract(head, 'Content-Length: ([^\r]+)', 1) AS BIGINT)
         AS length_ok
FROM sp
"""


def _sql_warc_http_layers() -> str:
    """Shared CTE chain ``hb → page → hmsg → rec2`` rebuilding the full
    WARC ⊃ HTTP ⊃ HTML layering byte-identically in DuckDB (mirror of
    ``synthetic_warc_http_records``), ending in ``rec2(doc_id, s)``."""
    from .operators.webpages import (
        ARTICLE_TRAILER,
        _AD_BLOCK,
        _FOOTER,
        _NAV_VARIANTS,
    )
    from .sources.warc import HTTP_ERROR_PAGE

    url = _SQL_PAGE_URL.format(x="hb.doc_id")
    nav = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(_NAV_VARIANTS)
    )
    return f"""
hb AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         replace(replace(replace(replace(replace(replace(
           coalesce(text, ''), '&', '&amp;'), '<', '&lt;'),
           '>', '&gt;'), chr(10), ' '), chr(2), ' '), chr(3), ' ') AS esc
  FROM documents
),
page AS (
  SELECT doc_id, h, {url} AS url,
         '<html><head><title>Doc</title><style>.m' || '{{}}'
      || '</style></head><body>'
      || CASE (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) % 3
           {nav} END
      || '{_AD_BLOCK}'
      || '<article><p>' || esc || '</p><p>' || '{ARTICLE_TRAILER}'
      || '</p></article>' || '{_FOOTER}' || '</body></html>' AS pg
  FROM hb
),
hmsg AS (
  SELECT doc_id, url,
         CASE WHEN m <= 5 THEN pg
              WHEN m = 6 THEN '{HTTP_ERROR_PAGE}'
              ELSE '' END AS body,
         CASE WHEN m <= 5 THEN '200 OK'
              WHEN m = 6 THEN '404 Not Found'
              ELSE '301 Moved Permanently' END AS statline,
         CASE WHEN (strpos('0123456789abcdef', substring(h, 8, 1)) - 1)
                   % 2 = 0
              THEN '; charset=utf-8' ELSE '' END AS cs,
         CASE WHEN m = 7
              THEN 'Location: https://www.example.org/moved/'
                   || CAST(doc_id AS VARCHAR) || chr(13) || chr(10)
              ELSE '' END AS loc
  FROM (SELECT *,
          (strpos('0123456789abcdef', substring(h, 7, 1)) - 1) % 8 AS m
        FROM page)
),
hm2 AS (
  SELECT doc_id, url,
         'HTTP/1.1 ' || statline || chr(13) || chr(10)
      || 'Content-Type: text/html' || cs || chr(13) || chr(10)
      || loc
      || 'Content-Length: '
      || CAST(octet_length(encode(body)) AS VARCHAR)
      || chr(13) || chr(10) || chr(13) || chr(10) || body AS msg
  FROM hmsg
),
rec2 AS (
  SELECT doc_id,
         'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: '
      || strftime(make_timestamp(
           (1735689600 + (doc_id * 7919) % 8640000) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') || chr(13) || chr(10)
      || 'WARC-Record-ID: <urn:md5:'
      || md5(CAST(doc_id AS VARCHAR)) || '>' || chr(13) || chr(10)
      || 'Content-Type: application/http; msgtype=response'
      || chr(13) || chr(10)
      || 'Content-Length: '
      || CAST(octet_length(encode(msg)) AS VARCHAR)
      || chr(13) || chr(10) || chr(13) || chr(10) || msg AS s
  FROM hm2
)"""


def q_http_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 2 of the CC container split: recover the HTTP/1.1 response
    (status, reason, Content-Type + charset param, optional Location,
    body integrity) from inside each WARC record — the real layering a
    crawl archive stores. Both cuts are first-blank-line byte
    arithmetic (the WARC payload itself contains an HTTP blank line,
    so the parser's FIRST-boundary rule is load-bearing here). Zero
    shuffles end to end."""
    from .sources.warc import parse_http, parse_warc, synthetic_warc_http_records

    docs = _t(spark, sf_dir, "documents")
    w = parse_warc(synthetic_warc_http_records(docs), with_payload=True)
    parsed = parse_http(w.select("url", F.col("payload").alias("http")))
    return parsed.select(
        "url", "status", "reason", "content_type", "charset",
        "location", "content_length", "body_octets", "length_ok",
        "body_md5",
    )


def _sql_http_parse() -> str:
    return rf"""
WITH {_sql_warc_http_layers()},
c1 AS (
  SELECT s, strpos(s, chr(13) || chr(10) || chr(13) || chr(10)) AS cut
  FROM rec2
),
w AS (
  SELECT substring(s, 1, cut - 1) AS whead,
         substring(s, cut + 4) AS payload
  FROM c1
),
c2 AS (
  SELECT whead, payload,
         strpos(payload, chr(13) || chr(10) || chr(13) || chr(10)) AS cut
  FROM w
),
hp AS (
  SELECT whead,
         substring(payload, 1, cut - 1) AS head,
         substring(payload, cut + 4) AS body
  FROM c2
)
SELECT regexp_extract(whead, 'WARC-Target-URI: ([^\r]+)', 1) AS url,
       CAST(regexp_extract(head, '^HTTP/1\.[01] (\d{{3}})', 1)
            AS INTEGER) AS status,
       regexp_extract(head, '^HTTP/1\.[01] \d{{3}} ([^\r]+)', 1)
         AS reason,
       nullif(regexp_extract(head, 'Content-Type: ([^;\r]+)', 1), '')
         AS content_type,
       nullif(regexp_extract(head, 'charset=([^\r;]+)', 1), '')
         AS charset,
       nullif(regexp_extract(head, 'Location: ([^\r]+)', 1), '')
         AS location,
       CAST(regexp_extract(head, 'Content-Length: (\d+)', 1) AS BIGINT)
         AS content_length,
       CAST(octet_length(encode(body)) AS BIGINT) AS body_octets,
       octet_length(encode(body)) = CAST(
         regexp_extract(head, 'Content-Length: (\d+)', 1) AS BIGINT)
         AS length_ok,
       md5(body) AS body_md5
FROM hp
"""


def q_extraction_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule pipeline end to end over RAW ARCHIVE BYTES:
    WARC record split → HTTP response split → status-200 text/html
    gate → density-based main-content extraction (the production Arrow
    kernel), emitting the per-url extracted text byte-identically.

    Scale shape: every stage is a per-row map fused into one
    zero-exchange pipeline (the two container cuts and the gate are
    whole-stage codegen; only (doc_id, url, html) cross the Arrow
    boundary). At 10¹² records the plan is embarrassingly parallel —
    partitioning by url-hash happens at the scan, and the gate prunes
    ~25% of pages before the (dominant) Python kernel pays anything.

    Codegen note: fusing the SYNTHETIC builder (html→http→warc concat)
    with the parser in one stage overflows the JVM's 64 KB codegen
    method limit, so Spark logs an ERROR and falls back to interpreted
    evaluation for that stage — correct, and harness-only: in
    production the records come off disk and the parse-side expressions
    alone compile (pinned by TestHttpStage's plan test)."""
    from .sources.warc import (
        extract_main_from_warc,
        synthetic_warc_http_records,
    )

    docs = _t(spark, sf_dir, "documents")
    return extract_main_from_warc(synthetic_warc_http_records(docs))


def _sql_extraction_funnel() -> str:
    return f"""
WITH ex AS ({_sql_html_extract()})
SELECT ex.* FROM ex
WHERE (strpos('0123456789abcdef',
              substring(md5(CAST(ex.doc_id AS VARCHAR)), 7, 1)) - 1)
      % 8 <= 5
"""


def q_crawl_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-cadence profile per canonical URL (crawl-scheduling /
    freshness signal): fetch count, first/last fetch time, integral
    mean refetch gap — one map-side-combinable aggregate over the
    canonicalized synthetic page-URL table."""
    from .operators.webpages import crawl_cadence, synthetic_page_urls

    return crawl_cadence(
        synthetic_page_urls(_t(spark, sf_dir, "documents"))
    )


def _sql_crawl_cadence() -> str:
    return _SQL_CANON_PAGES + """
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_fetches,
       min(fetch_ts_sec) AS first_ts_sec,
       max(fetch_ts_sec) AS last_ts_sec,
       CASE WHEN count(*) > 1
         THEN CAST((max(fetch_ts_sec) - min(fetch_ts_sec))
                   // (count(*) - 1) AS BIGINT)
       END AS mean_gap_sec
FROM c
GROUP BY canonical_url
"""


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (title / robots meta / rel=canonical)
    over deterministic synthetic pages — the DOM-heuristic curation
    step: noindex pages leave the corpus, nofollow prunes the link
    graph, canonical targets drive URL folding. Pure native regexp
    projection, zero shuffles; absent tags are NULL."""
    from .operators.webpages import page_metadata, synthetic_meta_pages

    return page_metadata(synthetic_meta_pages(_t(spark, sf_dir, "documents")))


def _sql_page_metadata() -> str:
    url_self = _SQL_PAGE_URL.format(x="d.doc_id")
    url_tgt = _SQL_PAGE_URL.format(x="((d.doc_id * 7 + 13) % 256)")
    return f"""
WITH pg AS (
  SELECT {url_self} AS url,
         '<html><head><title>Doc ' || CAST(d.doc_id AS VARCHAR)
         || '</title>'
         || CASE
              WHEN (strpos('0123456789abcdef', substring(
                md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1) % 4 = 0
              THEN '<meta name="robots" content="index,follow">'
              WHEN (strpos('0123456789abcdef', substring(
                md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1) % 4 = 1
              THEN '<meta name="robots" content="noindex,follow">'
              WHEN (strpos('0123456789abcdef', substring(
                md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1) % 4 = 2
              THEN '<meta name="robots" content="noindex,nofollow">'
              ELSE '' END
         || CASE
              WHEN (strpos('0123456789abcdef', substring(
                md5(CAST(d.doc_id AS VARCHAR)), 5, 1)) - 1) % 3 = 0
              THEN '<link rel="canonical" href="' || {url_self} || '">'
              WHEN (strpos('0123456789abcdef', substring(
                md5(CAST(d.doc_id AS VARCHAR)), 5, 1)) - 1) % 3 = 1
              THEN '<link rel="canonical" href="' || {url_tgt} || '">'
              ELSE '' END
         || '</head><body><p>Body of ' || CAST(d.doc_id AS VARCHAR)
         || '.</p></body></html>' AS html
  FROM documents d
),
x AS (
  SELECT url,
         nullif(regexp_extract(html, '<title>([^<]*)</title>', 1), '')
           AS title,
         nullif(regexp_extract(html,
           '<meta name="robots" content="([^"]+)">', 1), '')
           AS directive,
         nullif(regexp_extract(html,
           '<link rel="canonical" href="([^"]+)">', 1), '')
           AS canonical_href
  FROM pg
)
SELECT url, title, directive,
       list_contains(string_split(coalesce(directive, ''), ','),
                     'noindex') AS noindex,
       list_contains(string_split(coalesce(directive, ''), ','),
                     'nofollow') AS nofollow,
       canonical_href,
       CASE WHEN canonical_href IS NOT NULL
         THEN canonical_href = url END AS self_canonical,
       NOT list_contains(string_split(coalesce(directive, ''), ','),
                         'noindex') AS kept
FROM x
"""


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-anchor-text profile per link target (the classic
    web-search enrichment signal): href+anchor pairs pulled by two
    congruent regexp_extract_all calls zipped positionally — a pure
    native flat map — then one hash aggregate per dst_url."""
    from .operators.webpages import anchor_text_profile, synthetic_linked_pages

    return anchor_text_profile(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_anchor_text() -> str:
    from .operators.webpages import ANCHOR_WORDS

    words = ", ".join(f"'{w}'" for w in ANCHOR_WORDS)
    url = _SQL_PAGE_URL.format(x="tgt")
    return f"""
WITH links AS ({_SQL_LINK_SLOTS}),
anch AS (
  SELECT CASE WHEN j = 3
           THEN 'https://ext' || CAST(tgt AS VARCHAR) || '.example.net/'
           ELSE {url} END AS dst_url,
         ([{words}])[(src_id + j) % {len(ANCHOR_WORDS)} + 1]
           || ' ' || CAST(tgt AS VARCHAR) AS anchor
  FROM links
)
SELECT dst_url,
       CAST(count(*) AS BIGINT) AS n_anchors,
       list_sort(list_distinct(list(anchor))) AS anchors,
       CAST(max(length(anchor)) AS BIGINT) AS max_anchor_len
FROM anch
GROUP BY dst_url
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (3 power iterations, damping 0.85 in ppm,
    ranks in BIGINT micro-units) over the crawl's internal link graph —
    url→id resolution once, per-iteration shuffle join on src + hash
    agg on dst; no floating point, so the unrolled SQL oracle matches
    bit-for-bit."""
    from .operators.webpages import pagerank, synthetic_linked_pages

    return pagerank(synthetic_linked_pages(_t_raw(spark, sf_dir, "documents")))


def _sql_pagerank(iterations: int = 3, damping_ppm: int = 850_000) -> str:
    teleport = 1_000_000 - damping_ppm
    parts = [
        f"WITH links AS ({_SQL_LINK_SLOTS}),",
        """edges AS (
  SELECT src_id, tgt AS dst_id FROM links
  WHERE j <= 2 AND tgt IN (SELECT doc_id FROM documents)
),
deg AS (
  SELECT src_id, CAST(count(*) AS BIGINT) AS out_deg
  FROM edges GROUP BY src_id
),
r0 AS (
  SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS rank_e6
  FROM documents
),""",
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""c{i} AS (
  SELECT e.dst_id,
         sum((r.rank_e6 * {damping_ppm}) // (1000000 * g.out_deg)) AS s
  FROM edges e
  JOIN deg g ON g.src_id = e.src_id
  JOIN r{i - 1} r ON r.id = e.src_id
  GROUP BY e.dst_id
),
r{i} AS (
  SELECT d.doc_id AS id,
         CAST({teleport} + coalesce(c.s, 0) AS BIGINT) AS rank_e6
  FROM documents d LEFT JOIN c{i} c ON c.dst_id = d.doc_id
),""")
    url = _SQL_PAGE_URL.format(x="r.id")
    parts.append(f"""final AS (
  SELECT {url} AS url, r.rank_e6,
         CAST(coalesce(g.out_deg, 0) AS BIGINT) AS out_deg
  FROM r{iterations} r LEFT JOIN deg g ON g.src_id = r.id
)
SELECT url, rank_e6, out_deg FROM final""")
    return "\n".join(parts)


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style bad-words blocklist page gate with evidence columns
    (occurrence count + sorted distinct matched words). Zero-shuffle
    native projection; the blocklist is a constant array in the plan."""
    from .operators.text_analysis import blocklist_filter

    return blocklist_filter(_t(spark, sf_dir, "documents"))


def _sql_blocklist_filter() -> str:
    from .operators.text_analysis import BLOCKLIST

    bl = ", ".join(f"'{w}'" for w in BLOCKLIST)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(coalesce(text, '')),
           '[ \t\n\r\f\x0b]+', ' ', 'g')), ' ') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(tk, t -> list_contains([{bl}], t)))
            AS BIGINT) AS n_bad,
       list_sort(list_distinct(
         list_filter(tk, t -> list_contains([{bl}], t)))) AS bad_words,
       len(list_filter(tk, t -> list_contains([{bl}], t))) = 0 AS kept
FROM toks
"""


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-exact HyperLogLog distinct-count sketch (explicit
    register relation, portable 48-bit md5-prefix hash) vs the exact
    count: distinct orderkeys per returnflag at p=8 (m=256, ~6.5% σ).
    Both SFs sit in the raw-estimate regime (≫ 2.5m distinct), so the
    estimate is pure integer math + one identical double division —
    the ESTIMATE itself is oracle-hashed, not just the registers."""
    from .operators.scale import spread_small_scan
    from .operators.sketches import hll_cardinality

    # per-row md5 BEFORE the first exchange: spread the scan (the
    # layout-aware branch covers the big single-row-group case —
    # 6.0 → 3.6 s at sf1.0 on a 150 MB single-group lineitem)
    return hll_cardinality(
        spread_small_scan(_t(spark, sf_dir, "lineitem")),
        F.col("l_orderkey").cast("string"),
        ["l_returnflag"],
        p=8,
    )


def _sql_hll_cardinality(p: int = 8) -> str:
    from .operators.sketches import HASH_BITS, _alpha

    m = 1 << p
    bits = HASH_BITS - p
    num = repr(_alpha(m) * m * m * float(1 << HASH_BITS))
    h48 = _SQL_HEX12.format(
        H="substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 12)"
    )
    return f"""
WITH h AS (
  SELECT l_returnflag, {h48} AS h48 FROM lineitem
),
r AS (
  SELECT l_returnflag, h48 % {m} AS bucket,
         MAX(CASE WHEN h48 // {m} = 0 THEN {bits + 1}
                  ELSE {bits + 1} - length(bin(h48 // {m})) END) AS rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT l_returnflag, COUNT(*) AS present,
         SUM(CAST(1 AS BIGINT) << ({HASH_BITS} - rho)) AS s_present
  FROM r GROUP BY 1
),
e AS (
  SELECT l_returnflag, {m} - present AS zeros,
         CAST(floor({num} / CAST(s_present
           + CAST({m} - present AS BIGINT)
             * (CAST(1 AS BIGINT) << {HASH_BITS}) AS DOUBLE))
         AS BIGINT) AS e_raw
  FROM agg
),
fin AS (
  SELECT l_returnflag,
         CASE WHEN zeros > 0 AND e_raw * 2 <= 5 * {m}
              THEN CAST(floor({m} * ln({m} / CAST(zeros AS DOUBLE)))
                   AS BIGINT)
              ELSE e_raw END AS hll_est
  FROM e
),
x AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
  FROM lineitem GROUP BY 1
)
SELECT f.l_returnflag, hll_est, exact_distinct,
       CAST(floor(abs(hll_est - exact_distinct) * 1000000
                  / exact_distinct) AS BIGINT) AS err_ppm
FROM fin f JOIN x USING (l_returnflag)
"""


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph rollup of the crawl's link graph (the web-graph form
    ranking/spam pipelines consume): link count + distinct linking
    pages per (src_host, dst_host), same-host flag. Edge flat-map fused
    into the scan; ONE hash aggregate whose key space is host pairs."""
    from .operators.webpages import host_graph, synthetic_linked_pages

    return host_graph(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_host_graph() -> str:
    def nib1(x: str) -> str:
        return (
            f"(strpos('0123456789abcdef', "
            f"substring(md5(CAST({x} AS VARCHAR)), 1, 1)) - 1) % 4"
        )

    return f"""
WITH links AS ({_SQL_LINK_SLOTS}),
e AS (
  SELECT 'site' || CAST({nib1('src_id')} AS VARCHAR) || '.example.org'
           AS src_host,
         CASE WHEN j = 3
           THEN 'ext' || CAST(tgt AS VARCHAR) || '.example.net'
           ELSE 'site' || CAST({nib1('tgt')} AS VARCHAR)
                || '.example.org' END AS dst_host,
         src_id
  FROM links
)
SELECT src_host, dst_host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT src_id) AS BIGINT) AS n_src_pages,
       src_host = dst_host AS internal
FROM e GROUP BY src_host, dst_host
"""


def q_hreflang_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hreflang cluster validation: language-variant pages (doc_id mod
    3 = language, div 3 = translation group) declare alternates with
    nibble-selected RETURN LINKS MISSING — the screen counts each
    page's alternates, how many are reciprocated by the target page
    (the Google-documented symmetry requirement), x-default presence,
    and full consistency. One extraction flat map, a no-fan-out
    swap-self semi-join, one url aggregate."""
    from .operators.webpages import (
        extract_hreflang,
        hreflang_symmetry,
        synthetic_hreflang_pages,
    )

    return hreflang_symmetry(
        extract_hreflang(
            synthetic_hreflang_pages(_t(spark, sf_dir, "documents"))
        )
    )


def _sql_hreflang_symmetry() -> str:
    def nib(i: str) -> str:
        return (
            f"(strpos('0123456789abcdef', "
            f"substring(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        )

    decl = "".join(
        f"""
         || CASE WHEN doc_id % 3 <> {j} AND {nib(19 + j)} % 8 <> 0
              THEN '<link rel="alternate" hreflang="{lang}" href="'
                   || 'https://www.example.org/{lang}/'
                   || CAST(doc_id // 3 AS VARCHAR) || '"/>'
              ELSE '' END"""
        for j, lang in enumerate(("en", "de", "fr"))
    )
    return rf"""
WITH pg AS (
  SELECT doc_id,
         'https://www.example.org/'
         || list_extract(['en', 'de', 'fr'], CAST(doc_id % 3 AS INT) + 1)
         || '/' || CAST(doc_id // 3 AS VARCHAR) AS url,
         '<html><head>'{decl}
         || CASE WHEN doc_id % 3 = 0
              THEN '<link rel="alternate" hreflang="x-default" href="'
                   || 'https://www.example.org/en/'
                   || CAST(doc_id // 3 AS VARCHAR) || '"/>'
              ELSE '' END
         || '</head><body><p>v</p></body></html>' AS html
  FROM documents),
alts AS (
  SELECT url AS src_url,
         regexp_extract(m, '<link rel="alternate" hreflang="([a-z-]+)" '
                           || 'href="([^"]+)"/>', 1) AS hreflang,
         regexp_extract(m, '<link rel="alternate" hreflang="([a-z-]+)" '
                           || 'href="([^"]+)"/>', 2) AS href
  FROM pg, LATERAL unnest(regexp_extract_all(html,
         '<link rel="alternate" hreflang="([a-z-]+)" href="([^"]+)"/>',
         0)) t(m)),
real AS (
  SELECT src_url, href FROM alts WHERE hreflang <> 'x-default'),
sym AS (
  SELECT a.src_url, CAST(COUNT(*) AS BIGINT) AS n_symmetric
  FROM real a JOIN real b
    ON a.href = b.src_url AND b.href = a.src_url
  GROUP BY 1),
agg AS (
  SELECT src_url AS url,
         CAST(SUM(CASE WHEN hreflang <> 'x-default' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_alts,
         bool_or(hreflang = 'x-default') AS has_xdefault
  FROM alts GROUP BY 1)
SELECT a.url, a.n_alts,
       coalesce(s.n_symmetric, 0) AS n_symmetric,
       a.has_xdefault,
       coalesce(s.n_symmetric, 0) = a.n_alts AS consistent
FROM agg a LEFT JOIN sym s ON a.url = s.src_url
"""


def q_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot merge (Iceberg MERGE INTO semantics, engine-
    portable plan): a synthetic base table (nibble-selected docs,
    version-0 fingerprints) merged with a later delta crawl (nibble-
    selected overlap, some fetched twice, fingerprints re-versioned by
    another nibble) so all four outcomes populate — new / carried /
    updated / unchanged. One url-grain delta aggregate + one url full
    outer join; both sides crawl-sized, nothing broadcast."""
    from .operators.webpages import snapshot_upsert

    docs = _t_raw(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = F.md5(d.cast("string"))
    from .operators.webpages import _nib

    url = F.concat(F.lit("https://s.example.org/"), d.cast("string"))
    t0 = F.lit(1735689600) + (d * 37) % 1000
    base = docs.filter(_nib(h, 15) % 4 <= 2).select(
        url.alias("url"),
        t0.alias("first_seen_ts"),
        t0.alias("last_fetch_ts"),
        F.lit(1).cast("long").alias("n_fetches"),
        F.md5(F.concat(d.cast("string"), F.lit("#v0"))).alias("fingerprint"),
    )
    one = docs.filter(_nib(h, 16) % 2 == 0).select(
        url.alias("url"),
        (t0 + 86400).alias("fetch_ts_sec"),
        F.md5(
            F.concat(d.cast("string"), F.lit("#v"),
                     (_nib(h, 17) % 2).cast("string"))
        ).alias("fingerprint"),
    )
    refetch = docs.filter(
        (_nib(h, 16) % 2 == 0) & (_nib(h, 18) % 4 == 0)
    ).select(
        url.alias("url"),
        (t0 + 172800).alias("fetch_ts_sec"),
        F.md5(F.concat(d.cast("string"), F.lit("#v2"))).alias("fingerprint"),
    )
    return snapshot_upsert(base, one.unionAll(refetch))


def _sql_snapshot_upsert() -> str:
    def nib(i: int) -> str:
        return (
            f"(strpos('0123456789abcdef', "
            f"substring(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        )

    return rf"""
WITH base AS (
  SELECT 'https://s.example.org/' || CAST(doc_id AS VARCHAR) AS url,
         1735689600 + (doc_id * 37) % 1000 AS first_seen_ts,
         1735689600 + (doc_id * 37) % 1000 AS last_fetch_ts,
         CAST(1 AS BIGINT) AS n_fetches,
         md5(CAST(doc_id AS VARCHAR) || '#v0') AS fingerprint
  FROM documents WHERE {nib(15)} % 4 <= 2),
delta AS (
  SELECT 'https://s.example.org/' || CAST(doc_id AS VARCHAR) AS url,
         1735689600 + (doc_id * 37) % 1000 + 86400 AS fetch_ts_sec,
         md5(CAST(doc_id AS VARCHAR) || '#v'
             || CAST({nib(17)} % 2 AS VARCHAR)) AS fingerprint
  FROM documents WHERE {nib(16)} % 2 = 0
  UNION ALL
  SELECT 'https://s.example.org/' || CAST(doc_id AS VARCHAR) AS url,
         1735689600 + (doc_id * 37) % 1000 + 172800 AS fetch_ts_sec,
         md5(CAST(doc_id AS VARCHAR) || '#v2') AS fingerprint
  FROM documents WHERE {nib(16)} % 2 = 0 AND {nib(18)} % 4 = 0),
dagg AS (
  SELECT url, MIN(fetch_ts_sec) AS d_first, MAX(fetch_ts_sec) AS d_last,
         CAST(COUNT(*) AS BIGINT) AS d_n,
         arg_max(fingerprint, fetch_ts_sec) AS d_fp
  FROM delta GROUP BY url)
SELECT coalesce(b.url, d.url) AS url,
       CASE WHEN b.n_fetches IS NOT NULL THEN b.first_seen_ts
            ELSE d.d_first END AS first_seen_ts,
       greatest(coalesce(b.last_fetch_ts, 0),
                coalesce(d.d_last, 0)) AS last_fetch_ts,
       coalesce(b.n_fetches, 0) + coalesce(d.d_n, 0) AS n_fetches,
       coalesce(d.d_fp, b.fingerprint) AS fingerprint,
       CASE WHEN b.n_fetches IS NULL THEN 'new'
            WHEN d.d_n IS NULL THEN 'carried'
            WHEN d.d_fp <> b.fingerprint THEN 'updated'
            ELSE 'unchanged' END AS status
FROM base b FULL OUTER JOIN dagg d ON b.url = d.url
"""


def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 screen: error pages served as HTTP 200 flagged by (a)
    exact match against the host's PROBED error-template fingerprint
    (sic-transit random-URL probing) or (b) an error phrase on a thin
    page (< 12 tokens). The synthetic table routes docs to normal /
    phrase-error / template-clone shapes by an md5 nibble so all three
    branches fire. Per-row screens + one host-keyed left join against
    the probe relation (host-cardinality — shuffle, never broadcast)."""
    from .operators.webpages import (
        soft404_probes,
        soft404_screen,
        synthetic_soft404_pages,
    )

    pages = synthetic_soft404_pages(_t(spark, sf_dir, "documents"))
    return soft404_screen(pages, soft404_probes(pages))


def _sql_soft404() -> str:
    return r"""
WITH pages0 AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 8 AS VARCHAR) || '.example.org' AS host,
         replace(coalesce(text, ''), chr(10), ' ') AS body,
         (strpos('0123456789abcdef',
            substring(md5(CAST(doc_id AS VARCHAR)), 14, 1)) - 1) % 8 AS b
  FROM documents),
pages AS (
  SELECT doc_id, host,
         'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN b = 6
                THEN 'Error 404 - page not found. ' || substring(body, 1, 20)
              WHEN b = 7
                THEN 'The page you requested does not exist on ' || host
                     || '. Try the homepage.'
              ELSE body END AS text
  FROM pages0),
probes AS (
  SELECT DISTINCT host,
         md5('The page you requested does not exist on ' || host
             || '. Try the homepage.') AS probe_md5
  FROM pages)
SELECT p.doc_id, p.url,
       regexp_matches(lower(p.text),
         '(error 404|not found|does not exist|no longer available)')
         AS has_phrase,
       CAST(len(list_filter(
              string_split(trim(regexp_replace(p.text,
                '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
              x -> length(x) > 0)) AS BIGINT) AS n_toks,
       coalesce(md5(p.text) = pr.probe_md5, false) AS template_match,
       coalesce(md5(p.text) = pr.probe_md5, false)
         OR (regexp_matches(lower(p.text),
               '(error 404|not found|does not exist|no longer available)')
             AND len(list_filter(
                   string_split(trim(regexp_replace(p.text,
                     '[ \t\n\r\f\x0b]+', ' ', 'g')), ' '),
                   x -> length(x) > 0)) < 12) AS is_soft404
FROM pages p LEFT JOIN probes pr ON p.host = pr.host
"""


def q_frontier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier prioritization with per-host politeness caps: the
    uncrawled sitemap frontier scored by integral sitemap-evidence +
    link-popularity weights (n_refs·1000 + priority_ppm/1000 +
    in_degree·500), then row_number-capped to 3 candidates per host so
    no site monopolizes the fetch budget. One url-keyed left join + one
    host window; nothing broadcast."""
    from .operators.webpages import (
        _page_url,
        frontier_gap,
        frontier_priority,
        link_graph,
        sitemap_entries,
        synthetic_linked_pages,
        synthetic_sitemaps,
    )

    docs = _t(spark, sf_dir, "documents")
    gap = frontier_gap(
        sitemap_entries(synthetic_sitemaps(docs)),
        docs.select(_page_url(F.col("doc_id")).alias("url")),
    )
    return frontier_priority(
        gap, link_graph(synthetic_linked_pages(docs)), per_host_cap=3
    )


def _sql_frontier_priority() -> str:
    return f"""
WITH fg AS ({_sql_frontier_gap()}),
lg AS ({_sql_link_graph()}),
j AS (
  SELECT regexp_extract(f.loc, '^https?://([^/:]+)', 1) AS host,
         f.loc, f.n_refs,
         coalesce(l.in_degree, 0) AS in_degree,
         coalesce(f.max_priority_ppm, 0) AS prio
  FROM fg f LEFT JOIN lg l ON f.loc = l.dst_url),
s AS (
  SELECT host, loc, n_refs, in_degree,
         CAST(n_refs * 1000 + prio // 1000 + in_degree * 500
              AS BIGINT) AS score
  FROM j),
r AS (
  SELECT host, loc, score,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY score DESC, loc) AS BIGINT)
           AS host_rank,
         n_refs, in_degree
  FROM s)
SELECT host, loc, score, host_rank, n_refs, in_degree
FROM r WHERE host_rank <= 3
"""


def q_link_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-farm screen over the host graph: per-host
    in/out/self link masses plus reciprocity (distinct external
    out-neighbours that link straight back, integral ppm), flagging
    hosts whose reciprocity ≥ 50% across ≥ 2 out-neighbours. Runs
    entirely at host-pair grain — three hash aggregates + one
    pair-vs-swapped-pair semi-join, nothing broadcast."""
    from .operators.webpages import (
        host_graph,
        link_spam_scores,
        synthetic_linked_pages,
    )

    return link_spam_scores(
        host_graph(synthetic_linked_pages(_t_raw(spark, sf_dir, "documents")))
    )


def _sql_link_spam() -> str:
    return f"""
WITH hg AS ({_sql_host_graph()}),
ext AS (
  SELECT src_host, dst_host, n_links FROM hg WHERE NOT internal),
out_a AS (
  SELECT src_host AS host, CAST(SUM(n_links) AS BIGINT) AS out_links,
         CAST(COUNT(*) AS BIGINT) AS out_hosts
  FROM ext GROUP BY 1),
in_a AS (
  SELECT dst_host AS host, CAST(SUM(n_links) AS BIGINT) AS in_links
  FROM ext GROUP BY 1),
self_a AS (
  SELECT src_host AS host, CAST(SUM(n_links) AS BIGINT) AS self_links
  FROM hg WHERE internal GROUP BY 1),
recip AS (
  SELECT a.src_host AS host, CAST(COUNT(*) AS BIGINT) AS recip_hosts
  FROM ext a JOIN ext b
    ON a.src_host = b.dst_host AND a.dst_host = b.src_host
  GROUP BY 1),
hosts AS (
  SELECT src_host AS host FROM hg
  UNION SELECT dst_host FROM hg),
m AS (
  SELECT h.host,
         coalesce(out_links, 0) AS out_links,
         coalesce(in_links, 0) AS in_links,
         coalesce(self_links, 0) AS self_links,
         coalesce(out_hosts, 0) AS out_hosts,
         coalesce(recip_hosts, 0) AS recip_hosts
  FROM hosts h
  LEFT JOIN out_a USING (host) LEFT JOIN in_a USING (host)
  LEFT JOIN self_a USING (host) LEFT JOIN recip USING (host))
SELECT *,
       CASE WHEN out_hosts > 0
            THEN recip_hosts * 1000000 // out_hosts
            ELSE CAST(0 AS BIGINT) END AS recip_ppm,
       (CASE WHEN out_hosts > 0
             THEN recip_hosts * 1000000 // out_hosts
             ELSE CAST(0 AS BIGINT) END) >= 500000
         AND out_hosts >= 2 AS is_farm
FROM m
"""


def q_recrawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-change detection across recrawls: canonicalize the
    synthetic fetch table, fingerprint each fetch (md5 over canonical
    slot + a 3-way deterministic content version), then lag-compare
    within each canonical URL's time-ordered fetch history — the
    freshness signal a crawl scheduler feeds on. One shuffle (the
    window partition)."""
    from .operators.webpages import (
        canonical_url,
        recrawl_delta,
        synthetic_page_urls,
    )

    p = synthetic_page_urls(_t(spark, sf_dir, "documents"))
    f = p.select(
        canonical_url(F.col("url")).alias("canonical_url"),
        "fetch_ts_sec",
        F.md5(
            F.concat(
                canonical_url(F.col("url")), F.lit("#v"),
                ((F.col("doc_id") * 7919) % 3).cast("string"),
            )
        ).alias("fingerprint"),
    )
    return recrawl_delta(f)


def _sql_recrawl_delta() -> str:
    return _SQL_CANON_PAGES + """
, f AS (
  SELECT canonical_url, fetch_ts_sec,
         md5(canonical_url || '#v'
             || CAST((doc_id * 7919) % 3 AS VARCHAR)) AS fingerprint
  FROM c
)
SELECT canonical_url, fetch_ts_sec, fingerprint,
       coalesce(fingerprint <> lag(fingerprint) OVER
         (PARTITION BY canonical_url ORDER BY fetch_ts_sec), false)
         AS changed,
       CAST(row_number() OVER
         (PARTITION BY canonical_url ORDER BY fetch_ts_sec) AS BIGINT)
         AS fetch_seq
FROM f
"""


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff + decode over raw page bytes: BOM → declared
    ``charset=`` (alias-normalized) → utf-8 default, decoded through
    the matching JVM charset — all native expressions, zero shuffles.
    The synthetic corpus populates every branch (utf-8 with/without
    meta, BOM, latin1-aliased and canonical ISO-8859-1, windows-1252
    with cp1252-only bytes) so a blind utf-8 decode provably fails."""
    from .operators.encoding import decode_html, synthetic_encoded_pages

    pages = synthetic_encoded_pages(_t(spark, sf_dir, "documents"))
    return decode_html(pages).select(
        "doc_id", "declared", "charset", "bom", "utf8_fallback",
        "text_decoded",
        F.length("text_decoded").cast("long").alias("n_chars"),
    )


def _sql_charset_decode() -> str:
    """Direct expected-value oracle: DuckDB cannot hold latin-1 BYTES
    in a VARCHAR, so instead of rebuilding + re-decoding the binary it
    states the decoded RESULT each branch must produce (DuckDB string
    literals are already UTF-8). The byte-level decode behavior itself
    is pinned against Python codecs in tests/test_encoding.py."""
    from .operators.encoding import LATIN1_BODY, WIN1252_BODY

    return f"""
WITH b AS (
  SELECT doc_id, coalesce(text, '') AS t,
         (strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 11, 1)) - 1)
         % 8 AS m
  FROM documents
),
o AS (
  SELECT doc_id, m,
         CASE WHEN m <= 2 THEN 'utf-8'
              WHEN m = 5 THEN 'latin1'
              WHEN m = 6 THEN 'iso-8859-1'
              WHEN m = 7 THEN 'windows-1252' END AS declared,
         CASE WHEN m <= 4 THEN 'utf-8'
              WHEN m = 7 THEN 'windows-1252'
              ELSE 'iso-8859-1' END AS charset,
         m = 4 AS bom,
         CASE
           WHEN m <= 2 THEN '<html><head><meta charset="utf-8">'
             || '</head><body><p>' || t || '</p></body></html>'
           WHEN m <= 4 THEN '<html><head></head><body><p>' || t
             || '</p></body></html>'
           WHEN m <= 6 THEN '<html><head><meta charset="'
             || CASE WHEN m = 5 THEN 'latin1' ELSE 'iso-8859-1' END
             || '"></head><body><p>{LATIN1_BODY[0]}'
             || CAST(doc_id AS VARCHAR)
             || '{LATIN1_BODY[1]}</p></body></html>'
           ELSE '<html><head><meta charset="windows-1252">'
             || '</head><body><p>{WIN1252_BODY[0]}'
             || CAST(doc_id AS VARCHAR)
             || '{WIN1252_BODY[1]}</p></body></html>'
         END AS text_decoded
  FROM b
)
SELECT doc_id, declared, charset, bom,
       false AS utf8_fallback,  -- parquet text is valid utf-8 by spec
       text_decoded,
       CAST(length(text_decoded) AS BIGINT) AS n_chars
FROM o
"""


def q_host_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level filtering (FineWeb/UT1 style): score every page
    (alnum-fraction ppm, integer-exact), aggregate per host over a
    256-host synthetic shard, gate each page by its host's verdict
    (≥2 pages AND integral mean ≥ 500000 ppm). One aggregate + one
    size-aware join back on host."""
    from .operators.webpages import host_quality_gate, synthetic_host_pages

    return host_quality_gate(
        synthetic_host_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_host_quality_gate() -> str:
    return """
WITH p AS (
  SELECT doc_id,
         'h' || CAST(
           (strpos('0123456789abcdef',
                   substring(md5(CAST(doc_id AS VARCHAR)), 12, 1)) - 1)
           * 16
           + strpos('0123456789abcdef',
                    substring(md5(CAST(doc_id AS VARCHAR)), 13, 1)) - 1
           AS VARCHAR) || '.example.org' AS host,
         text
  FROM documents
),
s AS (
  SELECT 'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url,
         host,
         CASE WHEN length(coalesce(text, '')) = 0 THEN 0
              ELSE CAST(floor(1000000
                     * length(regexp_replace(text, '[^A-Za-z0-9]', '',
                                             'g'))
                     / length(text)) AS BIGINT) END AS score_ppm
  FROM p
),
v AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS host_pages,
         CAST(sum(score_ppm) // count(*) AS BIGINT) AS host_avg_ppm
  FROM s GROUP BY host
)
SELECT s.url, s.host, s.score_ppm, v.host_pages, v.host_avg_ppm,
       v.host_pages >= 2 AND v.host_avg_ppm >= 500000 AS kept
FROM s JOIN v USING (host)
"""


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style capture index (the Common-Crawl index build): SURT
    urlkey + capture ts + original url + content digest/length over the
    synthetic page-URL table, range-partitioned and sorted on (urlkey,
    ts) exactly like the real CDX shards. The projection is zero
    shuffles; the range exchange is the one unavoidable shuffle of a
    globally sorted index."""
    from .operators.webpages import cdx_index, synthetic_page_urls

    return cdx_index(
        synthetic_page_urls(_t(spark, sf_dir, "documents"),
                            carry=("text",))
    )


def _sql_cdx_index() -> str:
    # SURT mirror over the shared synthetic raw-URL CTE (`u`; the
    # canonical CTE `c` rides along unused): the oracle
    # re-canonicalizes with its own regex/list functions.
    return _SQL_CANON_PAGES + """,
low AS (
  SELECT doc_id, fetch_ts_sec, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '#.*$', ''),
               '^[a-z][a-z0-9+.-]*://', ''),
             '^www\\.', ''),
           '^([^/?:]+):(80|443)([/?].*)?$', '\\1\\3') AS s
  FROM u
),
parts AS (
  SELECT doc_id, fetch_ts_sec, url,
         regexp_extract(s, '^([^/?:]+)', 1) AS host,
         regexp_extract(s, '^[^/?:]+(:[0-9]+)', 1) AS port,
         regexp_replace(regexp_extract(s, '^[^/?]+([^?]*)', 1),
                        '/$', '') AS path,
         list_filter(
           string_split(regexp_extract(s, '\\?(.*)$', 1), '&'),
           p -> length(p) > 0) AS params
  FROM low
)
SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
       || port || ')' || path
       || CASE WHEN len(params) > 0
            THEN '?' || array_to_string(list_sort(params), '&')
            ELSE '' END AS urlkey,
       fetch_ts_sec, url,
       md5(coalesce(d.text, '')) AS digest,
       CAST(strlen(coalesce(d.text, '')) AS BIGINT) AS length
FROM parts JOIN documents d USING (doc_id)
"""


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML → crawler URL-discovery feed (sitemaps.org): one
    row per <url> entry with loc / optional lastmod / changefreq /
    priority (integer ppm). ONE regexp_extract_all pass pulls whole
    entry blocks (single-scan discipline); per-field regexes run over
    the tiny match strings. Zero shuffles."""
    from .operators.webpages import sitemap_entries, synthetic_sitemaps

    return sitemap_entries(
        synthetic_sitemaps(_t(spark, sf_dir, "documents"))
    )


def _sql_sitemap_parse() -> str:
    return _sql_sitemap_cte() + "\nSELECT * FROM parsed"


def _sql_sitemap_cte() -> str:
    # The oracle REBUILDS each sitemap document and RE-PARSES it with
    # its own regexes (true double-parse, like page_metadata); shared
    # by the sitemap_parse and frontier_gap oracles.
    nib = ("(strpos('0123456789abcdef', "
           "substring(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)")
    entry = """
      CASE WHEN {j} <= 1 + ({n10} % 3) THEN
        '<url><loc>https://site'
        || CAST((strpos('0123456789abcdef', substring(
             md5(CAST((doc_id * 17 + {j} * 59) % 512 AS VARCHAR)),
             1, 1)) - 1) % 4 AS VARCHAR)
        || '.example.org/p/'
        || CAST((doc_id * 17 + {j} * 59) % 512 AS VARCHAR) || '</loc>'
        || CASE WHEN {nj} % 2 = 0
             THEN '<lastmod>2026-01-'
                  || lpad(CAST({nj} % 28 + 1 AS VARCHAR), 2, '0')
                  || '</lastmod>' ELSE '' END
        || CASE WHEN {nj} % 3 != 0
             THEN '<changefreq>'
                  || (CASE {nj} % 3 WHEN 0 THEN 'daily'
                      WHEN 1 THEN 'weekly' ELSE 'monthly' END)
                  || '</changefreq>' ELSE '' END
        || CASE WHEN {nj} % 4 != 0
             THEN '<priority>0.' || CAST({nj} % 10 AS VARCHAR)
                  || '</priority>' ELSE '' END
        || '</url>'
      ELSE '' END"""
    entries = " || ".join(
        entry.format(j=j, n10=nib.format(i=10), nj=nib.format(i=10 + j))
        for j in (1, 2, 3)
    )
    return f"""
WITH sm AS (
  SELECT 'https://site'
         || CAST({nib.format(i=1)} % 4 AS VARCHAR)
         || '.example.org/sitemap-' || CAST(doc_id AS VARCHAR)
         || '.xml' AS sitemap_url,
         '<?xml version="1.0"?><urlset>' || {entries}
         || '</urlset>' AS xml
  FROM documents
),
e AS (
  SELECT sitemap_url,
         unnest(regexp_extract_all(xml, '<url>.*?</url>')) AS b
  FROM sm
),
parsed AS (
  SELECT sitemap_url,
         regexp_extract(b, '<loc>([^<]*)</loc>', 1) AS loc,
         CASE WHEN regexp_matches(b, '<lastmod>([^<]*)</lastmod>')
           THEN regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1)
         END AS lastmod,
         CASE WHEN regexp_matches(b, '<changefreq>([^<]*)</changefreq>')
           THEN regexp_extract(b, '<changefreq>([^<]*)</changefreq>', 1)
         END AS changefreq,
         CASE WHEN regexp_matches(b, '<priority>([^<]*)</priority>')
           THEN CAST(regexp_extract(
                  regexp_extract(b, '<priority>([^<]*)</priority>', 1),
                  '^0\\.(\\d)$', 1) AS BIGINT) * 100000
         END AS priority_ppm
  FROM e
)"""


def q_frontier_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-frontier construction: sitemap-discovered locations LEFT
    ANTI joined against the crawled url set — per uncrawled loc, its
    reference count, strongest advertised priority, freshest lastmod.
    One aggregate on loc + one anti join; both sides hash once on the
    url (neither is broadcastable at crawl scale)."""
    from .operators.webpages import (
        _page_url,
        frontier_gap,
        sitemap_entries,
        synthetic_sitemaps,
    )

    docs = _t(spark, sf_dir, "documents")
    discovered = sitemap_entries(synthetic_sitemaps(docs))
    crawled = docs.select(_page_url(F.col("doc_id")).alias("url"))
    return frontier_gap(discovered, crawled)


def _sql_frontier_gap() -> str:
    return _sql_sitemap_cte() + """,
agg AS (
  SELECT loc, CAST(count(*) AS BIGINT) AS n_refs,
         max(priority_ppm) AS max_priority_ppm,
         max(lastmod) AS latest_lastmod
  FROM parsed GROUP BY loc
),
crawled AS (
  SELECT DISTINCT 'https://site'
         || CAST((strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 4
            AS VARCHAR)
         || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT a.loc, a.n_refs, a.max_priority_ppm, a.latest_lastmod
FROM agg a LEFT JOIN crawled c ON a.loc = c.url
WHERE c.url IS NULL
"""


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME routing of raw archive payloads (file(1)/WHATWG
    mimesniff order: PDF/PNG/GIF/JPEG/gzip/zip magics → HTML tag probe
    → NUL text-vs-binary heuristic) over a deterministic mixed-media
    binary column; all decisions on the uppercase hex of a bounded
    payload head — cross-engine exact, zero shuffles."""
    from .operators.encoding import mime_sniff, synthetic_payloads

    return mime_sniff(synthetic_payloads(_t(spark, sf_dir, "documents")))


def _sql_mime_sniff() -> str:
    from .operators.encoding import _KIND_MAGIC

    magic_case = " ".join(
        f"WHEN {i} THEN '{_KIND_MAGIC[k]}00' || hex(body)"
        for i, k in enumerate(
            ("pdf", "png", "gif", "jpeg", "gzip", "zip"), start=1
        )
    )
    # payload hex per kind; ASCII kinds (0: html-tagged, 8: bare text)
    # also keep a STRING view for the tag probe — every byte is
    # printable ASCII there, so hex() and the string agree by
    # construction; binary kinds can never start with '<'.
    return f"""
WITH p AS (
  SELECT doc_id,
         (  (strpos('0123456789abcdef', substring(
               md5(CAST(doc_id AS VARCHAR)), 14, 1)) - 1) * 16
          + strpos('0123456789abcdef', substring(
               md5(CAST(doc_id AS VARCHAR)), 15, 1)) - 1) % 9 AS m,
         regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') AS body
  FROM documents
),
h AS (
  SELECT doc_id, m,
         CASE m
           WHEN 0 THEN hex('<!DOCTYPE html><html><body>' || body)
           {magic_case}
           WHEN 7 THEN '0000' || hex(body)
           ELSE hex(body)
         END AS ph,
         CASE WHEN m = 0 THEN '<!DOCTYPE html><html><body>' || body
              WHEN m = 8 THEN body ELSE '' END AS pstr
  FROM p
),
s AS (
  SELECT doc_id,
         substring(ph, 1, 2048) AS head,
         regexp_replace(lower(substring(pstr, 1, 64)), '^\\s+', '')
           AS probe,
         substring(ph, 1, 16) AS magic_hex,
         CAST(length(ph) // 2 AS BIGINT) AS payload_len,
         regexp_matches(substring(ph, 1, 2048),
                        '^([0-9A-F]{{2}})*?00') AS has_nul
  FROM h
)
SELECT doc_id,
       CASE
         WHEN starts_with(head, '255044462D') THEN 'application/pdf'
         WHEN starts_with(head, '89504E470D0A1A0A') THEN 'image/png'
         WHEN starts_with(head, '474946383761') THEN 'image/gif'
         WHEN starts_with(head, '474946383961') THEN 'image/gif'
         WHEN starts_with(head, 'FFD8FF') THEN 'image/jpeg'
         WHEN starts_with(head, '1F8B') THEN 'application/gzip'
         WHEN starts_with(head, '504B0304') THEN 'application/zip'
         WHEN starts_with(probe, '<!doctype html')
              OR starts_with(probe, '<html') THEN 'text/html'
         WHEN has_nul THEN 'application/octet-stream'
         ELSE 'text/plain'
       END AS mime,
       magic_hex, payload_len, has_nul AS is_binary
FROM s
"""


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware fetch scheduling: every frontier URL gets a
    per-host slot under a per-host crawl delay (1-4 s from the host
    md5, standing in for robots Crawl-delay); slot i fetches at
    i·delay seconds. ONE window shuffle on host — a mega-host
    serializes by the politeness constraint itself, not by the
    engine."""
    from .operators.webpages import fetch_schedule, synthetic_page_urls

    return fetch_schedule(
        synthetic_page_urls(_t(spark, sf_dir, "documents"))
    )


def _sql_fetch_schedule() -> str:
    return _SQL_CANON_PAGES + """,
f AS (
  SELECT doc_id, url,
         regexp_extract(url, '^[a-z]+://([^/?:]+)', 1) AS host
  FROM u
),
d AS (
  SELECT doc_id, url, host,
         CAST((strpos('0123456789abcdef', substring(md5(host), 1, 1))
               - 1) % 4 + 1 AS BIGINT) AS delay_sec,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY url, doc_id) - 1 AS BIGINT)
           AS slot
  FROM f
)
SELECT doc_id, url, host, delay_sec, slot,
       slot * delay_sec AS scheduled_offset_sec
FROM d
"""


def q_host_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host template (chrome) line removal: lines appearing on
    ≥ 60% of a host's pages (hosts with ≥ 4 pages) are detected as
    site chrome and stripped from every page, which is the host-scoped
    deboilerplate pass CC-style pipelines run between HTML strip and
    corpus-level line dedup. The synthetic page table stamps a nav +
    footer on every page of a host (must be stripped), a promo line on
    ~half (must survive), and unique body lines cut from the document
    text (must survive). Two hash aggregates + two host-keyed joins;
    nothing broadcast — hosts are crawl-cardinality."""
    from .operators.webpages import (
        host_template_lines,
        strip_host_template,
        synthetic_host_lined_pages,
    )

    pages = synthetic_host_lined_pages(_t(spark, sf_dir, "documents"))
    return strip_host_template(pages, host_template_lines(pages))


def _sql_host_template_strip() -> str:
    return r"""
WITH pages0 AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 8 AS VARCHAR) || '.example.org' AS host,
         replace(coalesce(text, ''), chr(10), ' ') AS body
  FROM documents),
pages AS (
  SELECT doc_id, host,
         'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url,
         concat_ws(chr(10),
           'NAV ' || host || ' home products about contact',
           CASE WHEN (strpos('0123456789abcdef',
                   substring(md5(CAST(doc_id AS VARCHAR)), 13, 1)) - 1)
                   % 2 = 0
                THEN 'PROMO newsletter for ' || host END,
           'BODY0 ' || substring(body, 1, 80),
           'BODY1 ' || substring(body, 81, 80),
           'BODY2 ' || substring(body, 161, 80),
           '(c) 2026 ' || host) AS text
  FROM pages0),
lines AS (
  SELECT doc_id, url, host, CAST(i - 1 AS BIGINT) AS line_no, ls[i] AS line
  FROM (SELECT *, string_split(text, chr(10)) AS ls FROM pages) p,
       LATERAL unnest(generate_series(1, len(ls))) s(i)),
hp AS (
  SELECT host, COUNT(DISTINCT url) AS host_pages FROM pages GROUP BY host),
tmpl AS (
  SELECT lp.host, lp.line
  FROM (SELECT host, line, COUNT(DISTINCT url) AS n_pages
        FROM lines GROUP BY host, line) lp
  JOIN hp ON lp.host = hp.host
  WHERE hp.host_pages >= 4
    AND lp.n_pages * 1000000 >= 600000 * hp.host_pages)
SELECT l.doc_id, l.url,
       coalesce(string_agg(CASE WHEN t.line IS NULL THEN l.line END,
                           chr(10) ORDER BY l.line_no), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN t.line IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stripped
FROM lines l
LEFT JOIN tmpl t ON l.host = t.host AND l.line = t.line
GROUP BY l.doc_id, l.url
"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3xx canonicalization: follow every redirect chain to its
    terminus (resolved / loop / truncated at 4 hops) over a synthetic
    edge table with straight chains, terminus-less exits, self-loops
    and md5-scrambled cycles. max_hops unrolled left joins against the
    redirect map; in-flight rows strictly shrink each hop."""
    from .operators.webpages import resolve_redirects, synthetic_redirects

    return resolve_redirects(
        synthetic_redirects(_t(spark, sf_dir, "documents")), max_hops=4
    )


# Shared oracle fragment: the synthetic redirect edge table and the
# bounded recursive walk with terminal-status classification (mirror of
# operators.webpages.synthetic_redirects + resolve_redirects at
# max_hops=4).  Used WITH RECURSIVE by both the resolver query and the
# alias-attribution query.
_SQL_REDIRECT_WALK = r"""
e AS (
  SELECT 'https://r.example.org/' || CAST(doc_id AS VARCHAR) AS src_url,
         CASE (strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 12, 1)) - 1) % 4
           WHEN 0 THEN 'https://r.example.org/'
                       || CAST((doc_id * 7 + 3) % 512 AS VARCHAR)
           WHEN 1 THEN 'https://f.example.org/'
                       || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN 'https://r.example.org/'
                       || CAST(doc_id AS VARCHAR)
           ELSE 'https://r.example.org/'
                || CAST((doc_id * 3 + 1) % 512 AS VARCHAR)
         END AS location
  FROM documents
  WHERE (strpos('0123456789abcdef',
           substring(md5(CAST(doc_id AS VARCHAR)), 11, 1)) - 1) % 4 <= 2
),
walk AS (
  SELECT src_url, location AS cur, CAST(1 AS BIGINT) AS n_hops,
         [src_url] AS seen
  FROM e
  UNION ALL
  SELECT w.src_url, e2.location, w.n_hops + 1,
         list_append(w.seen, w.cur)
  FROM walk w JOIN e e2 ON w.cur = e2.src_url
  WHERE NOT list_contains(w.seen, w.cur) AND w.n_hops < 4
),
last AS (
  SELECT src_url, cur, n_hops, seen,
         row_number() OVER (PARTITION BY src_url
                            ORDER BY n_hops DESC) AS rk
  FROM walk
),
resolved0 AS (
  SELECT l.src_url, l.cur AS final_url, l.n_hops,
         CASE
           WHEN NOT EXISTS (SELECT 1 FROM e WHERE e.src_url = l.cur)
             THEN 'resolved'
           WHEN list_contains(l.seen, l.cur) THEN 'loop'
           ELSE 'truncated'
         END AS status
  FROM last l WHERE rk = 1
)"""


def _sql_redirect_resolve() -> str:
    return (
        "WITH RECURSIVE " + _SQL_REDIRECT_WALK
        + "\nSELECT src_url, final_url, n_hops, status FROM resolved0\n"
    )


def q_canonical_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias → canonical-page attribution: content pages (URLs with no
    outgoing 3xx) credited with the alias URLs whose resolved redirect
    walk terminates at them — the dedup/credit step a crawler runs
    right after 3xx canonicalization. One anti join (content = pages
    minus redirect sources), the unrolled walk, one final_url hash agg,
    one left join back; all url-keyed shuffles, nothing broadcast."""
    from .operators.webpages import attribute_aliases, synthetic_redirects

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://r.example.org/"), F.col("doc_id").cast("string")
        ).alias("url"),
        "doc_id",
    )
    return attribute_aliases(
        pages, synthetic_redirects(docs), max_hops=4
    )


def _sql_canonical_attribution() -> str:
    return (
        "WITH RECURSIVE " + _SQL_REDIRECT_WALK
        + r""",
pages AS (
  SELECT 'https://r.example.org/' || CAST(doc_id AS VARCHAR) AS url,
         doc_id
  FROM documents),
content AS (
  SELECT p.* FROM pages p
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src_url = p.url)),
alias_agg AS (
  SELECT final_url AS url, CAST(COUNT(*) AS BIGINT) AS n_aliases,
         MAX(n_hops) AS max_alias_hops
  FROM resolved0 WHERE status = 'resolved'
  GROUP BY final_url)
SELECT c.url, c.doc_id,
       coalesce(a.n_aliases, 0) AS n_aliases,
       coalesce(a.max_alias_hops, 0) AS max_alias_hops
FROM content c LEFT JOIN alias_agg a ON c.url = a.url
"""
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (search-tier consumer of the extracted
    corpus): per term, exact df and total tf plus a posting sample of
    the 16 smallest doc_ids sorted ascending — the sample is capped
    BEFORE any collect_list so a stopword's posting list never
    materializes unbounded, and df stays exact so the truncation is
    disclosed. Hapaxes (df < 2) dropped after stats. One (term, doc_id)
    hash agg + one term window; the final term group-by reuses the
    window's partitioning."""
    from .operators.indexing import inverted_index

    return inverted_index(
        _t(spark, sf_dir, "documents"), min_df=2, top_postings=16
    )


def _sql_inverted_index() -> str:
    return (
        "WITH " + _SQL_CLEAN_TOKS
        + r""",
terms AS (
  SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms GROUP BY term, doc_id),
stats AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
         CAST(SUM(tf) OVER (PARTITION BY term) AS BIGINT) AS tf_total
  FROM tf)
SELECT term, df, tf_total, list(doc_id ORDER BY doc_id) AS postings
FROM stats
WHERE rk <= 16 AND df >= 2
GROUP BY term, df, tf_total
"""
    )


def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET sink roundtrip: extraction-funnel main content rendered as
    WARC conversion records (the derived text format CC publishes) and
    PARSED BACK through the WARC splitter — length_ok + payload_md5
    prove the written bytes carry the extracted text exactly. Entirely
    native string render/parse around the one Arrow extraction stage;
    zero shuffles."""
    from .sources.warc import (
        extract_main_from_warc,
        parse_warc,
        synthetic_warc_http_records,
        wet_records,
    )

    docs = _t(spark, sf_dir, "documents")
    ex = extract_main_from_warc(synthetic_warc_http_records(docs))
    return parse_warc(wet_records(ex))


def _sql_wet_export() -> str:
    crlf = "chr(13) || chr(10)"
    return f"""
WITH ex AS ({_sql_extraction_funnel()}),
rec AS (
  SELECT 'WARC/1.0' || {crlf}
      || 'WARC-Type: conversion' || {crlf}
      || 'WARC-Target-URI: ' || ex.url || {crlf}
      || 'WARC-Date: '
      || strftime(make_timestamp(
           (1735689600 + (ex.doc_id * 7919) % 8640000) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') || {crlf}
      || 'WARC-Refers-To: <urn:md5:'
      || md5(CAST(ex.doc_id AS VARCHAR)) || '>' || {crlf}
      || 'Content-Type: text/plain' || {crlf}
      || 'Content-Length: '
      || CAST(octet_length(encode(coalesce(ex.main_text, '')))
              AS VARCHAR)
      || {crlf} || {crlf} || coalesce(ex.main_text, '') AS s
  FROM ex
),
sp AS (
  SELECT substring(s, 1, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   - 1) AS head,
         substring(s, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   + 4) AS payload
  FROM rec
)
SELECT regexp_extract(head, 'WARC-Target-URI: ([^\r]+)', 1) AS url,
       regexp_extract(head, 'WARC-Type: ([^\r]+)', 1) AS warc_type,
       CAST(epoch(strptime(
         regexp_extract(head, 'WARC-Date: ([^\r]+)', 1),
         '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS warc_date_ts,
       CAST(regexp_extract(head, 'Content-Length: ([^\r]+)', 1)
            AS BIGINT) AS content_length,
       CAST(octet_length(encode(payload)) AS BIGINT) AS payload_octets,
       md5(payload) AS payload_md5,
       octet_length(encode(payload)) = CAST(
         regexp_extract(head, 'Content-Length: ([^\r]+)', 1) AS BIGINT)
         AS length_ok
FROM sp
"""


def q_wat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT sink roundtrip (completes the CC artifact trio next to WARC
    parse and WET export): per-page link metadata rendered as
    ``WARC-Type: metadata`` records with a concatenation-built JSON
    payload, parsed BACK through the WARC splitter and then queried
    with real JSON-path functions — length_ok + payload_md5 prove the
    record bytes, links_count/first_link prove the payload is
    well-formed JSON on both engines."""
    from .operators.webpages import synthetic_linked_pages
    from .sources.warc import parse_warc, wat_records

    pages = synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    w = parse_warc(wat_records(pages), with_payload=True)
    return w.select(
        "url",
        "warc_type",
        "warc_date_ts",
        "content_length",
        "payload_octets",
        "payload_md5",
        "length_ok",
        F.get_json_object("payload", "$.envelope.links_count")
        .cast("long").alias("links_count"),
        F.get_json_object("payload", "$.envelope.links[0]")
        .alias("first_link"),
    )


def _sql_wat_export() -> str:
    crlf = "chr(13) || chr(10)"
    page_url = _SQL_PAGE_URL.format(x="d.doc_id")
    return rf"""
WITH links AS ({_SQL_LINK_SLOTS}),
lk AS (
  SELECT src_id,
         list(dst_url ORDER BY dst_url) AS ls
  FROM (
    SELECT src_id,
           CASE WHEN j = 3
             THEN 'https://ext' || CAST(tgt AS VARCHAR) || '.example.net/'
             ELSE {_SQL_PAGE_URL.format(x="tgt")} END AS dst_url
    FROM links) GROUP BY src_id
),
pg AS (
  SELECT d.doc_id, {page_url} AS url,
         coalesce(ls, []) AS arr
  FROM documents d LEFT JOIN lk ON lk.src_id = d.doc_id
),
pay AS (
  SELECT doc_id, url,
         '{{"envelope":{{"uri":"'
         || replace(replace(url, chr(92), chr(92) || chr(92)),
                    '"', chr(92) || '"')
         || '","record_id":"urn:md5:' || md5(CAST(doc_id AS VARCHAR))
         || '","links":'
         || CASE WHEN len(arr) = 0 THEN '[]'
                 ELSE '["' || array_to_string(
                        list_transform(arr, x ->
                          replace(replace(x, chr(92),
                                          chr(92) || chr(92)),
                                  '"', chr(92) || '"')), '","')
                      || '"]' END
         || ',"links_count":' || CAST(len(arr) AS VARCHAR) || '}}}}'
           AS payload
  FROM pg
),
rec AS (
  SELECT 'WARC/1.0' || {crlf}
      || 'WARC-Type: metadata' || {crlf}
      || 'WARC-Target-URI: ' || url || {crlf}
      || 'WARC-Date: '
      || strftime(make_timestamp(
           (1735689600 + (doc_id * 7919) % 8640000) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') || {crlf}
      || 'WARC-Refers-To: <urn:md5:'
      || md5(CAST(doc_id AS VARCHAR)) || '>' || {crlf}
      || 'Content-Type: application/json' || {crlf}
      || 'Content-Length: '
      || CAST(octet_length(encode(payload)) AS VARCHAR)
      || {crlf} || {crlf} || payload AS s
  FROM pay
),
sp AS (
  SELECT substring(s, 1, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   - 1) AS head,
         substring(s, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   + 4) AS payload
  FROM rec
)
SELECT regexp_extract(head, 'WARC-Target-URI: ([^\r]+)', 1) AS url,
       regexp_extract(head, 'WARC-Type: ([^\r]+)', 1) AS warc_type,
       CAST(epoch(strptime(
         regexp_extract(head, 'WARC-Date: ([^\r]+)', 1),
         '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS warc_date_ts,
       CAST(regexp_extract(head, 'Content-Length: ([^\r]+)', 1)
            AS BIGINT) AS content_length,
       CAST(octet_length(encode(payload)) AS BIGINT) AS payload_octets,
       md5(payload) AS payload_md5,
       octet_length(encode(payload)) = CAST(
         regexp_extract(head, 'Content-Length: ([^\r]+)', 1) AS BIGINT)
         AS length_ok,
       CAST(json_extract_string(payload, '$.envelope.links_count')
            AS BIGINT) AS links_count,
       json_extract_string(payload, '$.envelope.links[0]')
         AS first_link
FROM sp
"""


def q_layout_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout parse (north rule): two-column gutter detection +
    de-columnizing over pdftotext-layout-style fixed-width pages — the
    widest strictly-interior vertical whitespace run that is blank on
    EVERY line is the column gutter; every line splits at it. One
    (doc_id,pos) aggregate + doc-local window/aggregates + one join of
    the page-count-sized gutter relation back onto the lines."""
    from .operators.layout import split_columns, synthetic_layout_pages

    out = split_columns(
        synthetic_layout_pages(_t(spark, sf_dir, "documents"))
    )
    return out.select(
        "doc_id",
        F.col("line_no").cast("long").alias("line_no"),
        "left_text",
        "right_text",
        F.col("gutter_start").cast("long").alias("gutter_start"),
        F.col("gutter_end").cast("long").alias("gutter_end"),
    )


def _sql_layout_columns() -> str:
    return r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(
           coalesce(text, ''), '\s+', ' ', 'g')), ' '),
           x -> length(x) > 0)[1:8] AS toks
  FROM documents
),
p AS (
  SELECT doc_id,
         array_to_string(list_transform(toks,
           t -> rpad(substring(t, 1, 16), 20, ' ')
                || upper(substring(t, 1, 16))), chr(10)) AS layout_text
  FROM t WHERE len(toks) > 0
),
l AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS line_no, ls[i] AS line
  FROM (SELECT doc_id, string_split(layout_text, chr(10)) AS ls FROM p),
       LATERAL unnest(generate_series(1, len(ls))) t(i)
),
ch AS (
  SELECT doc_id, i AS pos,
         CASE WHEN substring(line, i, 1) != ' ' THEN 1 ELSE 0 END
           AS nonblank
  FROM l, LATERAL unnest(generate_series(1, length(line))) s(i)
),
bp AS (
  SELECT doc_id, pos, sum(nonblank) AS nn FROM ch GROUP BY doc_id, pos
),
wdt AS (SELECT doc_id, max(pos) AS page_width FROM bp GROUP BY doc_id),
runs AS (
  SELECT doc_id, min(pos) AS gs, max(pos) AS ge
  FROM (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
             AS grp
    FROM bp WHERE nn = 0
  ) GROUP BY doc_id, grp
),
g AS (
  SELECT doc_id, gs, ge FROM (
    SELECT r.doc_id, gs, ge,
           row_number() OVER (PARTITION BY r.doc_id
                              ORDER BY (ge - gs + 1) DESC, gs) AS rk
    FROM runs r JOIN wdt w ON r.doc_id = w.doc_id
    WHERE gs > 1 AND ge < w.page_width AND ge - gs + 1 >= 2
  ) WHERE rk = 1
)
SELECT l.doc_id, l.line_no,
       rtrim(substring(l.line, 1, CAST(g.gs AS INT) - 1)) AS left_text,
       substring(l.line, CAST(g.ge AS INT) + 1, length(l.line))
         AS right_text,
       CAST(g.gs AS BIGINT) AS gutter_start,
       CAST(g.ge AS BIGINT) AS gutter_end
FROM l JOIN g USING (doc_id)
"""


def q_link_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 §5 reference resolution over extracted hrefs — the
    step between raw link extraction and any frontier / link-graph
    work: absolute, protocol-relative, root-relative, plain/dot
    relative, 1-3-level ``..`` ascent (3 clamps at root), query-only
    and fragment-only forms, dot-segment removal on the path component
    only.  Pure native expression chain over the fused extraction flat
    map — ZERO shuffles, zero Python."""
    from .operators.webpages import resolve_links, synthetic_relhref_pages

    return resolve_links(
        synthetic_relhref_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_link_resolve() -> str:
    def nib(i: int) -> str:
        return (
            f"(strpos('0123456789abcdef', "
            f"substring(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        )

    def t(j: int) -> str:
        return f"CAST((doc_id * 31 + {j} * 97) % 256 AS VARCHAR)"

    def a(href: str) -> str:
        return f"'<a href=\"' || {href} || '\">x</a>'"

    slots = " || ".join(
        [
            a(f"'https://ext' || {t(1)} || '.example.net/x/' || {t(1)}"),
            a(
                "'//cdn' || CAST((doc_id * 31 + 2 * 97) % 4 AS VARCHAR)"
                f" || '.example.net/lib/' || {t(2)} || '.js'"
            ),
            a(f"'/p/' || {t(3)}"),
            a(f"'img/' || {t(4)} || '.png'"),
            f"CASE WHEN {nib(11)} % 2 = 0 THEN "
            + a(f"'./same/' || {t(5)}") + " ELSE '' END",
            f"CASE WHEN {nib(12)} % 2 = 0 THEN "
            + a(f"'../up/' || {t(6)}") + " ELSE '' END",
            f"CASE WHEN {nib(13)} % 4 <> 0 THEN "
            + a(f"'../../' || {t(7)}") + " ELSE '' END",
            f"CASE WHEN {nib(13)} % 4 = 0 THEN "
            + a(f"'../../../deep/' || {t(8)}") + " ELSE '' END",
            f"CASE WHEN {nib(14)} % 2 = 0 THEN "
            + a("'?page=' || CAST((doc_id * 31 + 9 * 97) % 7 AS VARCHAR)")
            + " ELSE '' END",
            f"CASE WHEN {nib(15)} % 2 = 0 THEN "
            + a(f"'#sec' || {t(10)}") + " ELSE '' END",
        ]
    )
    return rf"""
WITH pg AS (
  SELECT doc_id,
         'https://site' || CAST({nib(1)} % 4 AS VARCHAR)
         || '.example.org/dir' || CAST(doc_id % 5 AS VARCHAR)
         || '/sub/' || CAST(doc_id AS VARCHAR) || '.html'
         || CASE WHEN {nib(10)} % 2 = 0
              THEN '?sess=' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END
           AS url,
         '<html><body>' || {slots} || '</body></html>' AS html
  FROM documents),
e AS (
  SELECT url AS src_url,
         regexp_extract(m, 'href="([^"]+)"', 1) AS href
  FROM pg, LATERAL unnest(
         regexp_extract_all(html, 'href="([^"]+)"', 0)) u(m)),
k AS (
  SELECT src_url, href,
         CASE WHEN regexp_matches(href, '^[a-z][a-z0-9+.-]*:')
                THEN 'absolute'
              WHEN href LIKE '//%' THEN 'protocol_relative'
              WHEN href LIKE '/%' THEN 'root_relative'
              WHEN href LIKE '?%' THEN 'query'
              WHEN href LIKE '#%' THEN 'fragment'
              ELSE 'relative' END AS kind,
         regexp_extract(src_url, '^([a-z][a-z0-9+.-]*):', 1) AS scheme,
         regexp_extract(src_url,
                        '^([a-z][a-z0-9+.-]*://[^/?#]+)', 1) AS b_origin,
         regexp_replace(src_url, '[?#].*$', '') AS base_nq
  FROM e),
r AS (
  SELECT src_url, href, kind,
         CASE kind
           WHEN 'absolute' THEN href
           WHEN 'protocol_relative' THEN scheme || ':' || href
           WHEN 'root_relative' THEN b_origin || href
           WHEN 'query' THEN base_nq || href
           WHEN 'fragment'
             THEN regexp_replace(src_url, '#.*$', '') || href
           ELSE regexp_replace(base_nq, '/[^/]*$', '/') || href
         END AS raw
  FROM k),
p AS (
  SELECT *, regexp_extract(raw,
              '^([a-z][a-z0-9+.-]*://[^/?#]+)', 1) AS origin0
  FROM r),
q AS (SELECT *, substring(raw, length(origin0) + 1) AS rest0 FROM p),
s AS (
  SELECT *, regexp_extract(rest0, '^([^?#]*)', 1) AS path0,
         substring(rest0,
           length(regexp_extract(rest0, '^([^?#]*)', 1)) + 1) AS tail0
  FROM q),
norm AS (
  SELECT *, regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(path0,
        '/\./', '/', 'g'), '/\./', '/', 'g'), '^\./', ''),
      '/[^/]+/\.\./', '/', 'g'), '/[^/]+/\.\./', '/', 'g'),
      '/[^/]+/\.\./', '/', 'g'),
    '^(/\.\.)+/', '/') AS npath
  FROM s)
SELECT src_url, href, kind,
       origin0 || npath || tail0 AS abs_url,
       regexp_extract(raw, '^[a-z]+://([^/?#]+)', 1)
         <> regexp_extract(src_url, '^[a-z]+://([^/?#]+)', 1)
         AS is_external
FROM norm
"""


def q_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (public-suffix list) rollup — the grain
    crawl budgets and ownership screens actually want, vs the
    HOSTNAME grain of host_graph/host_quality_gate: PSL longest-
    suffix match via three zero-exchange broadcast left joins (the
    PSL is ~10k rows, bounded by construction), implicit last-label
    fallback for unlisted TLDs, NULL registrable part for bare-suffix
    hosts, then ONE hash aggregate per (registered_domain, suffix)."""
    from .operators.webpages import (
        domain_rollup,
        public_suffix_df,
        synthetic_domain_pages,
    )

    return domain_rollup(
        synthetic_domain_pages(_t(spark, sf_dir, "documents")),
        public_suffix_df(spark),
    )


def _sql_domain_rollup() -> str:
    from .operators.webpages import PUBLIC_SUFFIXES

    vals = ", ".join(f"('{s}')" for s in PUBLIC_SUFFIXES)
    return f"""
WITH psl(suffix) AS (VALUES {vals}),
pg AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 6 = 0 THEN 'www.shop' || CAST(doc_id % 37 AS VARCHAR)
           || '.co.uk'
      WHEN doc_id % 6 = 1 THEN 'news' || CAST(doc_id % 37 AS VARCHAR)
           || '.org.uk'
      WHEN doc_id % 6 = 2 THEN
        CASE WHEN (strpos('0123456789abcdef', substring(
                   md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) % 8 = 0
             THEN 'github.io'
             ELSE 'blog' || CAST(doc_id % 37 AS VARCHAR) || '.github.io'
        END
      WHEN doc_id % 6 = 3 THEN 'm' || CAST(doc_id % 7 AS VARCHAR)
           || '.corp' || CAST(doc_id % 11 AS VARCHAR) || '.com'
      WHEN doc_id % 6 = 4 THEN 'dept' || CAST(doc_id % 5 AS VARCHAR)
           || '.uni' || CAST(doc_id % 13 AS VARCHAR) || '.ac.uk'
      ELSE 'cdn' || CAST(doc_id % 37 AS VARCHAR) || '.unknown'
           || CAST(doc_id % 3 AS VARCHAR) || '.zz'
    END AS host
  FROM documents),
cand AS (
  SELECT host, string_split(host, '.') AS ls, len(string_split(host, '.'))
         AS n
  FROM pg),
m AS (
  SELECT host, ls, n,
         coalesce(
           CASE WHEN n >= 3 AND array_to_string(ls[n-2:n], '.')
                  IN (SELECT suffix FROM psl)
                THEN array_to_string(ls[n-2:n], '.') END,
           CASE WHEN n >= 2 AND array_to_string(ls[n-1:n], '.')
                  IN (SELECT suffix FROM psl)
                THEN array_to_string(ls[n-1:n], '.') END,
           CASE WHEN ls[n] IN (SELECT suffix FROM psl) THEN ls[n] END,
           ls[n]) AS ps
  FROM cand),
rd AS (
  SELECT host, ps AS public_suffix,
         CASE WHEN host <> ps
              THEN ls[n - len(string_split(ps, '.'))] || '.' || ps
         END AS registered_domain
  FROM m)
SELECT registered_domain, public_suffix,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       MIN(host) AS first_host
FROM rd GROUP BY 1, 2
"""


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical largest-remainder (Hamilton) crawl-budget
    apportionment: the global per-cycle page budget split exactly
    across public suffixes (bounded global ranking) then registered
    domains (suffix-partitioned ranking) — Σ alloc == budget exactly,
    the invariant naive rounding cannot give."""
    from .operators.webpages import (
        crawl_budget,
        domain_rollup,
        public_suffix_df,
        synthetic_domain_pages,
    )

    return crawl_budget(
        domain_rollup(
            synthetic_domain_pages(_t_raw(spark, sf_dir, "documents")),
            public_suffix_df(spark),
        )
    )


def _sql_crawl_budget(total_budget: int = 100_000) -> str:
    B = total_budget
    return f"""
WITH roll AS (
{_sql_domain_rollup()}
),
d AS (
  SELECT registered_domain, public_suffix,
         CAST(n_pages AS BIGINT) AS weight
  FROM roll WHERE registered_domain IS NOT NULL
),
sfx AS (
  SELECT public_suffix, sum(weight) AS s_w FROM d GROUP BY public_suffix
),
tot AS (SELECT sum(s_w) AS t FROM sfx),
l1 AS (
  SELECT public_suffix, s_w,
         CAST(({B} * s_w) // t.t AS BIGINT) AS base,
         CAST({B} - sum(({B} * s_w) // t.t) OVER () AS BIGINT)
           AS leftover,
         row_number() OVER (ORDER BY ({B} * s_w) % t.t DESC,
                            public_suffix ASC) AS rk
  FROM sfx, tot t
),
sb AS (
  SELECT public_suffix, s_w,
         CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
              AS BIGINT) AS s_budget
  FROM l1
),
l2 AS (
  SELECT d.registered_domain, d.public_suffix, d.weight,
         CAST((sb.s_budget * d.weight) // sb.s_w AS BIGINT) AS base,
         CAST(sb.s_budget - sum((sb.s_budget * d.weight) // sb.s_w)
              OVER (PARTITION BY d.public_suffix) AS BIGINT)
           AS leftover,
         row_number() OVER (PARTITION BY d.public_suffix
            ORDER BY (sb.s_budget * d.weight) % sb.s_w DESC,
                     d.registered_domain ASC) AS rk
  FROM d JOIN sb ON sb.public_suffix = d.public_suffix
)
SELECT registered_domain, public_suffix, weight,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM l2
"""


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection (Bharat & Broder '99) over the synthetic
    mirrored corpus: per-host k-min line-hash sketches, banded
    candidate join (complete bands only), exact-Jaccard verification
    of candidates — never all-pairs."""
    from .operators.webpages import mirror_hosts, synthetic_mirror_pages

    return mirror_hosts(
        synthetic_mirror_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_mirror_hosts(
    sketch_k: int = 16, band_size: int = 4, threshold_e6: int = 500_000
) -> str:
    n_bands = sketch_k // band_size
    return f"""
WITH base AS (
  SELECT doc_id AS id, doc_id % 64 AS hid,
         'h' || CAST(doc_id % 64 AS VARCHAR) || '.example.org' AS host,
         'alpha line ' || CAST(doc_id AS VARCHAR) AS l1,
         'beta line ' || CAST((doc_id * 7) % 1000 AS VARCHAR) AS l2,
         'gamma line ' || CAST((doc_id * 13) % 1000 AS VARCHAR) AS l3
  FROM documents
),
pg AS (
  SELECT host, [l1, l2, l3] AS ls FROM base
  UNION ALL
  SELECT 'm' || CAST(hid AS VARCHAR) || '.example.org',
         CASE WHEN hid % 16 = 0 THEN [l1, l2, l3]
              ELSE [l1, l2, l3,
                    'mirror footer ' || CAST(id AS VARCHAR)] END
  FROM base WHERE hid % 8 = 0
),
ln AS (
  SELECT DISTINCT host, md5(unnest(ls)) AS line_h FROM pg
),
sizes AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_lines FROM ln GROUP BY host
),
sk AS (
  SELECT host, (list_sort(list(line_h)))[1:{sketch_k}] AS sig
  FROM ln GROUP BY host
),
bands AS (
  SELECT host, bb.b AS band,
         md5(array_to_string(
           sig[bb.b * {band_size} + 1 : (bb.b + 1) * {band_size}],
           '|')) AS band_h
  FROM sk, (SELECT unnest(range({n_bands})) AS b) bb
  WHERE len(sig[bb.b * {band_size} + 1 : (bb.b + 1) * {band_size}])
        = {band_size}
),
cand AS (
  SELECT DISTINCT a.host AS host_a, b.host AS host_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_h = b.band_h AND a.host < b.host
),
com AS (
  SELECT c.host_a, c.host_b, CAST(count(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN ln la ON la.host = c.host_a
  JOIN ln lb ON lb.host = c.host_b AND lb.line_h = la.line_h
  GROUP BY c.host_a, c.host_b
),
j AS (
  SELECT com.host_a, com.host_b, com.n_common,
         sa.n_lines AS n_a, sb.n_lines AS n_b,
         CAST((com.n_common * 1000000)
              // (sa.n_lines + sb.n_lines - com.n_common) AS BIGINT)
           AS jaccard_e6
  FROM com
  JOIN sizes sa ON sa.host = com.host_a
  JOIN sizes sb ON sb.host = com.host_b
)
SELECT host_a, host_b, n_common, n_a, n_b, jaccard_e6
FROM j WHERE jaccard_e6 >= {threshold_e6}
"""


def q_crawl_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-depth BFS from the deterministic seed set over the
    synthetic internal link graph — min hop distance per reached page,
    4 hops, frontier anti-joined against the visited set each hop (one
    shuffle join + distinct per hop, frontiers persisted)."""
    from .operators.webpages import crawl_depth, synthetic_linked_pages

    return crawl_depth(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


_SQL_INTERNAL_EDGES = """edges AS (
  SELECT DISTINCT src_id, tgt AS dst_id FROM links
  WHERE j <= 2 AND tgt IN (SELECT doc_id FROM documents)
),"""


def _sql_bfs_chain(
    p: str, seeds_mod: int, max_hops: int, src: str, dst: str
) -> str:
    """Unrolled frontier-BFS CTE chain (prefix ``p``) over the shared
    ``edges`` relation: ``{p}n{i}`` is the hop-i frontier (new nodes
    only), ``{p}v{i}`` the visited set after hop i. ``src``/``dst``
    pick the walk direction."""
    parts = [f"""{p}n0 AS (
  SELECT doc_id AS id, CAST(0 AS BIGINT) AS depth FROM documents
  WHERE doc_id % {seeds_mod} = 0
),
{p}v0 AS (SELECT id, depth FROM {p}n0),"""]
    for i in range(1, max_hops + 1):
        parts.append(f"""{p}n{i} AS (
  SELECT DISTINCT e.{dst} AS id, CAST({i} AS BIGINT) AS depth
  FROM edges e JOIN {p}n{i - 1} f ON f.id = e.{src}
  WHERE e.{dst} NOT IN (SELECT id FROM {p}v{i - 1})
),
{p}v{i} AS (SELECT id, depth FROM {p}v{i - 1}
         UNION ALL SELECT id, depth FROM {p}n{i}),""")
    return "\n".join(parts)


def _sql_crawl_depth(seeds_mod: int = 64, max_hops: int = 4) -> str:
    url = _SQL_PAGE_URL.format(x="v.id")
    return "\n".join([
        f"WITH links AS ({_SQL_LINK_SLOTS}),",
        _SQL_INTERNAL_EDGES,
        _sql_bfs_chain("", seeds_mod, max_hops, "src_id", "dst_id"),
        f"""final AS (
  SELECT {url} AS url, v.depth FROM v{max_hops} v
)
SELECT url, depth FROM final""",
    ])


def q_bowtie_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-relative bow-tie decomposition (Broder et al. 2000):
    forward + reverse frontier BFS from the seed set over the SAME
    resolved edge relation, classifying every page core/in/out/
    disconnected within the hop horizon."""
    from .operators.webpages import bowtie_classes, synthetic_linked_pages

    return bowtie_classes(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_bowtie_classes(seeds_mod: int = 64, max_hops: int = 4) -> str:
    url = _SQL_PAGE_URL.format(x="d.doc_id")
    return "\n".join([
        f"WITH links AS ({_SQL_LINK_SLOTS}),",
        _SQL_INTERNAL_EDGES,
        _sql_bfs_chain("f", seeds_mod, max_hops, "src_id", "dst_id"),
        _sql_bfs_chain("b", seeds_mod, max_hops, "dst_id", "src_id"),
        f"""final AS (
  SELECT {url} AS url, f.depth AS fwd_depth, b.depth AS bwd_depth,
         CASE WHEN f.depth IS NOT NULL AND b.depth IS NOT NULL
                THEN 'core'
              WHEN b.depth IS NOT NULL THEN 'in'
              WHEN f.depth IS NOT NULL THEN 'out'
              ELSE 'disconnected' END AS cls
  FROM documents d
  LEFT JOIN fv{max_hops} f ON f.id = d.doc_id
  LEFT JOIN bv{max_hops} b ON b.id = d.doc_id
)
SELECT url, fwd_depth, bwd_depth, cls FROM final""",
    ])


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact HITS hubs/authorities (2 iterations, micro-unit
    L1 normalization via integral division) over the synthetic
    internal link graph — the search-ranking complement of pagerank,
    bit-matched by an unrolled SQL oracle."""
    from .operators.webpages import hits_scores, synthetic_linked_pages

    return hits_scores(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_hits_scores(iterations: int = 2) -> str:
    # unrolled half-iterations; DuckDB sum(BIGINT) is HUGEINT so every
    # normalized score is CAST back to BIGINT to match Spark's long.
    parts = [
        f"WITH links AS ({_SQL_LINK_SLOTS}),",
        """edges AS (
  SELECT DISTINCT src_id, tgt AS dst_id FROM links
  WHERE j <= 2 AND tgt IN (SELECT doc_id FROM documents)
),
nodes AS (SELECT doc_id AS id FROM documents),
h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS s FROM nodes),""",
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""ra{i} AS (
  SELECT e.dst_id AS id, sum(h.s) AS raw
  FROM edges e JOIN h{i - 1} h ON h.id = e.src_id GROUP BY e.dst_id
),
fa{i} AS (
  SELECT n.id, coalesce(r.raw, 0) AS raw
  FROM nodes n LEFT JOIN ra{i} r ON r.id = n.id
),
ta{i} AS (SELECT sum(raw) AS tot FROM fa{i}),
a{i} AS (
  SELECT f.id,
         CAST(CASE WHEN t.tot > 0 THEN (f.raw * 1000000) // t.tot
              ELSE 0 END AS BIGINT) AS s
  FROM fa{i} f, ta{i} t
),
rh{i} AS (
  SELECT e.src_id AS id, sum(a.s) AS raw
  FROM edges e JOIN a{i} a ON a.id = e.dst_id GROUP BY e.src_id
),
fh{i} AS (
  SELECT n.id, coalesce(r.raw, 0) AS raw
  FROM nodes n LEFT JOIN rh{i} r ON r.id = n.id
),
th{i} AS (SELECT sum(raw) AS tot FROM fh{i}),
h{i} AS (
  SELECT f.id,
         CAST(CASE WHEN t.tot > 0 THEN (f.raw * 1000000) // t.tot
              ELSE 0 END AS BIGINT) AS s
  FROM fh{i} f, th{i} t
),""")
    url = _SQL_PAGE_URL.format(x="h.id")
    parts.append(f"""final AS (
  SELECT {url} AS url, h.s AS hub_e6, a.s AS auth_e6
  FROM h{iterations} h JOIN a{iterations} a ON a.id = h.id
)
SELECT url, hub_e6, auth_e6 FROM final""")
    return "\n".join(parts)


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact TrustRank (seed-personalized PageRank, the
    classic web-spam demotion score): teleport mass restarts only at
    the deterministic seed set, so trust decays with link distance
    from seeds. Same per-iteration shape as pagerank (one shuffle
    join + one hash agg), unrolled SQL oracle matches bit-for-bit."""
    from .operators.webpages import synthetic_linked_pages, trustrank

    return trustrank(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_trustrank(
    seeds_mod: int = 64, iterations: int = 3, damping_ppm: int = 850_000
) -> str:
    teleport = 1_000_000 - damping_ppm
    seed_mass = (f"CASE WHEN d.doc_id % {seeds_mod} = 0 "
                 f"THEN {teleport} ELSE 0 END")
    parts = [
        f"WITH links AS ({_SQL_LINK_SLOTS}),",
        """edges AS (
  SELECT DISTINCT src_id, tgt AS dst_id FROM links
  WHERE j <= 2 AND tgt IN (SELECT doc_id FROM documents)
),
deg AS (
  SELECT src_id, CAST(count(*) AS BIGINT) AS out_deg
  FROM edges GROUP BY src_id
),""",
        f"""t0 AS (
  SELECT d.doc_id AS id, CAST({seed_mass} AS BIGINT) AS trust_e6
  FROM documents d
),""",
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""c{i} AS (
  SELECT e.dst_id,
         sum((t.trust_e6 * {damping_ppm}) // (1000000 * g.out_deg))
           AS s
  FROM edges e
  JOIN deg g ON g.src_id = e.src_id
  JOIN t{i - 1} t ON t.id = e.src_id
  GROUP BY e.dst_id
),
t{i} AS (
  SELECT d.doc_id AS id,
         CAST({seed_mass} + coalesce(c.s, 0) AS BIGINT) AS trust_e6
  FROM documents d LEFT JOIN c{i} c ON c.dst_id = d.doc_id
),""")
    url = _SQL_PAGE_URL.format(x="t.id")
    parts.append(f"""final AS (
  SELECT {url} AS url, t.trust_e6,
         t.id % {seeds_mod} = 0 AS seed
  FROM t{iterations} t
)
SELECT url, trust_e6, seed FROM final""")
    return "\n".join(parts)


def q_pagination_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=next/prev pagination-chain assembly over the synthetic
    paginated corpus: heads (no rel=prev) walk the url→next map via
    unrolled left joins (redirect_resolve's plan-construction loop)
    into one row per ARTICLE with its ordered part list."""
    from .operators.webpages import (
        paginate_chains,
        synthetic_paginated_pages,
    )

    return paginate_chains(
        synthetic_paginated_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_pagination_chains() -> str:
    # fixture-mirror oracle: article a = id div 4, true length
    # L = 1 + nib5(md5(a)) % 4; heads are part-0 pages (chains of L
    # parts) and k ≥ L orphans (single-page articles). Assumes every
    # article's parts are present — true whenever the doc count is a
    # multiple of 4 (all driver SFs); the Spark side handles ragged
    # tails and is pinned by the sf0.001 hand-model test.
    url_i = _SQL_PAGE_URL.format(x="(x.a * 4 + i)")
    url_0 = _SQL_PAGE_URL.format(x="x.doc_id")
    return f"""
WITH p AS (
  SELECT doc_id, doc_id // 4 AS a, doc_id % 4 AS k FROM documents
),
x AS (
  SELECT doc_id, a, k,
         1 + (strpos('0123456789abcdef',
              substring(md5(CAST(a AS VARCHAR)), 5, 1)) - 1) % 4 AS L
  FROM p
),
chains AS (
  SELECT {url_0} AS root_url,
         CAST(x.L AS BIGINT) AS n_parts,
         list_transform(range(CAST(x.L AS BIGINT)),
                        i -> {url_i}) AS part_urls,
         true AS complete
  FROM x WHERE x.k = 0
),
orphans AS (
  SELECT {url_0} AS root_url,
         CAST(1 AS BIGINT) AS n_parts,
         [{url_0}] AS part_urls,
         true AS complete
  FROM x WHERE x.k >= x.L
)
SELECT * FROM chains UNION ALL SELECT * FROM orphans
"""


def q_adaptive_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive revisit scheduling: fold recrawl_delta's change flags
    into a per-URL change ratio (integer ppm) and a revisit bucket +
    concrete next fetch time from the shared REVISIT_POLICY table —
    one window shuffle + one exchange-reusing aggregate."""
    from .operators.webpages import (
        adaptive_revisit,
        canonical_url,
        recrawl_delta,
        synthetic_page_urls,
    )

    p = synthetic_page_urls(_t(spark, sf_dir, "documents"))
    f = p.select(
        canonical_url(F.col("url")).alias("canonical_url"),
        "fetch_ts_sec",
        F.md5(
            F.concat(
                canonical_url(F.col("url")), F.lit("#v"),
                ((F.col("doc_id") * 7919) % 3).cast("string"),
            )
        ).alias("fingerprint"),
    )
    return adaptive_revisit(recrawl_delta(f))


def _sql_adaptive_revisit() -> str:
    from .operators.webpages import REVISIT_POLICY

    bucket = "\n       ".join(
        f"WHEN change_ratio_ppm >= {ppm} THEN '{name}'"
        for ppm, name, _ in REVISIT_POLICY
    )
    secs = "\n       ".join(
        f"WHEN change_ratio_ppm >= {ppm} THEN {s}"
        for ppm, name, s in REVISIT_POLICY
    )
    return f"""
WITH d AS (
{_sql_recrawl_delta()}
),
a AS (
  SELECT canonical_url,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes,
         max(fetch_ts_sec) AS last_ts
  FROM d GROUP BY canonical_url
),
r AS (
  SELECT canonical_url, n_fetches, n_changes,
         CASE WHEN n_fetches > 1 THEN
           CAST((n_changes * 1000000) // (n_fetches - 1) AS BIGINT)
         END AS change_ratio_ppm,
         last_ts
  FROM a
)
SELECT canonical_url, n_fetches, n_changes, change_ratio_ppm,
  CASE WHEN change_ratio_ppm IS NULL THEN 'daily'
       {bucket}
       ELSE 'monthly' END AS revisit_bucket,
  CAST(last_ts + CASE WHEN change_ratio_ppm IS NULL THEN 86400
       {secs}
       ELSE 2592000 END AS BIGINT) AS next_fetch_ts_sec
FROM r
"""


def q_keyword_stuffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-page SEO keyword-stuffing screen over the synthetic SEO
    corpus: declared meta keywords vs tokenized body — keyword density
    in integer ppm, declared-but-absent fraction, and the ≥30%%
    verdict. Zero-shuffle native projection."""
    from .operators.webpages import keyword_stuffing, synthetic_seo_pages

    return keyword_stuffing(
        synthetic_seo_pages(_t(spark, sf_dir, "documents"))
    )


def _sql_keyword_stuffing(threshold_ppm: int = 300_000) -> str:
    # rebuild the SEO page html from doc_id, then DOUBLE-PARSE it with
    # DuckDB's own regex/list functions — same discipline as the
    # link_resolve oracle (the oracle never trusts the builder's
    # intermediates, only the byte-identical page).
    nib3 = ("(strpos('0123456789abcdef', substring(hx, 3, 1)) - 1)")
    nib4 = ("(strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)")
    url = _SQL_PAGE_URL.format(x="doc_id")
    return f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
),
k AS (
  SELECT doc_id,
         'kw' || CAST(doc_id % 17 AS VARCHAR) AS kw,
         'kw' || CAST((doc_id * 3 + 1) % 17 AS VARCHAR) AS kw2,
         'kw' || CAST((doc_id * 5 + 2) % 17 AS VARCHAR) AS kw3,
         CASE WHEN {nib3} % 4 = 0 THEN 8 + {nib4} % 8
              WHEN {nib3} % 4 = 1 THEN 1 ELSE 0 END AS reps
  FROM h
),
pg AS (
  SELECT doc_id,
         '<html><head><title>guide to ' || kw
         || '</title><meta name="keywords" content="' || kw || ', '
         || kw2 || ', ' || kw3 || '"></head><body><p>'
         || 'plain prose about topic ' || CAST(doc_id % 7 AS VARCHAR)
         || repeat(' ' || kw, reps) || '</p></body></html>' AS html
  FROM k
),
x AS (
  SELECT doc_id,
         string_split_regex(regexp_extract(html,
           '<meta name="keywords" content="([^"]*)">', 1),
           ',\\s*') AS kws,
         string_split_regex(trim(lower(regexp_extract(html,
           '<p>(.*?)</p>', 1))), '\\s+') AS toks
  FROM pg
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, t -> list_contains(kws, t)))
              AS BIGINT) AS kw_hits,
         CAST(len(kws) AS BIGINT) AS n_meta_kw,
         CAST(len(list_filter(kws, w -> list_contains(toks, w)))
              AS BIGINT) AS n_present
  FROM x
),
s AS (
  SELECT {url} AS url, n_tokens, kw_hits,
         CASE WHEN n_tokens > 0
              THEN CAST((kw_hits * 1000000) // n_tokens AS BIGINT)
         END AS kw_density_ppm,
         n_meta_kw,
         CASE WHEN n_meta_kw > 0
              THEN CAST((n_present * 1000000) // n_meta_kw AS BIGINT)
         END AS meta_present_frac_e6
  FROM m
)
SELECT url, n_tokens, kw_hits, kw_density_ppm, n_meta_kw,
       meta_present_frac_e6,
       coalesce(kw_density_ppm >= {threshold_ppm}, false) AS stuffed
FROM s
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation (degree-ordered compact-forward
    orientation — oriented out-degree bounded O(√m), total wedge work
    O(m^{3/2}) regardless of celebrity-page skew) over a denser mod-48
    hub variant of the synthetic link graph."""
    from .operators.webpages import synthetic_linked_pages, triangle_counts

    return triangle_counts(
        synthetic_linked_pages(
            _t_raw(spark, sf_dir, "documents"), targets_mod=48
        )
    )


def _sql_triangle_count(mod: int = 48) -> str:
    url = _SQL_PAGE_URL.format(x="deg.id")
    return "\n".join([
        f"WITH links AS ({_sql_link_slots(mod)}),",
        _SQL_INTERNAL_EDGES,
        f"""und AS (
  SELECT DISTINCT least(src_id, dst_id) AS a,
         greatest(src_id, dst_id) AS b
  FROM edges WHERE src_id <> dst_id),
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id),
o AS (
  SELECT CASE WHEN da.deg <= db.deg THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg <= db.deg THEN u.b ELSE u.a END AS v,
         CASE WHEN da.deg <= db.deg THEN db.deg ELSE da.deg END AS dv
  FROM und u
  JOIN deg da ON da.id = u.a
  JOIN deg db ON db.id = u.b),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM o e1
  JOIN o e2 ON e1.u = e2.u
   AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
per_node AS (
  SELECT id, COUNT(*) AS triangles FROM (
    SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
    UNION ALL SELECT z AS id FROM tri)
  GROUP BY id)
SELECT {url} AS url, CAST(deg.deg AS BIGINT) AS degree,
       CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles
FROM deg LEFT JOIN per_node p ON p.id = deg.id""",
    ])


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spam mass (Gyöngyi et al., VLDB '06): the fraction of a page's
    PageRank NOT backed by trusted sources — relative spam mass
    ``1 − (trust_share / rank_share)`` — the canonical link-spam
    demotion signal on top of the two rank kernels this registry
    already grades.

    Integer-exact composition: both scores are BIGINT micro-units;
    shares normalize through two integral divisions applied in the
    SAME order on both engines (``ratio = trust·10⁶ div rank``, then
    ``× (Σrank·10⁶ div Σtrust) div 10⁶``), clipped to [0, 10⁶].
    Magnitude bound: Σrank·10⁶ stays inside BIGINT below ~9·10¹²
    pages; beyond that the global factor drops to e3 units (one
    constant — the HITS note).  A page is a SUSPECT when its spam
    mass is ≥ 0.5 AND its rank is above the teleport floor (an
    unranked page's spam mass is noise, Gyöngyi's own caveat).

    Scale shape: the two iterative kernels as graded, ONE url
    equi-join between their outputs, a 1-row global-sum broadcast
    cross join, then a narrow projection.
    """
    from .operators.webpages import (
        pagerank,
        synthetic_linked_pages,
        trustrank,
    )

    pages = synthetic_linked_pages(_t_raw(spark, sf_dir, "documents"))
    # resolve the link graph ONCE for both kernels (each otherwise
    # re-runs extract_links + the two url joins — §2.4); eager
    # materialization, not lazy persist, for the same stampede/lineage
    # reasons as the kernels' own state
    from .operators.webpages import _resolve_edges

    ids, edges = _resolve_edges(pages)
    graph = (ids, edges.localCheckpoint(eager=True))
    pr0 = pagerank(pages, graph=graph)
    tr0 = trustrank(pages, graph=graph)
    pr = pr0.select("url", "rank_e6")
    tr = tr0.select("url", "trust_e6")
    # persisted: j feeds BOTH the 1-row totals and the scored
    # projection — without it each branch re-runs the two kernels'
    # output joins (incl. the synthetic-url md5 projection) (§2.4)
    j = pr.join(tr, "url").persist()
    totals = j.agg(
        F.sum("rank_e6").alias("_sr"), F.sum("trust_e6").alias("_st")
    )
    scored = j.crossJoin(F.broadcast(totals)).select(
        "url",
        "rank_e6",
        "trust_e6",
        F.expr(
            "greatest(0L, least(1000000L, 1000000L - "
            "(((trust_e6 * 1000000L) div rank_e6)"
            " * ((_sr * 1000000L) div _st)) div 1000000L))"
        ).alias("spam_mass_ppm"),
    )
    out = scored.withColumn(
        "suspect",
        (F.col("spam_mass_ppm") >= 500_000)
        & (F.col("rank_e6") > 1_000_000),
    )
    # carry the kernels' persisted edge-relation handles to THIS
    # output (handles attach to DataFrame objects; pr0/tr0 are
    # discarded here) so bench/mirror release them per invocation
    from .operators.dedup import attach_plan_cache

    for src in (pr0, tr0):
        for h in getattr(src, "_plan_cache_handles", []):
            attach_plan_cache(out, h)
    attach_plan_cache(out, j)
    return out


def _sql_spam_mass() -> str:
    return f"""
WITH pr AS ({_sql_pagerank()}),
tr AS ({_sql_trustrank()}),
j AS (
  SELECT pr.url, pr.rank_e6, tr.trust_e6
  FROM pr JOIN tr ON tr.url = pr.url),
tot AS (
  SELECT CAST(SUM(rank_e6) AS BIGINT) AS sr,
         CAST(SUM(trust_e6) AS BIGINT) AS st
  FROM j),
s AS (
  SELECT url, rank_e6, trust_e6,
         greatest(0, least(1000000, 1000000 -
           (((trust_e6 * 1000000) // rank_e6)
            * ((sr * 1000000) // st)) // 1000000)) AS sm
  FROM j CROSS JOIN tot)
SELECT url, rank_e6, trust_e6, CAST(sm AS BIGINT) AS spam_mass_ppm,
       sm >= 500000 AND rank_e6 > 1000000 AS suspect
FROM s
"""


def q_clustering_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-bucketed local clustering coefficients — the web-graph
    summary statistic on top of the triangle kernel: per node
    ``cc_e6 = (2T·10⁶) div (d·(d−1))`` (integer-exact), then per
    degree the node count and the integral mean — one extra aggregate
    over :func:`triangle_counts`' output, nothing new shuffles."""
    from .operators.webpages import synthetic_linked_pages, triangle_counts

    tri = triangle_counts(
        synthetic_linked_pages(
            _t_raw(spark, sf_dir, "documents"), targets_mod=48
        )
    )
    per_node = tri.filter(F.col("degree") >= 2).select(
        "degree",
        F.expr(
            "(2 * triangles * 1000000L) div (degree * (degree - 1))"
        ).alias("cc_e6"),
    )
    out = per_node.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("sum(cc_e6) div count(1)").alias("mean_cc_e6"),
    )
    # Re-attach the triangle kernel's persist handles to the RETURNED
    # frame — handles live on the DataFrame object, not the plan, so
    # the filter/select/groupBy above would otherwise orphan them and
    # leak 3 persisted frames per invocation (the spam_mass lesson).
    from .operators.dedup import attach_plan_cache

    for h in getattr(tri, "_plan_cache_handles", None) or []:
        attach_plan_cache(out, h)
    return out


def _sql_clustering_coeffs(mod: int = 48) -> str:
    return f"""
WITH tri_out AS ({_sql_triangle_count(mod)}),
per_node AS (
  SELECT degree,
         (2 * triangles * 1000000) // (degree * (degree - 1)) AS cc_e6
  FROM tri_out WHERE degree >= 2)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(cc_e6) // COUNT(*) AS BIGINT) AS mean_cc_e6
FROM per_node GROUP BY degree
"""


def q_landmark_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-based harmonic closeness: ONE multi-source reverse BFS
    from a constant-size landmark set (hop distance page → landmark),
    folded to an integer-exact Σ 10⁶ div d score — the scalable
    centrality estimator for graphs where exact closeness is Θ(n·m)."""
    from .operators.webpages import (
        landmark_closeness,
        synthetic_linked_pages,
    )

    return landmark_closeness(
        synthetic_linked_pages(
            _t_raw(spark, sf_dir, "documents"), targets_mod=48
        )
    )


def _sql_bfs_chain_lm(
    p: str, landmarks: tuple, max_hops: int, src: str, dst: str
) -> str:
    """Unrolled MULTI-SOURCE frontier-BFS CTE chain: like
    :func:`_sql_bfs_chain` but keyed (lm, id) so each landmark's sweep
    stays independent — the oracle mirror of ``_bfs_depths_multi``."""
    lms = ", ".join(str(int(x)) for x in landmarks)
    parts = [f"""{p}n0 AS (
  SELECT doc_id AS lm, doc_id AS id, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id IN ({lms})
),
{p}v0 AS (SELECT lm, id, depth FROM {p}n0),"""]
    for i in range(1, max_hops + 1):
        parts.append(f"""{p}n{i} AS (
  SELECT DISTINCT f.lm, e.{dst} AS id, CAST({i} AS BIGINT) AS depth
  FROM edges e JOIN {p}n{i - 1} f ON f.id = e.{src}
  WHERE NOT EXISTS (SELECT 1 FROM {p}v{i - 1} v
                    WHERE v.lm = f.lm AND v.id = e.{dst})
),
{p}v{i} AS (SELECT lm, id, depth FROM {p}v{i - 1}
         UNION ALL SELECT lm, id, depth FROM {p}n{i}),""")
    return "\n".join(parts)


def _sql_landmark_closeness(mod: int = 48, max_hops: int = 4) -> str:
    from .operators.webpages import CLOSENESS_LANDMARKS

    url = _SQL_PAGE_URL.format(x="g.id")
    return "\n".join([
        f"WITH links AS ({_sql_link_slots(mod)}),",
        _SQL_INTERNAL_EDGES,
        _sql_bfs_chain_lm(
            "", CLOSENESS_LANDMARKS, max_hops, "dst_id", "src_id"
        ),
        f"""g AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_landmarks,
         CAST(SUM(1000000 // depth) AS BIGINT) AS closeness_e6
  FROM v{max_hops} WHERE depth > 0 GROUP BY id
)
SELECT {url} AS url, n_landmarks, closeness_e6 FROM g""",
    ])


#: The BM25 benchmark query workload — (query_id, term) rows over the
#: synthetic corpus vocabulary.  Tiny by construction (it is the graded
#: workload, not user traffic), which is what licenses the broadcast in
#: ``bm25_topk``.
BM25_QUERY_TERMS = (
    (1, "spark"), (1, "window"), (1, "agg"),
    (2, "customer"), (2, "query"),
    (3, "fast"), (3, "scan"), (3, "filter"),
    (4, "stream"), (4, "batch"), (4, "merge"),
)


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query over the documents corpus — the scoring
    half of the search tier next to ``inverted_index``.  Per-term
    contributions are e6-floored BEFORE the per-(query, doc) sum so
    the score is an order-independent BIGINT sum; exact df/dl over the
    full corpus, query relation broadcast (a LocalRelation literal,
    real stats)."""
    from .operators.indexing import bm25_topk

    vals = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERY_TERMS)
    qrel = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(query_id, term)"
    )
    return bm25_topk(_t(spark, sf_dir, "documents"), qrel)


def _sql_bm25_rank(
    k1: float = 1.2, b: float = 0.75, top_k: int = 10
) -> str:
    # float constants rendered in e-notation: a bare decimal literal is
    # DECIMAL in DuckDB (exact arithmetic) where Spark folds DOUBLEs —
    # e-notation forces DOUBLE so both engines run the same IEEE ops
    vals = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERY_TERMS)
    return ("WITH " + _SQL_CLEAN_TOKS + f""",
terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       FROM terms GROUP BY term, doc_id),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
       FROM tf GROUP BY doc_id),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES {vals}) AS t(query_id, term)),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(floor(1e6
           * ln(1.0e0 + (CAST(nd.n AS DOUBLE) - dfr.df + 0.5e0)
                        / (dfr.df + 0.5e0))
           * (tf.tf * ({k1}e0 + 1.0e0))
           / (tf.tf + {k1}e0 * ((1.0e0 - {b}e0) + {b}e0 * dl.dl
              / (CAST(nd.tok AS DOUBLE) / nd.n)))) AS BIGINT) AS c
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfr ON dfr.term = tf.term
  CROSS JOIN nd),
agg AS (
  SELECT query_id, doc_id,
         CAST(COUNT(*) AS BIGINT) AS matched_terms,
         CAST(SUM(c) AS BIGINT) AS score_e6
  FROM scored GROUP BY query_id, doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rank AS BIGINT) AS rank, doc_id, matched_terms, score_e6
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY score_e6 DESC, doc_id) AS rank
      FROM agg)
WHERE rank <= {top_k}
""")


def q_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list d-gap / compression-size statistics: per-term gap
    distribution + delta-coded bit cost over the inverted-index tf
    grain; bits via length(bin(gap)) (integer-exact on both engines,
    unlike floor(log2)); top-50 by df via TakeOrderedAndProject."""
    from .operators.indexing import postings_gap_stats

    return postings_gap_stats(_t(spark, sf_dir, "documents"))


def _sql_postings_stats(min_df: int = 2, top_terms: int = 50) -> str:
    return ("WITH " + _SQL_CLEAN_TOKS + f""",
terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT term, doc_id FROM terms GROUP BY term, doc_id),
g AS (
  SELECT term,
         coalesce(doc_id - lag(doc_id) OVER (
           PARTITION BY term ORDER BY doc_id), doc_id + 1) AS gap
  FROM tf),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(MAX(gap) AS BIGINT) AS max_gap,
         CAST((SUM(gap) * 1000000) // COUNT(*) AS BIGINT) AS avg_gap_e6,
         CAST(SUM(length(bin(gap))) AS BIGINT) AS delta_bits
  FROM g GROUP BY term)
SELECT term, df, max_gap, avg_gap_e6, delta_bits
FROM stats WHERE df >= {min_df}
ORDER BY df DESC, term LIMIT {top_terms}
""")


def q_search_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank: BM25 candidate generation (20 per query)
    fused with a query-independent quality prior by integer-exact
    reciprocal-rank fusion — the prior ranks WITHIN each candidate
    set (never a global corpus sort), final top-10 per query."""
    from .operators.indexing import search_rank_fusion

    vals = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERY_TERMS)
    qrel = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(query_id, term)"
    )
    return search_rank_fusion(_t(spark, sf_dir, "documents"), qrel)


def _sql_search_rank_fusion(
    candidates: int = 20, top_k: int = 10, rrf_k: int = 60
) -> str:
    qual = SQL_QUALITY_SCORES.replace("{SW}", _sql_stopwords())
    return f"""
WITH bm AS ({_sql_bm25_rank(top_k=candidates)}),
qual AS ({qual}),
j AS (
  SELECT bm.query_id, bm.doc_id, bm.rank AS text_rank,
         q.quality, q.distinct_ratio_e6
  FROM bm JOIN qual q ON q.doc_id = bm.doc_id),
p AS (
  SELECT query_id, doc_id, text_rank,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY quality DESC, distinct_ratio_e6 DESC, doc_id
         ) AS BIGINT) AS prior_rank
  FROM j),
r AS (
  SELECT query_id, doc_id, text_rank, prior_rank,
         CAST(1000000 // ({rrf_k} + text_rank)
            + 1000000 // ({rrf_k} + prior_rank) AS BIGINT) AS rrf_e6
  FROM p)
SELECT query_id, final_rank, doc_id, text_rank, prior_rank, rrf_e6
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf_e6 DESC, doc_id
      ) AS BIGINT) AS final_rank
      FROM r)
WHERE final_rank <= {top_k}
"""


def q_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule mining (Bar-Yossef 2007): learn per (host, query
    parameter) whether stripping the parameter preserves page content
    — md5 fingerprints, variant↔base equi-join on the base url, one
    (host, param) aggregate; planted params cover droppable
    (utm/sess/sort), content-bearing (page) and mixed (ref) cases."""
    from .operators.webpages import dust_rules, synthetic_param_pages

    return dust_rules(
        synthetic_param_pages(_t_raw(spark, sf_dir, "documents"))
    )


def _sql_param_pages() -> str:
    """Oracle mirror of ``synthetic_param_pages`` as a CTE-chain
    fragment (``h`` + ``pages``), shared by the dust-rule and
    crawl-trap oracles."""
    url = _SQL_PAGE_URL.format(x="doc_id")
    return f"""h AS (
  SELECT doc_id, coalesce(text, '') AS text,
         (strpos('0123456789abcdef',
            substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS nib4
  FROM documents),
pages AS (
  SELECT {url} AS url, text FROM h
  UNION ALL
  SELECT {url} || '?utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR),
         text FROM h
  UNION ALL
  SELECT {url} || '?sess=s' || CAST(doc_id AS VARCHAR), text
  FROM h WHERE nib4 % 2 = 0
  UNION ALL
  SELECT {url} || '?page=2', text || ' :: page two tail'
  FROM h WHERE nib4 % 4 = 1
  UNION ALL
  SELECT {url} || '?sort=asc', text FROM h WHERE nib4 % 8 = 3
  UNION ALL
  SELECT {url} || '?ref=partner',
         CASE WHEN nib4 % 2 = 0 THEN text
              ELSE text || ' :: referral banner' END
  FROM h)"""


def _sql_dust_rules() -> str:
    return rf"""
WITH {_sql_param_pages()},
parsed AS (
  SELECT regexp_replace(url, '\?.*$', '') AS base,
         regexp_extract(url, '\?(.*)$', 1) AS qs,
         md5(text) AS fp
  FROM pages
  WHERE strpos(regexp_extract(url, '\?(.*)$', 1), '&') = 0),
bases AS (SELECT base, fp AS fp_base FROM parsed WHERE qs = ''),
variants AS (
  SELECT base, regexp_extract(qs, '^([^=&]+)', 1) AS param, fp
  FROM parsed WHERE qs <> ''),
pairs AS (
  SELECT regexp_extract(v.base, '^https://([^/]+)', 1) AS host,
         v.param,
         CASE WHEN v.fp = b.fp_base THEN 1 ELSE 0 END AS same
  FROM variants v JOIN bases b ON b.base = v.base),
agg AS (
  SELECT host, param,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(same) AS BIGINT) AS n_same
  FROM pairs GROUP BY host, param)
SELECT host, param, n_pairs,
       CAST((n_same * 1000000) // n_pairs AS BIGINT) AS preserved_ppm,
       (n_same * 1000000) // n_pairs = 1000000 AS droppable
FROM agg
"""


def q_crawl_trap_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap screen: per host, distinct urls vs distinct content
    fingerprints — the param-variant hosts (URL space explodes, content
    doesn't) must flag trap while a clean per-doc-content corpus on
    separate hosts must not."""
    from .operators.webpages import (
        crawl_trap_hosts,
        synthetic_param_pages,
    )

    docs = _t_raw(spark, sf_dir, "documents")
    clean = docs.select(
        F.concat(
            F.lit("https://clean"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    return crawl_trap_hosts(
        synthetic_param_pages(docs).unionByName(clean)
    )


def _sql_crawl_trap_hosts(
    min_urls: int = 20, trap_ppm_threshold: int = 300_000
) -> str:
    return rf"""
WITH {_sql_param_pages()},
all_pages AS (
  SELECT url, text FROM pages
  UNION ALL
  SELECT 'https://clean' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.com/d/' || CAST(doc_id AS VARCHAR),
         coalesce(text, '')
  FROM documents),
parsed AS (
  SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
         url, md5(text) AS fp
  FROM all_pages),
agg AS (
  SELECT host,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_content
  FROM parsed GROUP BY host)
SELECT host, n_urls, n_content,
       CAST(((n_urls - n_content) * 1000000) // n_urls AS BIGINT)
         AS dup_ratio_ppm,
       ((n_urls - n_content) * 1000000) // n_urls
         >= {trap_ppm_threshold} AND n_urls >= {min_urls} AS trap
FROM agg
"""


def q_index_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hashed term→shard assignment balance (8 shards):
    argmax over constant-size md5 weights as a native higher-order
    expression, one aggregate to K rows — the serving-side partition
    check after the index build."""
    from .operators.indexing import index_shard_balance

    return index_shard_balance(_t(spark, sf_dir, "documents"))


def _sql_index_shard_balance(n_shards: int = 8) -> str:
    return ("WITH " + _SQL_CLEAN_TOKS + f""",
terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT term, doc_id FROM terms GROUP BY term, doc_id),
dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY term),
sh AS (
  SELECT list_position(l, list_aggregate(l, 'max')) - 1 AS shard, df
  FROM (SELECT df,
          list_transform(range({n_shards}),
            s -> md5(term || ':' || CAST(s AS VARCHAR))) AS l
        FROM dfr))
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(df) AS BIGINT) AS n_postings
FROM sh GROUP BY shard
""")


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the Iceberg
    ``rewrite_data_files`` bin-packing step — the table-maintenance
    job every 10¹²-row table needs or its manifests drown in kilobyte
    files): greedy size-ordered-by-id packing of data files into
    target-size rewrite groups, WITHIN each partition.

    Deterministic integer formulation both engines compute
    identically: per partition, files in file_id order; a file's group
    is ``exclusive_prefix_sum(bytes) div target`` — a file larger than
    the target spills its group boundary naturally and oversized
    files end up alone, greedy-first-fit semantics without any
    iterative loop.

    Scale shape: this runs over FILE METADATA (one row per data file —
    a manifest-sized relation, millions of rows at 100 TB, not
    billions), one window partitioned by the table partition key (the
    unit a rewrite job actually locks), one aggregate to the plan
    grain. The file relation is synthesized from the documents table
    (file ≈ doc, partition ≈ source, bytes ≈ text octets + format
    overhead).

    Output: (part, group_id, n_files, group_bytes, first_file,
    last_file) — one row per rewrite task.
    """
    target = 64 * 1024  # rewrite-group target bytes at sf scale
    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.col("source").alias("part"),
        F.col("doc_id").alias("file_id"),
        (
            F.octet_length(F.coalesce(F.col("text"), F.lit("")))
            + F.lit(512)
        ).cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = files.withColumn(
        "_cum", F.sum("bytes").over(w)  # exclusive prefix (ends at -1)
    ).select(
        "part",
        "file_id",
        "bytes",
        F.expr(f"coalesce(_cum, 0L) div {target}L").alias("group_id"),
    )
    return grouped.groupBy("part", "group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("group_bytes"),
        F.min("file_id").cast("long").alias("first_file"),
        F.max("file_id").cast("long").alias("last_file"),
    )


def _sql_compaction_plan(target: int = 64 * 1024) -> str:
    return f"""
WITH files AS (
  SELECT source AS part, doc_id AS file_id,
         CAST(octet_length(encode(coalesce(text, ''))) + 512
              AS BIGINT) AS bytes
  FROM documents),
grouped AS (
  SELECT part, file_id, bytes,
         CAST(coalesce(SUM(bytes) OVER (
            PARTITION BY part ORDER BY file_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {target} AS BIGINT) AS group_id
  FROM files)
SELECT part, group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS group_bytes,
       CAST(MIN(file_id) AS BIGINT) AS first_file,
       CAST(MAX(file_id) AS BIGINT) AS last_file
FROM grouped GROUP BY part, group_id
"""


def q_revisit_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit-record export (CC's archive-side dedup): fetches
    whose payload digest matches the previous crawl's digest store
    emit ``WARC-Type: revisit`` records with EMPTY payload +
    Refers-To provenance; new urls and changed content emit full
    responses. One url equi-join + native render; parsed BACK through
    parse_warc with the revisit headers recovered in the same pass."""
    from .operators.webpages import _page_url
    from .sources.warc import (
        parse_warc,
        revisit_records,
        synthetic_digest_store,
    )

    docs = _t(spark, sf_dir, "documents")
    fetches = docs.select(
        "doc_id", _page_url(F.col("doc_id")).alias("url"), "text"
    )
    rec = revisit_records(fetches, synthetic_digest_store(docs))
    return parse_warc(
        rec,
        extra_headers=(
            "WARC-Refers-To", "WARC-Refers-To-Date", "WARC-Profile"
        ),
    )


def _sql_revisit_export() -> str:
    url = _SQL_PAGE_URL.format(x="doc_id")
    crlf = "chr(13) || chr(10)"
    return f"""
WITH h AS (
  SELECT doc_id, coalesce(text, '') AS cur,
         {url} AS url,
         (strpos('0123456789abcdef',
            substring(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) AS nib5,
         (strpos('0123456789abcdef',
            substring(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) AS nib6
  FROM documents),
store AS (
  SELECT url,
         CASE WHEN nib6 % 2 = 0 THEN md5(cur)
              ELSE md5(cur || ' [stale revision]') END AS seen_md5,
         '<urn:md5:' || md5(CAST(doc_id AS VARCHAR) || ':prev')
           || '>' AS orig_id,
         1735603200 + (doc_id * 7919) % 8640000 AS orig_ts
  FROM h WHERE nib5 % 2 = 0),
j AS (
  SELECT f.doc_id, f.url, f.cur,
         s.seen_md5, s.orig_id, s.orig_ts,
         s.seen_md5 IS NOT NULL AND s.seen_md5 = md5(f.cur)
           AS is_revisit
  FROM h f LEFT JOIN store s ON s.url = f.url),
rec AS (
  SELECT 'WARC/1.0' || {crlf}
    || 'WARC-Type: '
    || CASE WHEN is_revisit THEN 'revisit' ELSE 'response' END
    || {crlf}
    || 'WARC-Target-URI: ' || url || {crlf}
    || 'WARC-Date: '
    || strftime(make_timestamp(
         (1735689600 + (doc_id * 7919) % 8640000) * 1000000),
         '%Y-%m-%dT%H:%M:%SZ') || {crlf}
    || 'WARC-Record-ID: <urn:md5:'
    || md5(CAST(doc_id AS VARCHAR)) || '>' || {crlf}
    || CASE WHEN is_revisit THEN
         'WARC-Profile: http://netpreserve.org/warc/1.0/revisit/'
         || 'identical-payload-digest' || {crlf}
         || 'WARC-Refers-To: ' || orig_id || {crlf}
         || 'WARC-Refers-To-Date: '
         || strftime(make_timestamp(orig_ts * 1000000),
                     '%Y-%m-%dT%H:%M:%SZ') || {crlf}
         || 'WARC-Payload-Digest: md5:' || seen_md5 || {crlf}
       ELSE '' END
    || 'Content-Type: application/http; msgtype=response' || {crlf}
    || 'Content-Length: '
    || CAST(octet_length(encode(
         CASE WHEN is_revisit THEN '' ELSE cur END)) AS VARCHAR)
    || {crlf} || {crlf}
    || CASE WHEN is_revisit THEN '' ELSE cur END AS s
  FROM j),
sp AS (
  SELECT substring(s, 1, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   - 1) AS head,
         substring(s, strpos(s, chr(13)||chr(10)||chr(13)||chr(10))
                   + 4) AS payload
  FROM rec)
SELECT regexp_extract(head, 'WARC-Target-URI: ([^\r]+)', 1) AS url,
       regexp_extract(head, 'WARC-Type: ([^\r]+)', 1) AS warc_type,
       CAST(epoch(strptime(
         regexp_extract(head, 'WARC-Date: ([^\r]+)', 1),
         '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS warc_date_ts,
       CAST(regexp_extract(head, 'Content-Length: ([^\r]+)', 1)
            AS BIGINT) AS content_length,
       CAST(octet_length(encode(payload)) AS BIGINT) AS payload_octets,
       md5(payload) AS payload_md5,
       regexp_extract(head, 'WARC-Refers-To: ([^\r]+)', 1)
         AS warc_refers_to,
       regexp_extract(head, 'WARC-Refers-To-Date: ([^\r]+)', 1)
         AS warc_refers_to_date,
       regexp_extract(head, 'WARC-Profile: ([^\r]+)', 1)
         AS warc_profile,
       octet_length(encode(payload)) = CAST(
         regexp_extract(head, 'Content-Length: ([^\r]+)', 1) AS BIGINT)
         AS length_ok
FROM sp
"""


def q_sitemap_robots_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-policy sanity report a crawler runs before trusting a
    host's own metadata: sitemap-ADVERTISED urls that the host's
    robots policy DISALLOWS (RFC 9309 wildcard matching) — each
    conflict with how many sitemap documents advertise it and the
    winning disallow pattern.  Composes the graded sitemap parser and
    robots matcher: one distinct-url aggregate on the advertised
    relation, then the broadcast rule-array evaluation — no new
    kernel, one integration seam."""
    from .operators.webpages import (
        rfc9309_rules_df,
        robots_rfc9309,
        sitemap_entries,
        synthetic_sitemaps,
    )

    ents = sitemap_entries(
        synthetic_sitemaps(_t(spark, sf_dir, "documents"))
    )
    advertised = ents.groupBy(F.col("loc").alias("url")).agg(
        F.count_distinct("sitemap_url").cast("long")
        .alias("n_sitemaps")
    )
    verdicts = robots_rfc9309(
        advertised.select("url"), rfc9309_rules_df(spark)
    )
    return (
        verdicts.filter(~F.col("allowed"))
        .join(advertised, "url")
        .select("url", "host", "n_sitemaps", "best_pattern")
    )


def _sql_sitemap_robots_conflict() -> str:
    from .operators.webpages import RFC9309_RULES, _robots_pattern_rx

    rows = ", ".join(
        f"('{h}', '{_robots_pattern_rx(p)}', '{p}',"
        f" {2 * len(p) + int(a)})"
        for h, p, a in RFC9309_RULES
    )
    loc = _SQL_PAGE_URL.format(x="(d.doc_id * 17 + j.j * 59) % 512")
    return f"""
WITH ents AS (
  SELECT d.doc_id AS sitemap_doc, {loc} AS url
  FROM documents d,
       (SELECT unnest([1, 2, 3]) AS j) j
  WHERE j.j <= 1 + (strpos('0123456789abcdef',
        substring(md5(CAST(d.doc_id AS VARCHAR)), 10, 1)) - 1) % 3),
advertised AS (
  SELECT url, CAST(COUNT(DISTINCT sitemap_doc) AS BIGINT)
           AS n_sitemaps
  FROM ents GROUP BY url),
rules AS (SELECT * FROM (VALUES {rows}) t(host, rx, pattern, score)),
per_host AS (
  SELECT host, list(struct_pack(rx := rx, pattern := pattern,
                                score := score)) AS rl
  FROM rules GROUP BY host),
base AS (
  SELECT url, n_sitemaps,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS path
  FROM advertised),
j AS (
  SELECT b.url, b.host, b.n_sitemaps,
         list_filter(p.rl, r -> regexp_matches(b.path, r.rx)) AS hits
  FROM base b LEFT JOIN per_host p ON p.host = b.host),
k AS (
  SELECT url, host, n_sitemaps, hits,
         list_aggregate(list_transform(hits, r -> r.score), 'max')
           AS best
  FROM j)
SELECT url, host, n_sitemaps,
       list_filter(hits, r -> r.score = best)[1].pattern
         AS best_pattern
FROM k
WHERE NOT (len(hits) = 0 OR best % 2 = 1)
"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption sample prep: deterministic block-hash
    masking (18.75% of tokens in mean-3 spans), gaps-and-islands span
    assembly, ordinal sentinels interleaved into the input and paired
    with span content in the target — all native expressions."""
    from .operators.cleaning import span_corruption

    return span_corruption(_t(spark, sf_dir, "documents"))


def _sql_span_corruption(
    block_tokens: int = 3, mask_nibbles: int = 3
) -> str:
    return ("WITH " + _SQL_CLEAN_TOKS + f""",
raw2 AS (
  SELECT doc_id, unnest(tk) AS tok,
         CAST(unnest(range(1, len(tk) + 1)) AS BIGINT) AS i
  FROM toks),
toks2 AS (
  SELECT doc_id, i, tok,
         (strpos('0123456789abcdef',
            substring(md5(doc_id || ':' ||
              CAST((i - 1) // {block_tokens} AS VARCHAR)), 1, 1)) - 1)
           < {mask_nibbles} AS masked
  FROM raw2),
m AS (
  SELECT doc_id, i, tok,
         i - row_number() OVER (
           PARTITION BY doc_id ORDER BY i) AS island
  FROM toks2 WHERE masked),
spans AS (
  SELECT doc_id, island, MIN(i) AS first_i,
         CAST(COUNT(*) AS BIGINT) AS n,
         string_agg(tok, ' ' ORDER BY i) AS content
  FROM m GROUP BY doc_id, island),
spans2 AS (
  SELECT doc_id, first_i, n, content,
         '<extra_id_' || CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY first_i) - 1 AS VARCHAR)
           || '>' AS sentinel
  FROM spans),
input_rows AS (
  SELECT doc_id, i, tok FROM toks2 WHERE NOT masked
  UNION ALL
  SELECT doc_id, first_i AS i, sentinel AS tok FROM spans2),
inputs AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS inputs
  FROM input_rows GROUP BY doc_id),
targets AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(n) AS BIGINT) AS masked_tokens,
         string_agg(sentinel || ' ' || content, ' '
                    ORDER BY first_i) AS targets
  FROM spans2 GROUP BY doc_id)
SELECT i.doc_id, coalesce(t.n_spans, 0) AS n_spans,
       coalesce(t.masked_tokens, 0) AS masked_tokens,
       i.inputs, coalesce(t.targets, '') AS targets
FROM inputs i LEFT JOIN targets t ON t.doc_id = i.doc_id
""")


def q_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry planning (Iceberg ``expire_snapshots`` — the
    other half of table maintenance next to ``compaction_plan``):
    with the last 2 of 5 snapshots retained, a data file is DELETABLE
    iff every snapshot referencing it has expired — files still
    reachable from a live snapshot survive, however old.

    The input is the MANIFEST relation (snapshot_id, file_id) — the
    grain Iceberg metadata actually stores — synthesized as an
    interval per file (born at a nibble-chosen snapshot, surviving a
    nibble-chosen span) and exploded; the plan is one hash aggregate
    to file grain (min/max/count of referencing snapshots) and a
    narrow verdict projection.  At 100 TB the manifest relation is
    metadata-sized (one row per file per snapshot), and the aggregate
    is map-side combinable on file_id.

    Output: (file_id, first_snap, last_snap, n_snaps, deletable).
    """
    n_snapshots, retain_last = 5, 2
    docs = _t(spark, sf_dir, "documents")
    birth = 1 + F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 9, 1),"
        " 16, 10) as int) % 5"
    )
    span = 1 + F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 11, 1),"
        " 16, 10) as int) % 3"
    )
    manifest = docs.select(
        F.col("doc_id").alias("file_id"),
        F.explode(
            F.sequence(
                birth,
                F.least(birth + span - 1, F.lit(n_snapshots)),
            )
        ).alias("snapshot_id"),
    )
    live_floor = n_snapshots - retain_last + 1
    agg = manifest.groupBy("file_id").agg(
        F.min("snapshot_id").cast("long").alias("first_snap"),
        F.max("snapshot_id").cast("long").alias("last_snap"),
        F.count(F.lit(1)).cast("long").alias("n_snaps"),
    )
    return agg.select(
        "file_id", "first_snap", "last_snap", "n_snaps",
        (F.col("last_snap") < live_floor).alias("deletable"),
    )


def _sql_snapshot_expire(
    n_snapshots: int = 5, retain_last: int = 2
) -> str:
    live_floor = n_snapshots - retain_last + 1
    return f"""
WITH f AS (
  SELECT doc_id AS file_id,
         1 + (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 9, 1)) - 1) % 5
           AS birth,
         1 + (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 11, 1)) - 1) % 3
           AS span
  FROM documents),
manifest AS (
  SELECT file_id, unnest(range(birth,
           least(birth + span - 1, {n_snapshots}) + 1)) AS snapshot_id
  FROM f),
agg AS (
  SELECT file_id,
         CAST(MIN(snapshot_id) AS BIGINT) AS first_snap,
         CAST(MAX(snapshot_id) AS BIGINT) AS last_snap,
         CAST(COUNT(*) AS BIGINT) AS n_snaps
  FROM manifest GROUP BY file_id)
SELECT file_id, first_snap, last_snap, n_snaps,
       last_snap < {live_floor} AS deletable
FROM agg
"""


def q_robots_rfc9309(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full RFC 9309 robots matching — wildcard/anchored patterns,
    longest-pattern precedence with Allow winning length ties —
    applied per page via a broadcast per-host rule array and an
    integer-encoded precedence max; patterns precompiled to regexes in
    Python so both engines evaluate identical literals."""
    from .operators.webpages import (
        rfc9309_rules_df,
        robots_rfc9309,
        synthetic_linked_pages,
    )

    return robots_rfc9309(
        synthetic_linked_pages(_t_raw(spark, sf_dir, "documents")),
        rfc9309_rules_df(spark),
    )


def _sql_robots_rfc9309() -> str:
    from .operators.webpages import RFC9309_RULES, _robots_pattern_rx

    rows = ", ".join(
        f"('{h}', '{_robots_pattern_rx(p)}', '{p}',"
        f" {2 * len(p) + int(a)})"
        for h, p, a in RFC9309_RULES
    )
    url = _SQL_PAGE_URL.format(x="d.doc_id")
    return f"""
WITH pages AS (SELECT {url} AS url FROM documents d),
rules AS (SELECT * FROM (VALUES {rows}) t(host, rx, pattern, score)),
per_host AS (
  SELECT host, list(struct_pack(rx := rx, pattern := pattern,
                                score := score)) AS rl
  FROM rules GROUP BY host),
base AS (
  SELECT url, regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS path
  FROM pages),
j AS (
  SELECT b.url, b.host,
         list_filter(p.rl, r -> regexp_matches(b.path, r.rx)) AS hits
  FROM base b LEFT JOIN per_host p ON p.host = b.host),
k AS (
  SELECT url, host, hits,
         list_aggregate(list_transform(hits, r -> r.score), 'max')
           AS best
  FROM j)
SELECT url, host, CAST(len(hits) AS BIGINT) AS n_match,
       CASE WHEN len(hits) > 0
            THEN list_filter(hits, r -> r.score = best)[1].pattern
       END AS best_pattern,
       (len(hits) = 0 OR best % 2 = 1) AS allowed
FROM k
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "igt_classify_lines": q_igt_classify_lines,
        "igt_detect_spans": q_igt_detect_spans,
        "igt_segment_lines": q_igt_segment_lines,
        "span_islands_events": q_span_islands_events,
        "session_windows": q_session_windows,
        "value_percentiles": q_value_percentiles,
        "topn_per_group": q_topn_per_group,
        "json_props": q_json_props,
        "deterministic_mode": q_deterministic_mode,
        "interval_semijoin": q_interval_semijoin,
        "confusion_pivot": q_confusion_pivot,
        "topk_parts": q_topk_parts,
        "label_normalize": q_label_normalize,
        "tpch_q1": q_tpch_q1,
        "revenue_topk": q_revenue_topk,
        "local_supplier_volume": q_local_supplier_volume,
        "dedup_exact": q_dedup_exact,
        "fingerprints": q_fingerprints,
        "minhash_bands": q_minhash_bands,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "neardup_clusters": q_neardup_clusters,
        "gopher_filters": q_gopher_filters,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "stratified_sample": q_stratified_sample,
        "asof_join": q_asof_join,
        "corpus_mixture": q_corpus_mixture,
        "tfidf_top_terms": q_tfidf_top_terms,
        "hopping_counts": q_hopping_counts,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "embedding_neardup": q_embedding_neardup,
        "subword_stats": q_subword_stats,
        "media_frames": q_media_frames,
        "media_resize": q_media_resize,
        "winnowing": q_winnowing,
        "confusion_cube": q_confusion_cube,
        "embedding_stats": q_embedding_stats,
        "media_meta": q_media_meta,
        "media_embeddings": q_media_embeddings,
        "substring_dup_spans": q_substring_dup_spans,
        "substring_dup_spans_i64": q_substring_dup_spans_i64,
        "substring_dedup_clean": q_substring_dedup_clean,
        "contamination_screen": q_contamination_screen,
        "mixture_resample": q_mixture_resample,
        "mixture_resample_recipe": q_mixture_resample_recipe,
        "repetition_ratios": q_repetition_ratios,
        "curation_funnel": q_curation_funnel,
        "unigram_familiarity": q_unigram_familiarity,
        "c4_clean": q_c4_clean,
        "line_dedup": q_line_dedup,
        "pii_redact": q_pii_redact,
        "dsir_weights": q_dsir_weights,
        "sequence_pack": q_sequence_pack,
        "temperature_mixture": q_temperature_mixture,
        "cleaning_funnel": q_cleaning_funnel,
        "incremental_dedup": q_incremental_dedup,
        "budget_select": q_budget_select,
        "bigram_lm_score": q_bigram_lm_score,
        "incremental_dedup_bloom": q_incremental_dedup_bloom,
        "nb_domain_score": q_nb_domain_score,
        "semdedup": q_semdedup,
        "url_dedup": q_url_dedup,
        "hll_cardinality": q_hll_cardinality,
        "html_extract": q_html_extract,
        "html_strip": q_html_strip,
        "link_graph": q_link_graph,
        "blocklist_filter": q_blocklist_filter,
        "anchor_text": q_anchor_text,
        "pagerank": q_pagerank,
        "crawl_cadence": q_crawl_cadence,
        "page_metadata": q_page_metadata,
        "warc_parse": q_warc_parse,
        "http_parse": q_http_parse,
        "extraction_funnel": q_extraction_funnel,
        "host_graph": q_host_graph,
        "recrawl_delta": q_recrawl_delta,
        "charset_decode": q_charset_decode,
        "host_quality_gate": q_host_quality_gate,
        "robots_filter": q_robots_filter,
        "cdx_index": q_cdx_index,
        "sitemap_parse": q_sitemap_parse,
        "frontier_gap": q_frontier_gap,
        "mime_sniff": q_mime_sniff,
        "fetch_schedule": q_fetch_schedule,
        "layout_columns": q_layout_columns,
        "wet_export": q_wet_export,
        "redirect_resolve": q_redirect_resolve,
        "host_template_strip": q_host_template_strip,
        "canonical_attribution": q_canonical_attribution,
        "inverted_index": q_inverted_index,
        "link_spam": q_link_spam,
        "wat_export": q_wat_export,
        "frontier_priority": q_frontier_priority,
        "soft404": q_soft404,
        "snapshot_upsert": q_snapshot_upsert,
        "hreflang_symmetry": q_hreflang_symmetry,
        "link_resolve": q_link_resolve,
        "domain_rollup": q_domain_rollup,
        "crawl_depth": q_crawl_depth,
        "hits_scores": q_hits_scores,
        "adaptive_revisit": q_adaptive_revisit,
        "keyword_stuffing": q_keyword_stuffing,
        "trustrank": q_trustrank,
        "pagination_chains": q_pagination_chains,
        "crawl_budget": q_crawl_budget,
        "mirror_hosts": q_mirror_hosts,
        "bowtie_classes": q_bowtie_classes,
        "triangle_count": q_triangle_count,
        "landmark_closeness": q_landmark_closeness,
        "bm25_rank": q_bm25_rank,
        "postings_stats": q_postings_stats,
        "search_rank_fusion": q_search_rank_fusion,
        "dust_rules": q_dust_rules,
        "crawl_trap_hosts": q_crawl_trap_hosts,
        "index_shard_balance": q_index_shard_balance,
        "robots_rfc9309": q_robots_rfc9309,
        "clustering_coeffs": q_clustering_coeffs,
        "compaction_plan": q_compaction_plan,
        "hard_negatives": q_hard_negatives,
        "span_corruption": q_span_corruption,
        "revisit_export": q_revisit_export,
        "spam_mass": q_spam_mass,
        "snapshot_expire": q_snapshot_expire,
        "sitemap_robots_conflict": q_sitemap_robots_conflict,
    }


def oracle_sql() -> dict[str, str]:
    sw = _sql_stopwords()
    return {
        "igt_segment_lines": SQL_SEGMENT_LINES,
        "span_islands_events": SQL_SPAN_ISLANDS,
        "session_windows": SQL_SESSION_WINDOWS,
        "value_percentiles": SQL_VALUE_PERCENTILES,
        "topn_per_group": SQL_TOPN_PER_GROUP,
        "json_props": SQL_JSON_PROPS,
        "deterministic_mode": SQL_DETERMINISTIC_MODE,
        "interval_semijoin": SQL_INTERVAL_SEMIJOIN,
        "confusion_pivot": SQL_CONFUSION_PIVOT,
        "topk_parts": SQL_TOPK_PARTS,
        "label_normalize": SQL_LABEL_NORMALIZE,
        "tpch_q1": SQL_TPCH_Q1,
        "revenue_topk": SQL_REVENUE_TOPK,
        "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
        "dedup_exact": SQL_DEDUP_EXACT,
        "fingerprints": SQL_FINGERPRINTS,
        "minhash_bands": _sql_minhash_bands(),
        "minhash_lsh_pairs": _sql_minhash_lsh_pairs(),
        "neardup_clusters": _sql_neardup_clusters(),
        "gopher_filters": SQL_GOPHER_FILTERS,
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "token_stats": SQL_TOKEN_STATS,
        "quality_scores": SQL_QUALITY_SCORES.replace("{SW}", sw),
        "lang_id": SQL_LANG_ID.replace("{SW}", sw),
        "simhash": SQL_SIMHASH,
        "simhash_neardup": _sql_simhash_neardup(),
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "asof_join": SQL_ASOF_JOIN,
        "corpus_mixture": SQL_CORPUS_MIXTURE,
        "tfidf_top_terms": _sql_tfidf_top_terms(),
        "hopping_counts": SQL_HOPPING_COUNTS,
        "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
        "ann_lsh": _sql_ann_lsh(),
        "ann_ivf": _sql_ann_ivf_fixed(),
        "embedding_neardup": _sql_embedding_neardup(),
        "subword_stats": _sql_subword_stats(),
        "media_frames": SQL_MEDIA_FRAMES,
        "media_resize": SQL_MEDIA_RESIZE,
        "winnowing": _sql_winnowing(),
        "confusion_cube": SQL_CONFUSION_CUBE,
        "embedding_stats": SQL_EMBEDDING_STATS,
        "media_meta": SQL_MEDIA_META,
        "media_embeddings": SQL_MEDIA_EMBEDDINGS,
        "substring_dup_spans": SQL_SUBSTRING_DUP_SPANS,
        "substring_dup_spans_i64": SQL_SUBSTRING_DUP_SPANS,
        "substring_dedup_clean": _sql_substring_dedup_clean(),
        "contamination_screen": SQL_CONTAMINATION_SCREEN,
        "mixture_resample": _sql_mixture_resample(),
        "mixture_resample_recipe": _sql_mixture_resample_recipe(),
        "repetition_ratios": SQL_REPETITION_RATIOS,
        "curation_funnel": _sql_curation_funnel(),
        "unigram_familiarity": SQL_UNIGRAM_FAMILIARITY,
        "c4_clean": SQL_C4_CLEAN,
        "line_dedup": SQL_LINE_DEDUP,
        "pii_redact": SQL_PII_REDACT,
        "dsir_weights": _sql_dsir_weights(),
        "sequence_pack": SQL_SEQUENCE_PACK,
        "temperature_mixture": SQL_TEMPERATURE_MIXTURE,
        "cleaning_funnel": SQL_CLEANING_FUNNEL,
        "incremental_dedup": SQL_INCREMENTAL_DEDUP,
        "budget_select": SQL_BUDGET_SELECT,
        "bigram_lm_score": SQL_BIGRAM_LM_SCORE,
        # bloom variant: same exact-output contract, same oracle
        "incremental_dedup_bloom": SQL_INCREMENTAL_DEDUP,
        "nb_domain_score": SQL_NB_DOMAIN_SCORE,
        "semdedup": _sql_semdedup(),
        "url_dedup": SQL_URL_DEDUP,
        "hll_cardinality": _sql_hll_cardinality(),
        "html_extract": _sql_html_extract(),
        "html_strip": _sql_html_strip(),
        "link_graph": _sql_link_graph(),
        "blocklist_filter": _sql_blocklist_filter(),
        "anchor_text": _sql_anchor_text(),
        "pagerank": _sql_pagerank(),
        "crawl_cadence": _sql_crawl_cadence(),
        "page_metadata": _sql_page_metadata(),
        "warc_parse": _sql_warc_parse(),
        "http_parse": _sql_http_parse(),
        "extraction_funnel": _sql_extraction_funnel(),
        "host_graph": _sql_host_graph(),
        "recrawl_delta": _sql_recrawl_delta(),
        "charset_decode": _sql_charset_decode(),
        "host_quality_gate": _sql_host_quality_gate(),
        "robots_filter": _sql_robots_filter(),
        "cdx_index": _sql_cdx_index(),
        "sitemap_parse": _sql_sitemap_parse(),
        "frontier_gap": _sql_frontier_gap(),
        "mime_sniff": _sql_mime_sniff(),
        "fetch_schedule": _sql_fetch_schedule(),
        "layout_columns": _sql_layout_columns(),
        "wet_export": _sql_wet_export(),
        "redirect_resolve": _sql_redirect_resolve(),
        "host_template_strip": _sql_host_template_strip(),
        "canonical_attribution": _sql_canonical_attribution(),
        "inverted_index": _sql_inverted_index(),
        "link_spam": _sql_link_spam(),
        "wat_export": _sql_wat_export(),
        "frontier_priority": _sql_frontier_priority(),
        "soft404": _sql_soft404(),
        "snapshot_upsert": _sql_snapshot_upsert(),
        "hreflang_symmetry": _sql_hreflang_symmetry(),
        "link_resolve": _sql_link_resolve(),
        "domain_rollup": _sql_domain_rollup(),
        "crawl_depth": _sql_crawl_depth(),
        "hits_scores": _sql_hits_scores(),
        "adaptive_revisit": _sql_adaptive_revisit(),
        "keyword_stuffing": _sql_keyword_stuffing(),
        "trustrank": _sql_trustrank(),
        "pagination_chains": _sql_pagination_chains(),
        "crawl_budget": _sql_crawl_budget(),
        "mirror_hosts": _sql_mirror_hosts(),
        "bowtie_classes": _sql_bowtie_classes(),
        "triangle_count": _sql_triangle_count(),
        "landmark_closeness": _sql_landmark_closeness(),
        "bm25_rank": _sql_bm25_rank(),
        "postings_stats": _sql_postings_stats(),
        "search_rank_fusion": _sql_search_rank_fusion(),
        "dust_rules": _sql_dust_rules(),
        "crawl_trap_hosts": _sql_crawl_trap_hosts(),
        "index_shard_balance": _sql_index_shard_balance(),
        "robots_rfc9309": _sql_robots_rfc9309(),
        "clustering_coeffs": _sql_clustering_coeffs(),
        "compaction_plan": _sql_compaction_plan(),
        "hard_negatives": SQL_HARD_NEGATIVES,
        "span_corruption": _sql_span_corruption(),
        "revisit_export": _sql_revisit_export(),
        "spam_mass": _sql_spam_mass(),
        "snapshot_expire": _sql_snapshot_expire(),
        "sitemap_robots_conflict": _sql_sitemap_robots_conflict(),
        # igt_classify_lines / igt_detect_spans: model scoring is
        # legitimately not SQL-expressible → rows-only checks.
    }
