"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...extras}.

The flagship measurement is the fused IGT detection pipeline over a
deterministic synthetic webtext corpus sized to the SF (BASELINE.md:
docs/sec and lines/sec), plus representative relational / dedup /
similarity queries over the driver tables.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from igtdetect_spark.entry_queries import queries as registry
    from igtdetect_spark.flagship import get_lexicons, get_synthetic_model
    from igtdetect_spark.plans.pipeline import DetectContext, detect_spans_fused
    from igtdetect_spark.session import build_session
    from igtdetect_spark.sources.pages import synthetic_pages

    spark = build_session(
        app_name="igtdetect_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- flagship: fused IGT detection over synthetic webtext at SF scale
    n_docs = max(50, int(50000 * sf))           # SF=0.1 → 5000 docs
    mega_every = 2000 if n_docs >= 4000 else 0  # skew: a few 100k-line docs
    pages = synthetic_pages(
        spark, n_docs, mega_doc_every=mega_every, mega_doc_lines=100_000,
        n_partitions=cpus * 2,
    ).cache()
    docs = pages.count()  # materialize corpus outside the timed window

    ctx = DetectContext(spark, get_synthetic_model(), get_lexicons())

    # warm-up: python workers + broadcast distribution are one-time costs
    detect_spans_fused(pages.limit(64), ctx).count()

    t0 = time.time()
    spans = detect_spans_fused(pages, ctx)
    n_spans = spans.count()
    t_detect = time.time() - t0
    timings["igt_detect_spans_synthetic"] = round(t_detect, 3)

    from igtdetect_spark.plans.chunked import (
        detect_spans_auto,
        detect_spans_chunked,
    )

    # chunk size tuned to parallelism (enough chunks per mega-doc to feed
    # every core; floor keeps per-chunk overhead amortized)
    chunk_lines = max(2_500, 100_000 // max(4, cpus))
    t0 = time.time()
    n_spans_chunked = detect_spans_chunked(
        pages, ctx, chunk_lines=chunk_lines
    ).count()
    timings["igt_detect_spans_chunked"] = round(time.time() - t0, 3)
    assert n_spans_chunked == n_spans, "chunked/fused span count diverged"

    # skew-aware selection: should match the better of the two paths
    # (here: fused — the 100k-line megas don't clear the chunk overhead)
    t0 = time.time()
    n_spans_auto = detect_spans_auto(pages, ctx, cores=cpus).count()
    timings["igt_detect_spans_auto"] = round(time.time() - t0, 3)
    assert n_spans_auto == n_spans, "auto/fused span count diverged"

    # line throughput: count segmented lines once (not in the timed window)
    from igtdetect_spark.operators.segment import segment_pages

    n_lines = segment_pages(pages).count()

    # --- registry queries over the driver tables
    qs = registry()
    bench_queries = [
        "igt_classify_lines", "igt_detect_spans", "span_islands_events",
        "tpch_q1", "revenue_topk", "minhash_bands", "ngram_jaccard",
        "token_stats", "quality_scores", "ann_cosine_topk", "ann_lsh",
        "simhash", "simhash_neardup", "asof_join", "corpus_mixture",
        "tfidf_top_terms", "hopping_counts",
        "dedup_exact", "neardup_clusters",
        "gopher_filters", "stratified_sample", "media_embeddings",
        "winnowing", "subword_stats",
        "substring_dup_spans", "substring_dedup_clean",
        "contamination_screen", "mixture_resample",
        "unigram_familiarity", "mixture_resample_recipe",
        "repetition_ratios", "substring_dup_spans_i64",
        "c4_clean", "line_dedup", "pii_redact", "dsir_weights",
        "sequence_pack", "temperature_mixture", "incremental_dedup",
        "budget_select", "bigram_lm_score", "incremental_dedup_bloom",
        "nb_domain_score", "semdedup", "url_dedup", "hll_cardinality",
        "html_extract", "html_strip", "link_graph", "blocklist_filter",
        "anchor_text", "pagerank", "crawl_cadence", "page_metadata",
        "warc_parse", "robots_filter", "http_parse", "extraction_funnel",
        "host_graph", "recrawl_delta", "charset_decode", "host_quality_gate",
        "cdx_index", "sitemap_parse", "mime_sniff", "fetch_schedule",
        "frontier_gap", "layout_columns", "wet_export",
        "redirect_resolve", "host_template_strip", "canonical_attribution",
        "inverted_index", "link_spam", "wat_export",
        "frontier_priority", "soft404", "snapshot_upsert",
        "hreflang_symmetry", "link_resolve", "domain_rollup",
        "crawl_depth", "hits_scores", "adaptive_revisit",
        "keyword_stuffing", "trustrank", "pagination_chains",
        "crawl_budget", "mirror_hosts", "bowtie_classes",
        "triangle_count", "landmark_closeness", "bm25_rank",
        "postings_stats", "search_rank_fusion", "dust_rules",
        "crawl_trap_hosts", "index_shard_balance", "robots_rfc9309",
        "clustering_coeffs", "compaction_plan", "hard_negatives",
        "span_corruption", "revisit_export", "spam_mass",
        "snapshot_expire", "sitemap_robots_conflict",
    ]
    from igtdetect_spark.operators.dedup import release_plan_caches

    def force(d):
        # df.count() lets Catalyst PRUNE every output column, so a
        # projection-terminal query (wat_export's JSON render,
        # wet_export, html_extract, ...) degenerates to a row count
        # over the scan and the timing measures a plan nobody would
        # run. A bit_xor(xxhash64(*)) checksum forces every output
        # column to be computed (overflow-free under ANSI, unlike
        # sum). Structural queries (join/agg/window-terminal) cost
        # the same either way — pruning cannot remove those stages —
        # so their history stays comparable; see BENCH/PLANS.md
        # "Scaling-probe validity fixes" for the measured A/B.
        def h(f):
            # xxhash64 rejects MapType; route maps through to_json —
            # the checksum only needs to FORCE evaluation, not be a
            # canonical value
            if "map<" in f.dataType.simpleString():
                return f"to_json(`{f.name}`)"
            return f"`{f.name}`"

        cols = ", ".join(h(f) for f in d.schema.fields)
        d.selectExpr(
            "count(1) AS n", f"bit_xor(xxhash64({cols})) AS chk"
        ).collect()

    for name in bench_queries:
        best = None
        for _ in range(2):  # best-of-2: damp JIT/GC noise in the record
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            force(df)
            dt = time.time() - t0
            release_plan_caches(df)  # outside the timed window
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(docs / t_detect, 1) if t_detect else None
    lines_per_sec = round(n_lines / t_detect, 1) if t_detect else None

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "synthetic_docs": docs,
                "synthetic_lines": n_lines,
                "detected_spans": n_spans,
                "docs_per_sec": docs_per_sec,
                "lines_per_sec": lines_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
