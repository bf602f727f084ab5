"""Two-column layout analysis (operators/layout): gutter detection +
de-columnizing for pdftotext -layout style fixed-width page text."""

from pyspark.sql import functions as F

from igtdetect_spark.operators.layout import (
    detect_gutters,
    page_lines,
    split_columns,
    synthetic_layout_pages,
)


def _pages(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, layout_text string",
    )


class TestGutterDetection:
    def test_two_column_page(self, spark):
        page = "alpha     ONE\nbe        TWO\ngamma     THREE"
        g = detect_gutters(page_lines(_pages(spark, [page]))).collect()
        assert len(g) == 1
        r = g[0]
        # positions 6-10 are blank on every line (gamma is 5 chars)
        assert (r["gutter_start"], r["gutter_end"]) == (6, 10)
        assert r["page_width"] == 15

    def test_single_column_page_has_no_gutter(self, spark):
        page = "a plain paragraph\nwith no aligned gutter at all"
        assert detect_gutters(page_lines(_pages(spark, [page]))).count() == 0

    def test_margins_are_not_gutters(self, spark):
        # common 3-space indent touches pos 1 → rejected (not interior);
        # the ragged right edge touches page_width → rejected
        page = "   left      R\n   ll        RR\n   lll       RRRR"
        g = detect_gutters(page_lines(_pages(spark, [page]))).collect()
        assert len(g) == 1
        # intersection of per-line blank runs: 8-13 (margin run 1-3 and
        # the ragged right edge are rejected as non-interior)
        assert (g[0]["gutter_start"], g[0]["gutter_end"]) == (8, 13)

    def test_widest_run_wins_leftmost_on_tie(self, spark):
        # two interior runs of equal width 3: positions 4-6 and 10-12
        page = "abc   def   ghi\nxyz   uvw   rst"
        g = detect_gutters(page_lines(_pages(spark, [page]))).collect()
        assert (g[0]["gutter_start"], g[0]["gutter_end"]) == (4, 6)

    def test_min_gap_filters_narrow_runs(self, spark):
        page = "word other\nmore thing"  # single-space gutter only
        assert (
            detect_gutters(page_lines(_pages(spark, [page])), min_gap=2)
            .count() == 0
        )
        assert (
            detect_gutters(page_lines(_pages(spark, [page])), min_gap=1)
            .count() == 1
        )


class TestSplitColumns:
    def test_split_values(self, spark):
        page = "alpha     ONE\nbe        TWO\ngamma     THREE"
        rows = {
            r["line_no"]: r
            for r in split_columns(_pages(spark, [page])).collect()
        }
        assert [(rows[i]["left_text"], rows[i]["right_text"])
                for i in range(3)] == [
            ("alpha", "ONE"), ("be", "TWO"), ("gamma", "THREE")
        ]

    def test_synthetic_pages_split_back_to_tokens(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, None), (3, "   ")],
            "doc_id long, text string",
        )
        pages = synthetic_layout_pages(docs)
        assert pages.count() == 1  # null/blank docs produce no page
        rows = split_columns(pages).orderBy("line_no").collect()
        assert [(r["left_text"], r["right_text"]) for r in rows] == [
            ("alpha", "ALPHA"), ("beta", "BETA"), ("gamma", "GAMMA")
        ]

    def test_plan_no_python_no_cartesian(self, spark):
        docs = spark.range(0, 20).select(
            F.col("id").alias("doc_id"),
            F.lit("one two three four").alias("text"),
        )
        plan = str(
            split_columns(synthetic_layout_pages(docs))
            ._jdf.queryExecution().executedPlan()
        )
        for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                    "CartesianProduct", "BroadcastNestedLoop"):
            assert bad not in plan
