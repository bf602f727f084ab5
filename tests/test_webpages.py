"""URL canonicalization + freshest-crawl dedup (operators/webpages)."""

from pyspark.sql import functions as F

from igtdetect_spark.operators.webpages import (
    canonical_url,
    synthetic_page_urls,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c"))
        .collect()
    ]


class TestCanonicalUrl:
    def test_each_rule(self, spark):
        cases = {
            # fragment stripped
            "https://a.org/x#sec": "https://a.org/x",
            # scheme folded
            "http://a.org/x": "https://a.org/x",
            # www stripped
            "https://www.a.org/x": "https://a.org/x",
            # default ports stripped (80 folds via the scheme rewrite)
            "https://a.org:443/x": "https://a.org/x",
            "http://a.org:80/x": "https://a.org/x",
            # NON-default port survives
            "https://a.org:8443/x": "https://a.org:8443/x",
            # tracking params dropped, survivors sorted
            "https://a.org/x?utm_source=rss&b=2&a=1":
                "https://a.org/x?a=1&b=2",
            "https://a.org/x?fbclid=22&gclid=1": "https://a.org/x",
            # param ORDER is not identity
            "https://a.org/x?b=2&a=1": "https://a.org/x?a=1&b=2",
            # trailing slash stripped
            "https://a.org/x/": "https://a.org/x",
            "https://a.org/": "https://a.org",
            # everything at once
            "http://www.a.org:80/x/?utm_campaign=z&id=3#f":
                "https://a.org/x?id=3",
        }
        got = _canon(spark, list(cases))
        assert got == list(cases.values())

    def test_distinct_resources_stay_distinct(self, spark):
        urls = [
            "https://a.org/x?id=1",
            "https://a.org/x?id=2",
            "https://a.org/x",
            "https://b.org/x",
            "https://a.org/y",
        ]
        assert len(set(_canon(spark, urls))) == 5


class TestUrlDedup:
    def test_latest_fetch_wins_ties_on_smallest_id(self, spark):
        pages = spark.createDataFrame(
            [
                (1, "http://www.a.org/p?utm_source=x", 100),
                (2, "https://a.org/p/", 300),          # latest → kept
                (3, "https://a.org/p#frag", 200),
                (7, "https://b.org/q", 50),            # ts tie group:
                (5, "http://b.org/q", 50),             #   id 5 kept
                (9, "https://c.org/solo", 10),
            ],
            "doc_id long, url string, fetch_ts_sec long",
        )
        got = {
            r["canonical_url"]: (
                r["n_variants"], r["kept_doc_id"], r["latest_ts_sec"]
            )
            for r in url_dedup(pages).collect()
        }
        assert got == {
            "https://a.org/p": (3, 2, 300),
            "https://b.org/q": (2, 5, 50),
            "https://c.org/solo": (1, 9, 10),
        }

    def test_synthetic_urls_exercise_every_rule(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        pages = synthetic_page_urls(docs)
        urls = [r["url"] for r in pages.collect()]
        assert any("#frag" in u for u in urls)
        assert any("www." in u for u in urls)
        assert any("utm_" in u for u in urls)
        assert any(":443" in u or ":80" in u for u in urls)
        assert any(u.startswith("http://") for u in urls)
        # distinct fetch timestamps → "latest" is well-defined
        ts = [r["fetch_ts_sec"] for r in pages.collect()]
        assert len(set(ts)) == len(ts)
        # raw URLs genuinely collapse
        out = url_dedup(pages)
        assert out.filter("n_variants > 1").count() > 0

    def test_plan_single_exchange_no_python(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = str(
            url_dedup(synthetic_page_urls(docs))
            ._jdf.queryExecution().executedPlan()
        )
        # canonicalization fuses into the scan; the dedup is ONE hash
        # aggregate exchange — no window sort, no join, no Python.
        assert plan.count("Exchange") == 1, plan
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
