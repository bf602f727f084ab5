"""WARC response-record synthesis + native parse (sources/warc.py)."""

import hashlib

from igtdetect_spark.sources.warc import parse_warc, synthetic_warc_records


class TestWarcRoundTrip:
    def test_integrity_and_headers_on_driver_corpus(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = {
            r["doc_id"]: r["text"]
            for r in docs.select("doc_id", "text").collect()
        }
        got = parse_warc(synthetic_warc_records(docs)).collect()
        assert len(got) == len(rows)
        by_url = {r["url"]: r for r in got}
        for i, text in rows.items():
            site = int(hashlib.md5(str(i).encode()).hexdigest()[0], 16) % 4
            r = by_url[f"https://site{site}.example.org/p/{i}"]
            assert r["warc_type"] == "response"
            assert r["length_ok"] is True
            payload = (text or "").encode("utf-8")
            assert r["content_length"] == len(payload)
            assert r["payload_octets"] == len(payload)
            assert r["payload_md5"] == hashlib.md5(payload).hexdigest()
            exp_ts = 1735689600 + (i * 7919) % 8640000
            assert r["warc_date_ts"] == exp_ts

    def test_hostile_payloads(self, spark):
        """Payloads that look like WARC structure must not confuse the
        split: blank lines inside the payload, header-like payload
        lines, NULL and empty text, multi-byte UTF-8 lengths."""
        docs = spark.createDataFrame(
            [
                (1, "plain body"),
                (2, None),
                (3, ""),
                (4, "first\r\n\r\nsecond blank-line payload"),
                (5, "WARC-Type: fake\r\nContent-Length: 9999"),
                (6, "naïve café — 多字节"),
            ],
            "doc_id bigint, text string",
        )
        got = {
            r["url"].rsplit("/", 1)[1]: r
            for r in parse_warc(synthetic_warc_records(docs)).collect()
        }
        for i in range(1, 7):
            r = got[str(i)]
            assert r["length_ok"] is True, r
            assert r["warc_type"] == "response", r
        assert got["2"]["payload_octets"] == 0
        assert got["3"]["payload_octets"] == 0
        # payload with an embedded blank line survives byte-exactly
        body4 = "first\r\n\r\nsecond blank-line payload".encode()
        assert got["4"]["payload_md5"] == hashlib.md5(body4).hexdigest()
        # header-like payload lines don't leak into parsed headers
        assert got["5"]["content_length"] == len(
            "WARC-Type: fake\r\nContent-Length: 9999".encode()
        )
        # octet length counts UTF-8 bytes, not characters
        body6 = "naïve café — 多字节".encode("utf-8")
        assert got["6"]["payload_octets"] == len(body6)

    def test_zero_shuffle_native_plan(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = str(
            parse_warc(synthetic_warc_records(docs))
            ._jdf.queryExecution().executedPlan()
        )
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        assert "MapInPandas" not in plan, plan


class TestHttpStage:
    """HTTP response split inside the WARC payload (stage 2)."""

    def test_status_mix_and_round_trip_on_driver_corpus(self, spark):
        import hashlib

        from igtdetect_spark.sources.warc import (
            HTTP_ERROR_PAGE,
            parse_http,
            parse_warc,
            synthetic_warc_http_records,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        w = parse_warc(synthetic_warc_http_records(docs),
                       with_payload=True)
        got = parse_http(
            w.select("url", F.col("payload").alias("http"))
        ).collect()
        assert len(got) == docs.count()
        statuses = set()
        for r in got:
            i = int(r["url"].rsplit("/", 1)[1])
            h = hashlib.md5(str(i).encode()).hexdigest()
            m = int(h[6], 16) % 8
            exp_status = 200 if m <= 5 else (404 if m == 6 else 301)
            assert r["status"] == exp_status, (i, m)
            assert r["length_ok"] is True
            assert r["content_type"] == "text/html"
            exp_cs = "utf-8" if int(h[7], 16) % 2 == 0 else None
            assert r["charset"] == exp_cs
            if exp_status == 301:
                assert r["location"] == (
                    f"https://www.example.org/moved/{i}"
                )
                assert r["body_octets"] == 0
            else:
                assert r["location"] is None
            if exp_status == 404:
                assert r["body"] == HTTP_ERROR_PAGE
            if exp_status == 200:
                assert r["body"].startswith("<html><head><title>Doc")
                assert r["body_md5"] == hashlib.md5(
                    r["body"].encode()
                ).hexdigest()
            statuses.add(exp_status)
        # every branch fires at sf0.001
        assert statuses == {200, 301, 404}

    def test_hostile_bodies(self, spark):
        """Bodies containing blank lines, an embedded HTTP message, or
        header-shaped lines come back byte-identical and never shadow
        the real headers."""
        from igtdetect_spark.sources.warc import parse_http

        cases = {
            1: "line one\r\n\r\nline after blank",
            2: "HTTP/1.1 500 Broken\r\nContent-Type: text/evil\r\n\r\nx",
            3: "Location: https://evil.example/\r\nContent-Length: 9",
            4: "",
            5: "naïve café — 多字节",
        }

        def msg(body, extra=""):
            b = body.encode("utf-8")
            return (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                f"charset=utf-8\r\n{extra}Content-Length: {len(b)}"
                f"\r\n\r\n{body}"
            )

        df = spark.createDataFrame(
            [(k, msg(v)) for k, v in cases.items()],
            "id long, http string",
        )
        got = {r["id"]: r for r in parse_http(df).collect()}
        for k, body in cases.items():
            r = got[k]
            assert r["status"] == 200 and r["reason"] == "OK", k
            assert r["body"] == body, k
            assert r["length_ok"] is True, k
            assert r["content_type"] == "text/html"
            assert r["charset"] == "utf-8"
            # header-shaped BODY lines must not populate headers
            assert r["location"] is None, k

    def test_zero_shuffle_native_plan(self, spark):
        from igtdetect_spark.sources.warc import (
            parse_http,
            parse_warc,
            synthetic_warc_http_records,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        w = parse_warc(synthetic_warc_http_records(docs),
                       with_payload=True)
        plan = str(
            parse_http(w.select("url", F.col("payload").alias("http")))
            ._jdf.queryExecution().executedPlan()
        )
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        assert "MapInPandas" not in plan, plan


class TestExtractionFunnel:
    """WARC → HTTP → gate → main-content, end to end on raw bytes."""

    def test_equals_html_extract_on_surviving_docs(self, spark):
        """The funnel's per-url extract must be byte-identical to the
        direct html_extract path for every status-200 page, and the
        non-200 pages must be exactly the gated-out set."""
        import hashlib

        from igtdetect_spark.entry_queries import (
            q_extraction_funnel,
            q_html_extract,
        )

        sf = "/root/testdata/sf0.001"
        funnel = {r["doc_id"]: r for r in
                  q_extraction_funnel(spark, sf).collect()}
        direct = {r["doc_id"]: r for r in
                  q_html_extract(spark, sf).collect()}
        survivors = {
            i for i in direct
            if int(hashlib.md5(str(i).encode()).hexdigest()[6], 16) % 8 <= 5
        }
        assert set(funnel) == survivors
        assert 0 < len(survivors) < len(direct)
        for i in survivors:
            assert funnel[i]["main_text"] == direct[i]["main_text"], i
            assert funnel[i]["kept_blocks"] == direct[i]["kept_blocks"]
            assert funnel[i]["url"] == direct[i]["url"]

    def test_single_python_stage_zero_exchange(self, spark):
        from igtdetect_spark.entry_queries import q_extraction_funnel

        # cluster-scale contract: pin the shape with the bench-only
        # small-scan spread disabled (no-op past 64 MB)
        spark.conf.set("igtdetect.spreadSmallScanBytes", "0")
        try:
            plan = str(
                q_extraction_funnel(spark, "/root/testdata/sf0.001")
                ._jdf.queryExecution().executedPlan()
            )
        finally:
            spark.conf.unset("igtdetect.spreadSmallScanBytes")
        assert "Exchange" not in plan, plan
        assert plan.count("MapInPandas") == 1, plan
        assert "BatchEvalPython" not in plan, plan


class TestWetExport:
    def test_roundtrip_integrity(self, spark):
        import hashlib

        from pyspark.sql import functions as F

        from igtdetect_spark.sources.warc import (
            extract_main_from_warc,
            parse_warc,
            synthetic_warc_http_records,
            wet_records,
        )

        docs = spark.range(0, 40).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("A sufficiently long stopword bearing paragraph "
                      "about the topic of document "),
                F.col("id").cast("string"),
            ).alias("text"),
            F.lit("en").alias("lang"),
        )
        ex = extract_main_from_warc(synthetic_warc_http_records(docs))
        extracted = {r["url"]: r["main_text"] for r in ex.collect()}
        assert extracted, "funnel produced nothing — fixture broken"

        back = parse_warc(wet_records(ex)).collect()
        assert len(back) == len(extracted)
        for r in back:
            assert r["warc_type"] == "conversion"
            assert r["length_ok"] is True
            want = extracted[r["url"]]
            assert r["payload_md5"] == hashlib.md5(
                want.encode()).hexdigest()
            assert r["payload_octets"] == len(want.encode())

    def test_render_is_shuffle_free(self, spark):
        from pyspark.sql import functions as F

        from igtdetect_spark.sources.warc import parse_warc, wet_records

        ex = spark.range(0, 5).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("https://x/p/"), F.col("id").cast("string"))
            .alias("url"),
            F.lit("some extracted text").alias("main_text"),
        )
        plan = str(
            parse_warc(wet_records(ex))
            ._jdf.queryExecution().executedPlan()
        )
        assert "Exchange" not in plan
        for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py not in plan


class TestWatRecords:
    def _pages(self, spark, rows):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "doc_id long, url string, h string")
        return df.select(
            "doc_id", "url", F.encode("h", "utf-8").alias("html")
        )

    def test_payload_json_and_roundtrip(self, spark):
        from igtdetect_spark.sources.warc import parse_warc, wat_records

        pages = self._pages(spark, [
            (1, "https://a.org/1",
             '<a href="https://b.org/x">b</a><a href="https://a.org/2">a</a>'),
            (2, "https://a.org/2", "<p>no links</p>"),
        ])
        out = {r["url"]: r for r in parse_warc(
            wat_records(pages), with_payload=True).collect()}
        import json

        r1 = json.loads(out["https://a.org/1"]["payload"])
        # links sorted; count matches; envelope fields present
        assert r1["envelope"]["links"] == [
            "https://a.org/2", "https://b.org/x"
        ]
        assert r1["envelope"]["links_count"] == 2
        assert r1["envelope"]["uri"] == "https://a.org/1"
        r2 = json.loads(out["https://a.org/2"]["payload"])
        assert r2["envelope"]["links"] == []
        assert r2["envelope"]["links_count"] == 0
        # container integrity
        for r in out.values():
            assert r["warc_type"] == "metadata"
            assert r["length_ok"]

    def test_quote_and_backslash_escaped(self, spark):
        from igtdetect_spark.sources.warc import parse_warc, wat_records

        pages = self._pages(spark, [
            (3, 'https://a.org/?q="x"\\y',
             '<a href="https://b.org/\\"">z</a>'),
        ])
        row = parse_warc(wat_records(pages), with_payload=True).collect()[0]
        import json

        env = json.loads(row["payload"])["envelope"]  # must not raise
        assert env["uri"] == 'https://a.org/?q="x"\\y'
        # href stops at the attribute's closing quote, leaving a LONE
        # trailing backslash — which must not eat the JSON close-quote
        assert env["links"] == ["https://b.org/\\"]


class TestRevisitRecords:
    """Archive-side dedup: revisit vs response decisions."""

    def test_decision_matrix_and_provenance(self, spark):
        from igtdetect_spark.sources.warc import (
            parse_warc,
            revisit_records,
        )

        fetches = spark.createDataFrame(
            [
                (1, "https://a/1", "same body"),     # in store, unchanged
                (2, "https://a/2", "new body v2"),   # in store, CHANGED
                (3, "https://a/3", "fresh page"),    # not in store
            ],
            "doc_id long, url string, text string",
        )
        import hashlib

        store = spark.createDataFrame(
            [
                ("https://a/1",
                 hashlib.md5(b"same body").hexdigest(),
                 "<urn:md5:orig1>", 1000),
                ("https://a/2",
                 hashlib.md5(b"old body v1").hexdigest(),
                 "<urn:md5:orig2>", 2000),
            ],
            "url string, seen_md5 string, orig_id string, orig_ts long",
        )
        out = parse_warc(
            revisit_records(fetches, store),
            extra_headers=("WARC-Refers-To", "WARC-Profile"),
        )
        got = {r["url"]: r for r in out.collect()}
        r1 = got["https://a/1"]
        assert r1["warc_type"] == "revisit"
        assert r1["payload_octets"] == 0 and r1["length_ok"]
        assert r1["warc_refers_to"] == "<urn:md5:orig1>"
        assert "identical-payload-digest" in r1["warc_profile"]
        for u in ("https://a/2", "https://a/3"):
            r = got[u]
            assert r["warc_type"] == "response", u
            assert r["payload_octets"] > 0 and r["length_ok"]
            assert r["warc_refers_to"] == ""  # no provenance headers
