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
