"""Extraction tests: oracle semantics + Spark pUDF parity + the
byte-identity invariant (BASELINE.json)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crawlspark import synth
from crawlspark.clean import clean_to_text, udfs as clean_udfs
from crawlspark.extract import (extract_detail_fields, extract_jsonld_blobs,
                                extract_links, udfs as extract_udfs)


def _page_html(i: int) -> str:
    return synth.gen_detail_chunk(np.array([i], dtype=np.int64)).iloc[0]["html"].decode()


class TestOracle:
    def test_canonical_and_experience(self):
        html = _page_html(1)
        f = extract_detail_fields(html)
        assert f["canonical_url"].startswith("https://") and "id1.html" in f["canonical_url"]
        assert f["experience_text"] in synth._EXPERIENCES

    def test_jobposting_fields(self):
        f = extract_detail_fields(_page_html(2))
        assert f["job_description"] and "Mô tả công việc" in f["job_description"]
        assert f["industry"] and all(s == s.strip() and s for s in f["industry"])
        assert f["occupational_category"] in synth._OCCUPATIONS
        assert f["employment_type"] in synth._EMP_TYPES
        assert f["company_website"].startswith("https://company")

    def test_location_ordered_dedup(self):
        # craft a page with duplicate regions (scraper.go:253-275)
        import json
        jp = {"@type": "JobPosting", "title": "t", "description": "d",
              "jobLocation": [
                  {"address": {"addressRegion": "Hà Nội", "addressLocality": "Cầu Giấy"}},
                  {"address": {"addressRegion": "Hà Nội", "addressLocality": "Đống Đa"}},
                  {"address": {"addressRegion": "Đà Nẵng", "addressLocality": "Cầu Giấy"}},
              ]}
        html = f'<script type="application/ld+json">{json.dumps(jp, ensure_ascii=False)}</script>'
        f = extract_detail_fields(html)
        assert f["location_city"] == ["Hà Nội", "Đà Nẵng"]
        assert f["location_district"] == ["Cầu Giấy", "Đống Đa"]

    def test_non_jobposting_skipped_but_audited(self):
        html = _page_html(5)  # h_noise%5==0 pages carry the Org blob
        found = False
        for i in range(1, 60):
            h = _page_html(i)
            blobs = extract_jsonld_blobs(h)
            f = extract_detail_fields(h)
            if f["jsonld_count"] == 2:
                found = True
                assert len(blobs) == 2
                assert f["job_description"]  # Org blob did not clobber
        assert found

    def test_salary_variants(self):
        # id%4: 0=VND, 1=small ints, 2=negotiable, 3=absent
        f0 = extract_detail_fields(_page_html(4))   # variant 0
        assert f0["salary_min_jsonld"] and f0["salary_min_jsonld"] > 1000
        f1 = extract_detail_fields(_page_html(5))   # variant 1
        assert 0 < f1["salary_min_jsonld"] <= 1000
        f2 = extract_detail_fields(_page_html(6))   # variant 2
        assert f2["salary_text_jsonld"] == "Thỏa thuận" and f2["is_negotiable"]
        f3 = extract_detail_fields(_page_html(7))   # variant 3
        assert f3["salary_min_jsonld"] is None and f3["salary_text_jsonld"] is None

    def test_invalid_json_skipped(self):
        html = '<script type="application/ld+json">{broken</script>'
        f = extract_detail_fields(html)
        assert f["jsonld_count"] == 0
        assert extract_jsonld_blobs(html) == []

    def test_links_fifo(self):
        lists = synth.gen_list_chunk(120, seed=42)
        links = extract_links(lists.iloc[0]["html"].decode())
        assert links, "list page should carry items"
        assert [l["rank"] for l in links] == list(range(1, len(links) + 1))
        assert all(l["href"].startswith("https://") for l in links)
        assert all(l["item_id"] and l["item_updated"] for l in links)


class TestSparkParity:
    def test_struct_udf_matches_oracle(self, spark):
        pages = synth.gen_pages_pandas(120, seed=42)
        details = pages[pages["text"] != ""].head(40)
        df = spark.createDataFrame(details[["url", "html"]])
        ex_udf, _, _ = extract_udfs()
        got = (df.withColumn("x", ex_udf(F.col("html").cast("string")))
                 .select("url", "x.*").toPandas().set_index("url"))
        for _, r in details.iterrows():
            want = extract_detail_fields(r["html"].decode())
            g = got.loc[r["url"]]
            for k, v in want.items():
                gv = g[k]
                if isinstance(gv, np.ndarray):
                    gv = list(gv)
                if v is None:
                    assert gv is None or (isinstance(gv, float) and pd.isna(gv)), (k, gv)
                else:
                    assert gv == v, (k, gv, v)

    def test_byte_identity_invariant(self, spark):
        """THE BASELINE.json gate: clean_to_text(extracted description)
        must equal the frozen golden pages.text, byte for byte."""
        pages = synth.gen_pages_pandas(300, seed=42)
        details = pages[pages["text"] != ""]
        df = spark.createDataFrame(details[["url", "html", "text"]])
        ex_udf, _, _ = extract_udfs()
        _, clean_to_text_udf, _ = clean_udfs()
        out = (df.withColumn("x", ex_udf(F.col("html").cast("string")))
                 .withColumn("extracted_text", clean_to_text_udf(F.col("x.job_description")))
                 .select("url", "text", "extracted_text"))
        mismatches = out.filter(F.col("text") != F.col("extracted_text")).count()
        assert mismatches == 0
        assert out.count() == len(details)

    def test_links_udf(self, spark):
        lists = synth.gen_list_chunk(150, seed=42)
        df = spark.createDataFrame(lists[["url", "html"]])
        _, links_udf, _ = extract_udfs()
        exploded = (df.withColumn("link", F.explode(links_udf(F.col("html").cast("string"))))
                      .select("url", "link.*"))
        n = exploded.count()
        assert n == 150
        assert exploded.filter(F.col("item_id").isNull()).count() == 0


class TestJvmParity:
    """extract_pages_jvm (pure Column expressions) must equal the
    Arrow/Python-oracle stage row for row over the full synthetic
    corpus — every field, both page depths, plus null/empty html."""

    def _both(self, spark, df):
        from crawlspark.extract import extract_pages, extract_pages_jvm

        sel = ["url", "depth", "_links", "x", "jsonld"]
        a = extract_pages(df).select(*sel)
        b = extract_pages_jvm(df).select(*sel)
        return a, b

    def test_full_corpus_equality(self, spark):
        pages = synth.gen_pages_pandas(600, seed=42)
        df = (spark.createDataFrame(pages[["url", "html"]])
              .withColumn("depth",
                          F.when(F.col("url").contains("/viec-lam/danh-sach"),
                                 F.lit(0)).otherwise(F.lit(1))))
        a, b = self._both(spark, df)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        assert a.count() == len(pages)

    def test_null_and_empty_html(self, spark):
        rows = [("u0", None, 0), ("u1", None, 1),
                ("u2", b"", 0), ("u3", b"", 1),
                ("u4", b"<p>no structures</p>", 1)]
        df = spark.createDataFrame(rows, "url string, html binary, depth int")
        a, b = self._both(spark, df)
        ra = {r.url: r.asDict() for r in a.collect()}
        rb = {r.url: r.asDict() for r in b.collect()}
        assert ra == rb
        assert ra["u1"]["x"]["jsonld_count"] == 0
        assert ra["u0"]["_links"] == []

    def test_jvm_plan_has_no_python_stage(self, spark):
        from crawlspark.extract import extract_pages_jvm

        df = spark.createDataFrame([("u", b"<p></p>", 1)],
                                   "url string, html binary, depth int")
        plan = extract_pages_jvm(df)._jdf.queryExecution() \
            .executedPlan().toString()
        for marker in ("MapInArrow", "ArrowEvalPython", "BatchEvalPython",
                       "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan, marker
