"""CSS-selector extraction engine (E4-E6, E9) tests."""

import json

from pyspark.sql import functions as F

from crawlspark.cssx import (absolutize, css_fields_udf, extract_css_fields,
                             extract_next_data, node_html, node_text,
                             parse_html, select)

HTML = """
<html><body>
 <nav><a href="/">home</a></nav>
 <h2 class="title sub">Fallback Title</h2>
 <div class="job-detail">
   <h1 class="title">Kỹ sư Phần mềm</h1>
   <div class="company-name"> ACME &amp; Co </div>
   <div class="desc"><p>Mô tả <b>đậm</b></p><ul><li>x</li></ul></div>
   <span class="job-tag">Thưởng</span>
   <span class="job-tag">Du lịch</span>
   <span class="job-tag"></span>
   <a class="apply" href="/ung-tuyen/123">Ứng tuyển</a>
 </div>
 <script id="__NEXT_DATA__" type="application/json">{"props": {"jobId": 9}}</script>
</body></html>
"""


class TestSelect:
    def test_tag_class_id(self):
        root = parse_html(HTML)
        assert node_text(select(root, "h1.title")[0]) == "Kỹ sư Phần mềm"
        assert len(select(root, ".job-tag")) == 3
        assert select(root, "script#__NEXT_DATA__")

    def test_comma_fallback_document_order(self):
        # careerviet_extractor.go:94: Find("h1.title, h2.title").First()
        root = parse_html(HTML)
        nodes = select(root, "h2.title, h1.title")
        assert node_text(nodes[0]) == "Fallback Title"  # document order wins

    def test_descendant_chain(self):
        root = parse_html(HTML)
        nodes = select(root, "div.job-detail a.apply")
        assert nodes and nodes[0].attrs["href"] == "/ung-tuyen/123"
        assert select(root, "nav a.apply") == []

    def test_attr_selector(self):
        root = parse_html(HTML)
        assert select(root, "script[type='application/json']")


class TestFieldMap:
    FIELDS = {
        "title": {"selector": "h1.title, h2.title"},
        "company": {"selector": ".company-name"},
        "description": {"selector": "div.desc", "mode": "html"},
        "benefits": {"selector": ".job-tag", "mode": "text_all"},
        "apply_url": {"selector": "a.apply", "mode": "attr:href"},
        "missing": {"selector": ".nope"},
    }

    def test_extract(self):
        got = extract_css_fields(HTML, self.FIELDS)
        # document order: h2.title precedes h1.title here
        assert got["title"] == "Fallback Title"
        assert got["company"] == "ACME & Co"  # trimmed, entity-decoded
        assert got["description"] == "<p>Mô tả <b>đậm</b></p><ul><li>x</li></ul>"
        assert got["benefits"] == "Thưởng; Du lịch"  # empties dropped, joined
        assert got["apply_url"] == "/ung-tuyen/123"
        assert got["missing"] == ""

    def test_udf(self, spark):
        import pandas as pd
        df = spark.createDataFrame(pd.DataFrame({"h": [HTML, "", None]}))
        out = df.select(css_fields_udf(self.FIELDS)(F.col("h")).alias("m")).collect()
        assert out[0]["m"]["company"] == "ACME & Co"
        assert out[1]["m"]["title"] == ""
        assert out[2]["m"]["title"] == ""


class TestNextData:
    def test_payload(self):
        assert json.loads(extract_next_data(HTML)) == {"props": {"jobId": 9}}
        assert extract_next_data("<p>no next</p>") == ""


class TestAbsolutize:
    def test_cases(self):
        base = "https://x.vn/viec-lam/abc.html"
        assert absolutize("/p/1", base) == "https://x.vn/p/1"
        assert absolutize("rel.html", base) == "https://x.vn/viec-lam/rel.html"
        assert absolutize("https://y.vn/q", base) == "https://y.vn/q"
        assert absolutize(None, base) == ""
