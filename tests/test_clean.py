"""Byte-level tests for the cleaner (reference cleaner.go semantics)."""

from crawlspark.clean import clean_html, clean_to_text, go_escape, strip_all, unescape_html


class TestCleanToText:
    def test_strips_tags(self):
        assert clean_to_text("<p>Hello <b>world</b></p>") == "Hello world"

    def test_escapes_remaining_text(self):
        # bluemonday StrictPolicy HTML-escapes text tokens (SURVEY §2.6 C2)
        assert clean_to_text("A & B") == "A &amp; B"
        assert clean_to_text("a < b > c") == "a &lt; b &gt; c"
        assert clean_to_text("say \"hi\" y'all") == "say &#34;hi&#34; y&#39;all"

    def test_entity_roundtrip(self):
        # input entity &amp; -> parser unescapes to & -> output re-escapes
        assert clean_to_text("x &amp; y") == "x &amp; y"
        assert clean_to_text("&quot;q&quot;") == "&#34;q&#34;"

    def test_script_style_content_dropped(self):
        assert clean_to_text("a<script>var x=1;</script>b") == "ab"
        assert clean_to_text("a<style>.c{}</style>b") == "ab"

    def test_newline_squash_single_pass(self):
        # Go strings.ReplaceAll("\n\n\n","\n\n") is one non-overlapping
        # left-to-right pass: 4 newlines -> 3, not 2 (cleaner.go:50)
        assert clean_to_text("a\n\n\nb") == "a\n\nb"
        assert clean_to_text("a\n\n\n\n\n\nb") == "a\n\n\n\nb"
        four = "a" + "\n" * 4 + "b"
        assert clean_to_text(four) == "a\n\n\nb"

    def test_trimspace(self):
        assert clean_to_text("  <p> x </p>  ") == "x"

    def test_empty_and_none(self):
        assert clean_to_text("") == ""
        assert clean_to_text(None) == ""

    def test_comments_dropped(self):
        assert clean_to_text("a<!-- hidden -->b") == "ab"

    def test_vietnamese_preserved(self):
        assert clean_to_text("<p>Kinh nghiệm: Hơn 5 năm</p>") == "Kinh nghiệm: Hơn 5 năm"


class TestCleanHtmlAllowlist:
    def test_keeps_allowed_tags(self):
        assert clean_html("<p>a<b>c</b></p>") == "<p>a<b>c</b></p>"
        assert clean_html("<ul><li>x</li></ul>") == "<ul><li>x</li></ul>"

    def test_strips_disallowed_keeps_text(self):
        assert clean_html("<table><tr><td>x</td></tr></table>") == "x"
        assert clean_html("<nav>menu</nav>") == "menu"

    def test_strips_attributes(self):
        assert clean_html('<p class="x" onclick="evil()">a</p>') == "<p>a</p>"
        assert clean_html('<h1 onclick="evil()">t</h1>') == "<h1>t</h1>"

    def test_a_href_schemes(self):
        assert clean_html('<a href="https://x.vn/p">l</a>') == '<a href="https://x.vn/p">l</a>'
        assert clean_html('<a href="mailto:a@b.c">m</a>') == '<a href="mailto:a@b.c">m</a>'
        assert clean_html('<a href="/rel">r</a>') == '<a href="/rel">r</a>'
        # javascript: rejected -> bluemonday drops the whole element
        # (a is allowed only via AllowAttrs("href"), cleaner.go:26-29);
        # inner text survives, the tags do not
        assert clean_html('<a href="javascript:evil()">j</a>') == "j"
        assert clean_html("<a>no href</a>") == "no href"
        assert clean_html('<p><a href="javascript:x">j</a>k</p>') == "<p>jk</p>"

    def test_script_content_gone(self):
        assert clean_html("<div>a<script>x()</script>b</div>") == "<div>ab</div>"

    def test_br_selfclosing(self):
        assert clean_html("x<br/>y") == "x<br/>y"


class TestGoEscape:
    def test_table(self):
        assert go_escape("&'<>\"") == "&amp;&#39;&lt;&gt;&#34;"


class TestUnescape:
    def test_named_and_numeric(self):
        assert unescape_html("x &amp; y") == "x & y"
        assert unescape_html("&#x1EA1;") == "ạ"
        assert unescape_html("&quot;") == '"'
        assert unescape_html(None) == ""


class TestStripAll:
    def test_mixed(self):
        src = '<h1 onclick="e()">T</h1><script>s</script><p>a &amp; b</p>'
        assert strip_all(src) == "Ta &amp; b"


def test_udfs_match_oracle(spark):
    """Spark pUDF output must be byte-identical to the pure oracle."""
    import pandas as pd
    from crawlspark.clean import udfs

    clean_html_udf, clean_to_text_udf, unescape_udf = udfs()
    samples = [
        "<p>Hello &amp; <b>world</b></p>\n\n\n<ul><li>x</li></ul>",
        "a<script>bad()</script>b",
        'Kinh nghiệm &#x1EA1; <a href="javascript:x">l</a>',
        "",
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": samples}))
    got = df.select(clean_to_text_udf("s").alias("t"),
                    clean_html_udf("s").alias("c"),
                    unescape_udf("s").alias("u")).collect()
    for row, s in zip(got, samples):
        assert row["t"] == clean_to_text(s)
        assert row["c"] == clean_html(s)
        assert row["u"] == unescape_html(s)
