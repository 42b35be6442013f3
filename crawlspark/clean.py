"""HTML cleaning with reference-identical semantics (the byte-identity op).

Re-expresses the reference cleaner (internal/common/cleaner/cleaner.go)
on Python stdlib:

- ``clean_html``      = Clean (cleaner.go:40-42): bluemonday allowlist
  policy — keep p/br/div/span/b/strong/em/i/u/ul/ol/li/h1-h6 and
  a[href] (http/https/mailto/relative only); drop every other tag but
  keep its inner text; drop <script>/<style> *content* entirely;
  re-escape text (Go html.EscapeString table).
- ``clean_to_text``   = CleanToText (cleaner.go:45-54): strip ALL tags
  (StrictPolicy), escape remaining text, one non-overlapping pass of
  "\\n\\n\\n" -> "\\n\\n" (Go strings.ReplaceAll ≡ Python str.replace),
  then strip.
- ``unescape_html``   = html.UnescapeString applied by the normalizer
  to the six text fields (normalizer.go:46-51). Python html.unescape
  implements the same full HTML5 named-entity table.

The pure-Python functions below are the *oracle*: fixture golden text
is generated with them at synth time and frozen into ``pages.text``;
the Spark pipeline runs the same logic inside vectorized pandas UDFs
and tests assert byte equality between pipeline output and the frozen
column (BASELINE.json per-row invariant).

Scale note: these are per-row Python inside Arrow-batched pandas UDFs —
the one place the engine pays the Python tax, amortized by
maxRecordsPerBatch-sized Arrow transfers and parallelized across
executors. There is no JVM-side equivalent of an HTML5 sanitizer.
"""

from __future__ import annotations

import html as _htmllib
from html.parser import HTMLParser

import pandas as pd

# Go html.EscapeString escapes exactly these five characters
# (the bluemonday output side re-escapes text tokens with it).
def go_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&#34;")
    )


_ALLOWED_TAGS = frozenset(
    [
        "p", "br", "div", "span",
        "strong", "b", "em", "i", "u",
        "ul", "ol", "li",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "a",
    ]
)
_SKIP_CONTENT_TAGS = frozenset(["script", "style"])
_VOID_TAGS = frozenset(["br", "hr", "img", "meta", "link", "input"])
_ALLOWED_SCHEMES = ("http://", "https://", "mailto:")


def _href_allowed(href: str) -> bool:
    h = href.strip()
    if not h:
        return False
    low = h.lower()
    if low.startswith(_ALLOWED_SCHEMES):
        return True
    # Relative URLs allowed (AllowRelativeURLs(true), cleaner.go:27);
    # any other scheme (javascript:, data:, ...) rejected.
    if ":" in h.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]:
        return False
    return True


class _SanitizeParser(HTMLParser):
    """Single-pass tag-allowlist sanitizer (strict=no tags kept)."""

    def __init__(self, strict: bool):
        super().__init__(convert_charrefs=True)
        self.strict = strict
        self.out: list[str] = []
        self._skip_depth = 0
        # bluemonday drops an element allowed only via attribute policy
        # (a[href]) once every attribute is rejected — only the inner
        # text survives. Count suppressed anchors so the matching
        # </a> is dropped too.
        self._a_suppressed = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1
            return
        if self.strict or self._skip_depth or tag not in _ALLOWED_TAGS:
            return
        if tag == "a":
            href = next((v for k, v in attrs if k == "href" and v is not None), None)
            if href is not None and _href_allowed(href):
                self.out.append(f'<a href="{go_escape(href)}">')
            else:
                self._a_suppressed += 1
        else:
            self.out.append(f"<{tag}>")

    def handle_startendtag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            return
        if self.strict or self._skip_depth or tag not in _ALLOWED_TAGS:
            return
        if tag == "a":
            href = next((v for k, v in attrs if k == "href" and v is not None), None)
            if href is not None and _href_allowed(href):
                self.out.append(f'<a href="{go_escape(href)}"/>')
            return  # attribute-less <a/> dropped (bluemonday parity)
        self.out.append(f"<{tag}/>")

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self.strict or self._skip_depth or tag not in _ALLOWED_TAGS:
            return
        if tag in _VOID_TAGS:
            return
        if tag == "a" and self._a_suppressed:
            self._a_suppressed -= 1
            return
        self.out.append(f"</{tag}>")

    def handle_data(self, data):
        if not self._skip_depth and data:
            self.out.append(go_escape(data))

    # comments/decl/pi dropped, matching bluemonday defaults
    def handle_comment(self, data):
        pass

    def handle_decl(self, data):
        pass

    def handle_pi(self, data):
        pass


def clean_html(src: str | None) -> str:
    """Allowlist sanitize (reference Clean, cleaner.go:40-42)."""
    if not src:
        return ""
    p = _SanitizeParser(strict=False)
    p.feed(src)
    p.close()
    return "".join(p.out)


def strip_all(src: str | None) -> str:
    """StrictPolicy sanitize: all tags removed, text escaped."""
    if not src:
        return ""
    p = _SanitizeParser(strict=True)
    p.feed(src)
    p.close()
    return "".join(p.out)


def clean_to_text(src: str | None) -> str:
    """Reference CleanToText (cleaner.go:45-54), byte-identical.

    strip tags -> escape text -> single non-overlapping pass of
    '\\n\\n\\n' -> '\\n\\n' -> TrimSpace.
    """
    text = strip_all(src)
    text = text.replace("\n\n\n", "\n\n")
    return text.strip()


def unescape_html(s: str | None) -> str:
    """html.UnescapeString equivalent (normalizer.go:46-51)."""
    if not s:
        return ""
    return _htmllib.unescape(s)


# ---------------------------------------------------------------------------
# Spark pandas-UDF wrappers (lazy import so the oracle side has no
# Spark dependency)
# ---------------------------------------------------------------------------
def _register_udfs():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def clean_html_udf(s: pd.Series) -> pd.Series:
        return s.map(clean_html, na_action="ignore").fillna("")

    @pandas_udf("string")
    def clean_to_text_udf(s: pd.Series) -> pd.Series:
        return s.map(clean_to_text, na_action="ignore").fillna("")

    @pandas_udf("string")
    def unescape_html_udf(s: pd.Series) -> pd.Series:
        return s.map(unescape_html, na_action="ignore").fillna("")

    return clean_html_udf, clean_to_text_udf, unescape_html_udf


_udfs = None


def udfs():
    """Return (clean_html_udf, clean_to_text_udf, unescape_html_udf)."""
    global _udfs
    if _udfs is None:
        _udfs = _register_udfs()
    return _udfs
