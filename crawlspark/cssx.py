"""Generic CSS-selector field extraction (SURVEY §2.4 E4-E6, E9) on
stdlib only (no lxml in this sandbox).

Re-expresses the reference's configurable selector-map scrape:
- per-field ChildText(selector), description/requirements/benefits as
  inner HTML (colly_extractor.go:97-144)
- multi-selector fallbacks 'h1.title, h2.title' = union in document
  order, first match wins; repeated-element accumulation (.job-tag ->
  array) (careerviet_extractor.go:91-148)
- script#__NEXT_DATA__ payload grab (colly_extractor.go:83-94)
- absolute-URL resolution (colly_extractor.go:176-180)

Selector grammar supported (all the reference uses): tag, .class,
#id, tag.class, tag#id, [attr='val'] suffixes, descendant chains
('div.info span'), comma alternatives. Matching is case-insensitive
on tags, exact on classes/ids.

The pure functions are the oracle; ``css_fields_udf`` wraps them as a
vectorized pandas UDF returning a map column.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text_parts")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self.text_parts: list[str] = []

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())


_VOID = frozenset(["br", "hr", "img", "meta", "link", "input", "area",
                   "base", "col", "embed", "source", "track", "wbr"])
_RAWTEXT = frozenset(["script", "style"])


class _TreeParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close up to the nearest matching open tag (tolerates mis-nesting)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.children.append(data)


def parse_html(src: str | None) -> Node:
    p = _TreeParser()
    p.feed(src or "")
    p.close()
    return p.root


_SEL_RE = re.compile(
    r"^([a-zA-Z][\w-]*)?((?:[.#][\w-]+)*)((?:\[[\w-]+='[^']*'\])*)$")


def _parse_simple(sel: str):
    m = _SEL_RE.match(sel)
    if not m:
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = (m.group(1) or "").lower() or None
    classes, node_id = set(), None
    for part in re.findall(r"[.#][\w-]+", m.group(2) or ""):
        if part[0] == ".":
            classes.add(part[1:])
        else:
            node_id = part[1:]
    attrs = dict(re.findall(r"\[([\w-]+)='([^']*)'\]", m.group(3) or ""))
    return tag, classes, node_id, attrs


def _matches(n: Node, simple) -> bool:
    tag, classes, node_id, attrs = simple
    if tag and n.tag != tag:
        return False
    if classes and not classes <= n.classes:
        return False
    if node_id and n.attrs.get("id") != node_id:
        return False
    for k, v in attrs.items():
        if n.attrs.get(k) != v:
            return False
    return True


def _walk(n: Node):
    for c in n.children:
        if isinstance(c, Node):
            yield c
            yield from _walk(c)


def select(root: Node, selector: str) -> list[Node]:
    """Comma alternatives unioned in document order (goquery semantics)."""
    out, seen = [], set()
    alternatives = [s.strip() for s in selector.split(",") if s.strip()]
    order = {id(n): i for i, n in enumerate(_walk(root))}
    for alt in alternatives:
        chain = [_parse_simple(p) for p in alt.split()]
        for n in _walk(root):
            if not _matches(n, chain[-1]):
                continue
            # verify ancestor chain (descendant combinator)
            a, ok = n.parent, True
            for anc_sel in reversed(chain[:-1]):
                while a is not None and not _matches(a, anc_sel):
                    a = a.parent
                if a is None:
                    ok = False
                    break
                a = a.parent
            if ok and id(n) not in seen:
                seen.add(id(n))
                out.append(n)
    out.sort(key=lambda n: order[id(n)])
    return out


def node_text(n: Node) -> str:
    """All descendant text (script/style content excluded), like
    goquery .Text()."""
    parts = []

    def rec(x: Node):
        if x.tag in _RAWTEXT:
            return
        for c in x.children:
            if isinstance(c, Node):
                rec(c)
            else:
                parts.append(c)

    rec(n)
    return "".join(parts)


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))


def node_html(n: Node) -> str:
    """Serialized inner HTML (the reference keeps inner HTML for
    description/requirements/benefits, colly_extractor.go:118-127)."""
    parts = []

    def rec(x):
        if isinstance(x, str):
            parts.append(_esc(x))
            return
        attrs = "".join(f' {k}="{v}"' for k, v in x.attrs.items() if v is not None)
        if x.tag in _VOID:
            parts.append(f"<{x.tag}{attrs}/>")
            return
        parts.append(f"<{x.tag}{attrs}>")
        for c in x.children:
            rec(c)
        parts.append(f"</{x.tag}>")

    for c in n.children:
        rec(c)
    return "".join(parts)


def extract_css_fields(html: str | None, field_map: dict[str, dict]) -> dict:
    """E4/E6: one DOM parse, many fields out.

    field_map: name -> {"selector": str, "mode": "text" (default,
    first match, trimmed) | "html" (inner HTML of first match) |
    "text_all" (repeated elements joined by '; ', careerviet
    benefits accumulation) | "attr:<name>" (attribute of first match)}.
    Missing match -> '' (reference ChildText semantics).
    """
    root = parse_html(html)
    out = {}
    for name, spec in field_map.items():
        nodes = select(root, spec["selector"])
        mode = spec.get("mode", "text")
        if not nodes:
            out[name] = ""
        elif mode == "text":
            out[name] = node_text(nodes[0]).strip()
        elif mode == "html":
            out[name] = node_html(nodes[0])
        elif mode == "text_all":
            out[name] = "; ".join(t for t in (node_text(x).strip() for x in nodes) if t)
        elif mode.startswith("attr:"):
            out[name] = nodes[0].attrs.get(mode[5:], "") or ""
        else:
            raise ValueError(f"unknown mode {mode!r}")
    return out


def extract_next_data(html: str | None) -> str:
    """E5: the Next.js __NEXT_DATA__ JSON payload (raw text)."""
    root = parse_html(html)
    nodes = select(root, "script#__NEXT_DATA__")
    if not nodes:
        return ""
    parts = [c for c in nodes[0].children if isinstance(c, str)]
    return "".join(parts).strip()


def absolutize(href: str | None, base_url: str) -> str:
    """E9 (colly_extractor.go:176-180): resolve relative hrefs."""
    if not href:
        return ""
    if href.startswith(("http://", "https://")):
        return href
    return urljoin(base_url, href)


def css_fields_udf(field_map: dict[str, dict]):
    """Vectorized pandas UDF: html -> map<string,string> of fields."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("map<string,string>")
    def run(html: pd.Series) -> pd.Series:
        return pd.Series([extract_css_fields(h, field_map) for h in html])

    return run
