"""HTTP scrape source (SURVEY.md §2.1 S8) — driver-side helper, not a
Catalyst source.

Reference behavior (python_code/scraper/server.js:19-31,
python_code/scraper/scraper.js:7-37): POST {url, selectors,
clickSelector} -> headless Chromium -> per-selector innerText; a
selector may yield a scalar, an array (multi-match), or null.

Fetch layers, most-capable first:
- ``playwright_fetcher`` — full JS rendering + click support; gated
  behind an import-try (no browser in this container).
- ``urllib_fetcher`` — REAL in-container path: stdlib HTTP fetch +
  a minimal CSS-selector engine over ``html.parser`` covering the
  selector subset static pages need (``tag``, ``.class``, ``#id``,
  compounds like ``div.row``, and descendant chains ``table td``).
  No JS execution and no clicks — ``click_selector`` raises, steering
  those scrapes to the Playwright layer. Exercised end-to-end against
  a live local HTTP server in tests/test_rest_soap.py.
- any injected ``fetcher`` callable (tests, custom transports).

The Spark-facing contract — result rows to a typed DataFrame with
scalar+array selector results — is shared by all three.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCRAPE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("selector", T.StringType(), False),
        T.StructField("values", T.ArrayType(T.StringType()), True),  # null = no match
    ]
)

NAV_TIMEOUT_MS = 30_000  # scraper.js:12
CLICK_TIMEOUT_MS = 5_000  # scraper.js:14


def playwright_fetcher(url: str, selectors: dict[str, str], click_selector: str | None = None):
    """Real fetcher (requires playwright — absent in this container)."""
    try:
        from playwright.sync_api import sync_playwright  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "scrape source needs playwright; inject a fetcher for tests"
        ) from exc
    with sync_playwright() as p:  # pragma: no cover - no browser in image
        browser = p.chromium.launch()
        page = browser.new_page()
        page.goto(url, timeout=NAV_TIMEOUT_MS)
        if click_selector:
            page.click(click_selector, timeout=CLICK_TIMEOUT_MS)
        out = {}
        for name, css in selectors.items():
            els = page.query_selector_all(css)
            out[name] = [e.inner_text() for e in els] if els else None
        browser.close()
        return out


class _Node:
    __slots__ = ("tag", "attrs", "content")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        # document-ordered mix of text chunks (str) and child _Nodes —
        # innerText must interleave them in source order
        self.content: list = []

    @property
    def children(self) -> "list[_Node]":
        return [c for c in self.content if isinstance(c, _Node)]

    def inner_text(self) -> str:
        parts = []
        for c in self.content:
            t = c if isinstance(c, str) else c.inner_text()
            if t and t.strip():
                parts.append(t.strip())
        return " ".join(parts)


_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# HTML5 implicit end tags (the subset real pages rely on): starting
# tag X auto-closes an OPEN element whose tag is in the set. Without
# this, '<ul><li>a<li>b</ul>' nests li2 INSIDE li1 (html.parser emits
# no implicit end events) and innerText concatenates siblings —
# diverging from the Chromium contract playwright_fetcher meets.
_P_CLOSERS = {"p"}
_IMPLICIT_CLOSERS = {
    "li": {"li"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
    "tr": {"td", "th", "tr"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"td", "th", "tr"},
    "tbody": {"td", "th", "tr", "thead"},
    "tfoot": {"td", "th", "tr", "tbody"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "p": _P_CLOSERS,
    # block-level elements close an open <p>
    **{t: _P_CLOSERS for t in (
        "address", "article", "aside", "blockquote", "div", "dl",
        "fieldset", "footer", "form", "h1", "h2", "h3", "h4", "h5",
        "h6", "header", "hr", "main", "nav", "ol", "pre", "section",
        "table", "ul",
    )},
}


def _parse_html(html: str) -> _Node:
    """Parse into a simple element tree (stdlib html.parser)."""
    from html.parser import HTMLParser

    root = _Node("#root", {})

    class P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.stack = [root]

        def handle_starttag(self, tag, attrs):
            closers = _IMPLICIT_CLOSERS.get(tag)
            if closers:
                # pop nearest-first: '<tr>' inside an open td pops the
                # td then the tr; '<li>' inside a NESTED '<ul>' stops
                # at the ul (not in the set), preserving the nesting
                while len(self.stack) > 1 and self.stack[-1].tag in closers:
                    self.stack.pop()
            node = _Node(tag, attrs)
            self.stack[-1].content.append(node)
            if tag not in _VOID_TAGS:
                self.stack.append(node)

        def handle_endtag(self, tag):
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == tag:
                    del self.stack[i:]
                    break

        def handle_data(self, data):
            # <script>/<style> bodies are code, not innerText —
            # Chromium's innerText (the contract playwright_fetcher
            # meets) excludes them
            for node in self.stack:
                if node.tag in ("script", "style"):
                    return
            self.stack[-1].content.append(data)

    p = P()
    p.feed(html)
    return root


def _match_simple(node: _Node, token: str) -> bool:
    """tag / .class / #id and compounds (div.row#x)."""
    import re

    m = re.fullmatch(r"([a-zA-Z][\w-]*|\*)?((?:[.#][\w-]+)*)", token)
    if not m:
        return False
    tag, quals = m.group(1), m.group(2)
    if tag and tag != "*" and node.tag != tag.lower():
        return False
    classes = set((node.attrs.get("class") or "").split())
    for q in re.findall(r"[.#][\w-]+", quals or ""):
        if q[0] == "." and q[1:] not in classes:
            return False
        if q[0] == "#" and node.attrs.get("id") != q[1:]:
            return False
    return True


def select_all(root: _Node, selector: str) -> list[_Node]:
    """Descendant-combinator CSS subset, document order."""
    tokens = selector.split()
    if not tokens:
        return []

    out = []

    def walk(node: _Node, depth: int):
        d = depth
        if d < len(tokens) and _match_simple(node, tokens[d]):
            d += 1
        if d == len(tokens):
            out.append(node)
            d = depth  # a match's descendants restart at this depth
        for c in node.children:
            walk(c, d)

    for c in root.children:
        walk(c, 0)
    return out


def urllib_fetcher(
    url: str,
    selectors: dict[str, str],
    click_selector: str | None = None,
    timeout_s: float = NAV_TIMEOUT_MS / 1000,
):
    """Static-page fetcher: stdlib HTTP GET + CSS-subset selection.
    innerText per matched element, None for no-match — the same
    string|array|null union the Chromium fetcher produces. Clicks need
    a browser; raise instead of silently skipping the interaction."""
    if click_selector:
        raise NotImplementedError(
            "click_selector needs a JS-capable fetcher (playwright_fetcher)"
        )
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        html = resp.read().decode("utf-8", errors="replace")
    root = _parse_html(html)
    out = {}
    for name, css in selectors.items():
        els = select_all(root, css)
        out[name] = [e.inner_text() for e in els] if els else None
    return out


def scrape_to_df(
    spark: SparkSession,
    url: str,
    selectors: dict[str, str],
    click_selector: str | None = None,
    fetcher: Callable[..., dict] | None = None,
) -> DataFrame:
    """Run one scrape and land the per-selector results as a DataFrame.
    Scalars become 1-element arrays; no-match stays NULL (the reference's
    string|array|null union, normalized to array|null)."""
    fetcher = fetcher or playwright_fetcher
    result = fetcher(url, selectors, click_selector)
    rows = []
    for name in selectors:
        v = result.get(name)
        if v is None:
            values = None
        elif isinstance(v, str):
            values = [v]
        else:
            values = [str(x) for x in v]
        rows.append((url, name, values))
    return spark.createDataFrame(rows, SCRAPE_SCHEMA)
