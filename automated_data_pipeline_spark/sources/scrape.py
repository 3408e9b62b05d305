"""HTTP scrape source (SURVEY.md §2.1 S8) — driver-side helper, not a
Catalyst source.

Reference behavior (python_code/scraper/server.js:19-31,
python_code/scraper/scraper.js:7-37): POST {url, selectors,
clickSelector} -> headless Chromium -> per-selector innerText; a
selector may yield a scalar, an array (multi-match), or null.

This container has no browser and no network; the fetch layer is
pluggable (``fetcher``) with the Playwright variant gated behind an
import-try. The Spark-facing contract — result rows to a typed
DataFrame with scalar+array selector results — is real and tested via
an injected fake fetcher.
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
