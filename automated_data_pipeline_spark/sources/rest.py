"""REST and SOAP ingestion sources (reference design targets:
python_code/projectplan.md source-type diagram lists SOAP, REST,
headless Chrome, SQL Server, CSV, JSON; only the last four are
implemented in the reference — these two complete the set).

Driver-side helpers, like the scrape source (S8): fetch happens on the
driver (or via a distributed fetch for URL lists), rows land as a
DataFrame and flow through the same 4-stage pipeline. Transports are
injectable — this container has no network, so tests inject fakes; the
urllib-based default is gated behind the call, not an import.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CANONICAL_INPUT_COLUMNS
from ..plans.empty import empty_local_frame

REQUEST_TIMEOUT_S = 30

_RESOLVED_SCHEMA = (
    ", ".join(f"{c} string" for c in CANONICAL_INPUT_COLUMNS) + ", raw_payload string"
)


def _records_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Per-row case-insensitive resolution onto the canonical input
    schema (the reference resolves per row: pull.js:30-33
    ``row.OrderId || row.orderId``), with raw-payload retention.
    Driver-side by construction — REST/SOAP payloads are driver-sized;
    use ``rest_json_source_distributed`` for URL fan-out."""
    rows = []
    for rec in records:
        lookup: dict[str, object] = {}
        for k, v in rec.items():
            lk = k.strip().lower()
            # first NON-NULL variant wins (pull.js:30-33 `row.OrderId ||
            # row.orderId` — a null first variant must not shadow a
            # populated later one; files.py COALESCEs identically)
            if lookup.get(lk) is None:
                lookup[lk] = v
        rows.append(
            tuple(
                None if lookup.get(c.lower()) is None else str(lookup[c.lower()])
                for c in CANONICAL_INPUT_COLUMNS
            )
            + (json.dumps(rec),)
        )
    return spark.createDataFrame(rows, _RESOLVED_SCHEMA)


def http_get(url: str, headers: dict[str, str] | None = None) -> str:
    """Default GET transport (urllib). Tests inject fakes instead."""
    from urllib.request import Request, urlopen

    req = Request(url, headers=headers or {})
    with urlopen(req, timeout=REQUEST_TIMEOUT_S) as resp:  # pragma: no cover
        return resp.read().decode("utf-8")


def http_post(
    url: str, body: str, headers: dict[str, str] | None = None
) -> str:
    """Default POST transport (urllib) — exercised against a LIVE local
    HTTP server in tests/test_rest_soap.py (same treatment the scraper
    and the HTTP API got); external hosts simply fail with the normal
    urllib error in an offline container."""
    from urllib.request import Request, urlopen

    req = Request(
        url, data=body.encode("utf-8"), headers=headers or {}, method="POST"
    )
    with urlopen(req, timeout=REQUEST_TIMEOUT_S) as resp:
        return resp.read().decode("utf-8")


def soap_transport(soap_action: str = "") -> Callable[[str, str], str]:
    """SOAP 1.1 transport: POST the envelope as text/xml with the
    SOAPAction header (the wire format projectplan.md's SOAP source
    implies). Returns a (url, envelope) -> response-body callable."""

    def post(url: str, envelope: str) -> str:
        return http_post(
            url,
            envelope,
            headers={
                "Content-Type": "text/xml; charset=utf-8",
                "SOAPAction": f'"{soap_action}"',
            },
        )

    return post


def rest_json_source(
    spark: SparkSession,
    url: str,
    record_path: list[str] | None = None,
    transport: Callable[[str], str] | None = None,
) -> DataFrame:
    """GET a JSON endpoint; the payload (optionally descended through
    ``record_path`` keys) must be a record or list of records. Rows are
    resolved onto the canonical order-input schema (case-insensitive,
    like the file sources) with raw-payload retention."""
    transport = transport or http_get
    payload = json.loads(transport(url))
    for key in record_path or []:
        payload = payload[key]
    records = payload if isinstance(payload, list) else [payload]
    return _records_to_df(spark, records)


def rest_json_source_distributed(
    spark: SparkSession,
    urls: list[str],
    transport_name: str = "automated_data_pipeline_spark.sources.rest.http_get",
) -> DataFrame:
    """Fan a URL list across the cluster: one fetch task per URL via
    mapInPandas (executor-side I/O — the 100 TB-scale variant of
    ``rest_json_source`` for crawl-style workloads). The transport is
    named (module:attr) rather than closed-over so nothing driver-local
    ships to executors.

    Per-URL errors are CAPTURED into the ``error`` column (body NULL),
    never raised: on a 10k-URL crawl one dead endpoint must not fail
    the task, trigger 4 whole-partition retries (re-fetching every
    healthy URL alongside it), and then throw away every body already
    fetched. Filter ``error IS NULL`` for the successes."""
    import importlib

    import pandas as pd

    if not urls:
        return empty_local_frame(spark, "url string, body string, error string")

    def fetch(batches):
        mod, _, attr = transport_name.rpartition(".")
        fn = getattr(importlib.import_module(mod), attr)
        for pdf in batches:
            bodies, errors = [], []
            for u in pdf["url"]:
                try:
                    bodies.append(fn(u))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — per-URL capture
                    bodies.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"url": pdf["url"], "body": bodies, "error": errors}
            )

    url_df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(
        min(len(urls), spark.sparkContext.defaultParallelism)
    )
    return url_df.mapInPandas(
        fetch, schema="url string, body string, error string"
    )


def soap_orders_source(
    spark: SparkSession,
    url: str,
    envelope: str,
    record_tag: str = "Order",
    transport: Callable[[str, str], str] | None = None,
) -> DataFrame:
    """POST a SOAP envelope and flatten ``record_tag`` elements of the
    response body into rows (child element name -> column). Namespace
    prefixes are stripped; columns resolve case-insensitively onto the
    canonical schema like every other source.

    The default transport is the real urllib SOAP POST
    (``soap_transport()``) — live-tested against a local stdlib HTTP
    server; tests may still inject fakes for wire-free unit cases."""
    if transport is None:
        transport = soap_transport()
    body = transport(url, envelope)
    root = ET.fromstring(body)
    records = []
    for el in root.iter():
        if el.tag.rpartition("}")[2] == record_tag:
            rec = {
                child.tag.rpartition("}")[2]: (child.text or "")
                for child in el
            }
            records.append(rec)
    return _records_to_df(spark, records)
