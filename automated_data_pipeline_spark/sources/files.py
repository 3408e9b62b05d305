"""File scan sources (SURVEY.md §2.1 S1–S3).

Semantics mirrored from the reference:
- CSV: header row, case-insensitive column match with camelCase fallback,
  unknown columns dropped, missing columns NULL, empty lines skipped
  (python_code/orchestrator/steps/pull.js:24-37; quote-aware parsing
  java_code/.../steps/PullStep.java:116-130 — Spark's CSV reader is
  RFC-4180 quote-aware already).
- JSON: a file holding an array of objects, or a single object treated as
  a 1-row array (pull.js:38-52); each row retains the full original
  record re-serialized as a JSON string (`raw_payload`, pull.js:50).

Scale notes: reads are schema-explicit (no inferSchema job), PERMISSIVE
mode, and stay entirely declarative so Catalyst prunes/pushes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CANONICAL_INPUT_COLUMNS


def _canonical_name(col: str) -> str | None:
    """Case-insensitive resolution onto the canonical input schema
    (pull.js:30-33 `row.OrderId || row.orderId`)."""
    lowered = {c.lower(): c for c in CANONICAL_INPUT_COLUMNS}
    return lowered.get(col.strip().lower())


def resolve_input_columns(df: DataFrame) -> DataFrame:
    """Project any raw input frame onto (OrderId, CustomerId, Amount,
    OrderDate, raw_payload) as strings: case-insensitive match, unknown
    columns dropped, missing columns NULL. First match wins on
    duplicates. ``raw_payload`` passes through when present (JSON path),
    else is NULL (CSV path, matching the reference's NULL RawPayload)."""
    exprs = _resolved_exprs(df)
    if "raw_payload" in df.columns:
        exprs.append(F.col("raw_payload"))
    else:
        exprs.append(F.lit(None).cast("string").alias("raw_payload"))
    return df.select(*exprs)


def read_orders_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: CSV scan. All columns as strings (landing is stringly-typed);
    typing happens in Extract. raw_payload stays NULL for CSV, matching
    the reference (pull.js keeps RawPayload only for JSON)."""
    raw = spark.read.options(header=True, mode="PERMISSIVE").csv(path)
    return resolve_input_columns(raw)


def _resolved_exprs(df: DataFrame):
    """Per-row case fallback like the reference (pull.js:30-33
    ``row.OrderId || row.orderId``): when several case-variant columns
    exist (a JSON file mixing camelCase and PascalCase records yields
    one column per variant), COALESCE them in column order rather than
    dropping all but the first."""
    mapping: dict[str, list[str]] = {}
    for c in df.columns:
        if c == "raw_payload":
            continue
        canon = _canonical_name(c)
        if canon is not None:
            mapping.setdefault(canon, []).append(c)
    exprs = []
    for canon in CANONICAL_INPUT_COLUMNS:
        if canon in mapping:
            variants = [F.col(f"`{c}`").cast("string") for c in mapping[canon]]
            exprs.append(F.coalesce(*variants).alias(canon))
        else:
            exprs.append(F.lit(None).cast("string").alias(canon))
    return exprs


def _first_nonblank_line(spark: SparkSession | None, path: str) -> str | None:
    """First non-blank line of a JSON input. Local plain files use a
    direct read (no job); anything the local filesystem can't see —
    object-store URIs, globs, compressed part files — falls back to
    ONE tiny Spark text job (limit-pruned), so the sniff works on
    every path the reader itself accepts instead of silently guessing.
    """
    target = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".json") and not f.startswith((".", "_"))
        )
        target = os.path.join(path, parts[0]) if parts else None
    # compressed files MUST take the Spark sniff: a direct read would
    # return the compression magic bytes as the "first line", fail to
    # parse, and misclassify gzipped JSONL as multiline (silently
    # keeping one record per file); spark.read.text decompresses
    if target is not None and target.lower().endswith(
        (".gz", ".bz2", ".zst", ".xz", ".deflate", ".lz4", ".snappy")
    ):
        target = None
        if spark is None:
            return None
    if target is not None and os.path.isfile(target):
        try:
            with open(target, "rb") as f:
                for line in f:
                    if line.strip():
                        return line.strip().decode("utf-8", "replace")
                return None
        except OSError:
            pass  # fall through to the Spark sniff
    if spark is None:
        return None
    for r in spark.read.text(path).limit(50).collect():
        v = (r["value"] or "").strip()
        if v:
            return v
    return None


def _json_is_multiline(path: str, spark: SparkSession | None = None) -> bool:
    """Sniff whether a JSON input is a whole-file document (array of
    objects / pretty-printed object -> Spark multiLine mode) or
    line-delimited JSONL (Spark's own JSON writer emits JSONL; reading
    THAT with multiLine=True silently keeps only the FIRST record per
    file — no corrupt-record marker, just data loss). Decision: first
    non-blank line parses as a complete JSON value => JSONL."""
    import json as _json

    first_line = _first_nonblank_line(spark, path)
    if first_line is None:
        return True
    if first_line.startswith("["):
        return True  # array document (even a one-line one)
    try:
        _json.loads(first_line)
        return False  # one complete object per line -> JSONL
    except ValueError:
        return True  # object spans lines -> whole-file document


def read_orders_json(spark: SparkSession, path: str) -> DataFrame:
    """S2+S3: JSON scan (array-of-objects or single object -> 1 row,
    plus line-delimited JSONL — auto-sniffed, including non-local /
    glob / compressed paths via a Spark-side sniff) with raw-payload
    retention (`raw_payload` = the original record re-serialized,
    pull.js:50)."""
    reader = spark.read
    if _json_is_multiline(path, spark):
        reader = reader.option("multiLine", True)
    raw = reader.json(path)
    with_payload = raw.withColumn("raw_payload", F.to_json(F.struct(*raw.columns)))
    return resolve_input_columns(with_payload)


def read_orders_columnar(
    spark: SparkSession, path: str, fmt: str
) -> DataFrame:
    """Columnar scan (parquet/orc) onto the same stringly landing
    contract as S1/S2: case-insensitive resolution, unknown columns
    dropped, values cast to string (typing happens in Extract, keeping
    the single coercion point). Beyond-reference source: the reference
    whitelist is .csv/.json (api/server.js:23-31), but a Spark-native
    pipeline's upstream is routinely parquet/orc — both readers are
    built-in, splittable, and pushdown/pruning-capable."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    raw = spark.read.format(fmt).load(path)
    return resolve_input_columns(raw)


def read_binary_assets(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Multimodal asset ingest via the binaryFile source: one row per
    file with (path, modification_time, length, content) where content
    is the opaque binary payload (feeds operators/multimodal). The
    reader never decodes — decode happens in Arrow-batched mapInPandas
    downstream. ``pattern`` is a glob over file names (e.g. '*.png').

    Scale: binaryFile is splittable across files (not within a file);
    millions of small assets parallelize naturally, single giant files
    do not — pack those upstream (tar/parquet BLOB) instead."""
    r = spark.read.format("binaryFile")
    if pattern:
        r = r.option("pathGlobFilter", pattern)
    df = r.load(path)
    return df.select(
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("length"),
        F.col("content"),
    )


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Raw-text corpus scan: line-per-row (default) or file-per-row
    (``whole_files`` — one document per file, path retained as doc
    identity). The ingest shape for the documents-table operators."""
    df = spark.read.text(path, wholetext=whole_files).withColumn(
        "path", F.input_file_name()
    )
    return df.select("path", F.col("value").alias("text"))


_COLUMNAR_EXTS = {".parquet": "PARQUET", ".orc": "ORC"}


def read_orders_file(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """Dispatch on extension like the reference trigger endpoint
    (python_code/api/server.js:23-31 whitelist .csv/.json, which the
    HTTP upload path keeps verbatim; parquet/orc are the beyond-
    reference columnar additions for Spark-native upstreams). A
    directory (e.g. a Spark-written dataset of part files) dispatches
    on the extension of the data files inside. Returns
    (frame, source_type). Compression suffixes are transparent: a
    '.json.gz' / '.csv.bz2' part dispatches on the inner extension
    (Spark's text-based readers decompress these natively)."""

    def _data_ext(name: str) -> str:
        base = name.lower()
        for comp in (".gz", ".bz2", ".zst", ".snappy", ".deflate", ".lz4"):
            if base.endswith(comp):
                base = base[: -len(comp)]
                break
        return os.path.splitext(base)[1]

    lower = _data_ext(path) or path.lower()
    if os.path.isdir(path):
        exts = {
            _data_ext(f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        }
        data_exts = exts & ({".csv", ".json"} | set(_COLUMNAR_EXTS))
        if len(data_exts) == 1:
            lower = data_exts.pop()
        else:
            raise ValueError(
                f"cannot infer source type for directory {path}: "
                f"found extensions {sorted(exts)} (need exactly one of "
                f".csv/.json/.parquet/.orc)"
            )
    if lower.endswith(".json"):
        return read_orders_json(spark, path), "JSON"
    if lower.endswith(".csv"):
        return read_orders_csv(spark, path), "CSV"
    for ext, source_type in _COLUMNAR_EXTS.items():
        if lower.endswith(ext):
            return (
                read_orders_columnar(spark, path, ext.lstrip(".")),
                source_type,
            )
    raise ValueError(
        f"unsupported source file type: {path} (.csv/.json/.parquet/.orc only)"
    )
