"""Beyond-reference file sources: columnar (parquet/orc) orders ingest
onto the stringly landing contract, binaryFile multimodal asset ingest,
and raw-text corpus scan. The reference whitelist (.csv/.json,
python_code/api/server.js:23-31) stays pinned by the HTTP upload tests;
these cover the Spark-native upstream formats."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from automated_data_pipeline_spark.sources import files


def _orders_rows():
    return [
        Row(OrderId="ORD-1", CustomerId="C-1", Amount=25.0, OrderDate="2024-01-02"),
        Row(OrderId="ORD-2", CustomerId="C-2", Amount=350.0, OrderDate="2024-01-03"),
    ]


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_orders_resolve_to_landing_contract(spark, tmp_path, fmt):
    src = str(tmp_path / f"orders_{fmt}")
    spark.createDataFrame(_orders_rows()).write.format(fmt).save(src)
    df = files.read_orders_columnar(spark, src, fmt)
    assert df.columns == ["OrderId", "CustomerId", "Amount", "OrderDate", "raw_payload"]
    # landing is stringly-typed even from a typed columnar source
    assert dict(df.dtypes)["Amount"] == "string"
    got = {r["OrderId"]: r["Amount"] for r in df.collect()}
    assert got == {"ORD-1": "25.0", "ORD-2": "350.0"}


def test_columnar_case_insensitive_and_unknown_columns(spark, tmp_path):
    src = str(tmp_path / "orders_ci")
    spark.createDataFrame(
        [Row(orderid="ORD-9", CUSTOMERID="C-9", amount=10.0, extra_col="drop-me")]
    ).write.parquet(src)
    df = files.read_orders_columnar(spark, src, "parquet")
    row = df.collect()[0]
    assert row["OrderId"] == "ORD-9"
    assert row["CustomerId"] == "C-9"
    assert row["OrderDate"] is None
    assert "extra_col" not in df.columns


def test_read_orders_file_dispatches_columnar_dir(spark, tmp_path):
    src = str(tmp_path / "orders.parquet")
    spark.createDataFrame(_orders_rows()).write.parquet(src)
    df, source_type = files.read_orders_file(spark, src)
    assert source_type == "PARQUET"
    assert df.count() == 2


def test_columnar_source_runs_full_pipeline(spark, tmp_path):
    from automated_data_pipeline_spark.runner import PipelineRunner

    src = str(tmp_path / "orders.parquet")
    spark.createDataFrame(_orders_rows()).write.parquet(src)
    runner = PipelineRunner(spark, str(tmp_path / "wh"))
    rid = runner.run(source_path=src)
    target = runner.target.read(spark)
    got = {r["order_id"]: r["amount_category"] for r in target.collect()}
    assert got == {"ORD-1": "Low", "ORD-2": "High"}
    runs = runner.control.runs(spark).filter(f"run_id = '{rid}'").collect()
    assert runs[0]["status"] == "Success"


def test_binary_assets_reader(spark, tmp_path):
    from automated_data_pipeline_spark.operators import multimodal

    adir = tmp_path / "assets"
    adir.mkdir()
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    blob = multimodal.encode_png(2, 2, 3, px)
    (adir / "a.png").write_bytes(blob)
    (adir / "b.png").write_bytes(blob)
    (adir / "ignore.txt").write_bytes(b"not an image")

    df = files.read_binary_assets(spark, str(adir), pattern="*.png")
    rows = df.collect()
    assert len(rows) == 2
    assert {r["length"] for r in rows} == {len(blob)}
    assert rows[0]["content"] == blob
    assert df.columns == ["path", "modification_time", "length", "content"]


def test_text_corpus_line_and_whole_modes(spark, tmp_path):
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    (cdir / "d1.txt").write_text("line one\nline two\n")
    (cdir / "d2.txt").write_text("single doc body\n")

    lines = files.read_text_corpus(spark, str(cdir))
    assert lines.count() == 3
    whole = files.read_text_corpus(spark, str(cdir), whole_files=True)
    docs = {r["path"].rsplit("/", 1)[-1]: r["text"] for r in whole.collect()}
    assert docs["d1.txt"] == "line one\nline two\n"
    assert docs["d2.txt"] == "single doc body\n"


def test_json_reader_handles_jsonl_and_document_forms(spark, tmp_path):
    """Spark's own JSON writer emits line-delimited JSONL; reading that
    with multiLine=True silently keeps only the FIRST record per file.
    The reader must sniff the form and lose nothing."""
    import json as _json

    # JSONL (one object per line — e.g. a Spark-written dataset)
    jl = tmp_path / "orders_lines.json"
    with open(jl, "w") as f:
        for i in range(3):
            f.write(_json.dumps({"OrderId": f"ORD-{i}", "Amount": i * 10.0}) + "\n")
    df = files.read_orders_json(spark, str(jl))
    assert df.count() == 3

    # whole-file array document (the reference's sample_orders.json form)
    arr = tmp_path / "orders_array.json"
    arr.write_text(_json.dumps(
        [{"OrderId": "ORD-A", "Amount": 1.0}, {"OrderId": "ORD-B", "Amount": 2.0}]
    ))
    assert files.read_orders_json(spark, str(arr)).count() == 2

    # pretty-printed single object -> 1 row
    one = tmp_path / "order_one.json"
    one.write_text('{\n  "OrderId": "ORD-X",\n  "Amount": 5.0\n}\n')
    got = files.read_orders_json(spark, str(one)).collect()
    assert len(got) == 1 and got[0]["OrderId"] == "ORD-X"


def test_gzipped_jsonl_sniffs_as_jsonl_and_reads_all_rows(spark, tmp_path):
    """A .json.gz JSONL file must NOT be sniffed by reading raw
    compressed bytes (the gzip magic parsed as a 'first line' made the
    sniff answer multiLine=True, silently keeping ONE record per
    file); the compressed suffix routes to the Spark text sniff, which
    decompresses."""
    import gzip

    from automated_data_pipeline_spark.sources.files import (
        _json_is_multiline,
        read_orders_json,
    )

    p = tmp_path / "orders.json.gz"
    with gzip.open(p, "wt") as f:
        for i in range(5):
            f.write(
                '{"OrderId": "G-%03d", "Amount": "%d.00", '
                '"Status": "Completed"}\n' % (i, 10 * (i + 1))
            )
    assert _json_is_multiline(str(p), spark) is False
    df = read_orders_json(spark, str(p))
    assert df.count() == 5
    assert {r["OrderId"] for r in df.collect()} == {
        f"G-{i:03d}" for i in range(5)
    }
