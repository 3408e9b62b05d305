"""Regression tests for the round-5 adversarial-review findings on the
sources / scheduler / api layer (the scheduler ones live in
test_scheduler.py)."""

from __future__ import annotations

import gzip
import os
import threading

import pytest
from pyspark.sql import functions as F


def test_html_parser_implicitly_closes_siblings(spark):
    """'<ul><li>a<li>b</ul>' must yield sibling li elements with
    innerText ['a','b'] — html.parser emits no implicit end events, so
    without the HTML5 auto-close rules li2 nests inside li1 and
    innerText concatenates ('a b'). Same for unclosed p/td/tr/dt."""
    from automated_data_pipeline_spark.sources.scrape import (
        _parse_html,
        select_all,
    )

    root = _parse_html("<ul><li>a<li>b</ul>")
    assert [n.inner_text() for n in select_all(root, "li")] == ["a", "b"]

    root = _parse_html("<p>one<p>two<div>three</div>")
    assert [n.inner_text() for n in select_all(root, "p")] == ["one", "two"]

    root = _parse_html(
        "<table><tr><td>1<td>2<tr><td>3<td>4</table>"
    )
    assert [n.inner_text() for n in select_all(root, "td")] == [
        "1", "2", "3", "4",
    ]
    assert [n.inner_text() for n in select_all(root, "tr")] == ["1 2", "3 4"]

    root = _parse_html("<dl><dt>k1<dd>v1<dt>k2<dd>v2</dl>")
    assert [n.inner_text() for n in select_all(root, "dd")] == ["v1", "v2"]

    # NESTED lists must keep nesting: the inner li stays inside the ul
    root = _parse_html("<ul><li>a<ul><li>inner</ul><li>b</ul>")
    texts = [n.inner_text() for n in select_all(root, "li")]
    assert texts == ["a inner", "inner", "b"]


def test_json_sniff_handles_compressed_parts(spark, tmp_path):
    """A directory of gzip JSONL part files is invisible to the local
    sniffer (no bare '.json' names); the Spark-side fallback must still
    detect JSONL — multiLine=True on JSONL silently keeps one record
    per file."""
    from automated_data_pipeline_spark.sources.files import read_orders_json

    d = tmp_path / "jsonl_gz"
    d.mkdir()
    rows = [
        b'{"orderId": "ORD-1", "amount": "5.0"}\n',
        b'{"orderId": "ORD-2", "amount": "6.0"}\n',
        b'{"orderId": "ORD-3", "amount": "7.0"}\n',
    ]
    with gzip.open(d / "part-0.json.gz", "wb") as f:
        f.writelines(rows[:2])
    with gzip.open(d / "part-1.json.gz", "wb") as f:
        f.writelines(rows[2:])

    df = read_orders_json(spark, str(d))
    got = {r["OrderId"] for r in df.collect()}
    assert got == {"ORD-1", "ORD-2", "ORD-3"}, got


def test_read_orders_file_dispatches_compressed_parts(spark, tmp_path):
    """read_orders_file sees through compression suffixes: a directory
    of '.json.gz' parts dispatches as JSON (it used to raise 'found
    extensions [.gz]')."""
    from automated_data_pipeline_spark.sources.files import read_orders_file

    d = tmp_path / "gz_src"
    d.mkdir()
    with gzip.open(d / "part-0.json.gz", "wb") as f:
        f.write(b'{"orderId": "ORD-9", "amount": "1.0"}\n')
    df, source_type = read_orders_file(spark, str(d))
    assert source_type == "JSON"
    assert [r["OrderId"] for r in df.collect()] == ["ORD-9"]


def test_distributed_fetch_captures_per_url_errors(spark):
    """One dead URL in a crawl batch must not fail the job (Spark would
    retry the whole partition 4x and then discard every fetched body);
    it lands as an error row instead."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from automated_data_pipeline_spark.sources.rest import (
        rest_json_source_distributed,
    )

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/dead":
                self.send_response(404)
                self.end_headers()
                return
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        urls = [f"{base}/a", f"{base}/dead", f"{base}/b"]
        out = {r["url"]: r for r in
               rest_json_source_distributed(spark, urls).collect()}
        assert out[f"{base}/a"]["body"] == '{"ok": true}'
        assert out[f"{base}/a"]["error"] is None
        assert out[f"{base}/dead"]["body"] is None
        assert "404" in out[f"{base}/dead"]["error"]
        assert out[f"{base}/b"]["error"] is None
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_list_logs_clamps_negative_limit(spark):
    from automated_data_pipeline_spark import api

    logs = spark.createDataFrame(
        [(1, "r1", "p", "Info", "m", None)],
        "log_id long, run_id string, pipeline_name string, level string,"
        " message string, log_at timestamp",
    )
    assert api.list_logs(logs, limit=-1).count() == 0  # not a crash
    assert api.list_logs(logs, limit=5).count() == 1


def test_run_number_fallback_is_all_or_nothing(spark):
    """Reference parity (server.js:63-69): positional numbering only
    when NO stored run_number exists — a per-row coalesce over a mixed
    table synthesized numbers that collided with stored ones."""
    from datetime import datetime

    from automated_data_pipeline_spark.api import with_run_number_fallback

    schema = "run_id string, run_number long, created_at timestamp"
    mixed = spark.createDataFrame(
        [
            ("A", 1, datetime(2024, 1, 1)),
            ("B", None, datetime(2024, 1, 2)),
            ("C", 2, datetime(2024, 1, 3)),
        ],
        schema,
    )
    got = {r["run_id"]: r["run_number"]
           for r in with_run_number_fallback(mixed).collect()}
    # stored numbers untouched; the gap stays NULL (no collision with C)
    assert got == {"A": 1, "B": None, "C": 2}

    unnumbered = spark.createDataFrame(
        [
            ("A", None, datetime(2024, 1, 1)),
            ("B", None, datetime(2024, 1, 2)),
        ],
        schema,
    )
    got = {r["run_id"]: r["run_number"]
           for r in with_run_number_fallback(unnumbered).collect()}
    assert got == {"A": 1, "B": 2}  # oldest = 1


def test_snapshot_diff_empty_and_evolved_schemas(spark):
    from automated_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "k string, v int"
    )
    new = spark.createDataFrame(
        [("k1", 9), ("k3", 3)], "k string, v int"
    )
    # explicit [] = key-presence-only: k1 matches on both sides so it
    # is UNCHANGED even though v differs
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k", compare_cols=[],
                                  include_unchanged=True).collect()}
    assert got == {"k1": "unchanged", "k2": "deleted", "k3": "inserted"}

    # schema evolution: new snapshot adds a column; default compares
    # the INTERSECTION instead of crashing on the missing column
    new2 = spark.createDataFrame(
        [("k1", 1, "x"), ("k2", 5, "y")], "k string, v int, extra string"
    )
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new2, "k",
                                  include_unchanged=True).collect()}
    assert got == {"k1": "unchanged", "k2": "changed"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not present in both"):
        snapshot_diff(old, new2, "k", compare_cols=["extra"])


def test_range_join_bands_with_colliding_column_name(spark):
    from automated_data_pipeline_spark.operators.joins import range_join_bands

    fact = spark.createDataFrame([(5.0,), (15.0,)], "amount double")
    # bands frame ALSO carries an 'amount' reference column
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low", 1.0), (10.0, 20.0, "high", 2.0)],
        "lo double, hi double, band string, amount double",
    )
    got = {r["band"] for r in range_join_bands(fact, bands, "amount").collect()}
    assert got == {"low", "high"}


def test_interval_overlap_join_guards_and_collisions(spark):
    from automated_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("a", 0, 10)], "name string, start long, end long"
    )
    right = spark.createDataFrame(
        [("b", 5, 15)], "name string, start long, end long"
    )
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(left, right, "start", "end", "start", "end", 0)
    out = interval_overlap_join(
        left, right, "start", "end", "start", "end", bin_width=8
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    # colliding right-side columns come back r_-prefixed, all selectable
    assert r["name"] == "a" and r["r_name"] == "b"
    assert (r["start"], r["end"], r["r_start"], r["r_end"]) == (0, 10, 5, 15)


def test_salted_aggregate_salt_is_deterministic_content_hash(spark):
    """The salt must be a pure function of row CONTENT (a partition-
    or order-derived salt re-salts differently on stage retry — the
    SPARK-23207 corruption class). Same data, different partitioning
    => identical salt assignment and identical totals."""
    from automated_data_pipeline_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(100)], "k string, i int, v double"
    )
    a = salted_aggregate(df.repartition(7), ["k"], {"total": ("v", "sum"), "n": ("*", "count")})
    b = salted_aggregate(df.repartition(3), ["k"], {"total": ("v", "sum"), "n": ("*", "count")})
    ra, rb = a.first(), b.first()
    assert ra["total"] == rb["total"] == sum(float(i) for i in range(100))
    assert ra["n"] == rb["n"] == 100
    # and the salt expression itself is content-derived: identical
    # frames produce identical per-salt partials regardless of layout
    from automated_data_pipeline_spark.operators.skew import _row_salt

    s1 = {(r["i"], r["_s"]) for r in
          df.repartition(7).withColumn("_s", _row_salt(df, 8)).collect()}
    s2 = {(r["i"], r["_s"]) for r in
          df.repartition(3).withColumn("_s", _row_salt(df, 8)).collect()}
    assert s1 == s2


def test_file_trigger_resolves_headers_and_json_format(spark, tmp_path):
    """The stream path must ingest exactly like the upload path: a
    REORDERED camelCase CSV header still maps by name (the schema-bound
    streaming read bound by POSITION and silently swapped business
    keys), and a pretty-printed JSON array parses (streaming JSON is
    always multiLine=false and yielded all-NULL rows). One run PER
    FILE, reference granularity."""
    from automated_data_pipeline_spark.runner import PipelineRunner
    from automated_data_pipeline_spark.streaming.file_trigger import (
        start_file_trigger,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # reordered + camelCase header
    with open(os.path.join(landing, "odd_header.csv"), "w") as f:
        f.write("customerId,orderId,amount,orderDate\n"
                "C-7,ORD-H1,25.00,2024-01-02\n")
    runner = PipelineRunner(spark, str(tmp_path / "wh"))
    q = start_file_trigger(spark, runner, landing)
    q.awaitTermination(120)
    target = {r["order_id"]: r for r in runner.target.read(spark).collect()}
    assert set(target) == {"ORD-H1"}, "header bound by position, not name"
    assert target["ORD-H1"]["customer_id"] == "C-7"

    landing2 = str(tmp_path / "landing_json")
    os.makedirs(landing2)
    with open(os.path.join(landing2, "pretty.json"), "w") as f:
        f.write('[\n  {"OrderId": "ORD-J1", "CustomerId": "C1",\n'
                '   "Amount": "300.0", "OrderDate": "2024-01-05"},\n'
                '  {"OrderId": "ORD-J2", "CustomerId": "C2",\n'
                '   "Amount": "10.0", "OrderDate": "2024-01-06"}\n]\n')
    runner2 = PipelineRunner(spark, str(tmp_path / "wh2"))
    q = start_file_trigger(spark, runner2, landing2, fmt="json")
    q.awaitTermination(120)
    target = {r["order_id"]: r for r in runner2.target.read(spark).collect()}
    assert set(target) == {"ORD-J1", "ORD-J2"}, "multiLine JSON lost"
    assert target["ORD-J1"]["amount_category"] == "High"


def test_file_trigger_one_run_per_file(spark, tmp_path):
    from automated_data_pipeline_spark.runner import PipelineRunner
    from automated_data_pipeline_spark.streaming.file_trigger import (
        start_file_trigger,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i in (1, 2):
        with open(os.path.join(landing, f"f{i}.csv"), "w") as f:
            f.write(f"OrderId,CustomerId,Amount,OrderDate\n"
                    f"ORD-F{i},C{i},10.0,2024-01-0{i}\n")
    runner = PipelineRunner(spark, str(tmp_path / "wh"))
    q = start_file_trigger(spark, runner, landing)
    q.awaitTermination(120)
    runs = runner.control.runs(spark).collect()
    assert len(runs) == 2 and all(r["status"] == "Success" for r in runs)
    assert runner.target.read(spark).count() == 2


def test_concurrent_migrates_do_not_lose_rows(spark, tmp_path):
    """Two runs migrating concurrently must BOTH land in the published
    target: without the merge lock, both base on v=N and the later
    pointer silently drops the earlier run's rows while both report
    Success."""
    import threading as th

    from automated_data_pipeline_spark.runner import PipelineRunner

    runner = PipelineRunner(spark, str(tmp_path / "wh"))

    def mk(prefix, n):
        return spark.createDataFrame(
            [(f"{prefix}-{i}", f"C{i}", "10.0", "2024-01-01")
             for i in range(n)],
            "OrderId string, CustomerId string, Amount string, OrderDate string",
        )

    errs = []

    def go(prefix):
        try:
            runner.run(source_df=mk(prefix, 20), source_type="Generated",
                       pipeline_name=f"P-{prefix}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [th.Thread(target=go, args=(p,)) for p in ("AAA", "BBB")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    target = runner.target.read(spark)
    got = {r["order_id"] for r in target.collect()}
    assert len(got) == 40, f"lost rows: {40 - len(got)}"
    assert {o.split('-')[0] for o in got} == {"AAA", "BBB"}


def test_sweep_closes_steps_and_blocks_zombie_success(spark, tmp_path):
    from datetime import timedelta

    from automated_data_pipeline_spark.control import utcnow
    from automated_data_pipeline_spark.runner import (
        TIMEOUT_STATUS,
        PipelineRunner,
    )

    runner = PipelineRunner(spark, str(tmp_path / "wh"))
    rid = runner.control.start_run(pipeline_name="Stuck")
    runner.control.update_run(
        rid, status="Running", started_at=utcnow() - timedelta(hours=7)
    )
    runner.control.update_step(rid, 2, status="Running", started_at=utcnow())
    assert len(runner.sweep_timeouts()) == 1
    runs = {r["run_id"]: r for r in runner.control.runs(spark).collect()}
    assert runs[rid]["status"] == TIMEOUT_STATUS
    steps = {
        (s["run_id"], s["step_number"]): s["status"]
        for s in runner.control.steps(spark).collect()
    }
    # the in-flight step AND the never-started ones are closed out
    assert steps[(rid, 2)] == "Failed"
    assert all(steps[(rid, i)] == "Failed" for i in (1, 3, 4))
    # zombie thread finishing later must not overwrite the verdict
    runner._finalize_run(rid, "Success", "Stuck")
    runs = {r["run_id"]: r for r in runner.control.runs(spark).collect()}
    assert runs[rid]["status"] == TIMEOUT_STATUS


def test_control_survives_stale_tmp_file(spark, tmp_path):
    """A crash between write_table(tmp) and os.replace leaves only a
    '.tmp-*.parquet' in the control dir; the next read must see an
    empty store, not a bricked ParquetDataset."""
    from automated_data_pipeline_spark.control import ControlStore

    store = ControlStore(str(tmp_path / "wh"))
    os.makedirs(store.runs_dir, exist_ok=True)
    with open(os.path.join(store.runs_dir, ".tmp-crashed.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert store.next_run_number() == 1  # not an exception
    rid = store.start_run(pipeline_name="AfterCrash")
    assert rid


def test_run_numbers_unique_across_store_instances(spark, tmp_path):
    """Two ControlStore instances over one workdir (scheduler-owned +
    HTTP-server-owned, or two processes) must never hand out the same
    run number — the O_EXCL claim files arbitrate."""
    from automated_data_pipeline_spark.control import ControlStore

    wd = str(tmp_path / "wh")
    a, b = ControlStore(wd), ControlStore(wd)
    ra = a.start_run(pipeline_name="A")
    rb = b.start_run(pipeline_name="B")  # b's cache never saw ra
    na = next(r["run_number"] for r in a.runs(spark).collect()
              if r["run_id"] == ra)
    nb = next(r["run_number"] for r in b.runs(spark).collect()
              if r["run_id"] == rb)
    assert na != nb, f"duplicate run_number {na}"
    assert {na, nb} == {1, 2}


def test_progress_tracker_dedupes_replayed_batches():
    """A restart from the same checkpoint replays the last uncommitted
    batch under the same (query id, batchId); the cumulative total must
    count it once. Terminated queries are evicted past the cap."""
    from types import SimpleNamespace

    from automated_data_pipeline_spark.streaming.progress import (
        StreamProgressTracker,
    )

    t = StreamProgressTracker()

    def ev(qid, batch, rows):
        return SimpleNamespace(
            progress=SimpleNamespace(
                id=qid, name="q", batchId=batch, numInputRows=rows
            )
        )

    t.onQueryProgress(ev("q1", 4, 100))
    t.onQueryProgress(ev("q1", 5, 50))
    t.onQueryProgress(ev("q1", 5, 50))  # replay after restart
    snap = t.snapshot()["q1"]
    assert snap["rows"] == 150 and snap["batches"] == 2

    # eviction: terminated queries beyond the cap are dropped
    for i in range(t.MAX_FINISHED + 10):
        qid = f"dead-{i}"
        t.onQueryProgress(ev(qid, 0, 1))
        t.onQueryTerminated(SimpleNamespace(id=qid))
    snap = t.snapshot()
    assert "q1" in snap  # live query never evicted
    assert len([k for k in snap if k.startswith("dead-")]) == t.MAX_FINISHED


def test_punct_ratio_is_unicode_aware_and_oracle_consistent(spark):
    """Accented/CJK letters must NOT count as punctuation (the ASCII
    class silently scored well-formed non-English docs ~0.2 lower),
    and the \\pL\\pN class must mean the same thing in Spark's Java
    regex and DuckDB's RE2 — the fixtures are ASCII-only, so this is
    the only place the cross-engine unicode semantics are exercised."""
    import duckdb

    from automated_data_pipeline_spark.functions.text import punct_ratio

    texts = [
        "héllo wörld çà ñandú",      # latin + diacritics: no punct
        "你好 世界",                  # CJK: no punct
        "half! and... half?",        # real punctuation
        "münchen (bayern), ü.a.!",   # mixed
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_vals = [
        round(r["pr"], 6)
        for r in df.select(punct_ratio(F.col("text")).alias("pr"))
        .collect()
    ]
    assert spark_vals[0] == 0.0 and spark_vals[1] == 0.0
    assert spark_vals[2] > 0.2
    con = duckdb.connect()
    duck_vals = [
        round(con.execute(
            "SELECT length(regexp_replace(?, '[\\pL\\pN\\s]', '', 'g')) * 1.0"
            " / greatest(length(?), 1)", [t, t]).fetchone()[0], 6)
        for t in texts
    ]
    assert spark_vals == duck_vals, (spark_vals, duck_vals)
