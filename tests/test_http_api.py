"""HTTP read-API round-trip: every endpoint's JSON must equal its
DataFrame twin (api.py), and POST /pipeline/trigger must validate
uploads and drive a real pipeline run (server.js:42-169 parity)."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from automated_data_pipeline_spark import api
from automated_data_pipeline_spark.http_api import (
    PipelineApiServer,
    rows_to_jsonable,
)
from automated_data_pipeline_spark.runner import PipelineRunner
from automated_data_pipeline_spark.sources.generators import generate_orders


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, data, content_type):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=data,
        headers={"Content-Type": content_type},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def served(spark, workdir):
    runner = PipelineRunner(spark, workdir)
    runner.run(
        source_df=generate_orders(spark, 25),
        source_type="Generated",
        pipeline_name="Alpha",
    )
    runner.run(
        source_df=generate_orders(spark, 10),
        source_type="Generated",
        pipeline_name="Beta",
    )
    srv = PipelineApiServer(
        spark,
        runner.control,
        runner=runner,
        landing_dir=f"{workdir}/landing",
    ).start()
    yield srv, runner
    srv.stop()


def test_get_endpoints_match_dataframe_twins(spark, served):
    srv, runner = served
    runs_df = srv.runs_df()

    status, body = _get(srv.port, "/runs")
    assert status == 200
    assert body == rows_to_jsonable(api.list_runs(runs_df))
    assert len(body) == 2

    status, alpha = _get(srv.port, "/runs?pipeline=Alpha")
    assert [r["pipeline_name"] for r in alpha] == ["Alpha"]

    rid = alpha[0]["run_id"]
    status, detail = _get(srv.port, f"/runs/{rid}")
    assert status == 200
    assert detail["run_id"] == rid
    assert [s["step_number"] for s in detail["steps"]] == [1, 2, 3, 4]
    assert all(s["status"] == "Success" for s in detail["steps"])

    status, logs = _get(srv.port, f"/runs/{rid}/logs")
    assert status == 200
    assert logs == rows_to_jsonable(
        api.run_logs(runner.control.logs(spark), rid)
    )
    assert len(logs) >= 10

    status, recent = _get(srv.port, "/logs?level=Info&limit=5")
    assert status == 200 and len(recent) == 5
    assert recent == rows_to_jsonable(
        api.list_logs(runner.control.logs(spark), level="Info", limit=5)
    )

    assert _get(srv.port, "/runs/nope")[0] == 404
    assert _get(srv.port, "/runs/nope/logs")[0] == 404
    assert _get(srv.port, "/bogus")[0] == 404


def test_trigger_upload_runs_pipeline(spark, served):
    srv, runner = served
    csv = b"OrderId,CustomerName,Amount,OrderDate\nORD-000001,Ada,12.5,2024-01-01\n"

    # raw-body + filename variant
    status, out = _post(
        srv.port, "/pipeline/trigger?filename=batch.csv", csv, "text/csv"
    )
    assert status == 201 and out["runId"]

    # multipart variant (the reference's form field "file")
    boundary = "bnd123"
    mp = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="m.csv"\r\n'
        "Content-Type: text/csv\r\n\r\n"
    ).encode() + csv + f"\r\n--{boundary}--\r\n".encode()
    status, out2 = _post(
        srv.port, "/pipeline/trigger", mp,
        f"multipart/form-data; boundary={boundary}",
    )
    assert status == 201 and out2["runId"] != out["runId"]

    # both triggered runs complete (background threads)
    deadline = time.time() + 60
    done = {}
    while time.time() < deadline and len(done) < 2:
        for rid in (out["runId"], out2["runId"]):
            st, detail = _get(srv.port, f"/runs/{rid}")
            if st == 200 and detail["status"] in ("Success", "Failed"):
                done[rid] = detail["status"]
        time.sleep(0.5)
    assert done == {out["runId"]: "Success", out2["runId"]: "Success"}

    # upload validation: bad extension and no file -> 400, no run created
    n_before = len(_get(srv.port, "/runs")[1])
    status, err = _post(
        srv.port, "/pipeline/trigger?filename=evil.exe", b"x", "text/plain"
    )
    assert status == 400 and "allowed" in err["error"]
    status, err = _post(srv.port, "/pipeline/trigger", b"", "text/csv")
    assert status == 400
    assert len(_get(srv.port, "/runs")[1]) == n_before


def test_oversize_upload_rejected_from_header(served):
    """The body must be refused via Content-Length before buffering
    (multer fileSize-limit parity) — and no run is created."""
    srv, _ = served
    n_before = len(_get(srv.port, "/runs")[1])
    big = b"x" * (api.UPLOAD_MAX_BYTES + 8192)
    status, err = _post(
        srv.port, "/pipeline/trigger?filename=big.csv", big, "text/csv"
    )
    assert status == 400 and "too large" in err["error"]
    assert len(_get(srv.port, "/runs")[1]) == n_before


def test_trigger_creates_control_row_before_201(spark, served):
    """The 201 response must be pollable immediately: the Running
    control row is written synchronously before the reply (reference
    parity: server.js:180 inserts rows, then spawns the worker)."""
    srv, runner = served
    body = b"OrderId,CustomerId,Amount,OrderDate\nORD-P1,C-1,10.0,2024-01-01\n"
    status, resp = _post(
        srv.port, "/pipeline/trigger?filename=poll.csv", body,
        "application/octet-stream",
    )
    assert status == 201
    rid = resp["runId"]
    # no sleep: the row must already exist
    status, got = _get(srv.port, f"/runs/{rid}")
    assert status == 200
    assert got["run_id"] == rid
    # let the background run finish before the fixture tears down
    for _ in range(120):
        status, got = _get(srv.port, f"/runs/{rid}")
        if got.get("status") in ("Success", "Failed"):
            break
        time.sleep(0.5)
    assert got["status"] == "Success"


def test_invalid_content_length_is_client_error(served):
    """Negative Content-Length must not reach rfile.read(-N) (which
    blocks to EOF and hangs the handler thread); non-numeric is a 400,
    not a 500."""
    import http.client

    srv, _ = served
    for bad in ("-5", "abc"):
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.putrequest("POST", "/pipeline/trigger?filename=x.csv")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Content-Length", bad)
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400, bad
        conn.close()
