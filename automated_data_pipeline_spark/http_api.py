"""Thin HTTP read API over the monitoring DataFrame queries (api.py),
mirroring the reference's Express server route-for-route
(python_code/api/server.js:42-169; ApiServlet.java:435-593):

- GET  /runs                 — ?pipeline=&status=, newest-first, top 100
- GET  /runs/{id}            — run row + steps[] ordered by step_number
- GET  /runs/{id}/logs       — chronological logs for one run (404 if
                               the run doesn't exist)
- GET  /logs                 — ?runId=&pipeline=&level=&limit= (default
                               500, clamped to 2000), newest-first
- POST /pipeline/trigger     — upload a CSV/JSON (multipart form field
                               "file" or raw body + ?filename=), save to
                               the landing dir, start the pipeline in a
                               background thread, 201 {runId, ...}

Browser GUI (web.py renders, this module routes — the counterpart of
the reference's React pages / JSPs: RunList.jsx, RunDetail.jsx,
Logs.jsx, run-detail.jsp with its 2 s auto-refresh):

- GET  /                     — HTML runs table (?pipeline=&status=)
- GET  /ui/runs/{id}         — HTML run detail + steps (+ meta-refresh
                               2 s while Running), 404 page if missing
- GET  /ui/logs              — HTML logs table (?runId=&level=&limit=)

Design notes:
- stdlib only (ThreadingHTTPServer): the engine charter is "no new
  dependencies"; each request runs one already-planned DataFrame query.
- The reference runs the triggered pipeline in a CHILD PROCESS so the
  API stays responsive (server.js:175-190); a Spark driver must keep
  the pipeline inside its own JVM session, so the equivalent here is a
  daemon thread — Spark job submission is thread-safe, and the read
  endpoints stay live while the pipeline runs.
- Query results serialize through a single timestamp-aware JSON
  canonicalizer, so cross-checking an endpoint against its DataFrame
  twin is exact (tests/test_http_api.py does precisely that).
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import urllib.parse
from datetime import date, datetime
from email.parser import BytesParser
from email.policy import default as email_default_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from . import api, web


def rows_to_jsonable(df: DataFrame) -> list[dict]:
    """Collect a (small, already-limited) result and canonicalize values
    for JSON: timestamps/dates to ISO-8601 strings, Rows to dicts,
    bytes to hex. Endpoint frames are all bounded (point lookups or
    LIMIT-ed lists), so the collect is driver-safe by construction."""

    def conv(v):
        if isinstance(v, datetime):
            return v.isoformat(sep=" ", timespec="microseconds")
        if isinstance(v, date):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return [conv(x) for x in v]
        if hasattr(v, "asDict"):  # nested Row (steps[] structs)
            return {k: conv(x) for k, x in v.asDict().items()}
        return v

    return [{k: conv(v) for k, v in r.asDict().items()} for r in df.collect()]


class PipelineApiServer:
    """Bundles the Spark session, control store, and pipeline runner
    behind the reference's HTTP surface. ``port=0`` binds an ephemeral
    port (tests); ``server.port`` reports the bound port."""

    def __init__(
        self,
        spark,
        control,
        runner=None,
        landing_dir: str | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.spark = spark
        self.control = control
        self.runner = runner
        self.landing_dir = landing_dir
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self)
        )
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- data access (each maps to one api.py DataFrame function) -----
    def runs_df(self) -> DataFrame:
        return api.with_run_number_fallback(self.control.runs(self.spark))

    def list_runs(self, pipeline, status) -> list[dict]:
        return rows_to_jsonable(
            api.list_runs(self.runs_df(), pipeline=pipeline, status=status)
        )

    def run_detail(self, run_id: str) -> dict | None:
        out = rows_to_jsonable(
            api.run_detail(
                self.runs_df(), self.control.steps(self.spark), run_id
            )
        )
        if not out:
            return None
        detail = out[0]
        detail["steps"] = detail.get("steps") or []
        return detail

    def run_logs(self, run_id: str) -> list[dict] | None:
        # 404 contract: the run must exist (server.js:114-119)
        from pyspark.sql import functions as F

        present = (
            self.control.runs(self.spark)
            .filter(F.col("run_id") == run_id)
            .limit(1)
            .count()
        )
        if not present:
            return None
        return rows_to_jsonable(
            api.run_logs(self.control.logs(self.spark), run_id)
        )

    def list_logs(self, run_id, pipeline, level, limit) -> list[dict]:
        return rows_to_jsonable(
            api.list_logs(
                self.control.logs(self.spark),
                run_id=run_id,
                pipeline=pipeline,
                level=level,
                limit=limit,
            )
        )

    def trigger(self, filename: str, payload: bytes) -> dict:
        api.validate_upload(filename, len(payload))
        import uuid

        ext = os.path.splitext(filename)[1].lower() or ".csv"
        os.makedirs(self.landing_dir, exist_ok=True)
        # timestamp + uuid suffix: two concurrent uploads in the same
        # millisecond must not collide and silently overwrite each other
        saved = os.path.join(
            self.landing_dir,
            f"upload_{int(time.time() * 1000)}_{uuid.uuid4().hex[:8]}{ext}",
        )
        with open(saved, "wb") as f:
            f.write(payload)
        run_id = str(uuid.uuid4())
        # create the control rows SYNCHRONOUSLY so a client that polls
        # GET /runs/{id} right after the 201 finds the Running row
        # (reference parity: server.js:180 / PipelineRunner.java:59-119
        # insert control rows before handing off to the worker)
        self.runner.control.start_run(
            pipeline_name="HttpTriggeredPipeline", run_id=run_id
        )
        t = threading.Thread(
            target=self.runner.run,
            kwargs={
                "source_path": saved,
                "run_id": run_id,
                "pipeline_name": "HttpTriggeredPipeline",
            },
            daemon=True,
        )
        t.start()
        return {
            "runId": run_id,
            "message": "Pipeline started in background",
            "file": os.path.basename(saved),
        }

    # -- lifecycle ----------------------------------------------------
    def start(self) -> "PipelineApiServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def parse_multipart_file(content_type: str, body: bytes):
    """Extract (filename, payload) of the ``file`` form field from a
    multipart/form-data body using the stdlib email parser. Returns
    None when no file part is present."""
    msg = BytesParser(policy=email_default_policy).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    if not msg.is_multipart():
        return None
    for part in msg.iter_parts():
        disp = part.get("Content-Disposition", "")
        if 'name="file"' in disp:
            m = re.search(r'filename="([^"]*)"', disp)
            fname = m.group(1) if m else "upload.csv"
            return fname, part.get_payload(decode=True) or b""
    return None


def _make_handler(srv: PipelineApiServer):
    class Handler(BaseHTTPRequestHandler):
        server_version = "PipelineApi/1.0"

        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _send(self, code: int, obj) -> None:
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(data)

        def _send_html(self, code: int, page: str) -> None:
            data = page.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            try:
                u = urllib.parse.urlsplit(self.path)
                q = dict(urllib.parse.parse_qsl(u.query))
                parts = [p for p in u.path.split("/") if p]
                # -- browser GUI (web.py) ----------------------------
                if parts == []:
                    return self._send_html(
                        200,
                        web.render_run_list(
                            srv.list_runs(q.get("pipeline"), q.get("status"))
                        ),
                    )
                if len(parts) == 3 and parts[:2] == ["ui", "runs"]:
                    # web.py percent-encodes ids in links; decode the
                    # path segment or any id with reserved chars 404s
                    # from its own link
                    rid = urllib.parse.unquote(parts[2])
                    detail = srv.run_detail(rid)
                    if detail is None:
                        return self._send_html(
                            404, web.render_not_found(f"Run {rid}")
                        )
                    return self._send_html(
                        200, web.render_run_detail(detail)
                    )
                if parts == ["ui", "logs"]:
                    try:
                        limit = int(q.get("limit", api.DEFAULT_LOG_LIMIT))
                    except ValueError:
                        limit = api.DEFAULT_LOG_LIMIT
                    logs = srv.list_logs(
                        q.get("runId"), q.get("pipeline"),
                        q.get("level"), limit,
                    )
                    return self._send_html(
                        200,
                        web.render_logs(
                            logs, run_id=q.get("runId"), level=q.get("level")
                        ),
                    )
                # -- JSON API ----------------------------------------
                if parts == ["runs"]:
                    return self._send(
                        200,
                        srv.list_runs(q.get("pipeline"), q.get("status")),
                    )
                if len(parts) == 2 and parts[0] == "runs":
                    detail = srv.run_detail(parts[1])
                    if detail is None:
                        return self._send(404, {"error": "Run not found"})
                    return self._send(200, detail)
                if len(parts) == 3 and parts[0] == "runs" and parts[2] == "logs":
                    logs = srv.run_logs(parts[1])
                    if logs is None:
                        return self._send(404, {"error": "Run not found"})
                    return self._send(200, logs)
                if parts == ["logs"]:
                    try:
                        limit = int(q.get("limit", api.DEFAULT_LOG_LIMIT))
                    except ValueError:
                        limit = api.DEFAULT_LOG_LIMIT
                    return self._send(
                        200,
                        srv.list_logs(
                            q.get("runId"), q.get("pipeline"),
                            q.get("level"), limit,
                        ),
                    )
                return self._send(404, {"error": "Not found"})
            except Exception as e:  # mirror server.js catch-all 500
                return self._send(500, {"error": str(e)})

        def do_POST(self):
            try:
                u = urllib.parse.urlsplit(self.path)
                if u.path != "/pipeline/trigger":
                    return self._send(404, {"error": "Not found"})
                if srv.runner is None or srv.landing_dir is None:
                    return self._send(
                        500, {"error": "trigger not configured"}
                    )
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    return self._send(
                        400, {"error": "invalid Content-Length header"}
                    )
                if length < 0:
                    # rfile.read(-N) would block reading to EOF and hang
                    # this handler thread until the client gives up
                    return self._send(
                        400, {"error": "invalid Content-Length header"}
                    )
                # multer parity (server.js:25 limits.fileSize): refuse
                # oversize uploads from the header, BEFORE buffering the
                # body — a 10 GB POST must not reach driver memory.
                # Multipart framing overhead is ~1 KB; exact payload
                # size is re-checked post-parse by validate_upload.
                if length > api.UPLOAD_MAX_BYTES + 4096:
                    # drain and DISCARD in small chunks (memory stays
                    # bounded) so the client can finish sending and
                    # receive the 400 instead of a broken pipe
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    return self._send(
                        400,
                        {"error": f"file too large: request body {length} "
                                  f"bytes > {api.UPLOAD_MAX_BYTES} byte cap"},
                    )
                body = self.rfile.read(length) if length else b""
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    got = parse_multipart_file(ctype, body)
                    if got is None:
                        return self._send(
                            400,
                            {"error": 'No file uploaded. Use form field '
                                      '"file" with a CSV or JSON file.'},
                        )
                    fname, payload = got
                else:
                    q = dict(urllib.parse.parse_qsl(u.query))
                    fname = q.get("filename")
                    payload = body
                    if not fname or not payload:
                        return self._send(
                            400,
                            {"error": 'No file uploaded. Use form field '
                                      '"file" with a CSV or JSON file.'},
                        )
                try:
                    out = srv.trigger(fname, payload)
                except ValueError as ve:
                    return self._send(400, {"error": str(ve)})
                return self._send(201, out)
            except Exception as e:
                return self._send(500, {"error": str(e)})

    return Handler
