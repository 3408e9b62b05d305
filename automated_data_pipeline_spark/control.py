"""Control-plane tables: pipeline_runs / step_runs / pipeline_logs.

The reference keeps run/step/log state in mutable DB rows, committed
eagerly so monitors see progress mid-flight (sqlite_schema.sql:5-46;
PipelineRunner.java:212-218). A Spark-native engine has no cheap
row-update primitive, so the control plane is **event-sourced**: every
state change appends an immutable full-state row (tiny parquet file,
written driver-side via pyarrow — the control plane is metadata beside
the dataflow, exactly like the reference's SQLite-beside-the-pipeline);
the *current* state is the latest row per key, derived with a window
function. Appends are atomic-by-file, so concurrent readers (the
monitoring API) never see torn state — the reference gets the same
property from WAL journaling (orchestrator/db.js:17).

At scale this would be a Delta/Iceberg table with OPTIMIZE compaction;
the event-sourced latest-wins view is identical.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from datetime import datetime, timezone
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .schemas import STEP_NAMES
from .plans.empty import empty_local_frame

_RUN_FIELDS = [
    ("run_id", pa.string()),
    ("run_number", pa.int64()),
    ("pipeline_name", pa.string()),
    ("adf_run_id", pa.string()),
    ("started_at", pa.timestamp("us", tz="UTC")),
    ("finished_at", pa.timestamp("us", tz="UTC")),
    ("status", pa.string()),
    ("created_at", pa.timestamp("us", tz="UTC")),
    ("updated_at", pa.timestamp("us", tz="UTC")),
    ("event_seq", pa.int64()),
]
_STEP_FIELDS = [
    ("run_id", pa.string()),
    ("step_number", pa.int32()),
    ("step_name", pa.string()),
    ("started_at", pa.timestamp("us", tz="UTC")),
    ("finished_at", pa.timestamp("us", tz="UTC")),
    ("status", pa.string()),
    ("rows_affected", pa.int64()),
    ("rows_processed", pa.int64()),
    ("rows_total", pa.int64()),
    ("error_message", pa.string()),
    ("created_at", pa.timestamp("us", tz="UTC")),
    ("updated_at", pa.timestamp("us", tz="UTC")),
    ("event_seq", pa.int64()),
]
_LOG_FIELDS = [
    ("log_id", pa.int64()),
    ("run_id", pa.string()),
    ("pipeline_name", pa.string()),
    ("log_at", pa.timestamp("us", tz="UTC")),
    ("level", pa.string()),
    ("step_number", pa.int32()),
    ("step_name", pa.string()),
    ("message", pa.string()),
    ("details", pa.string()),
]


def utcnow() -> datetime:
    return datetime.now(timezone.utc)


class ControlStore:
    """Append-only control tables under ``<workdir>/control/``."""

    def __init__(self, workdir: str):
        self.workdir = workdir
        self.runs_dir = os.path.join(workdir, "control", "pipeline_runs")
        self.steps_dir = os.path.join(workdir, "control", "step_runs")
        self.logs_dir = os.path.join(workdir, "control", "pipeline_logs")
        for d in (self.runs_dir, self.steps_dir, self.logs_dir):
            os.makedirs(d, exist_ok=True)
        # current-state caches so each append carries full state
        self._runs: dict[str, dict[str, Any]] = {}
        self._steps: dict[tuple[str, int], dict[str, Any]] = {}
        # Concurrent runs (HTTP trigger daemon threads, scheduler) share
        # one store: the RLock (a) keeps cache iteration/mutation safe
        # and (b) makes next_run_number + the Running-row write one
        # atomic section, so two simultaneous start_run calls cannot
        # both read MAX(run_number)=N and both hand out N+1.
        self._lock = threading.RLock()

    # ---- low-level append ----------------------------------------------
    def _append(self, directory: str, fields, row: dict[str, Any]) -> None:
        schema = pa.schema(fields)
        arrays = [pa.array([row.get(name)], type=typ) for name, typ in fields]
        table = pa.Table.from_arrays(arrays, schema=schema)
        fname = f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(directory, f".tmp-{fname}")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(directory, fname))

    def _disk_rows(self, directory: str, columns: list[str] | None = None):
        """All event rows on disk as a list of dicts (control tables are
        tiny metadata; this is a footer-level read, no Spark job).

        Only the no-data-yet case maps to [] — a real read error must
        PROPAGATE: swallowing it would make update_run fall through to
        a bare {run_id} merge base (wiping state to NULLs) and restart
        run numbering at 1, exactly what the disk fallback exists to
        prevent."""
        # dot/underscore-prefixed entries are invisible to pyarrow's
        # ParquetDataset (hidden-file convention) — counting a stale
        # '.tmp-*.parquet' (crash between write_table and os.replace)
        # here would make ParquetDataset fail on an effectively empty
        # directory and brick the control plane
        if not os.path.isdir(directory) or not any(
            f.endswith(".parquet") and not f.startswith((".", "_"))
            for f in os.listdir(directory)
        ):
            return []
        ds = pq.ParquetDataset(directory)
        return ds.read(columns=columns).to_pylist()

    def _latest_disk_state(self, directory: str, key: dict[str, Any]) -> dict[str, Any] | None:
        """Latest-wins row for one key from disk — the cross-process
        fallback when this instance's cache has never seen the key
        (another process started the run; we must not wipe its state
        to NULLs on update).

        Two-phase read (ADVICE r13: the probe ran per run completion
        and read EVERY column of EVERY event file while holding the
        store lock): phase 1 scans only the key + event_seq columns
        across fragments to locate the winning event; phase 2 reads
        the full row from the ONE file that holds it. Ties on
        event_seq keep the earliest fragment/row — the same winner the
        old single-pass strict-> comparison produced."""
        if not os.path.isdir(directory) or not any(
            f.endswith(".parquet") and not f.startswith((".", "_"))
            for f in os.listdir(directory)
        ):
            return None
        cols = list(key) + ["event_seq"]
        ds = pq.ParquetDataset(directory)
        best_seq, best_frag = None, None
        for frag in ds.fragments:
            for row in frag.to_table(columns=cols).to_pylist():
                if all(row.get(k) == v for k, v in key.items()):
                    seq = row.get("event_seq") or 0
                    if best_seq is None or seq > best_seq:
                        best_seq, best_frag = seq, frag
        if best_frag is None:
            return None
        # first full row in the winning fragment with the winning seq —
        # the same iteration order as phase 1, so the same row the old
        # single-pass strict-> comparison selected
        for row in best_frag.to_table().to_pylist():
            if (row.get("event_seq") or 0) == best_seq and all(
                row.get(k) == v for k, v in key.items()
            ):
                best = dict(row)
                best.pop("event_seq", None)
                return best
        return None

    # ---- run lifecycle (reference: index.js:32-51; PipelineRunner.java:59-119)
    def next_run_number(self) -> int:
        """A1: COALESCE(MAX(RunNumber),0)+1 (index.js:36) — max over BOTH
        this instance's cache and disk, so concurrent stores on one
        workdir don't hand out duplicate numbers from a stale cache."""
        mx = 0
        with self._lock:
            runs_snapshot = list(self._runs.values())
        for r in runs_snapshot:
            mx = max(mx, r.get("run_number") or 0)
        for row in self._disk_rows(self.runs_dir, columns=["run_number"]):
            if row.get("run_number") is not None:
                mx = max(mx, row["run_number"])
        return mx + 1

    def _claim_run_number(self) -> int:
        """Allocate a fresh run number exclusively ACROSS processes: the
        in-memory lock makes next_run_number atomic within one store,
        but two store instances (scheduler-owned + HTTP-server-owned,
        or two processes) could both read MAX=N and hand out N+1. An
        O_EXCL claim file per number arbitrates — the loser advances
        to the next free number (same discipline as TargetTable's
        version claims; pyarrow ignores the underscore-prefixed
        markers)."""
        n = self.next_run_number()
        while True:
            claim = os.path.join(self.runs_dir, f"_claim_run_{n:09d}")
            try:
                os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                return n
            except FileExistsError:
                n += 1

    def start_run(
        self,
        pipeline_name: str = "OrdersPipeline",
        adf_run_id: str | None = None,
        run_id: str | None = None,
    ) -> str:
        """Insert the Running run row + 4 Pending step placeholders
        (the reference's 'logical plan': index.js:38-49)."""
        run_id = run_id or str(uuid.uuid4())
        now = utcnow()
        with self._lock:
            return self._start_run_locked(run_id, pipeline_name, adf_run_id, now)

    def _start_run_locked(self, run_id, pipeline_name, adf_run_id, now) -> str:
        # Restart-aware: when the run_id already has control rows (the
        # HTTP trigger creates them synchronously before the worker
        # thread calls run(), and a retried run_id re-enters here), the
        # run KEEPS its run_number — the client already saw it — and
        # its row/steps reset to Running/Pending for the new attempt
        # instead of being re-inserted under a fresh number.
        existing = self._runs.get(run_id) or self._latest_disk_state(
            self.runs_dir, {"run_id": run_id}
        )
        run_number = (
            existing["run_number"]
            if existing and existing.get("run_number") is not None
            else self._claim_run_number()
        )
        created_at = (
            existing["created_at"]
            if existing and existing.get("created_at") is not None
            else now
        )
        row = {
            "run_id": run_id,
            "run_number": run_number,
            "pipeline_name": pipeline_name,
            "adf_run_id": adf_run_id or f"local-{time.time_ns() // 1_000_000}",
            "started_at": now,
            "finished_at": None,
            "status": "Running",
            "created_at": created_at,
        }
        self._write_run(row)
        for i, name in enumerate(STEP_NAMES, start=1):
            self._write_step(
                {
                    "run_id": run_id,
                    "step_number": i,
                    "step_name": name,
                    "started_at": None,
                    "finished_at": None,
                    "status": "Pending",
                    "rows_affected": None,
                    "rows_processed": None,
                    "rows_total": None,
                    "error_message": None,
                    "created_at": now,
                }
            )
        return run_id

    def _write_run(self, row: dict[str, Any]) -> None:
        row = dict(row)
        row["updated_at"] = utcnow()
        row["event_seq"] = time.time_ns()
        with self._lock:
            self._runs[row["run_id"]] = row
        self._append(self.runs_dir, _RUN_FIELDS, row)

    def _write_step(self, row: dict[str, Any]) -> None:
        row = dict(row)
        row["updated_at"] = utcnow()
        row["event_seq"] = time.time_ns()
        with self._lock:
            self._steps[(row["run_id"], row["step_number"])] = row
        self._append(self.steps_dir, _STEP_FIELDS, row)

    def latest_run_state(self, run_id: str) -> dict[str, Any] | None:
        """Latest-wins state row for one run, straight from DISK (not
        the in-process cache): the cross-process-correct answer —
        another store instance (timeout sweeper, second process) may
        have written a newer event this cache never saw. Driver-side
        footer read of the tiny control table; no Spark job (the
        latest-per-key window the ``runs`` view computes, for one
        key)."""
        with self._lock:
            return self._latest_disk_state(self.runs_dir, {"run_id": run_id})

    def update_run(self, run_id: str, **fields: Any) -> None:
        with self._lock:
            cur = self._runs.get(run_id)
            if cur is None:  # started by another process — merge, don't wipe
                cur = self._latest_disk_state(self.runs_dir, {"run_id": run_id})
            cur = dict(cur or {"run_id": run_id})
            cur.update(fields)
            self._write_run(cur)

    def update_step(self, run_id: str, step_number: int, **fields: Any) -> None:
        with self._lock:
            cur = self._steps.get((run_id, step_number))
            if cur is None:
                cur = self._latest_disk_state(
                    self.steps_dir, {"run_id": run_id, "step_number": step_number}
                )
            cur = dict(cur or {"run_id": run_id, "step_number": step_number})
            cur.update(fields)
            self._write_step(cur)

    def log(
        self,
        run_id: str | None,
        level: str,
        message: str,
        pipeline_name: str | None = None,
        step_number: int | None = None,
        step_name: str | None = None,
        details: str | None = None,
    ) -> None:
        """Append-only log stream (logger.js:21-33; PipelineLogger.java:15-34)."""
        self._append(
            self.logs_dir,
            _LOG_FIELDS,
            {
                "log_id": time.time_ns(),
                "run_id": run_id,
                "pipeline_name": pipeline_name,
                "log_at": utcnow(),
                "level": level,
                "step_number": step_number,
                "step_name": step_name,
                "message": message,
                "details": details,
            },
        )

    # ---- DataFrame views ------------------------------------------------
    def _latest(self, df: DataFrame, keys: list[str]) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(F.col("event_seq").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "event_seq")
        )

    def _read_dir(self, spark: SparkSession, directory: str, fields) -> DataFrame:
        files = [
            f
            for f in os.listdir(directory)
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        if not files:
            # empty frame with the right schema
            schema = pa.schema(fields)
            return empty_local_frame(spark, str_schema(schema))
        return spark.read.parquet(directory)

    def runs(self, spark: SparkSession) -> DataFrame:
        return self._latest(self._read_dir(spark, self.runs_dir, _RUN_FIELDS), ["run_id"])

    def steps(self, spark: SparkSession) -> DataFrame:
        return self._latest(
            self._read_dir(spark, self.steps_dir, _STEP_FIELDS),
            ["run_id", "step_number"],
        )

    def logs(self, spark: SparkSession) -> DataFrame:
        return self._read_dir(spark, self.logs_dir, _LOG_FIELDS)


def str_schema(schema: pa.Schema) -> str:
    """pyarrow schema -> Spark DDL string for empty-frame construction."""
    mapping = {
        pa.string(): "string",
        pa.int64(): "bigint",
        pa.int32(): "int",
        pa.timestamp("us", tz="UTC"): "timestamp",
    }
    parts = []
    for f in schema:
        parts.append(f"{f.name} {mapping.get(f.type, 'string')}")
    return ", ".join(parts)
