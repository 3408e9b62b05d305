"""Schedule computation + poller (SURVEY.md §2.1 S10, §3.3).

Port of the reference scheduler semantics (java_code/.../ScheduleRunner.java):
- 60 s poll loop firing due schedules (:26-58)
- due = Enabled AND NextRunAt IS NOT NULL AND NextRunAt <= now (:39)
- next-run computation (:74-111): daily at HH:mm; weekly with
  day-of-week modulo arithmetic (:83-94); monthly with end-of-month
  clamping (:95-104) — e.g. day_of_month=31 in February fires on the
  28th/29th.

The clock is injected (``now_fn``) so tests are deterministic. The
schedule table itself lives in the control store pattern (tiny metadata
— driver-side), while fired pipelines run through the Spark runner.
"""

from __future__ import annotations

import calendar
import threading
import time as _time
from datetime import datetime, time, timedelta
from typing import Callable

POLL_SECONDS = 60  # ScheduleRunner.java:33


def _parse_run_at(run_at_time: str) -> time:
    hh, mm = run_at_time.split(":")
    return time(int(hh), int(mm))


def _clamp_day(year: int, month: int, day: int) -> int:
    """End-of-month clamp (ScheduleRunner.java:96-103): day 31 in a
    30-day month -> 30; Feb 29/30/31 -> 28 or 29."""
    return min(day, calendar.monthrange(year, month)[1])


def compute_next_run(
    schedule_type: str,
    run_at_time: str,
    now: datetime,
    day_of_week: int | None = None,
    day_of_month: int | None = None,
) -> datetime:
    """Next fire time strictly after ``now``.

    - daily: today at HH:mm if still ahead, else tomorrow (:105-108)
    - weekly: next occurrence of day_of_week (1=Mon..7=Sun) at HH:mm,
      modulo arithmetic incl. same-day-but-passed -> +7 days (:83-94)
    - monthly: day_of_month clamped to month length; if this month's
      occurrence passed, roll to next month and re-clamp (:95-104)
    """
    at = _parse_run_at(run_at_time)
    if schedule_type == "daily":
        candidate = datetime.combine(now.date(), at, tzinfo=now.tzinfo)
        if candidate <= now:
            candidate += timedelta(days=1)
        return candidate
    if schedule_type == "weekly":
        if day_of_week is None:
            raise ValueError("weekly schedule requires day_of_week (1=Mon..7=Sun)")
        if not 1 <= int(day_of_week) <= 7:
            # range-check here (not just in the HTML form, which is
            # client-side only): (8 - isoweekday) % 7 would otherwise
            # SILENTLY fold an out-of-range day onto an arbitrary one
            raise ValueError(
                f"day_of_week must be 1=Mon..7=Sun, got {day_of_week}"
            )
        days_ahead = (day_of_week - (now.isoweekday())) % 7
        candidate = datetime.combine(
            now.date() + timedelta(days=days_ahead), at, tzinfo=now.tzinfo
        )
        if candidate <= now:
            candidate += timedelta(days=7)
        return candidate
    if schedule_type == "monthly":
        if day_of_month is None:
            raise ValueError("monthly schedule requires day_of_month")
        if not 1 <= int(day_of_month) <= 31:
            # 29-31 clamp to month length (reference parity); beyond 31
            # is out of the domain entirely
            raise ValueError(
                f"day_of_month must be 1..31, got {day_of_month}"
            )
        year, month = now.year, now.month
        day = _clamp_day(year, month, day_of_month)
        candidate = datetime.combine(
            now.date().replace(day=day), at, tzinfo=now.tzinfo
        )
        if candidate <= now:
            month += 1
            if month > 12:
                month, year = 1, year + 1
            day = _clamp_day(year, month, day_of_month)
            candidate = datetime.combine(
                datetime(year, month, day).date(), at, tzinfo=now.tzinfo
            )
        return candidate
    raise ValueError(f"unknown schedule_type: {schedule_type}")


def _coerce_dt(v) -> datetime | None:
    """Accept a datetime or its ISO string form (schedules persisted
    through a JSON/control-table round-trip come back as strings; a
    raw comparison would TypeError inside the poller and disable every
    schedule, not just the malformed one)."""
    if v is None or isinstance(v, datetime):
        return v
    if isinstance(v, str):
        return datetime.fromisoformat(v)
    raise TypeError(f"next_run_at must be datetime or ISO string, got {type(v)}")


class ScheduleRunner:
    """Driver-side poller: fires due schedules against the pipeline
    runner, then stamps last_run_at and recomputes next_run_at
    (ScheduleRunner.java:60-71). Schedules are plain dicts held by the
    caller (persist them wherever the control tables live).

    Concurrency contract: ``run_due`` CLAIMS a due schedule under the
    lock (advancing next_run_at before firing), so a manual run_due
    racing the poller thread — or start() called twice — fires each
    scheduled occurrence AT MOST ONCE. The reference stamps after the
    run (single-threaded servlet context, ScheduleRunner.java:60-71);
    claim-first is the same next-fire arithmetic, just race-safe.
    A schedule whose recompute fails (malformed fields slipped past
    add() via an explicit next_run_at) is DISABLED and recorded rather
    than re-fired every tick."""

    MAX_ERRORS = 200  # bounded: a forever-failing fire must not leak

    def __init__(
        self,
        fire: Callable[[dict], None],
        now_fn: Callable[[], datetime] = datetime.utcnow,
        poll_seconds: float = POLL_SECONDS,
    ):
        from collections import deque

        self.fire = fire
        self.now_fn = now_fn
        self.poll_seconds = poll_seconds
        self.schedules: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # (schedule_id, message); deque so a hot failure can't grow
        # driver memory without bound
        self.errors = deque(maxlen=self.MAX_ERRORS)

    def add(self, schedule: dict) -> None:
        s = dict(schedule)
        # ALWAYS validate by computing the next fire time — even when
        # the caller supplies next_run_at explicitly. A malformed
        # schedule must fail HERE (the caller's stack) instead of
        # inside the poller tick after its first fire.
        computed = compute_next_run(
            s["schedule_type"],
            s["run_at_time"],
            self.now_fn(),
            s.get("day_of_week"),
            s.get("day_of_month"),
        )
        s["next_run_at"] = (
            _coerce_dt(s.get("next_run_at"))
            if s.get("next_run_at") is not None
            else computed
        )
        with self._lock:
            self.schedules[s["schedule_id"]] = s

    def update(self, schedule_id: str, fields: dict) -> bool:
        """Atomic read-merge-validate-write under the runner lock (a
        lock-released merge would let two concurrent updates silently
        drop each other's fields). Recomputes/validates next_run_at
        through the same path as add(); raises ValueError on malformed
        fields WITHOUT touching the stored schedule. Returns False if
        the schedule doesn't exist."""
        with self._lock:
            cur = self.schedules.get(schedule_id)
            if cur is None:
                return False
            merged = dict(cur)
            merged.update(fields)
            merged["next_run_at"] = compute_next_run(
                merged["schedule_type"],
                merged["run_at_time"],
                self.now_fn(),
                merged.get("day_of_week"),
                merged.get("day_of_month"),
            )
            self.schedules[schedule_id] = merged
            return True

    def run_due(self) -> list[str]:
        """One poll tick (ScheduleRunner.java:36-58). Returns fired ids.

        A failing fire() must not kill the poller or hot-loop: the
        error is recorded on ``self.errors`` and next_run_at has
        ALREADY advanced at claim time (the reference's poll loop
        likewise survives a failed run and retries at the next
        scheduled time, not every 60 s)."""
        now = self.now_fn()
        claimed = []
        with self._lock:
            for s in self.schedules.values():
                if not s.get("enabled", True):
                    continue
                try:
                    nra = _coerce_dt(s.get("next_run_at"))
                except (TypeError, ValueError) as e:
                    s["enabled"] = False
                    self.errors.append((s.get("schedule_id", "?"), str(e)))
                    continue
                if nra is None or nra > now:
                    continue
                # claim: advance before firing so a concurrent tick
                # cannot double-fire this occurrence
                s["last_run_at"] = now
                try:
                    s["next_run_at"] = compute_next_run(
                        s["schedule_type"],
                        s["run_at_time"],
                        now,
                        s.get("day_of_week"),
                        s.get("day_of_month"),
                    )
                except Exception as e:  # noqa: BLE001 — never hot-loop
                    s["enabled"] = False
                    self.errors.append((s.get("schedule_id", "?"), str(e)))
                    continue
                claimed.append(s)
        fired = []
        for s in claimed:
            try:
                self.fire(s)
                fired.append(s["schedule_id"])
            except Exception as e:  # noqa: BLE001 — poller must survive
                self.errors.append((s["schedule_id"], str(e)))
        return fired

    def start(self) -> None:
        def loop():
            while not self._stop.is_set():
                try:
                    self.run_due()
                except Exception as e:  # noqa: BLE001 — keep polling
                    self.errors.append(("_poll", str(e)))
                self._stop.wait(self.poll_seconds)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


def pipeline_fire(runner, pipeline_name_prefix: str = "ScheduledPipeline"):
    """Production fire callback: run the 4-stage pipeline against the
    schedule's saved source file (ScheduleRunner.java:50-51 calls
    PipelineRunner.startPipelineRun(sourcePath) the same way). The
    pipeline name carries the schedule name so GET /runs attributes
    the run to its schedule.

    A schedule without a source_path raises — the poller records it on
    ``ScheduleRunner.errors`` and (by the claim-first contract) does
    NOT hot-loop the broken schedule."""

    def fire(schedule: dict) -> str:
        source = schedule.get("source_path")
        if not source:
            raise ValueError(
                f"schedule {schedule.get('schedule_id')} has no source_path"
            )
        name = schedule.get("name") or schedule.get("schedule_id") or "?"
        return runner.run(
            source_path=source,
            pipeline_name=f"{pipeline_name_prefix}:{name}",
        )

    return fire
