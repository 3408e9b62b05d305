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
        if not day_of_week:
            raise ValueError("weekly schedule requires day_of_week (1=Mon..7=Sun)")
        days_ahead = (day_of_week - (now.isoweekday())) % 7
        candidate = datetime.combine(
            now.date() + timedelta(days=days_ahead), at, tzinfo=now.tzinfo
        )
        if candidate <= now:
            candidate += timedelta(days=7)
        return candidate
    if schedule_type == "monthly":
        if not day_of_month:
            raise ValueError("monthly schedule requires day_of_month")
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


class ScheduleRunner:
    """Driver-side poller: fires due schedules against the pipeline
    runner, then stamps last_run_at and recomputes next_run_at
    (ScheduleRunner.java:60-71). Schedules are plain dicts held by the
    caller (persist them wherever the control tables live)."""

    def __init__(
        self,
        fire: Callable[[dict], None],
        now_fn: Callable[[], datetime] = datetime.utcnow,
        poll_seconds: float = POLL_SECONDS,
    ):
        self.fire = fire
        self.now_fn = now_fn
        self.poll_seconds = poll_seconds
        self.schedules: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.errors: list[tuple[str, str]] = []  # (schedule_id, message)

    def add(self, schedule: dict) -> None:
        s = dict(schedule)
        if s.get("next_run_at") is None:
            s["next_run_at"] = compute_next_run(
                s["schedule_type"],
                s["run_at_time"],
                self.now_fn(),
                s.get("day_of_week"),
                s.get("day_of_month"),
            )
        with self._lock:
            self.schedules[s["schedule_id"]] = s

    def run_due(self) -> list[str]:
        """One poll tick (ScheduleRunner.java:36-58). Returns fired ids.

        A failing fire() must not kill the poller or hot-loop: the
        error is recorded on ``self.errors`` and next_run_at STILL
        advances (the reference's poll loop likewise survives a failed
        run and retries at the next scheduled time, not every 60 s).
        The snapshot under the lock keeps a concurrent add() from
        breaking the iteration."""
        now = self.now_fn()
        fired = []
        with self._lock:
            due = [
                s for s in self.schedules.values()
                if s.get("enabled", True)
                and s.get("next_run_at") is not None
                and s["next_run_at"] <= now
            ]
        for s in due:
            try:
                self.fire(s)
                fired.append(s["schedule_id"])
            except Exception as e:  # noqa: BLE001 — poller must survive
                self.errors.append((s["schedule_id"], str(e)))
            s["last_run_at"] = now
            s["next_run_at"] = compute_next_run(
                s["schedule_type"],
                s["run_at_time"],
                now,
                s.get("day_of_week"),
                s.get("day_of_month"),
            )
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
