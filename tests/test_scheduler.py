"""Scheduler semantics tests — the computeNextRun port has real edge
cases (month-length clamping, same-day-but-passed rollover) mirrored
from ScheduleRunner.java:74-111."""

from __future__ import annotations

from datetime import datetime

from automated_data_pipeline_spark.scheduler import ScheduleRunner, compute_next_run


def test_daily_ahead_and_passed():
    now = datetime(2024, 3, 10, 8, 0)
    assert compute_next_run("daily", "09:30", now) == datetime(2024, 3, 10, 9, 30)
    now = datetime(2024, 3, 10, 10, 0)
    assert compute_next_run("daily", "09:30", now) == datetime(2024, 3, 11, 9, 30)


def test_weekly_modulo():
    # 2024-03-10 is a Sunday (isoweekday 7)
    now = datetime(2024, 3, 10, 8, 0)
    assert compute_next_run("weekly", "09:00", now, day_of_week=3) == datetime(
        2024, 3, 13, 9, 0
    )  # Wednesday
    # same day, time already passed -> +7 days (ScheduleRunner.java:89-93)
    now = datetime(2024, 3, 10, 10, 0)
    assert compute_next_run("weekly", "09:00", now, day_of_week=7) == datetime(
        2024, 3, 17, 9, 0
    )
    # same day, time still ahead -> today
    now = datetime(2024, 3, 10, 8, 0)
    assert compute_next_run("weekly", "09:00", now, day_of_week=7) == datetime(
        2024, 3, 10, 9, 0
    )


def test_monthly_clamp_february():
    # day 31 requested; February clamps to 29 (2024 is a leap year) —
    # ScheduleRunner.java:96-103
    now = datetime(2024, 2, 1, 0, 0)
    assert compute_next_run("monthly", "06:00", now, day_of_month=31) == datetime(
        2024, 2, 29, 6, 0
    )
    # non-leap year clamps to 28
    now = datetime(2023, 2, 1, 0, 0)
    assert compute_next_run("monthly", "06:00", now, day_of_month=31) == datetime(
        2023, 2, 28, 6, 0
    )


def test_monthly_rollover_and_reclamp():
    # passed this month -> next month, re-clamped (31 -> Apr 30)
    now = datetime(2024, 3, 31, 12, 0)
    assert compute_next_run("monthly", "06:00", now, day_of_month=31) == datetime(
        2024, 4, 30, 6, 0
    )
    # December -> January year rollover
    now = datetime(2024, 12, 31, 12, 0)
    assert compute_next_run("monthly", "06:00", now, day_of_month=31) == datetime(
        2025, 1, 31, 6, 0
    )


def test_poller_fires_due_and_recomputes():
    clock = {"now": datetime(2024, 3, 10, 8, 59)}
    fired = []
    r = ScheduleRunner(fire=lambda s: fired.append(s["schedule_id"]), now_fn=lambda: clock["now"])
    r.add(
        {
            "schedule_id": "s1",
            "schedule_type": "daily",
            "run_at_time": "09:00",
            "source_path": "/x.csv",
            "enabled": True,
        }
    )
    assert r.run_due() == []  # not due yet
    clock["now"] = datetime(2024, 3, 10, 9, 1)
    assert r.run_due() == ["s1"]
    assert fired == ["s1"]
    # recomputed to tomorrow; firing again now does nothing
    assert r.schedules["s1"]["next_run_at"] == datetime(2024, 3, 11, 9, 0)
    assert r.run_due() == []
    # disabled schedules never fire (P7 predicate)
    r.schedules["s1"]["enabled"] = False
    clock["now"] = datetime(2024, 3, 11, 9, 1)
    assert r.run_due() == []
