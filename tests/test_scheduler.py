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


def test_add_validates_even_with_explicit_next_run_at():
    """A malformed schedule must fail at add() (the caller's stack),
    never inside a poller tick after its first fire — that was a
    duplicate-fire-every-60s bug."""
    import pytest

    r = ScheduleRunner(fire=lambda s: None, now_fn=lambda: datetime(2024, 3, 10, 8, 0))
    with pytest.raises(ValueError, match="day_of_week"):
        r.add(
            {
                "schedule_id": "bad",
                "schedule_type": "weekly",
                "run_at_time": "09:00",
                "next_run_at": datetime(2024, 3, 1, 9, 0),  # explicit, past
            }
        )
    assert r.schedules == {}


def test_iso_string_next_run_at_is_coerced():
    """Schedules reloaded from a JSON/control-table round-trip carry
    next_run_at as an ISO string; one such schedule must not disable
    the whole poller (it used to TypeError the due comprehension)."""
    clock = {"now": datetime(2024, 3, 10, 9, 1)}
    fired = []
    r = ScheduleRunner(fire=lambda s: fired.append(s["schedule_id"]), now_fn=lambda: clock["now"])
    r.add(
        {
            "schedule_id": "s-str",
            "schedule_type": "daily",
            "run_at_time": "09:00",
            "next_run_at": "2024-03-10T09:00:00",
        }
    )
    assert r.run_due() == ["s-str"]
    assert r.schedules["s-str"]["next_run_at"] == datetime(2024, 3, 11, 9, 0)


def test_concurrent_run_due_fires_each_occurrence_once():
    """run_due claims under the lock (advancing next_run_at BEFORE
    firing), so a manual tick racing the poller thread cannot
    double-fire one scheduled occurrence."""
    import threading as th
    import time as t

    clock = {"now": datetime(2024, 3, 10, 9, 1)}
    fired = []

    def slow_fire(s):
        t.sleep(0.2)
        fired.append(s["schedule_id"])

    r = ScheduleRunner(fire=slow_fire, now_fn=lambda: clock["now"])
    r.add({"schedule_id": "s1", "schedule_type": "daily", "run_at_time": "09:00"})
    # force due
    r.schedules["s1"]["next_run_at"] = datetime(2024, 3, 10, 9, 0)
    threads = [th.Thread(target=r.run_due) for _ in range(4)]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert fired == ["s1"], f"double-fired: {fired}"


def test_corrupted_schedule_is_disabled_not_hot_looped():
    """A schedule whose recompute fails (fields corrupted after add)
    is disabled and recorded once — never re-fired every tick, and
    healthy schedules keep firing."""
    clock = {"now": datetime(2024, 3, 10, 9, 1)}
    fired = []
    r = ScheduleRunner(fire=lambda s: fired.append(s["schedule_id"]), now_fn=lambda: clock["now"])
    r.add({"schedule_id": "bad", "schedule_type": "daily", "run_at_time": "09:00"})
    r.add({"schedule_id": "good", "schedule_type": "daily", "run_at_time": "09:00"})
    r.schedules["bad"]["run_at_time"] = "junk"  # corrupt post-add
    r.schedules["bad"]["next_run_at"] = datetime(2024, 3, 10, 9, 0)
    r.schedules["good"]["next_run_at"] = datetime(2024, 3, 10, 9, 0)
    assert r.run_due() == ["good"]
    assert not r.schedules["bad"]["enabled"]
    assert [sid for sid, _ in r.errors] == ["bad"]
    # next tick: bad stays silent, no error spam
    clock["now"] = datetime(2024, 3, 10, 9, 2)
    r.run_due()
    assert len(r.errors) == 1


def test_error_list_is_bounded():
    clock = {"now": datetime(2024, 3, 10, 9, 1)}

    def always_fail(s):
        raise RuntimeError("boom")

    r = ScheduleRunner(fire=always_fail, now_fn=lambda: clock["now"])
    r.add({"schedule_id": "f", "schedule_type": "daily", "run_at_time": "09:00"})
    for i in range(ScheduleRunner.MAX_ERRORS + 50):
        r.schedules["f"]["next_run_at"] = clock["now"]
        r.run_due()
    assert len(r.errors) == ScheduleRunner.MAX_ERRORS
