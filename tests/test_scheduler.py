"""Cron parsing + scheduler semantics (SURVEY.md A18)."""

from __future__ import annotations

from datetime import datetime

import pytest

from datalakeingestionservice_spark.pipeline.scheduler import (
    CronParseError,
    CronSchedule,
    JobScheduler,
)


def test_reference_cron_every_minute():
    """`0 */1 * * * ?` — the hr-oracle dataset's trigger."""
    s = CronSchedule("0 */1 * * * ?")
    assert s.next_fire(datetime(2026, 1, 1, 10, 0, 0)) == datetime(2026, 1, 1, 10, 1, 0)
    assert s.next_fire(datetime(2026, 1, 1, 10, 0, 30)) == datetime(2026, 1, 1, 10, 1, 0)


def test_reference_cron_every_two_minutes():
    s = CronSchedule("0 */2 * * * ?")
    assert s.next_fire(datetime(2026, 1, 1, 10, 1, 0)) == datetime(2026, 1, 1, 10, 2, 0)
    assert s.next_fire(datetime(2026, 1, 1, 10, 2, 0)) == datetime(2026, 1, 1, 10, 4, 0)


def test_daily_and_dow_and_five_field():
    daily = CronSchedule("0 30 2 * * ?")
    assert daily.next_fire(datetime(2026, 1, 1, 3, 0)) == datetime(2026, 1, 2, 2, 30)
    mondays = CronSchedule("0 0 9 ? * MON")
    nxt = mondays.next_fire(datetime(2026, 1, 1, 0, 0))  # Thu Jan 1 2026
    assert nxt == datetime(2026, 1, 5, 9, 0) and nxt.weekday() == 0
    classic = CronSchedule("*/15 * * * *")  # 5-field: minutes
    assert classic.next_fire(datetime(2026, 1, 1, 10, 7)) == datetime(2026, 1, 1, 10, 15)


def test_cron_rejects_garbage():
    with pytest.raises(CronParseError):
        CronSchedule("not a cron")
    with pytest.raises(CronParseError):
        CronSchedule("0 0 0 0")


def test_scheduler_fires_due_jobs_once():
    fired = []
    sched = JobScheduler()
    sched.add("a", "0 */1 * * * ?", lambda: fired.append("a"))
    sched.add("b", "0 0 12 * * ?", lambda: fired.append("b"))

    t = datetime(2026, 1, 1, 10, 0, 30)
    assert sched.run_pending(t) == []  # neither due yet at first observation
    t = datetime(2026, 1, 1, 10, 1, 0)
    assert sched.run_pending(t) == ["a"]
    assert sched.run_pending(t) == []  # not re-fired at the same instant
    t = datetime(2026, 1, 1, 12, 0, 0)
    assert set(sched.run_pending(t)) == {"a", "b"}
    assert fired.count("a") == 2 and fired.count("b") == 1
