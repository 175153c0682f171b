"""Cron scheduling parity (SURVEY.md A18) — out-of-engine driver loop.

The reference schedules one Quartz job per enabled dataset with 6/7-field cron
triggers and per-dataset non-overlap (`JobSchedulingService.cs:24-75`,
`[DisallowConcurrentExecution]`). This module gives the same semantics without
external deps: a Quartz-subset cron parser (sec min hour dom mon dow [year];
`*`, `?`, `a`, `a-b`, `a/s`, `*/s`, lists) and a scheduler loop that fires due
datasets, never overlapping runs of the same dataset.

At real deployment scale this is an Airflow/workflow-engine concern; the
engine only promises the run function is safe to trigger per dataset.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timedelta

_FIELD_RANGES = [
    (0, 59),  # second
    (0, 59),  # minute
    (0, 23),  # hour
    (1, 31),  # day of month
    (1, 12),  # month
    (0, 6),   # day of week (internal Sun=0..Sat=6; see _atom_value for input)
]

_DOW_NAMES = {"sun": 0, "mon": 1, "tue": 2, "wed": 3, "thu": 4, "fri": 5, "sat": 6}
_MON_NAMES = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


class CronParseError(ValueError):
    pass


def _atom_value(token: str, idx: int) -> int:
    token = token.lower()
    if idx == 5 and token in _DOW_NAMES:
        return _DOW_NAMES[token]
    if idx == 4 and token in _MON_NAMES:
        return _MON_NAMES[token]
    try:
        v = int(token)
    except ValueError:
        raise CronParseError(f"bad cron atom: {token!r}") from None
    if idx == 5:
        # Quartz convention (JobSchedulingService.cs triggers): numeric dow is
        # 1-7 = SUN-SAT; 0 is also accepted as SUN. Internal form is Sun=0.
        if not 0 <= v <= 7:
            raise CronParseError(f"day-of-week out of range: {token!r}")
        return 0 if v == 0 else v - 1
    return v


def _parse_field(field_text: str, idx: int) -> set[int]:
    lo, hi = _FIELD_RANGES[idx]
    allowed: set[int] = set()
    for raw in field_text.split(","):
        part = raw
        step = 1
        has_step = "/" in raw
        if has_step:
            part, step_text = raw.split("/", 1)
            step = int(step_text)
            if step <= 0:
                raise CronParseError(f"bad step in {field_text!r}")
        if part in ("*", "?", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = _atom_value(a, idx), _atom_value(b, idx)
        else:
            start = _atom_value(part, idx)
            end = hi if has_step else start
        for v in range(start, end + 1, step):
            allowed.add(v)
    if not allowed:
        raise CronParseError(f"empty cron field: {field_text!r}")
    return allowed


@dataclass
class CronSchedule:
    """Quartz-subset cron: `sec min hour dom mon dow [year]`."""

    expression: str
    _fields: list[set[int]] = field(default_factory=list, repr=False)

    def __post_init__(self) -> None:
        parts = self.expression.split()
        if len(parts) == 7:
            parts = parts[:6]  # year field: treated as '*'
        if len(parts) == 5:
            parts = ["0", *parts]  # classic 5-field cron: fire at second 0
        if len(parts) != 6:
            raise CronParseError(
                f"expected 5/6/7 cron fields, got {len(parts)}: {self.expression!r}"
            )
        self._fields = [_parse_field(p, i) for i, p in enumerate(parts)]

    def matches(self, ts: datetime) -> bool:
        sec, minute, hour, dom, mon, dow = self._fields
        return (
            ts.second in sec
            and ts.minute in minute
            and ts.hour in hour
            and ts.day in dom
            and ts.month in mon
            and ((ts.weekday() + 1) % 7) in dow  # python Mon=0 -> cron Sun=0
        )

    def next_fire(self, after: datetime) -> datetime:
        """Smallest matching time strictly after `after` (search bounded 366d)."""
        ts = (after + timedelta(seconds=1)).replace(microsecond=0)
        horizon = after + timedelta(days=366)
        sec, minute, hour, dom, mon, dow = self._fields
        while ts <= horizon:
            if ts.month not in mon:
                ts = (ts.replace(day=1, hour=0, minute=0, second=0)
                      + timedelta(days=32)).replace(day=1)
                continue
            if ts.day not in dom or ((ts.weekday() + 1) % 7) not in dow:
                ts = ts.replace(hour=0, minute=0, second=0) + timedelta(days=1)
                continue
            if ts.hour not in hour:
                ts = ts.replace(minute=0, second=0) + timedelta(hours=1)
                continue
            if ts.minute not in minute:
                ts = ts.replace(second=0) + timedelta(minutes=1)
                continue
            if ts.second not in sec:
                ts += timedelta(seconds=1)
                continue
            return ts
        raise CronParseError(f"no fire time within a year: {self.expression!r}")


@dataclass
class ScheduledDataset:
    dataset_id: str
    schedule: CronSchedule
    run: Callable[[], object]
    next_fire: datetime | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


class JobScheduler:
    """Fires due dataset jobs; same-dataset runs never overlap
    (`[DisallowConcurrentExecution]` parity)."""

    def __init__(self) -> None:
        self._jobs: dict[str, ScheduledDataset] = {}

    def add(
        self, dataset_id: str, cron_expression: str, run: Callable[[], object]
    ) -> None:
        self._jobs[dataset_id] = ScheduledDataset(
            dataset_id, CronSchedule(cron_expression), run
        )

    def run_pending(self, now: datetime) -> list[str]:
        """Fire every job whose next_fire <= now; returns fired dataset ids.
        A job still running from a previous fire is skipped, not queued."""
        fired: list[str] = []
        for job in self._jobs.values():
            if job.next_fire is None:
                job.next_fire = job.schedule.next_fire(now - timedelta(seconds=1))
            if job.next_fire <= now:
                if job._lock.acquire(blocking=False):
                    try:
                        job.run()
                        fired.append(job.dataset_id)
                    finally:
                        job._lock.release()
                job.next_fire = job.schedule.next_fire(now)
        return fired
