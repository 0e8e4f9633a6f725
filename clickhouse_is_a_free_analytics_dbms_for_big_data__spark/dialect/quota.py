"""Per-user resource quotas — the usage-accounting half of admission
control.

Reference: ``Interpreters/Quota.h`` / ``Quota.cpp`` — a quota is a set
of time intervals (e.g. hour, day), each carrying maximums for seven
counters (``QuotaValues``: queries, errors, result rows/bytes, read
rows/bytes, execution time); ``executeQuery.cpp:174-177`` counts the
query and checks the limits before running, ``:95,:298`` count errors,
and the profiling stream layer (``IProfilingBlockInputStream.cpp:212,
305``) accounts result/read rows+bytes and execution time as blocks
flow, re-checking after each add.  Accounting is "soft" (may slightly
exceed — checked per block, not per row), counters reset when the
interval window rolls over (``QuotaForInterval::updateTime``), and a
keyed quota (``Quota::is_keyed``) tracks an independent counter set
per client-supplied key while sharing one set of maximums.

Spark-first translation: the counters are driver-side metadata (one
dict per interval), so this is pure session bookkeeping — no cluster
state, no executor involvement.  ``queries``/``errors``/execution-time
accounting hooks into the dialect engine's ``execute()``/retire path;
result-row accounting hooks the engine's collect funnel
(``Engine.collect``), the analog of the reference's stream layer.
Zero maximum = unlimited, exactly as the reference.
"""

from __future__ import annotations

import threading
import time

__all__ = [
    "QuotaExpiredError",
    "QuotaForInterval",
    "QuotaForIntervals",
    "Quotas",
    "RESOURCES",
]

# (counter key, display name used in the exceeded-error message) —
# order and wording follow QuotaForInterval::checkExceeded
RESOURCES = (
    ("queries", "Queries"),
    ("errors", "Errors"),
    ("result_rows", "Total result rows"),
    ("result_bytes", "Total result bytes"),
    ("read_rows", "Total rows read"),
    ("read_bytes", "Total bytes read"),
    ("execution_time", "Total execution time"),
)
_KEYS = tuple(k for k, _ in RESOURCES)


class QuotaExpiredError(RuntimeError):
    """Quota.cpp:142 — ErrorCodes::QUOTA_EXPIRED (code 201)."""


def _zero() -> dict:
    return {k: 0 for k in _KEYS}


def _duration_phrase(duration: int) -> str:
    """Quota.cpp:126-137 — the human-readable interval length."""
    if duration == 3600:
        return "1 hour"
    if duration == 60:
        return "1 minute"
    if duration % 3600 == 0:
        return f"{duration // 3600} hours"
    if duration % 60 == 0:
        return f"{duration // 60} minutes"
    return f"{duration} seconds"


class QuotaForInterval:
    """Limits plus accumulated counters for ONE interval length.

    ``execution_time`` is accounted in seconds (float); the reference
    stores microseconds and compares whole seconds
    (``max.execution_time_usec / 1000000`` in checkExceeded) — we
    compare whole seconds the same way so the boundary behavior
    matches.
    """

    def __init__(self, duration: int, max_values: dict | None = None,
                 offset: int = 0):
        self.duration = int(duration)
        self.offset = int(offset)
        self.rounded_time = 0
        self.max = _zero()
        if max_values:
            unknown = set(max_values) - set(_KEYS)
            if unknown:
                raise ValueError(f"unknown quota resource(s): {unknown}")
            self.max.update(max_values)
        self.used = _zero()

    # -------------------------------------------------- accounting

    def _update_time(self, now: float) -> None:
        """QuotaForInterval::updateTime — roll the window, reset."""
        if now >= self.rounded_time + self.duration:
            self.rounded_time = (
                (int(now) - self.offset) // self.duration * self.duration
                + self.offset
            )
            self.used = _zero()

    def add_query(self) -> None:
        self.used["queries"] += 1

    def add_error(self) -> None:
        self.used["errors"] += 1

    def check_exceeded(self, now: float, quota_name: str,
                       user_name: str) -> None:
        self._update_time(now)
        for key, display in RESOURCES:
            max_amount = self.max[key]
            used_amount = self.used[key]
            if key == "execution_time":  # whole-second comparison
                max_amount, used_amount = int(max_amount), int(used_amount)
            self._check(max_amount, used_amount, display, quota_name,
                        user_name)

    def check_and_add_result(self, now: float, quota_name: str,
                             user_name: str, rows: int,
                             bytes_: int) -> None:
        self.used["result_rows"] += rows
        self.used["result_bytes"] += bytes_
        self.check_exceeded(now, quota_name, user_name)

    def check_and_add_read(self, now: float, quota_name: str,
                           user_name: str, rows: int, bytes_: int) -> None:
        self.used["read_rows"] += rows
        self.used["read_bytes"] += bytes_
        self.check_exceeded(now, quota_name, user_name)

    def check_and_add_execution_time(self, now: float, quota_name: str,
                                     user_name: str,
                                     seconds: float) -> None:
        self.used["execution_time"] += seconds
        self.check_exceeded(now, quota_name, user_name)

    def _check(self, max_amount, used_amount, resource_name: str,
               quota_name: str, user_name: str) -> None:
        """Quota.cpp:117-143 — zero max means unlimited; the error
        message carries interval end and the quota template name."""
        if max_amount and used_amount > max_amount:
            end = self.rounded_time + self.duration
            raise QuotaExpiredError(
                f"Quota for user '{user_name}' for "
                f"{_duration_phrase(self.duration)} has been exceeded. "
                f"{resource_name}: {used_amount}, max: {max_amount}. "
                f"Interval will end at {end}. "
                f"Name of quota template: '{quota_name}'. "
                f"(code 201, QUOTA_EXPIRED)"
            )

    def to_row(self) -> dict:
        """Usage snapshot (QuotaForInterval::toString, structured)."""
        return {
            "duration": self.duration,
            "interval_start": self.rounded_time,
            "interval_end": self.rounded_time + self.duration,
            **{f"used_{k}": self.used[k] for k in _KEYS},
            **{f"max_{k}": self.max[k] for k in _KEYS},
        }


class QuotaForIntervals:
    """All interval lengths for one (quota, user[, key]) — checks walk
    intervals largest-first so the error names the longest window
    first, as the reference's ordered map walk does."""

    def __init__(self, quota_name: str, user_name: str,
                 intervals: dict[int, dict]):
        self.quota_name = quota_name
        self.user_name = user_name
        self._intervals = [
            QuotaForInterval(d, limits)
            for d, limits in sorted(intervals.items(), reverse=True)
        ]
        self._lock = threading.Lock()

    def empty(self) -> bool:
        return not self._intervals

    def add_query(self) -> None:
        with self._lock:
            for it in self._intervals:
                it.add_query()

    def add_error(self) -> None:
        with self._lock:
            for it in self._intervals:
                it.add_error()

    def check_exceeded(self, now: float | None = None) -> None:
        now = time.time() if now is None else now
        with self._lock:
            for it in self._intervals:
                it.check_exceeded(now, self.quota_name, self.user_name)

    def check_and_add_result(self, rows: int, bytes_: int = 0,
                             now: float | None = None) -> None:
        now = time.time() if now is None else now
        with self._lock:
            for it in self._intervals:
                it.check_and_add_result(now, self.quota_name,
                                        self.user_name, rows, bytes_)

    def check_and_add_read(self, rows: int, bytes_: int = 0,
                           now: float | None = None) -> None:
        now = time.time() if now is None else now
        with self._lock:
            for it in self._intervals:
                it.check_and_add_read(now, self.quota_name,
                                      self.user_name, rows, bytes_)

    def check_and_add_execution_time(self, seconds: float,
                                     now: float | None = None) -> None:
        now = time.time() if now is None else now
        with self._lock:
            for it in self._intervals:
                it.check_and_add_execution_time(
                    now, self.quota_name, self.user_name, seconds)

    def add_execution_time(self, seconds: float) -> None:
        """Account elapsed time WITHOUT checking — used at query
        retire, where the query is already done and a raise would
        surface under the wrong statement; the next admission
        ``check_exceeded`` enforces it (mid-query overruns are the
        max_execution_time watchdog's job)."""
        with self._lock:
            for it in self._intervals:
                it.used["execution_time"] += seconds

    def usage(self) -> list[dict]:
        with self._lock:
            return [it.to_row() for it in self._intervals]


class _Quota:
    """One named quota template: shared maximums, per-key counters
    (Quota struct — ``quota_for_keys``; an unkeyed quota ignores any
    client key and stores everything under one slot)."""

    def __init__(self, name: str, intervals: dict[int, dict],
                 keyed: bool = False):
        self.name = name
        self.intervals = intervals
        self.keyed = keyed
        self._per_key: dict[tuple, QuotaForIntervals] = {}
        self._lock = threading.Lock()

    def get(self, user_name: str, key: str = "") -> QuotaForIntervals:
        # unkeyed: one shared counter set per user (reference stores
        # at key 0 and ignores a passed key rather than throwing)
        slot = (user_name, key if self.keyed else "")
        with self._lock:
            q = self._per_key.get(slot)
            if q is None:
                q = QuotaForIntervals(self.name, user_name, self.intervals)
                self._per_key[slot] = q
        return q


class Quotas:
    """Registry of quota templates (users.xml's <quotas> section)."""

    def __init__(self):
        self._quotas: dict[str, _Quota] = {}
        self._lock = threading.Lock()

    def configure(self, name: str, intervals: dict[int, dict],
                  keyed: bool = False) -> None:
        """Define/replace the quota template ``name``.

        ``intervals`` maps interval length in seconds to a dict of
        resource maximums (keys from :data:`RESOURCES`; missing or
        zero = unlimited), e.g.::

            quotas.configure("limited", {3600: {"queries": 100}})
        """
        with self._lock:
            self._quotas[name] = _Quota(name, intervals, keyed)

    def get(self, name: str, user_name: str,
            key: str = "") -> QuotaForIntervals:
        """Context::setQuota — resolve the counter set this user's
        session accounts against."""
        with self._lock:
            q = self._quotas.get(name)
        if q is None:
            raise KeyError(f"Unknown quota '{name}'")
        return q.get(user_name, key)

    def names(self) -> list[str]:
        with self._lock:
            return sorted(self._quotas)
