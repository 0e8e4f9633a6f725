"""ProcessList / KILL QUERY / max_execution_time — the runtime
admission-control surface.

Reference: ``Interpreters/ProcessList.h`` (the registry of running
queries), ``Interpreters/InterpreterKillQueryQuery.cpp`` (KILL QUERY
resolves matching entries and cancels them), and
``Interpreters/executeQuery.cpp:174-189`` (the per-query time limit).

Spark-first translation: cluster-level admission (quotas, slots,
preemption) belongs to the cluster manager, but the PER-QUERY runtime
contract is expressible in a session — every dialect query runs under
a unique Spark *job group* with ``interruptOnCancel``, so it can be
cancelled mid-flight:

- ``KILL QUERY WHERE query_id = '...'`` cancels the matching group
  (``SparkContext.cancelJobGroup`` interrupts its running stages);
- ``SETTINGS max_execution_time = N`` arms a daemon watchdog that
  cancels the group when the deadline passes — including jobs the
  client only materializes later (lazy ``collect()``), because the
  job-group binding is thread-local and outlives ``execute()``.

The cancelled job surfaces to the caller as Spark's job-group
cancellation error; the entry's ``status`` records WHY
(``TimedOut`` / ``Killed``), which ``system.processes`` and tests
read.  Scale note: this is driver-side metadata only — one dict entry
and one timer per in-flight query.
"""

from __future__ import annotations

import threading
import time
import uuid


class QueryTimeoutError(RuntimeError):
    """Raised when a query known to have hit max_execution_time is
    re-checked (executeQuery.cpp's "Timeout exceeded" path)."""


class ProcessList:
    """Registry of in-flight dialect queries, keyed by query_id."""

    def __init__(self, spark):
        self.spark = spark
        self._entries: dict[str, dict] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------ lifecycle

    def begin(
        self,
        query: str,
        query_id: str | None = None,
        max_execution_time: float | None = None,
        user: str = "default",
    ) -> str:
        """Register ``query`` and bind the CURRENT THREAD's Spark jobs
        to its job group.  Returns the query_id."""
        qid = query_id or uuid.uuid4().hex[:16]
        group = f"chq-{qid}"
        sc = self.spark.sparkContext
        sc.setJobGroup(group, query.replace("\n", " ")[:256],
                       interruptOnCancel=True)
        entry = {
            "query_id": qid,
            "query": query,
            "user": user,
            "group": group,
            "start": time.monotonic(),
            "status": "Running",
            "timer": None,
        }
        with self._lock:
            self._entries[qid] = entry
        if max_execution_time is not None and max_execution_time > 0:
            t = threading.Timer(
                float(max_execution_time), self._timeout, args=(qid,)
            )
            t.daemon = True
            entry["timer"] = t
            t.start()
        return qid

    def finish(self, query_id: str) -> dict | None:
        """Deregister a completed query and disarm its watchdog.
        Returns the retired entry (callers account elapsed time
        against quotas) or None if already retired."""
        with self._lock:
            entry = self._entries.pop(query_id, None)
        if entry and entry["timer"] is not None:
            entry["timer"].cancel()
        return entry

    # ------------------------------------------------ cancellation

    def _cancel_group(self, group: str) -> None:
        sc = self.spark.sparkContext
        # also mark jobs SUBMITTED after the deadline as cancelled —
        # a lazy collect whose job starts late must still be refused.
        # The JVM SparkContext has cancelJobGroupAndFutureJobs (3.5+);
        # the PySpark wrapper doesn't expose it yet.
        try:
            sc._jsc.sc().cancelJobGroupAndFutureJobs(group)
        except Exception:  # pragma: no cover - older Spark fallback
            sc.cancelJobGroup(group)

    def _cancel_until_finished(self, query_id: str, group: str) -> None:
        """Cancel ``group`` and keep re-cancelling until the entry is
        retired OR the group has no active jobs left.  The future-jobs
        marker alone marks a late-submitted job cancelled but does NOT
        interrupt its already-running tasks (measured: the error
        surfaces only when the tasks finish); a plain cancelJobGroup
        tick interrupts them promptly.  Each tick is one driver-side
        RPC — bounded by ``finish()``, by the jobs draining (a victim
        whose caller never retires the entry must not keep a canceller
        spinning for the full cap), or by the cap."""
        self._cancel_group(group)
        sc = self.spark.sparkContext
        idle_ticks = 0
        for _ in range(2400):  # 20 min cap at 0.5 s/tick
            time.sleep(0.5)
            with self._lock:
                if query_id not in self._entries:
                    return
            try:
                tracker = sc.statusTracker()
                active = [
                    j
                    for j in tracker.getJobIdsForGroup(group)
                    if (info := tracker.getJobInfo(j)) is not None
                    and str(info.status) == "RUNNING"
                ]
            except Exception:  # pragma: no cover - tracker hiccup
                active = [None]  # assume busy; keep ticking
            if not active:
                # a few grace ticks: a cancelled job may be between
                # submission and visibility in the status tracker
                idle_ticks += 1
                if idle_ticks >= 4:
                    return
                continue
            idle_ticks = 0
            sc.cancelJobGroup(group)

    def _spawn_canceller(self, query_id: str, group: str) -> None:
        t = threading.Thread(
            target=self._cancel_until_finished, args=(query_id, group),
            daemon=True,
        )
        t.start()

    def _timeout(self, query_id: str) -> None:
        with self._lock:
            entry = self._entries.get(query_id)
            if entry is None or entry["status"] != "Running":
                return
            entry["status"] = "TimedOut"
        self._cancel_until_finished(query_id, entry["group"])

    def kill(self, query_id: str | None = None,
             user: str | None = None) -> list[tuple[str, str, str, str]]:
        """KILL QUERY: cancel every running entry matching the WHERE
        fields; returns (kill_status, query_id, user, query) rows
        (InterpreterKillQueryQuery.cpp block shape)."""
        rows = []
        with self._lock:
            matches = [
                e for e in self._entries.values()
                if e["status"] == "Running"
                and (query_id is None or e["query_id"] == query_id)
                and (user is None or e["user"] == user)
            ]
            for e in matches:
                e["status"] = "Killed"
        for e in matches:
            self._spawn_canceller(e["query_id"], e["group"])
            rows.append(
                ("finished", e["query_id"], e["user"], e["query"])
            )
        return rows

    # ------------------------------------------------ introspection

    def status(self, query_id: str) -> str | None:
        with self._lock:
            e = self._entries.get(query_id)
            return e["status"] if e else None

    def check(self, query_id: str) -> None:
        """Raise QueryTimeoutError if the entry was watchdog-cancelled
        — converts Spark's generic cancellation into the reference's
        "Timeout exceeded" error class."""
        if self.status(query_id) == "TimedOut":
            raise QueryTimeoutError(
                "Timeout exceeded: query was cancelled by "
                "max_execution_time (code 159, TIMEOUT_EXCEEDED)"
            )

    def running(self) -> list[dict]:
        """Snapshot of in-flight entries (system.processes rows)."""
        with self._lock:
            return [
                dict(e, elapsed=time.monotonic() - e["start"])
                for e in self._entries.values()
            ]
