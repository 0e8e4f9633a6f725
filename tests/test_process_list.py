"""KILL QUERY / max_execution_time / system.processes
(dialect/process_list.py — Interpreters/ProcessList.h analog)."""

from __future__ import annotations

import threading
import time

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
    ChEngine,
)

# big enough that the scan runs for minutes on this container when
# uncancelled (float sum: no ANSI overflow cuts it short);
# cancellation interrupts it within a task batch
_SLOW = "SELECT sum(toFloat64(number)) FROM numbers(300000000000)"


@pytest.fixture(scope="module")
def eng(spark):
    return ChEngine(spark)


def test_max_execution_time_cancels_lazy_collect(eng):
    """SETTINGS max_execution_time=N arms a watchdog on the query's
    job group; a collect that blows the deadline is cancelled
    mid-flight and the entry records TimedOut (executeQuery.cpp's
    TIMEOUT_EXCEEDED path)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect.process_list import (
        QueryTimeoutError,
    )

    df = eng.execute(_SLOW + " SETTINGS max_execution_time = 1")
    t0 = time.monotonic()
    with pytest.raises(Exception):
        df.collect()
    assert time.monotonic() - t0 < 60  # cancelled, not run to the end
    qid = eng._qid_local.qid
    assert eng.process_list.status(qid) == "TimedOut"
    with pytest.raises(QueryTimeoutError, match="Timeout exceeded"):
        eng.process_list.check(qid)
    eng.finish_query()


def test_kill_query_cancels_running_collect(eng):
    """KILL QUERY WHERE query_id = '...' cancels the matching job
    group from ANOTHER thread and reports the
    (kill_status, query_id, user, query) block
    (InterpreterKillQueryQuery.cpp)."""
    errors = []
    started = threading.Event()

    def victim():
        df = eng.execute(_SLOW, query_id="victim-1")
        started.set()
        try:
            df.collect()
        except Exception as ex:  # noqa: BLE001 - recording for assert
            errors.append(ex)

    th = threading.Thread(target=victim, daemon=True)
    th.start()
    assert started.wait(30)
    time.sleep(2)  # let the collect submit its job
    rows = eng.execute(
        "KILL QUERY WHERE query_id = 'victim-1'"
    ).collect()
    assert [(r.kill_status, r.query_id, r.user) for r in rows] == [
        ("finished", "victim-1", "default")
    ]
    th.join(60)
    assert not th.is_alive(), "victim collect was not cancelled"
    assert errors, "victim collect returned instead of raising"
    assert eng.process_list.status("victim-1") == "Killed"
    # a second KILL matches nothing: the entry is no longer Running
    assert eng.execute(
        "KILL QUERY WHERE query_id = 'victim-1'"
    ).collect() == []


def test_kill_query_no_match_returns_empty_block(eng):
    df = eng.execute("KILL QUERY WHERE query_id = 'nope'")
    assert df.columns == ["kill_status", "query_id", "user", "query"]
    assert df.collect() == []


def test_watchdog_disarmed_when_query_finishes(eng):
    """A finished query's watchdog never fires: the next statement on
    the thread retires the previous entry (and its timer), so a fast
    query with a 1s limit cannot cancel later work."""
    eng.execute(
        "SELECT 1 SETTINGS max_execution_time = 1"
    ).collect()
    df = eng.execute("SELECT sum(number) AS s FROM numbers(1000)")
    time.sleep(1.3)  # past the (disarmed) deadline
    assert df.collect()[0].s == 499500
    eng.finish_query()


def test_system_processes_lists_other_inflight_queries(eng):
    """system.processes keeps its deterministic first row (the query
    being translated) and appends concurrent in-flight queries from
    other threads with their real query_id."""
    th = threading.Thread(
        target=lambda: eng.execute(_SLOW, query_id="inflight-7"),
        daemon=True,
    )
    th.start()
    th.join(30)  # execute() is lazy for SELECT; the entry remains
    try:
        rows = eng.execute("SELECT * FROM system.processes").collect()
        by_qid = {r.query_id: r for r in rows}
        assert "" in by_qid  # the deterministic self-row
        assert "inflight-7" in by_qid
        assert by_qid["inflight-7"].query == _SLOW
    finally:
        eng.finish_query("inflight-7")
