"""Per-user quotas (dialect/quota.py — Interpreters/Quota.h analog):
admission counting, error counting, result-row accounting through the
engine's collect funnel, interval rollover, keyed quotas."""

from __future__ import annotations

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
    ChEngine,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect.quota import (
    QuotaExpiredError,
    QuotaForInterval,
    QuotaForIntervals,
    Quotas,
)


@pytest.fixture()
def eng(spark):
    return ChEngine(spark)


# ------------------------------------------------------------ engine


def test_queries_limit_refuses_over_limit_query(eng):
    """executeQuery.cpp:174-177: addQuery then checkExceeded — with
    max queries=3, the interval admits 3 counted queries then refuses
    with the reference's message shape.  The FIRST query of a fresh
    window escapes accounting (its check rolls the window and clears
    counters — the reference's own documented quirk, Quota.cpp's
    'NOTE Seems that when new time interval has come, first query is
    not accounted in number of queries'), so queries 1-4 pass and the
    5th is refused."""
    eng.quotas.configure("tiny", {86400: {"queries": 3}})
    eng.set_user("alice", quota="tiny")
    for _ in range(4):  # 1st rolls the window; 2nd-4th count 1..3
        eng.execute("SELECT 1")
    with pytest.raises(
        QuotaExpiredError,
        match=r"Quota for user 'alice' for 24 hours has been exceeded. "
        r"Queries: 4, max: 3",
    ):
        eng.execute("SELECT 1")
    eng.set_user("default")  # detach


def test_errors_limit_counts_failed_statements(eng):
    """Failed statements count against the errors maximum
    (executeQuery.cpp:95,298); once over, even valid queries are
    refused at admission."""
    eng.quotas.configure("err1", {86400: {"errors": 1}})
    eng.set_user("bob", quota="err1")
    for _ in range(2):  # two genuine failures: errors -> 2 > 1
        with pytest.raises(Exception):
            eng.execute("SELECT definitely_no_such_function_xyz(1)")
    with pytest.raises(QuotaExpiredError, match=r"Errors: 2, max: 1"):
        eng.execute("SELECT 1")
    eng.set_user("default")


def test_result_rows_accounted_by_collect(eng):
    """Engine.collect is the stream-layer analog
    (IProfilingBlockInputStream.cpp:212): result rows/bytes are
    accounted as the client materializes, and the add that crosses
    the maximum raises."""
    eng.quotas.configure("rows5", {86400: {"result_rows": 5}})
    eng.set_user("carol", quota="rows5")
    rows = eng.collect("SELECT number FROM numbers(4)")
    assert len(rows) == 4
    with pytest.raises(
        QuotaExpiredError, match=r"Total result rows: 8, max: 5"
    ):
        eng.collect("SELECT number FROM numbers(4)")
    eng.set_user("default")


def test_detached_user_is_unlimited(eng):
    eng.quotas.configure("one", {86400: {"queries": 1}})
    eng.set_user("dave", quota="one")
    eng.execute("SELECT 1")
    eng.set_user("dave")  # re-set WITHOUT quota: unlimited
    for _ in range(5):
        eng.execute("SELECT 1")


def test_execution_time_accounted_at_retire(eng):
    """Wall-clock flows into the quota when the entry retires; the
    NEXT admission check enforces it (whole-second comparison, as the
    reference divides usec by 1e6)."""
    eng.quotas.configure("slowq", {86400: {"execution_time": 1}})
    eng.set_user("erin", quota="slowq")
    eng.execute("SELECT 1")
    eng.finish_query()
    # under a second elapsed -> still admitted
    eng.execute("SELECT 1")
    eng.finish_query()
    # simulate an expensive earlier query having been accounted
    eng.current_quota.add_execution_time(2.5)
    with pytest.raises(
        QuotaExpiredError, match=r"Total execution time: 2, max: 1"
    ):
        eng.execute("SELECT 1")
    eng.set_user("default")


# ------------------------------------------------------- unit level


def test_interval_rollover_resets_counters():
    """QuotaForInterval::updateTime: when the window rolls, used
    counters reset and the same user may query again."""
    q = QuotaForIntervals("q", "u", {60: {"queries": 2}})
    q.check_exceeded(now=1000.0)  # prime the window (rolls + clears)
    for _ in range(3):
        q.add_query()
    with pytest.raises(QuotaExpiredError, match="1 minute"):
        q.check_exceeded(now=1001.0)  # 3 > 2 inside the window
    # 61 s later the window has rolled: counters are fresh
    q.check_exceeded(now=1061.0)
    q.add_query()
    q.check_exceeded(now=1061.5)


def test_largest_interval_reported_first():
    """The intervals walk is largest-first, so an error names the
    longest exceeded window (QuotaForIntervals' ordered map walk)."""
    q = QuotaForIntervals(
        "q", "u", {60: {"queries": 1}, 86400: {"queries": 1}}
    )
    q.add_query()
    q.add_query()
    with pytest.raises(QuotaExpiredError, match="24 hours"):
        q.check_exceeded(now=50.0)


def test_keyed_quota_tracks_independent_counters():
    """Quota::is_keyed — per-key counter sets share one maximum
    template; an unkeyed quota ignores the client key."""
    qs = Quotas()
    qs.configure("keyed", {3600: {"queries": 1}}, keyed=True)
    a = qs.get("keyed", "u", key="k1")
    b = qs.get("keyed", "u", key="k2")
    assert a is not b
    a.add_query()
    a.add_query()
    with pytest.raises(QuotaExpiredError):
        a.check_exceeded(now=100.0)  # within the first window
    b.add_query()
    b.check_exceeded(now=100.0)  # other key unaffected

    qs.configure("unkeyed", {3600: {"queries": 1}}, keyed=False)
    c = qs.get("unkeyed", "u", key="k1")
    d = qs.get("unkeyed", "u", key="k2")
    assert c is d  # key ignored rather than rejected


def test_zero_max_means_unlimited():
    it = QuotaForInterval(3600, {"queries": 0})
    for _ in range(100):
        it.add_query()
    it.check_exceeded(100.0, "q", "u")


def test_usage_snapshot_shape():
    q = QuotaForIntervals("q", "u", {3600: {"queries": 10}})
    q.add_query()
    q.check_and_add_result(rows=3, bytes_=17, now=100.0)
    (row,) = q.usage()
    assert row["duration"] == 3600
    assert row["used_queries"] == 1
    assert row["used_result_rows"] == 3
    assert row["used_result_bytes"] == 17
    assert row["max_queries"] == 10


def test_read_accounting_checks_on_add():
    q = QuotaForIntervals("q", "u", {3600: {"read_rows": 10}})
    q.check_and_add_read(rows=8, now=100.0)
    with pytest.raises(
        QuotaExpiredError, match=r"Total rows read: 16, max: 10"
    ):
        q.check_and_add_read(rows=8, now=101.0)


def test_read_rows_accounted_from_scan_metrics(eng, spark):
    """Engine.collect feeds read_rows/read_bytes from the EXECUTED
    plan's scan metrics (numOutputRows/filesSize) — the analog of the
    stream progress callback (IProfilingBlockInputStream.cpp:305).  A
    25-row table read twice crosses a 40-row read quota even though
    each RESULT is a single aggregate row."""
    import os

    eng.register_table(
        "qnation",
        spark.read.parquet(
            os.path.join("/root/testdata/sf0.01", "nation.parquet")
        ),
    )
    eng.quotas.configure("reads", {86400: {"read_rows": 40}})
    eng.set_user("frank", quota="reads")
    (row,) = eng.collect("SELECT count() AS c FROM qnation")
    assert row.c == 25
    usage = eng.current_quota.usage()[0]
    assert usage["used_read_rows"] == 25
    assert usage["used_read_bytes"] > 0
    assert usage["used_result_rows"] == 1
    with pytest.raises(
        QuotaExpiredError, match=r"Total rows read: 50, max: 40"
    ):
        eng.collect("SELECT count() AS c FROM qnation")
    eng.set_user("default")


def test_max_result_rows_throw_and_break(eng):
    """max_result_rows — the output-stream limit (Limits.h:45,
    IProfilingBlockInputStream::checkLimits): THROW (default mode)
    raises TOO_MUCH_ROWS; result_overflow_mode='break' truncates."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect.engine import (
        ResultLimitError,
    )

    with pytest.raises(
        ResultLimitError,
        match=r"Limit for result rows exceeded: read 10 rows, maximum: 5",
    ):
        eng.collect(
            "SELECT number FROM numbers(10) SETTINGS max_result_rows = 5"
        )
    rows = eng.collect(
        "SELECT number FROM numbers(10) "
        "SETTINGS max_result_rows = 5, result_overflow_mode = 'break'"
    )
    assert len(rows) == 5
    # bytes limit: each row renders as a digit + newline = 2 bytes
    with pytest.raises(
        ResultLimitError, match=r"Limit for result bytes .* maximum: 7"
    ):
        eng.collect(
            "SELECT number FROM numbers(10) SETTINGS max_result_bytes = 7"
        )
    rows = eng.collect(
        "SELECT number FROM numbers(10) "
        "SETTINGS max_result_bytes = 7, result_overflow_mode = 'break'"
    )
    assert len(rows) == 3  # 3 full rows fit in 7 TSV bytes


def test_think_time_not_charged_as_execution_time(eng):
    """The auto-retire when the NEXT statement begins must not charge
    the gap between statements: a lazily-built, never-collected query
    did ~no work (the reference accounts stream-drain time, ~0 for an
    undrained stream).  Only explicit retires (finish_query, which
    collect calls right after materializing) span real execution."""
    eng.quotas.configure("think", {86400: {"execution_time": 1}})
    eng.set_user("grace", quota="think")
    eng.execute("SELECT 1")  # never collected, never finished
    # simulate inter-statement think-time longer than the limit
    qid = eng._qid_local.qid
    eng.process_list._entries[qid]["start"] -= 100.0
    eng.execute("SELECT 1")  # auto-retires the previous entry
    used = eng.current_quota.usage()[0]["used_execution_time"]
    assert used < 1.0  # the 100 s of think-time was NOT charged
    eng.set_user("default")


def test_result_limit_zero_means_unlimited(eng):
    """max_result_rows/bytes = 0 is 'no limit', as everywhere in
    Limits.h — not a limit of zero."""
    rows = eng.collect(
        "SELECT number FROM numbers(5) "
        "SETTINGS max_result_rows = 0, max_result_bytes = 0"
    )
    assert len(rows) == 5
