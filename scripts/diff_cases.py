"""Print unified diffs (got vs reference) for named golden cases.

Usage: python scripts/diff_cases.py CASE [CASE...]   (dev tool)
"""

from __future__ import annotations

import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/dbms/tests/queries/0_stateless/"


def main() -> None:
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import get_session
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
        ChEngine,
        TableMeta,
    )
    from tests.test_golden import run_sql_file

    spark = get_session(app_name="diffcases", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import signal

    signal.signal(signal.SIGALRM, lambda *a: (_ for _ in ()).throw(TimeoutError()))

    for case in sys.argv[1:]:
        eng = ChEngine(spark)
        eng.set_meta("events", TableMeta(sample_key="user_id"))
        signal.alarm(120)
        try:
            got = run_sql_file(eng, REF + case + ".sql")
        except BaseException as e:  # noqa: BLE001
            print(f"### {case}: ERR {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        finally:
            signal.alarm(0)
        exp = open(REF + case + ".reference").read()
        if got == exp:
            print(f"### {case}: OK", flush=True)
            continue
        print(f"### {case}: DIFF", flush=True)
        d = difflib.unified_diff(
            exp.splitlines(), got.splitlines(), "expected", "got", lineterm="", n=0
        )
        lines = list(d)
        for ln in lines[:40]:
            print(ln, flush=True)
        if len(lines) > 40:
            print(f"... ({len(lines) - 40} more diff lines)", flush=True)


if __name__ == "__main__":
    main()
