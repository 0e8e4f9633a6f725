"""Show the unified diff between a reference golden's expected output
and what the engine currently produces.

Usage: python scripts/diff_golden.py CASE [CASE...]
"""

from __future__ import annotations

import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/dbms/tests/queries/0_stateless"


def main() -> None:
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (
        get_session,
        register_tables,
    )
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
        ChEngine,
        TableMeta,
    )
    from tests.test_golden import run_sql_file

    spark = get_session(app_name="diff", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, "/root/testdata/sf0.001")
    for case in sys.argv[1:]:
        eng = ChEngine(spark)
        eng.set_meta("events", TableMeta(sample_key="user_id"))
        sql_path = os.path.join(REF_DIR, case + ".sql")
        try:
            got = run_sql_file(eng, sql_path)
        except BaseException as e:  # noqa: BLE001
            print(f"=== {case}: ERROR {type(e).__name__}: {e}")
            continue
        with open(os.path.join(REF_DIR, case + ".reference"), errors="surrogateescape") as f:
            expected = f.read()
        if got == expected:
            print(f"=== {case}: OK")
            continue
        print(f"=== {case}: DIFF")
        sys.stdout.writelines(
            difflib.unified_diff(
                expected.splitlines(keepends=True),
                got.splitlines(keepends=True),
                fromfile="expected",
                tofile="got",
                n=2,
            )
        )


if __name__ == "__main__":
    main()
