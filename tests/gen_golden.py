"""Regenerate tests/queries/*.reference from the current engine output.

Mirrors the reference's workflow of recording expected output once and
byte-comparing forever after (dbms/tests/clickhouse-test).  ALWAYS
review the diff before committing regenerated files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (
    get_session,
    register_tables,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
    ChEngine,
    TableMeta,
)
from tests.test_golden import QUERIES_DIR, run_sql_file

SF_SMOKE = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app_name="gen_golden", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("FATAL")
    register_tables(spark, SF_SMOKE)
    eng = ChEngine(spark)
    eng.set_meta("events", TableMeta(sample_key="user_id"))
    failed: list[str] = []
    for f in sorted(os.listdir(QUERIES_DIR)):
        if not f.endswith(".sql"):
            continue
        case = f[:-4]
        try:
            out = run_sql_file(eng, os.path.join(QUERIES_DIR, f))
        except Exception as e:
            failed.append(case)
            print(f"{case}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            continue
        with open(os.path.join(QUERIES_DIR, case + ".reference"), "w") as ref:
            ref.write(out)
        print(f"{case}: {out.count(chr(10))} lines")
    spark.stop()
    if failed:
        print(f"FAILED: {len(failed)} cases: {', '.join(failed)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
