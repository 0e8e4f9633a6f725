"""Ad-hoc dialect probe: run each CH-SQL statement from argv files or
stdin through ChEngine at sf0.001 and print TabSeparated output or the
error. Dev tool only."""

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
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
    format_result,
)
from tests.test_golden import split_statements


def main() -> None:
    spark = get_session(app_name="try_sql", master="local[4]", shuffle_partitions=4)
    register_tables(spark, "/root/testdata/sf0.001")
    eng = ChEngine(spark)
    eng.set_meta("events", TableMeta(sample_key="user_id"))
    text = sys.stdin.read()
    for stmt in split_statements(text):
        print(f"--- {stmt[:100]}")
        try:
            print(format_result(eng.sql(stmt), "TabSeparated"), end="")
        except Exception as e:
            print(f"ERROR: {type(e).__name__}: {str(e)[:300]}")
    spark.stop()


if __name__ == "__main__":
    main()
