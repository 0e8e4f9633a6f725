"""Audit: for every registry entry with an oracle, compare the DuckDB
result column types with the Spark result column types.  The driver's
value-hash serializes typed values, so a DuckDB HUGEINT (int128) column
vs a Spark BIGINT hashes differently even when values are equal.

Prints one line per suspicious column.  Used to calibrate the
regression test in tests/test_oracle_types.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import get_session
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import QUERIES
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.registry import (
    _ensure_loaded,
)

SF = "/root/testdata/sf0.01"


def main() -> None:
    _ensure_loaded()
    spark = get_session(app_name="audit", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(SF, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")

    n_checked = 0
    for name, spec in sorted(QUERIES.items()):
        if spec.oracle is None:
            continue
        try:
            rel = con.sql(spec.oracle)
            dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCK ERR {e}")
            continue
        try:
            df = spec.func(spark, SF)
            stypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERR {e}")
            continue
        n_checked += 1
        for col in sorted(set(dtypes) | set(stypes)):
            d, s = dtypes.get(col), stypes.get(col)
            if d is None or s is None:
                print(f"{name}.{col}: MISSING duck={d} spark={s}")
                continue
            print(f"{name}.{col}: duck={d} spark={s}")
    print(f"# checked {n_checked} entries", file=sys.stderr)


if __name__ == "__main__":
    main()
