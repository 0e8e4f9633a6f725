"""Golden-adoption sweep: run every not-yet-adopted reference stateless
golden (dbms/tests/queries/0_stateless) through ChEngine and report the
ones whose output is byte-identical to the .reference file.  Passing
cases can then be copied into tests/queries as ref_* pairs.

Usage:
    python scripts/adopt_goldens.py [--copy] [--limit N] [--only PAT]

Dev tool only — the conformance gate is tests/test_golden.py.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/dbms/tests/queries/0_stateless"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "queries")


def main() -> None:
    copy = "--copy" in sys.argv
    limit = None
    only = None
    argv = sys.argv[1:]
    explicit = None
    for i, a in enumerate(argv):
        if a == "--limit":
            limit = int(argv[i + 1])
        if a == "--only":
            only = argv[i + 1]
        if a == "--cases":  # comma-separated explicit case list
            explicit = argv[i + 1].split(",")

    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (
        get_session,
        register_tables,
    )
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
        ChEngine,
        TableMeta,
    )
    from tests.test_golden import run_sql_file

    shared = "--shared" in sys.argv
    adopted = {
        f[4:-4] for f in os.listdir(OUT_DIR)
        if f.startswith("ref_") and f.endswith(".sql")
    }
    cases = sorted(
        f[:-4] for f in os.listdir(REF_DIR)
        if f.endswith(".sql") and f[:-4] not in adopted
        and os.path.exists(os.path.join(REF_DIR, f[:-4] + ".reference"))
    )
    if explicit is not None:
        cases = [c for c in cases if c in explicit]
    if only:
        cases = [c for c in cases if only in c]
    if limit:
        cases = cases[:limit]

    # statement-led cases (newly enabled surface) first — they resolve
    # fast; big SELECT cases go last.  In --shared mode keep sorted
    # order: one engine carries state across files exactly like
    # tests/test_golden.py's module-scoped fixture (and the reference's
    # single server across the 0_stateless run).
    def lead(case: str) -> int:
        with open(os.path.join(REF_DIR, case + ".sql"), errors="replace") as f:
            head = f.read(400).lstrip().upper()
        return 0 if head.startswith(("DROP", "CREATE", "ALTER", "RENAME", "SHOW", "DESC", "EXISTS", "OPTIMIZE", "USE", "INSERT")) else 1

    if shared:
        cases = sorted(set(cases) | adopted)
    else:
        cases.sort(key=lambda c: (lead(c), c))

    spark = get_session(app_name="adopt", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, "/root/testdata/sf0.001")

    import signal
    import time

    def _alarm(signum, frame):
        raise TimeoutError("case timeout")

    signal.signal(signal.SIGALRM, _alarm)

    ok, fail, err = [], [], []
    shared_eng = None
    if shared:
        shared_eng = ChEngine(spark)
        shared_eng.set_meta("events", TableMeta(sample_key="user_id"))
    for case in cases:
        if shared:
            eng = shared_eng
            if case in adopted:
                # execute for state only (the adopted set re-verifies
                # in tests/test_golden.py)
                signal.alarm(90)
                try:
                    run_sql_file(eng, os.path.join(REF_DIR, case + ".sql"))
                except BaseException:
                    pass
                finally:
                    signal.alarm(0)
                continue
        else:
            eng = ChEngine(spark)
            eng.set_meta("events", TableMeta(sample_key="user_id"))
        sql_path = os.path.join(REF_DIR, case + ".sql")
        ref_path = os.path.join(REF_DIR, case + ".reference")
        t0 = time.time()
        signal.alarm(int(os.environ.get("ADOPT_TIMEOUT", "90")))  # skip pathological cases
        try:
            got = run_sql_file(eng, sql_path)
        except BaseException as e:  # noqa: BLE001 - includes alarm
            err.append((case, f"{type(e).__name__}: {str(e)[:160]}"))
            print(f"ERR  {case} ({time.time()-t0:.1f}s) {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        finally:
            signal.alarm(0)
        try:
            with open(ref_path, errors="surrogateescape") as f:
                expected = f.read()
        except UnicodeDecodeError:
            err.append((case, "non-UTF8 reference"))
            print(f"ERR  {case} non-UTF8 reference", flush=True)
            continue
        if got == expected:
            ok.append(case)
            print(f"OK   {case} ({time.time()-t0:.1f}s)", flush=True)
            if copy:
                shutil.copy(sql_path, os.path.join(OUT_DIR, f"ref_{case}.sql"))
                shutil.copy(ref_path, os.path.join(OUT_DIR, f"ref_{case}.reference"))
        else:
            fail.append(case)
            print(f"DIFF {case} ({time.time()-t0:.1f}s)", flush=True)
    print(f"\nSUMMARY: {len(ok)} ok, {len(fail)} diff, {len(err)} error")


if __name__ == "__main__":
    main()
