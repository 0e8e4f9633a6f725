"""Simulate the driver: import __spark_entry__ through its real path,
run entry(spark), then run every queries() entry at sf0.01 and compare
against oracle_sql() via DuckDB — exactly the driver's contract.

Set SPARK_GRAFT_ORACLE_SF_DIR to sweep another scale (e.g.
/root/testdata/sf0.1) — correctness at 10x the driver's gate."""
import sys, os, math, datetime
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import SparkSession

# sf1-scale sweeps need more than the 1g default heap (the funnel
# window sorts over 1M events OOM'd the r11 sweep); the driver's own
# gate stays the small default
_CORES = os.environ.get("SPARK_GRAFT_SIM_CORES", "4")
_MEM = os.environ.get("SPARK_GRAFT_SIM_MEM", "4g")
spark = (SparkSession.builder.master(f"local[{_CORES}]")
         .appName("driver-sim")
         .config("spark.driver.memory", _MEM)
         .config("spark.sql.shuffle.partitions", _CORES)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry()
df = E.entry(spark)
rows = df.collect()
print("entry(): rows =", len(rows))
print("entry() schema:", [f.name for f in df.schema.fields])
print("entry() first row:", rows[0])

# 2. correctness: queries vs oracle at sf0.01
import duckdb
con = duckdb.connect()
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table (e.g. the .sf1 build)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def norm(v):
    if isinstance(v, float) and math.isnan(v): return "NaN"
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat(" ")
    if isinstance(v, datetime.date): return v.isoformat()
    return v

qs, oracles = E.queries(), E.oracle_sql()
# optional name filter: any argv[1:] substring match keeps the entry
wanted = sys.argv[1:]
if wanted:
    qs = {n: f for n, f in qs.items() if any(w in n for w in wanted)}
ok = bad = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows OK")
        continue
    res = con.sql(oracles[name])
    order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    dcols = [res.columns[i] for i in order]
    drows = sorted(tuple(norm(r[i]) for i in order) for r in res.fetchall())
    match = (cols == dcols) and (srows == drows)
    ok += match; bad += (not match)
    print(f"  {name}: cols={'OK' if cols==dcols else (cols,dcols)} "
          f"rows={len(srows)}/{len(drows)} values={'MATCH' if srows==drows else 'MISMATCH'}")
print(f"SUMMARY: {ok} match, {bad} mismatch")
