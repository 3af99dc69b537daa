"""Driver-style correctness gate: run every queries() entry in Spark and
its oracle_sql() in DuckDB on the same sf0.01 parquet, compare sorted
values (floats rounded to 6). Usage: python tools/sweep_correctness.py
"""
import sys, math, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as e

def _norm(v):
    if v is None: return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, (list, tuple)): return tuple(_norm(x) for x in v)
    return str(v)
def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in data)

spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false")
    .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
q, o = e.queries(), e.oracle_sql()
fails = []
for name in sorted(q):
    sdf = q[name](spark, "/root/testdata/sf0.01")
    a = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.sql(o[name]); b = _rows(res.columns, res.fetchall())
    ok = a == b and sorted(sdf.columns) == sorted(res.columns)
    if not ok: fails.append(name)
    print(f"{name}: rows={len(a)} {'OK' if ok else 'MISMATCH'}", flush=True)
print("FAILURES:", fails or "none")
df = e.entry(spark)
print("entry smoke rows:", df.count(), "schema:", df.columns)
spark.stop()
