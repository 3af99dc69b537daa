"""Pandas-based replica of the driver's correctness gate.

The driver collects BOTH engines' results into pandas frames, sorts
columns by name, sorts rows, and value-hashes — so representation
matters: Spark DECIMAL arrives as ``decimal.Decimal`` objects while
DuckDB DECIMAL/HUGEINT arrive as ``float64`` (CORRECTNESS_r01 hash
fails), and an ``array<double>`` column crashes its sorter outright
(``unhashable type: 'list'``). ``tools/sweep_correctness.py``'s
tuple-normalization hides all of that; this replica reproduces it.

Per column we compare the *python type* of each value plus the value
itself (floats rounded to 6, datetimes normalized to isoformat — the
driver tolerates pandas datetime64[ns]-vs-[us] resolution, proven by
green timestamp queries in r01).

Usage: python tools/sweep_driver_canon.py [query ...]   (default: all)
"""
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell(v):
    """Type-sensitive canonical cell: (type-tag, normalized value)."""
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ("null", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, float):
        return ("float", f"{round(v, 6):.6f}")
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # the driver CRASHES on these — flag loudly instead of comparing
        return ("UNHASHABLE", repr(v)[:50])
    return (type(v).__name__, str(v))


def canon(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(tuple(_cell(v) for v in row)
                  for row in pdf.itertuples(index=False, name=None))
    return list(pdf.columns), rows


def main():
    only = set(sys.argv[1:])
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    q, o = e.queries(), e.oracle_sql()
    fails = []
    for name in sorted(q):
        if only and name not in only:
            continue
        try:
            scols, srows = canon(q[name](spark, SF_DIR).toPandas())
            ocols, orows = canon(con.sql(o[name]).df()) if name in o \
                else (scols, srows)
        except Exception as exc:  # driver records this as err
            fails.append(name)
            print(f"{name}: ERR {type(exc).__name__}: {exc}", flush=True)
            continue
        unhash = {c for cols, rows in ((scols, srows), (ocols, orows))
                  for row in rows[:1] for c, cell in zip(cols, row)
                  if cell[0] == "UNHASHABLE"}
        ok = scols == ocols and srows == orows and not unhash
        msg = "OK" if ok else "MISMATCH"
        if unhash:
            msg += f" (driver-crashing cols: {sorted(unhash)})"
        elif not ok and scols == ocols:
            # show the first differing row pair for debugging
            for a, b in zip(srows, orows):
                if a != b:
                    msg += f"\n  spark : {a}\n  oracle: {b}"
                    break
            if len(srows) != len(orows):
                msg += f" (rows {len(srows)} vs {len(orows)})"
        elif not ok:
            msg += f" (cols {scols} vs {ocols})"
        if not ok:
            fails.append(name)
        print(f"{name}: rows={len(srows)} {msg}", flush=True)
    print("FAILURES:", fails or "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
