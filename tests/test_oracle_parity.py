"""Replicates the driver's correctness gate locally: every queries() entry
runs in Spark AND its oracle_sql() runs in DuckDB on the same parquet; the
results must match on row count, column names, and (order-insensitively)
values. Run at sf0.001 for speed — the driver does sf0.01."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(row[i]) for i in idx) for row in data)


QUERY_NAMES = sorted(entrymod.queries().keys())


#: queries whose computation is iterative / not SQL-expressible — the
#: driver records a rows-only check for these; here we check determinism
#: (two runs, identical rows) instead of a DuckDB twin
NON_SQL_QUERIES = {"ann_ivf_trained"}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    oracle = entrymod.oracle_sql().get(name)
    if name in NON_SQL_QUERIES:
        assert oracle is None
        assert len(srows) > 0
        again = _rows(scols, [tuple(r) for r in q(spark, SF_DIR).collect()])
        assert _rows(scols, srows) == again, f"{name}: nondeterministic"
        return
    assert oracle is not None, f"{name}: no oracle registered"
    res = duck.sql(oracle)
    dcols = res.columns
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    a = _rows(scols, srows)
    b = _rows(dcols, drows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "fmt", "markdown", "error"]
