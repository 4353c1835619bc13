"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare row
count, schema (column names) and order-insensitive values."""

import glob
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


# Queries whose algorithm is genuinely non-SQL-expressible: no DuckDB
# oracle (the driver records a rows-only check); their correctness gate is
# a dedicated golden/parity pytest instead, named here. (search_snippets
# graduated to a pinned-VALUES oracle in round 4 — the algorithm gate is
# still tests/test_snippets.py's 22 api_snippets.cc string goldens.)
NON_SQL_QUERIES: dict[str, str] = {}


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
    if name in NON_SQL_QUERIES:
        assert sql is None
        assert len(srows) > 0  # rows-only check; real gate per NON_SQL_QUERIES
        return
    assert sql is not None, f"no oracle for {name}"
    res = ddb.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    ns, no = normalize(srows, scols), normalize(orows, ocols)
    mismatches = [
        (a, b) for a, b in zip(ns, no) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "score_micro", "n_ok", "n_quarantined"]
    # the error channel must be driver-visible and non-empty by construction
    assert rows[0]["n_quarantined"] > 0
    assert rows[0]["n_ok"] > 0
