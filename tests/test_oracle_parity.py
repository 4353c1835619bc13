"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare row
count, schema (column names) and a DRIVER-STRICT value hash.

Driver strictness (the round-2 HUGEINT lesson, round-4 verdict item #1):
the driver pulls both result sets through a dtype-carrying conversion and
hashes STRINGIFIED values with columns sorted by name — so an int64 column
on one side and a float64 on the other ("135701" vs "135701.0") mismatch
even when the numeric values are equal. The old local gate compared Python
values (135701 == 135701.0 passes) and let dtype drift hide until the
driver's rotating sample landed on a query. This mirror reproduces the
strict path: Spark results via toPandas() (LongType -> int64,
DoubleType -> float64), oracle results via duckdb .df() (BIGINT -> int64,
HUGEINT/DECIMAL -> float64), then canonical per-cell stringification.
"""

import glob
import math
import os

import duckdb
import numpy as np
import pandas as pd
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


def _canon_cell(v) -> str:
    """One canonical string per value, dtype-sensitive the way the driver's
    hash is: numpy/python ints render without a decimal point, floats with
    one, nulls as a fixed token, arrays recursively."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def strict_rows(pdf: pd.DataFrame):
    """Driver-style normalization: columns sorted by name, every cell
    stringified dtype-sensitively, rows sorted."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in t)
        for t in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


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
    spdf = sdf.toPandas()
    if name in NON_SQL_QUERIES:
        assert sql is None
        assert len(spdf) > 0  # rows-only check; real gate per NON_SQL_QUERIES
        return
    assert sql is not None, f"no oracle for {name}"
    opdf = ddb.execute(sql).df()
    assert list(spdf.columns) == list(opdf.columns), (
        f"{name}: column mismatch {list(spdf.columns)} vs {list(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), f"{name}: rowcount {len(spdf)} vs {len(opdf)}"
    ns, no = strict_rows(spdf), strict_rows(opdf)
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
    # Second leg: BOTH sides RAW-fetched (no pandas conversion on either).
    # The pandas legs each apply the same widenings (DATE -> datetime64,
    # nullable int -> float64), so a drift they share is invisible there:
    # duckdb's .df() renders a DATE like a TIMESTAMP, and a date_trunc
    # oracle missing the ::TIMESTAMP cast sails through — but stringifies
    # differently under a raw fetch ('2024-01-01' vs
    # '2024-01-01 00:00:00'; caught live on events_retention_cohorts in
    # round 6). Raw-vs-raw keeps the compare symmetric (Spark collect()
    # keeps longs int and nulls None, exactly like fetchall()).
    cur = ddb.execute(sql)
    ocols = [d[0] for d in cur.description]
    oorder = [ocols.index(c) for c in sorted(ocols)]
    raw_o = sorted(
        tuple(_canon_cell(row[i]) for i in oorder) for row in cur.fetchall()
    )
    scols = list(spdf.columns)
    sorder = [scols.index(c) for c in sorted(scols)]
    raw_s = sorted(
        tuple(_canon_cell(row[i]) for i in sorder) for row in sdf.collect()
    )
    raw_mism = [(a, b) for a, b in zip(raw_s, raw_o) if a != b]
    assert not raw_mism, f"{name}: raw-fetch mismatches {raw_mism[:5]}"


def test_strictness_catches_dtype_drift(spark, ddb):
    """The gate's reason to exist: a value-equal but dtype-drifted oracle
    (int64 aggregate silently widened to float64, the exact shape of the r2
    HUGEINT failure) MUST mismatch under the strict compare even though a
    plain value compare accepts it."""
    name = "search_count"
    sql = entrymod.oracle_sql()[name]
    spdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    drifted = ddb.execute(
        f"SELECT * REPLACE (CAST(n_matches AS DOUBLE) AS n_matches) "
        f"FROM ({sql})"
    ).df()
    # plain value compare would accept the drift...
    assert float(spdf.iloc[0, 0]) == float(drifted.iloc[0, 0])
    # ...the strict compare must not
    assert strict_rows(spdf) != strict_rows(drifted)
    # and the undrifted oracle must still pass strictly
    clean = ddb.execute(sql).df()
    assert strict_rows(spdf) == strict_rows(clean)


def test_spelling_metrics_agree_where_it_matters(ddb):
    """The spelling oracle ranks with DuckDB's UNRESTRICTED
    damerau_levenshtein while the engine computes restricted OSA; the two
    can disagree from distance 3 up ('ca'->'abc' is 2 vs 3), which the
    BETWEEN 1 AND 2 cutoff could turn into a parity flake if the corpus or
    probe words drift. Pin the equivalence: over every (probe word, vocab
    term) pair — a superset of the fragment-blocked candidate set — the two
    metrics agree whenever either is <= 2, so the oracle's cutoff and
    tie-break can never diverge from the engine's."""
    from tika_xapian_spark.operators.search import osa_distance

    probes = ["sprak", "merg", "window", "qery", "teh"]
    vocab = [
        r[0]
        for r in ddb.execute(
            "SELECT DISTINCT lower(regexp_replace(w, '[^a-z]', '', 'g')) "
            "FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
            "WHERE length(regexp_replace(w, '[^a-z]', '', 'g')) >= 2"
        ).fetchall()
    ]
    assert len(vocab) >= 20
    disagreements = []
    for w in probes:
        for t in vocab:
            dl = ddb.execute(
                "SELECT damerau_levenshtein(?, ?)", [w, t]
            ).fetchone()[0]
            osa = osa_distance(w, t)
            if min(dl, osa) <= 2 and dl != osa:
                disagreements.append((w, t, dl, osa))
    assert not disagreements, disagreements[:10]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "score_micro", "n_ok", "n_quarantined"]
    # the error channel must be driver-visible and non-empty by construction
    assert rows[0]["n_quarantined"] > 0
    assert rows[0]["n_ok"] > 0
