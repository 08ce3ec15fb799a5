"""Local replica of the driver's correctness gate: every ``queries()``
entry runs on Spark AND (where present) its ``oracle_sql()`` runs on
DuckDB over the same parquet; results must match on row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value canonicalization: short round-trip repr
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )


@pytest.fixture(scope="module")
def oracle_results(sf_dir):
    con = _duck_con(sf_dir)
    out = {}
    for name, sql in entry_mod.oracle_sql().items():
        cur = con.execute(sql)
        out[name] = (cur.fetchall(), [d[0] for d in cur.description])
    con.close()
    return out


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, oracle_results, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    d_rows, d_cols = oracle_results[name]

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sm = _row_multiset(s_rows, s_cols)
    dm = _row_multiset(d_rows, d_cols)
    if sm != dm:
        diff = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_all_queries_run_and_nonempty(spark, sf_dir):
    """Entries without an oracle (non-SQL-expressible) still must run and
    return rows with a stable schema."""
    oracles = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name in oracles:
            continue
        df = q(spark, sf_dir)
        n = df.count()
        assert n >= 0 and len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "extracted_text" in df.columns
