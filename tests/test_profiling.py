"""profile_table (operators/profiling.py): exact DuckDB twin on the
documents table, null/typed-lane semantics, single-scan plan."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.profiling import profile_table


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def _multiset(rows):
    return sorted("|".join(_canon(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _twin_sql(path: str, col: str, kind: str) -> str:
    base = f"""
      select '{col}' as column, count(*)::BIGINT as n_rows,
             sum(case when {col} is null then 1 else 0 end)::BIGINT as n_null,
             count(distinct {col})::BIGINT as n_distinct,
    """
    if kind == "num":
        tail = f"""
             min({col})::DOUBLE as min_num, max({col})::DOUBLE as max_num,
             NULL::VARCHAR as min_str, NULL::VARCHAR as max_str,
             NULL::DOUBLE as avg_len
        """
    else:
        tail = f"""
             NULL::DOUBLE as min_num, NULL::DOUBLE as max_num,
             min({col}) as min_str, max({col}) as max_str,
             case when count({col}) > 0
                  then sum(length({col}))::BIGINT / count({col})::BIGINT
             end as avg_len
        """
    return base + tail + f" from '{path}'"


def test_profile_matches_duckdb_exactly(docs, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    got = profile_table(docs).drop("dtype").collect()
    want = duckdb.sql(
        " UNION ALL ".join(
            _twin_sql(path, c, k)
            for c, k in [
                ("doc_id", "num"), ("text", "str"), ("lang", "str"),
                ("source", "str"), ("n_chars", "num"),
            ]
        )
    ).fetchall()
    assert _multiset(tuple(r) for r in got) == _multiset(want)


def test_profile_null_and_type_lanes(spark):
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("n"),
                (F.lit(s) if s is not None else F.lit(None).cast("string")).alias("s"),
                F.array(F.lit(i)).alias("arr"),
            )
            for i, s in [(1, "aa"), (2, None), (3, "bbbb"), (3, "aa")]
        ]
    )
    df = (
        spark.range(1)
        .select(F.explode(structs).alias("d"))
        .select("d.n", "d.s", "d.arr")
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    n = rows["n"]
    assert (n.n_rows, n.n_null, n.n_distinct) == (4, 0, 3)
    assert (n.min_num, n.max_num) == (1.0, 3.0)
    assert n.min_str is None and n.avg_len is None
    s = rows["s"]
    assert (s.n_null, s.n_distinct) == (1, 2)
    assert (s.min_str, s.max_str) == ("aa", "bbbb")
    assert s.avg_len == pytest.approx(8 / 3)
    assert s.min_num is None
    arr = rows["arr"]  # unsupported type: completeness only
    assert arr.n_null == 0 and arr.n_distinct is None


def test_profile_unknown_column_raises(docs):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(docs, columns=["nope"])


def test_profile_single_scan(docs):
    plan = (
        profile_table(docs, exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    scans = re.findall(r"Scan parquet", plan)
    assert len(scans) == 1, plan[:2000]
