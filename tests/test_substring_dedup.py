"""Exact substring dedup (operators/substring_dedup.py): DuckDB-exact
twin of the full window-hash → occurrence-rank → interval-merge → edit
pipeline, handcrafted semantics, and plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.substring_dedup import (
    exact_substring_dedup,
)

K = 8

_TWIN_SQL = f"""
    with docs as (
      select doc_id, string_split_regex(trim(text), '\\s+') as ws
      from read_parquet('{{path}}/documents.parquet')
    ), th as (
      select doc_id, ws, len(ws) as n,
        list_transform(ws, t -> ('0x' || substr(sha256('s1|' || t), 1, 8))
            ::ubigint::bigint % 2147483647) as th1,
        list_transform(ws, t -> ('0x' || substr(sha256('s2|' || t), 1, 8))
            ::ubigint::bigint % 2147483629) as th2
      from docs
    ), wins as (
      select doc_id, i as start,
        list_reduce(th1[i:i+{K - 1}],
            (a, b) -> (a * 1000003 + b) % 2147483647) * 2147483648
        + list_reduce(th2[i:i+{K - 1}],
            (a, b) -> (a * 999979 + b) % 2147483629) as h
      from th, unnest(range(1, n - {K} + 2)) as t(i)
      where n >= {K}
    ), occ as (
      select doc_id, start,
        row_number() over (partition by h order by doc_id, start) as rk,
        count(*) over (partition by h) as n_occ
      from wins
    ), marked as (
      select doc_id, start, start + {K - 1} as e
      from occ where n_occ > 1 and rk > 1
    ), g as (
      select doc_id, start, e,
        case when start > max(e) over (partition by doc_id order by start
            rows between unbounded preceding and 1 preceding)
        then 1 else 0 end as ng
      from marked
    ), grp as (
      select doc_id, start, e,
        sum(ng) over (partition by doc_id order by start
            rows between unbounded preceding and current row) as gg
      from g
    ), merged as (
      select doc_id, min(start) as s, max(e) as e
      from grp group by doc_id, gg
    ), nrm as (
      select doc_id, sum(e - s + 1)::bigint as nrm from merged
      group by doc_id
    ), toks as (
      select doc_id, i, ws[i] as tok
      from th, unnest(range(1, n + 1)) as t(i)
    ), keptt as (
      select t.doc_id, t.i, t.tok from toks t
      where not exists (select 1 from merged m
          where m.doc_id = t.doc_id and t.i between m.s and m.e)
    ), clean as (
      select doc_id, string_agg(tok, ' ' order by i) as ct
      from keptt group by doc_id
    )
    select d.doc_id, d.n::int as n_tokens,
           coalesce(nrm.nrm, 0)::int as n_removed_tokens,
           coalesce(c.ct, '') as clean_text
    from th d
    left join nrm using (doc_id)
    left join clean as c using (doc_id)
"""


def _multiset(rows):
    return sorted("|".join(str(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_matches_duckdb_exactly(docs, sf_dir):
    got = _multiset(
        tuple(r) for r in exact_substring_dedup(docs, k=K).collect()
    )
    want = _multiset(duckdb.sql(_TWIN_SQL.format(path=sf_dir)).fetchall())
    assert got == want


def test_corpus_discriminates(docs):
    """The synthetic corpus contains exact-duplicate docs, so the
    window dedup must actually remove tokens somewhere."""
    st = exact_substring_dedup(docs, k=K).agg(
        F.sum("n_removed_tokens").alias("r"),
        F.sum((F.col("n_removed_tokens") > 0).cast("int")).alias("nd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert st["r"] > 0
    assert 0 < st["nd"] < st["n"]


def test_deterministic_under_repartition(docs):
    a = _multiset(
        tuple(r) for r in exact_substring_dedup(docs, k=K).collect()
    )
    b = _multiset(
        tuple(r)
        for r in exact_substring_dedup(docs.repartition(13), k=K).collect()
    )
    assert a == b


# --- handcrafted semantics -------------------------------------------------


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_survives_later_removed(spark):
    shared = "a b c d e"  # 5 tokens, k=5 -> exactly one window
    df = _df(
        spark,
        [
            (1, shared + " tail1 tail2"),
            (2, "head1 head2 " + shared),
            (3, "totally different words here now"),
        ],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=5).collect()}
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["n_removed_tokens"] == 5
    assert out[2]["clean_text"] == "head1 head2"
    assert out[3]["n_removed_tokens"] == 0


def test_overlapping_windows_merge_into_one_interval(spark):
    """A 7-token shared run with k=5 yields 3 duplicated windows in the
    second doc (starts 1,2,3) that must merge to ONE 7-token interval,
    not 15 removed tokens."""
    run = "t1 t2 t3 t4 t5 t6 t7"
    df = _df(spark, [(1, run + " x y"), (2, run + " p q")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=5).collect()}
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["n_removed_tokens"] == 7
    assert out[2]["clean_text"] == "p q"


def test_disjoint_intervals_stay_disjoint(spark):
    a = "a1 a2 a3 a4 a5"
    b = "b1 b2 b3 b4 b5"
    df = _df(
        spark,
        [
            (1, a + " mid " + b),
            (2, a + " gap1 gap2 gap3 gap4 gap5 gap6 " + b),
        ],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=5).collect()}
    assert out[2]["n_removed_tokens"] == 10
    assert out[2]["clean_text"] == "gap1 gap2 gap3 gap4 gap5 gap6"


def test_short_docs_never_marked(spark):
    df = _df(spark, [(1, "a b c"), (2, "a b c")])  # < k tokens
    out = exact_substring_dedup(df, k=5).collect()
    assert all(r["n_removed_tokens"] == 0 for r in out)


def test_within_doc_repeat(spark):
    run = "r1 r2 r3 r4 r5"
    df = _df(spark, [(1, run + " bridge " + run)])
    row = exact_substring_dedup(df, k=5).collect()[0]
    assert row["n_removed_tokens"] == 5
    assert row["clean_text"] == run + " bridge"


def test_plan_shuffles_ints_not_text(spark, docs):
    plan = (
        exact_substring_dedup(docs, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln and "_toks" not in ln
