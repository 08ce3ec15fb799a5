"""C4 family (operators/c4_filters.py): line filter, page gates, and
three-line-span corpus dedup — DuckDB-exact over a materialized lined
corpus, plus handcrafted-rule and plan-shape tests."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.c4_filters import (
    c4_clean,
    c4_line_filter,
    c4_line_stats,
    c4_span_dedup,
    lined_documents,
)

_LINE_KEPT_SQL = (
    "x <> '' and right(x, 1) in ('.', '!', '?', '\"') "
    "and len(string_split_regex(x, '\\s+')) >= 5 "
    "and not contains(lower(x), 'javascript')"
)

_STATS_SQL = f"""
    with base as (
      select doc_id, text,
             list_transform(string_split(text, chr(10)), x -> trim(x)) as lines
      from read_parquet('{{path}}/*.parquet')
    ), k as (
      select *, list_filter(lines, x -> {_LINE_KEPT_SQL}) as kept,
             contains(lower(text), 'lorem ipsum') as has_lorem_ipsum,
             contains(text, chr(123)) as has_brace
      from base
    )
    select doc_id, len(lines)::int as n_lines, len(kept)::int as n_kept_lines,
           has_lorem_ipsum, has_brace,
           (not has_lorem_ipsum and not has_brace and len(kept) >= 3)
               as page_kept,
           case when (not has_lorem_ipsum and not has_brace
                      and len(kept) >= 3)
                then array_to_string(kept, chr(10)) end as clean_text
    from k
"""

_SPAN_DEDUP_SQL = f"""
    with base as (
      select doc_id,
             list_transform(string_split(text, chr(10)), x -> trim(x)) as lines
      from read_parquet('{{path}}/*.parquet')
    ), spans as (
      select doc_id, i as start,
             ('0x' || substr(sha256(array_to_string(
                 list_transform(lines[i:i+2],
                     x -> trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))),
                 chr(31))), 1, 14))::ubigint::bigint as h
      from base, unnest(range(1, greatest(len(lines) - 2, 0) + 1)) as t(i)
    ), occ as (
      select doc_id, start,
             row_number() over (partition by h order by doc_id, start) as rk,
             count(*) over (partition by h) as n_occ
      from spans
    ), removed as (
      select distinct doc_id, li
      from occ, unnest(range(start, start + 3)) as u(li)
      where n_occ > 1 and rk > 1
    ), drops as (
      select doc_id, list_sort(list(li)) as drop_idx
      from removed group by doc_id
    )
    select b.doc_id, len(b.lines)::int as n_lines,
           coalesce(len(d.drop_idx), 0)::int as n_removed_lines,
           -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
           coalesce(array_to_string(
             list_filter(b.lines,
                 (x, i) -> d.drop_idx is null
                           or not list_contains(d.drop_idx, i)),
             chr(10)), '') as clean_text
    from base b left join drops d using (doc_id)
"""


def _multiset(rows):
    return sorted("|".join(str(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def lined_path(spark, sf_dir, tmp_path_factory):
    path = os.path.join(
        str(tmp_path_factory.mktemp("c4")), "lined.parquet"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lined_documents(docs).select("doc_id", "text").coalesce(1).write.parquet(
        path
    )
    return path


@pytest.fixture(scope="module")
def lined(spark, lined_path):
    return spark.read.parquet(lined_path)


def test_line_stats_matches_duckdb_exactly(lined, lined_path):
    got = _multiset(tuple(r) for r in c4_line_stats(lined).collect())
    want = _multiset(
        duckdb.sql(_STATS_SQL.format(path=lined_path)).fetchall()
    )
    assert got == want


def test_span_dedup_matches_duckdb_exactly(lined, lined_path):
    got = _multiset(tuple(r) for r in c4_span_dedup(lined).collect())
    want = _multiset(
        duckdb.sql(_SPAN_DEDUP_SQL.format(path=lined_path)).fetchall()
    )
    assert got == want


def test_c4_clean_composes_filter_then_dedup(lined):
    """End-to-end composite equals applying the two stages explicitly."""
    got = _multiset(tuple(r) for r in c4_clean(lined).collect())
    survivors = c4_line_filter(lined)
    want = _multiset(tuple(r) for r in c4_span_dedup(survivors).collect())
    assert got == want
    assert len(got) > 0


def test_span_dedup_deterministic_under_repartition(lined):
    a = _multiset(tuple(r) for r in c4_span_dedup(lined).collect())
    b = _multiset(
        tuple(r) for r in c4_span_dedup(lined.repartition(13)).collect()
    )
    assert a == b


def test_corpus_actually_discriminates(lined):
    """The derived lined corpus must exercise every rule: some lines
    dropped per-line, some pages dropped per-page (incl. lorem/brace),
    and some spans actually deduplicated."""
    st = c4_line_stats(lined).agg(
        F.sum("n_lines").alias("nl"),
        F.sum("n_kept_lines").alias("nk"),
        F.sum(F.col("has_lorem_ipsum").cast("int")).alias("lo"),
        F.sum(F.col("has_brace").cast("int")).alias("br"),
        F.sum((~F.col("page_kept")).cast("int")).alias("pd"),
    ).collect()[0]
    assert 0 < st["nk"] < st["nl"]
    assert st["lo"] > 0 and st["br"] > 0 and st["pd"] > 0
    removed = c4_span_dedup(lined).agg(
        F.sum("n_removed_lines").alias("r")
    ).collect()[0]["r"]
    assert removed > 0


# --- handcrafted rule checks -----------------------------------------------


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_rules(spark):
    text = "\n".join(
        [
            "this line has five words.",        # kept
            "too short.",                        # < 5 words
            "no terminal punctuation five words",  # no terminal punct
            "a javascript line with six words.",   # javascript
            'he said "five words right here?"',    # end quote ok
            "another good line of words!",       # kept
            "  padded line with five words.  ",  # trimmed, kept
        ]
    )
    row = c4_line_stats(_df(spark, [(1, text)])).collect()[0]
    assert row["n_lines"] == 7
    assert row["n_kept_lines"] == 4
    assert row["page_kept"] is True
    assert row["clean_text"].count("\n") == 3


def test_page_rules(spark):
    good = "\n".join(["one good line of words."] * 3)
    rows = c4_line_stats(
        _df(
            spark,
            [
                (1, good),
                (2, good + "\nsprinkle of Lorem Ipsum here."),
                (3, good + "\nvar x = {1};"),
                (4, "one good line of words.\nsecond good line of words."),
            ],
        )
    ).collect()
    kept = {r["doc_id"]: r["page_kept"] for r in rows}
    assert kept == {1: True, 2: False, 3: False, 4: False}


def test_span_dedup_keeps_first_occurrence(spark):
    span = "alpha beta gamma.\ndelta epsilon zeta.\neta theta iota."
    df = _df(
        spark,
        [
            (1, span + "\nunique tail one."),
            (2, "unique head two.\n" + span),
            (3, "totally unrelated line.\nanother unrelated line."),
        ],
    )
    out = {r["doc_id"]: r for r in c4_span_dedup(df).collect()}
    assert out[1]["n_removed_lines"] == 0          # first (doc 1, start 1)
    assert out[2]["n_removed_lines"] == 3
    assert out[2]["clean_text"] == "unique head two."
    assert out[3]["n_removed_lines"] == 0          # < 3 shared lines


def test_span_dedup_within_doc_repeat(spark):
    span = "alpha beta gamma.\ndelta epsilon zeta.\neta theta iota."
    df = _df(spark, [(1, span + "\nbridge line here.\n" + span)])
    row = c4_span_dedup(df).collect()[0]
    assert row["n_removed_lines"] == 3
    assert row["clean_text"] == span + "\nbridge line here."


def test_line_filter_scan_fused(spark, lined):
    """The line filter is a pure projection: zero exchanges."""
    plan = (
        c4_line_filter(lined)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_span_dedup_shuffles_hashes_not_text(spark, lined):
    """The occurrence window and drop rollup key on the 56-bit span hash
    and doc id; no text column may ride an Exchange, and nothing plans
    quadratic."""
    plan = (
        c4_span_dedup(lined)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text" not in ln and "_lines" not in ln
