"""corpus_report (operators/textstats.py): per-language dataset-card
summary with global exact-dup attribution — DuckDB-exact."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.textstats import corpus_report


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


def test_corpus_report_matches_duckdb_exactly(docs, sf_dir):
    got = _multiset([tuple(r) for r in corpus_report(docs).collect()])
    sql = f"""
        with base as (
          select lang,
                 case when trim(text) = '' then 0
                      else len(string_split_regex(trim(text),'\\s+')) end as w,
                 sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as h
          from '{sf_dir}/documents.parquet'
        ), dups as (
          select h from base group by h having count(*) > 1
        ), flagged as (
          select lang, count(*)::bigint as n_dup_docs
          from base where h in (select h from dups) group by lang
        ), per_lang as (
          select lang, count(*)::bigint as n_docs, sum(w)::bigint as n_words,
                 round(avg(w), 6) as mean_words_per_doc
          from base group by lang
        )
        select p.lang, p.n_docs,
               round(p.n_docs / (sum(p.n_docs) over ()), 6) as pct_docs,
               p.n_words, p.mean_words_per_doc,
               coalesce(f.n_dup_docs, 0)::bigint as n_dup_docs
        from per_lang p left join flagged f using (lang)
    """
    want = _multiset(duckdb.sql(sql).fetchall())
    assert got == want


def test_corpus_report_shares_sum_to_one(docs):
    rows = corpus_report(docs).collect()
    assert abs(sum(r["pct_docs"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_corpus_report_single_text_scan(docs):
    """The text column is read by exactly one projection: dup detection
    and the rollup both consume the materialized (lang, w, h) base, so
    the expensive hash/token expressions never recompute."""
    plan = corpus_report(docs)._jdf.queryExecution().executedPlan().toString()
    # the localCheckpoint shows up as (logical) RDD scans; the parquet
    # text column must appear in at most one scan node
    assert plan.count("ReadSchema") <= 1


def test_corpus_report_counts_cross_lang_duplicates(spark):
    rows = [
        ("en", "same words here"),
        ("de", "same words here"),     # dup of the en doc (global, cross-lang)
        ("en", "unique english doc"),
        ("fr", "texte unique"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    rep = {r["lang"]: r for r in corpus_report(df).collect()}
    assert rep["en"]["n_dup_docs"] == 1   # one en copy of the dup pair
    assert rep["de"]["n_dup_docs"] == 1   # attributed to each copy's lang
    assert rep["fr"]["n_dup_docs"] == 0
    assert rep["en"]["n_docs"] == 2
