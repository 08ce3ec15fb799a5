"""Per-host domain-quality report (webfilter.domain_quality_report):
exact DuckDB twin of the entry's corpus (synthetic urls + injected PII
+ a verbatim-mirror host), flag semantics, and the narrow-shuffle plan
pin (text never on an exchange)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e
from docling_jobkit_spark.operators.webfilter import domain_quality_report

_HOST_SQL = "lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1))"
_HASH_SQL = "sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


def _twin_sql(path: str) -> str:
    url_synth = e._URL_SYNTH_SQL.replace(
        "from documents", f"from read_parquet('{path}/documents.parquet')"
    )
    pii_inject = e._PII_INJECT_SQL.replace(
        "from documents", f"from read_parquet('{path}/documents.parquet')"
    )
    n_pii = (
        f"len(regexp_extract_all(text, '{e._PII_EMAIL}'))"
        f" + len(regexp_extract_all(text, '{e._PII_IPV4}'))"
        f" + len(regexp_extract_all(text, '{e._PII_PHONE}'))"
    )
    return f"""
        with u as ({url_synth}),
        p as ({pii_inject}),
        base as (select u.doc_id, u.url, p.text from u join p using (doc_id)),
        corpus as (
          select doc_id, url, text from base
          union all
          select doc_id + 700000,
                 'https://mirror.example.net/copy/' || doc_id::varchar || '.html',
                 text
          from base where doc_id % 23 = 0
        ),
        narrow as (
          select doc_id, {_HOST_SQL} as host, {_HASH_SQL} as h,
                 {e._NTOK} as ntok, len(text) as nchar,
                 len(regexp_extract_all(text, '[.,!?;:]')) as npunct,
                 (({n_pii}) > 0)::int as pii
          from corpus
        ),
        dh as (select h from narrow group by h having count(*) > 1),
        j as (
          select n.*, (dh.h is not null)::int as dup
          from narrow n left join dh on n.h = dh.h
        ),
        agg as (
          select host, count(*)::bigint as n_docs, sum(dup)::bigint as n_dup_docs,
                 sum(pii)::bigint as n_pii_docs, sum(ntok)::bigint as stok,
                 sum(nchar)::bigint as schar, sum(npunct)::bigint as spunct
          from j group by host
        )
        select host, n_docs, n_dup_docs,
               round(n_dup_docs / n_docs, 6) as dup_rate,
               n_pii_docs,
               round(n_pii_docs / n_docs, 6) as pii_rate,
               case when schar > 0 then round(spunct / schar, 6) end as punct_ratio,
               round(stok / n_docs, 6) as avg_tokens,
               case when round(n_dup_docs / n_docs, 6) > 0.5 then 'dup_farm'
                    when round(n_pii_docs / n_docs, 6) > 0.3 then 'pii_source'
                    when round(stok / n_docs, 6) < 10.0 then 'low_text'
               end as flag_reason,
               (case when round(n_dup_docs / n_docs, 6) > 0.5 then 'dup_farm'
                     when round(n_pii_docs / n_docs, 6) > 0.3 then 'pii_source'
                     when round(stok / n_docs, 6) < 10.0 then 'low_text'
                end) is not null as flagged
        from agg
        order by host
    """


def test_domain_quality_matches_duckdb_exactly(spark, sf_dir):
    got = [
        tuple(r)
        for r in e.queries()["domain_quality"](spark, sf_dir).collect()
    ]
    want = duckdb.sql(_twin_sql(sf_dir)).fetchall()
    assert got == want
    assert len(got) > 2


def test_mirror_host_flagged_as_dup_farm(spark, sf_dir):
    rows = {
        r["host"]: r
        for r in e.queries()["domain_quality"](spark, sf_dir).collect()
    }
    mirror = rows["mirror.example.net"]
    assert mirror["dup_rate"] == 1.0 and mirror["flag_reason"] == "dup_farm"
    # reason precedence is fixed: a dup farm stays dup_farm even if it
    # also trips the pii gate
    for r in rows.values():
        if r["dup_rate"] > 0.5:
            assert r["flag_reason"] == "dup_farm"


def test_plan_text_never_on_an_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://h.example.org/p/"), F.col("doc_id")).alias("url"),
        "text",
    )
    plan = (
        domain_quality_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln.split("Exchange hashpartitioning", 1)[1]
