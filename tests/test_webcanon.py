"""URL canonicalization / canonical dedup / per-host caps
(operators/webfilter.py): DuckDB-exact twins over the messy synthetic
url corpus, handcrafted rule checks, and plan-shape pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from docling_jobkit_spark.operators.webfilter import (
    canonical_url,
    canonical_url_dedup,
    host_cap,
    host_stats,
)

# doc_id-keyed messy url — must stay in lockstep with _synth_messy_url()
_MESSY_SQL = """
      select doc_id,
             (case when doc_id % 5 = 0 then 'HTTPS' else 'https' end)
             || '://'
             || (case when doc_id % 3 = 0
                 then upper('h' || (doc_id % 350 % 5) || '.example.org')
                 else 'h' || (doc_id % 350 % 5) || '.example.org' end)
             || (case when doc_id % 4 = 0 then ':443' else '' end)
             || '/p/' || (doc_id % 350) || '.html?id=' || (doc_id % 350)
             || (case when doc_id % 2 = 0 then '&utm_campaign=x&gclid=g'
                 else '' end)
             || (case when doc_id % 6 = 0 then '#sec2' else '' end)
                 as url
      from read_parquet('{path}/documents.parquet')
"""

_CANON_SQL = """
      select doc_id, url,
        case when scheme = '' then url
             else scheme || '://' || auth || pth
                  || (case when newq = '' then '' else '?' || newq end)
        end as url_canonical
      from (
        select doc_id, url, scheme,
          case when scheme = 'http' then regexp_replace(auth0, ':80$', '')
               when scheme = 'https' then regexp_replace(auth0, ':443$', '')
               else auth0 end as auth,
          case when path0 = '' then '/' else path0 end as pth,
          coalesce(array_to_string(list_filter(string_split(q, '&'),
              p -> p <> '' and not regexp_matches(p,
                  '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)=')),
              '&'), '') as newq
        from (
          select doc_id, url,
            lower(regexp_extract(nf,
                '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) as scheme,
            lower(regexp_extract(nf,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) as auth0,
            regexp_extract(nf,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) as path0,
            regexp_extract(nf, '\\?([^#]*)', 1) as q
          from (select doc_id, url, regexp_replace(url, '#.*$', '') nf
                from messy)
        )
      )
"""

_LEDGER_SQL = f"""
    with messy as ({_MESSY_SQL}),
    canon as ({_CANON_SQL}),
    keep as (
      select *, row_number() over (partition by url_canonical
                                   order by doc_id) = 1 as url_canon_keep
      from canon
    ), survivors as (
      select doc_id, url_canonical,
             lower(regexp_extract(url_canonical,
                 '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)) as host
      from keep where url_canon_keep
    )
    select doc_id, url_canonical, host,
           row_number() over (partition by host order by doc_id) <= 60
               as host_kept
    from survivors
    order by doc_id
"""


def _multiset(rows):
    return sorted("|".join(str(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def messy(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "lang")
        .withColumn("url", entry_mod._synth_messy_url())
    )


def test_full_ledger_matches_duckdb_exactly(spark, sf_dir, messy):
    got = [
        tuple(r)
        for r in entry_mod._q_web_canonical_cap(spark, sf_dir).collect()
    ]
    want = duckdb.sql(_LEDGER_SQL.format(path=sf_dir)).fetchall()
    assert got == want
    assert len(got) == 350  # 500 docs, canonical identity mod 350


def test_canonical_matches_duckdb_exactly(sf_dir, messy):
    got = _multiset(
        (r["doc_id"], r["url_canonical"])
        for r in messy.select(
            "doc_id", canonical_url("url").alias("url_canonical")
        ).collect()
    )
    sql = f"with messy as ({_MESSY_SQL}) select doc_id, url_canonical from ({_CANON_SQL})"
    want = _multiset(duckdb.sql(sql.format(path=sf_dir)).fetchall())
    assert got == want


def test_corpus_discriminates(messy):
    """Every junk axis must actually appear AND collapse: upper scheme,
    upper host, ports, fragments, tracking params, and true dups."""
    out = messy.select(
        "url", canonical_url("url").alias("c")
    )
    st = out.agg(
        F.sum(F.col("url").contains("HTTPS").cast("int")).alias("up"),
        F.sum(F.col("url").contains(":443").cast("int")).alias("po"),
        F.sum(F.col("url").contains("#").cast("int")).alias("fr"),
        F.sum(F.col("url").contains("utm_").cast("int")).alias("tr"),
        F.sum(F.col("c").contains(":443").cast("int")).alias("c_po"),
        F.sum(F.col("c").contains("#").cast("int")).alias("c_fr"),
        F.sum(F.col("c").contains("utm_").cast("int")).alias("c_tr"),
        F.countDistinct("url").alias("nu"),
        F.countDistinct("c").alias("nc"),
    ).collect()[0]
    assert st["up"] > 0 and st["po"] > 0 and st["fr"] > 0 and st["tr"] > 0
    assert st["c_po"] == 0 and st["c_fr"] == 0 and st["c_tr"] == 0
    assert st["nc"] < st["nu"] and st["nc"] == 350


# --- handcrafted rules -----------------------------------------------------


CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM:80/A/B?x=1#frag", "http://www.example.com/A/B?x=1"),
    ("https://ex.com:443/", "https://ex.com/"),
    ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default kept
    ("http://ex.com:443/x", "http://ex.com:443/x"),  # 443 not http default
    ("https://ex.com", "https://ex.com/"),  # empty path -> /
    ("https://ex.com?utm_source=a&q=2&gclid=g", "https://ex.com/?q=2"),
    ("https://ex.com/p?utm_source=a&utm_medium=b", "https://ex.com/p"),
    ("https://ex.com/p?ref=tw&refresh=1", "https://ex.com/p?refresh=1"),
    ("not a url", "not a url"),  # unparseable passes through
    ("mailto:x@y.z", "mailto:x@y.z"),  # no ://, untouched
]


def test_handcrafted_canonicalization(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_host_cap_order_by_keeps_best(spark):
    rows = [(i, f"https://one.host/p{i}", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string, score long")
    out = host_cap(df, max_per_host=3, order_by=-F.col("score"))
    kept = sorted(r["doc_id"] for r in out.collect() if r["host_kept"])
    assert kept == [0, 1, 2]  # highest scores (100, 99, 98)


def test_host_stats_matches_duckdb(sf_dir, messy):
    got = _multiset(
        tuple(r)
        for r in host_stats(
            messy.withColumn("url", canonical_url("url"))
        ).collect()
    )
    sql = f"""
      with messy as ({_MESSY_SQL}), canon as ({_CANON_SQL})
      select lower(regexp_extract(url_canonical,
                 '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)) as host,
             count(*)::bigint as n_docs
      from canon group by 1
    """
    want = _multiset(duckdb.sql(sql.format(path=sf_dir)).fetchall())
    assert got == want


def test_dedup_deterministic_under_repartition(messy):
    a = _multiset(
        (r["doc_id"], r["url_canon_keep"])
        for r in canonical_url_dedup(messy).collect()
    )
    b = _multiset(
        (r["doc_id"], r["url_canon_keep"])
        for r in canonical_url_dedup(messy.repartition(13)).collect()
    )
    assert a == b


def test_plans(spark, messy):
    """canonical_url alone is a zero-exchange projection; the dedup and
    cap shuffles carry no payload column (only id + url-derived keys)."""
    plan_proj = (
        messy.select("doc_id", canonical_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_proj

    with_payload = messy.withColumn("text", F.repeat(F.lit("x"), 10))
    for op in (
        lambda d: canonical_url_dedup(d),
        lambda d: host_cap(d, 3),
    ):
        plan = op(with_payload)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "text" not in ln
