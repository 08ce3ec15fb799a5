"""Fuzzy MinHash/LSH decontamination (operators/decontam.py): exact
DuckDB twin of the bipartite band-join + signature-agreement verify,
discrimination (truncated benchmark copies are flagged, unrelated docs
are not), tau semantics, and plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import tokens
from docling_jobkit_spark.operators.decontam import (
    contamination_fuzzy,
    contamination_fuzzy_pairs,
)
from docling_jobkit_spark.operators.dedup import (
    _HALF,
    _PERMS,
    BANDS,
    MINHASH_PRIME,
    N_HASHES,
    ROWS_PER_BAND,
)

TAU = 0.7
_BENCH_OFFSET = 1_000_000


def _perms_sql() -> str:
    mask = _HALF - 1
    return ", ".join(
        f"list_min(list_transform(hs, x -> ((x >> 30) * {a} + (x & {mask}) * {c} + {b}) % {MINHASH_PRIME}))"
        for a, c, b in _PERMS
    )


# benchmark = every 7th doc truncated to its first 90% of tokens (a
# lightly-edited eval copy — exactly what fuzzy decontam exists for);
# signature pipeline mirrors dedup.py's bit-exact minhash oracle.
def _twin_sql(path: str, min_agree: int) -> str:
    r = ROWS_PER_BAND
    return f"""
        with docs as (
          select doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') as words
          from read_parquet('{path}/documents.parquet')
        ), bench_docs as (
          select doc_id + {_BENCH_OFFSET} as doc_id,
                 words[1:greatest(floor(len(words) * 0.9), 1)::int] as words
          from docs where doc_id % 7 = 0
        ), both_sides as (
          select 'c' as side, doc_id, words from docs
          union all
          select 'b' as side, doc_id, words from bench_docs
        ), sh as (
          select side, doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(words) - 2, 1) + 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                 as shingles
          from both_sides
        ), hs as (
          select side, doc_id,
                 list_transform(shingles,
                   s -> ('0x' || substr(sha256(s), 1, 15))::ubigint::bigint)
                 as hs
          from sh where len(shingles) > 0
        ), sig as (
          select side, doc_id, [{_perms_sql()}] as sig from hs
        ), bands as (
          select side, doc_id, sig,
                 unnest(generate_series(0, {BANDS - 1})) as band
          from sig
        ), keyed as (
          select side, doc_id, sig, band,
                 to_json(sig[band*{r}+1 : band*{r}+{r}]) as bucket
          from bands
        ), cand as (
          select distinct c.doc_id as doc_id, b.doc_id as bench_id,
                 len(list_filter(range(1, {N_HASHES} + 1),
                     i -> c.sig[i] = b.sig[i]))::int as n_agree
          from keyed c join keyed b
            on c.band = b.band and c.bucket = b.bucket
          where c.side = 'c' and b.side = 'b'
        )
        select doc_id, bench_id, n_agree,
               round(n_agree / {N_HASHES}.0, 6) as est_jaccard
        from cand where n_agree >= {min_agree}
        order by doc_id, bench_id
    """


def _benchmark(docs):
    toks = tokens(F.col("text"))
    take = F.greatest(F.floor(F.size(toks) * 0.9), F.lit(1)).cast("int")
    return docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + _BENCH_OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, F.lit(1), take), " ").alias("text"),
    )


@pytest.fixture(scope="module")
def docs_and_bench(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs, _benchmark(docs)


def test_fuzzy_pairs_match_duckdb_exactly(spark, sf_dir, docs_and_bench):
    import math

    docs, bench = docs_and_bench
    got = [
        tuple(r)
        for r in contamination_fuzzy_pairs(docs, bench, tau=TAU)
        .orderBy("doc_id", "bench_id")
        .collect()
    ]
    min_agree = int(math.ceil(N_HASHES * TAU - 1e-9))
    want = duckdb.sql(_twin_sql(sf_dir, min_agree)).fetchall()
    assert got == want
    assert len(got) > 0


def test_rollup_flags_sources_and_spares_the_rest(docs_and_bench):
    docs, bench = docs_and_bench
    rows = contamination_fuzzy(docs, bench, tau=TAU).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(by_id) == docs.count()  # one row per corpus doc
    sources = [i for i in by_id if i % 7 == 0]
    flagged_sources = sum(1 for i in sources if by_id[i]["contaminated"])
    # a 90% token prefix keeps shingle Jaccard ~0.9 — nearly every
    # source doc must be flagged; docs never copied must mostly survive
    assert flagged_sources >= 0.8 * len(sources)
    others = [i for i in by_id if i % 7 != 0]
    clean_others = sum(1 for i in others if not by_id[i]["contaminated"])
    assert clean_others >= 0.8 * len(others)
    for r in rows:
        assert r["contaminated"] == (r["n_bench_hits"] > 0)
        assert (r["max_est_jaccard"] is not None) == r["contaminated"]


def test_tau_monotone(docs_and_bench):
    docs, bench = docs_and_bench
    loose = contamination_fuzzy_pairs(docs, bench, tau=0.5).count()
    tight = contamination_fuzzy_pairs(docs, bench, tau=0.95).count()
    assert tight < loose


def test_tau_bounds_raise(docs_and_bench):
    docs, bench = docs_and_bench
    with pytest.raises(ValueError, match="tau"):
        contamination_fuzzy_pairs(docs, bench, tau=0.0)
    with pytest.raises(ValueError, match="tau"):
        contamination_fuzzy_pairs(docs, bench, tau=1.5)


def test_plan_broadcasts_benchmark_and_shuffles_no_text(docs_and_bench):
    docs, bench = docs_and_bench
    plan = (
        contamination_fuzzy_pairs(docs, bench, tau=TAU)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln
