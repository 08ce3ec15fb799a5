"""Relational Bloom filter (operators/bloom.py): DuckDB-exact twin of
build + probe, the no-false-negative guarantee, false-positive sanity,
and plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.bloom import (
    bloom_probe,
    build_bloom,
)

N_BITS = 4096  # deliberately small so false positives exist and are pinned
K = 5

_POS = (
    "(('0x' || substr(sha256('bloom' || {i} || '|' || url), 1, 14))"
    f"::ubigint::bigint % {N_BITS})"
)

_BUILD_SQL = f"""
    with keys as (
      select 'https://h' || (doc_id % 37) || '.example.org/p/' || doc_id
          as url
      from read_parquet('{{path}}/documents.parquet') where doc_id < 250
    ), pos as (
      {' union all '.join(f"select {_POS.format(i=i)} as p from keys" for i in range(K))}
    )
    select p // 62 as word_idx, bit_or(1::bigint << (p % 62)::int) as bits
    from pos group by 1
"""

_PROBE_SQL = f"""
    with keys as (
      select doc_id,
             'https://h' || (doc_id % 37) || '.example.org/p/' || doc_id
                 as url
      from read_parquet('{{path}}/documents.parquet')
    ), pos as (
      {' union all '.join(f"select doc_id, {_POS.format(i=i)} as p from keys" for i in range(K))}
    ), bloom as ({{build}}),
    hits as (
      select pos.doc_id,
             case when b.bits is not null
                  and (b.bits & (1::bigint << (pos.p % 62)::int))
                      = (1::bigint << (pos.p % 62)::int)
             then 1 else 0 end as hit
      from pos left join bloom b on pos.p // 62 = b.word_idx
    )
    select doc_id, min(hit) = 1 as bloom_maybe_seen
    from hits group by doc_id
"""


def _url_col():
    return F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )


@pytest.fixture(scope="module")
def keyed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.withColumn("url", _url_col())


@pytest.fixture(scope="module")
def bloom(keyed):
    return build_bloom(
        keyed.where("doc_id < 250"), n_bits=N_BITS, k_hashes=K
    ).localCheckpoint(eager=True)


def test_build_matches_duckdb_exactly(bloom, sf_dir):
    got = sorted(tuple(r) for r in bloom.collect())
    want = sorted(duckdb.sql(_BUILD_SQL.format(path=sf_dir)).fetchall())
    assert got == want


def test_probe_matches_duckdb_exactly(keyed, bloom, sf_dir):
    got = sorted(
        (r["doc_id"], r["bloom_maybe_seen"])
        for r in bloom_probe(keyed, bloom, n_bits=N_BITS, k_hashes=K).collect()
    )
    want = sorted(
        duckdb.sql(
            _PROBE_SQL.format(path=sf_dir, build=_BUILD_SQL.format(path=sf_dir))
        ).fetchall()
    )
    assert got == want


def test_no_false_negatives_and_some_true_negatives(keyed, bloom):
    out = {
        r["doc_id"]: r["bloom_maybe_seen"]
        for r in bloom_probe(keyed, bloom, n_bits=N_BITS, k_hashes=K).collect()
    }
    # every built key MUST hit
    assert all(out[i] for i in range(250))
    # the unbuilt half mostly misses (bloom is useful), may rarely hit
    unseen_hits = sum(1 for i in range(250, 500) if out[i])
    assert unseen_hits < 125  # fp rate far below 50%


def test_filter_is_compact(bloom):
    assert bloom.count() <= (N_BITS // 62) + 1


def test_probe_plan_broadcasts_filter(keyed, bloom):
    plan = (
        bloom_probe(keyed, bloom, n_bits=N_BITS, k_hashes=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
