"""DSIR importance resampling (operators/dsir.py): exact DuckDB twin of
the full train→weight→Gumbel-top-k pipeline, discrimination checks, and
plan-shape pins (broadcast dims, no text on any Exchange)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.dsir import (
    HashedNgramDist,
    dsir_logweights,
    dsir_sample,
    hashed_features,
    train_hashed_dist,
)

B = 512  # small bucket space so collisions actually occur in the test

# target = doc_id % 5 == 0 (expressible identically in both engines);
# the lang-targeted variant is exercised by the driver entry.
_TWIN_SQL = f"""
    with docs as (
      select doc_id,
             string_split_regex(trim(lower(text)), '\\s+') as ws
      from read_parquet('{{path}}/documents.parquet')
    ), grams as (
      select doc_id, unnest(ws) as g from docs
      union all
      select doc_id, ws[i] || chr(31) || ws[i + 1] as g
      from docs, unnest(range(1, len(ws))) as t(i)
      where len(ws) >= 2
    ), feats as (
      select doc_id,
             (('0x' || substr(sha256(g), 1, 14))::ubigint
              % {B})::int as bucket
      from grams
    ), tgt as (
      select bucket, count(*)::bigint as c from feats
      where doc_id % 5 = 0 group by bucket
    ), raw as (
      select bucket, count(*)::bigint as c from feats group by bucket
    ), tot as (
      select (select coalesce(sum(c), 0) from tgt) as tt,
             (select coalesce(sum(c), 0) from raw) as tr
    ), tdist as (
      select bucket,
             round(ln((c + 1) / (tt + {B})) / 1e-4, 0)::bigint as lq
      from tgt, tot
    ), rdist as (
      select bucket,
             round(ln((c + 1) / (tr + {B})) / 1e-4, 0)::bigint as lq
      from raw, tot
    ), lq0 as (
      select round(ln(1.0 / (tt + {B})) / 1e-4, 0)::bigint as t0,
             round(ln(1.0 / (tr + {B})) / 1e-4, 0)::bigint as r0
      from tot
    ), per_doc as (
      select f.doc_id, count(*)::bigint as n_feats,
             sum(coalesce(t.lq, l.t0) - coalesce(r.lq, l.r0))::bigint
                 as lqw
      from feats f
      left join tdist t using (bucket)
      left join rdist r using (bucket)
      cross join lq0 l
      group by f.doc_id
    ), weights as (
      select d.doc_id,
             coalesce(p.n_feats, 0)::bigint as n_feats,
             coalesce(p.lqw, 0)::bigint as lqw,
             round(coalesce(p.lqw, 0) * 1e-4, 6) as logw
      from docs d left join per_doc p using (doc_id)
    ), keyed as (
      select doc_id, n_feats, logw,
             lqw + round(-ln(-ln(((('0x' || substr(sha256(
                 'dsir|' || doc_id::varchar), 1, 14))::ubigint
                 % 9007199254740992) + 0.5) / 9007199254740992.0))
                 / 1e-4, 0)::bigint as key
      from weights
    )
    select row_number() over (order by key desc, doc_id asc) as rank,
           doc_id, n_feats, logw, key
    from keyed
    order by key desc, doc_id asc
    limit {{k}}
"""


@pytest.fixture(scope="module")
def dists(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = train_hashed_dist(
        docs.where(F.col("doc_id") % 5 == 0), n_buckets=B
    )
    raw = train_hashed_dist(docs, n_buckets=B)
    return docs, target, raw


def test_dsir_sample_matches_duckdb_exactly(spark, sf_dir, dists):
    docs, target, raw = dists
    got = [
        tuple(r)
        for r in dsir_sample(docs, target, raw, k=50)
        .orderBy("rank")
        .collect()
    ]
    want = duckdb.sql(_TWIN_SQL.format(path=sf_dir, k=50)).fetchall()
    assert got == want


def test_logweights_deterministic_under_repartition(dists):
    docs, target, raw = dists
    a = sorted(
        tuple(r) for r in dsir_logweights(docs, target, raw).collect()
    )
    b = sorted(
        tuple(r)
        for r in dsir_logweights(docs.repartition(13), target, raw).collect()
    )
    assert a == b


def test_target_docs_score_higher(dists):
    """Importance weights must actually discriminate: docs drawn from
    the target slice average a higher log-weight than the rest."""
    docs, target, raw = dists
    rows = dsir_logweights(docs, target, raw).withColumn(
        "in_target", F.col("doc_id") % 5 == 0
    )
    means = {
        r["in_target"]: r["m"]
        for r in rows.groupBy("in_target")
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_sample_is_without_replacement_and_sized(dists):
    docs, target, raw = dists
    out = dsir_sample(docs, target, raw, k=40).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 40 and len(set(ids)) == 40
    assert [r["rank"] for r in sorted(out, key=lambda r: -r["key"])] == list(
        range(1, 41)
    )


def test_bucket_space_mismatch_raises(dists):
    docs, target, raw = dists
    other = HashedNgramDist(
        dist=raw.dist, lq0=raw.lq0, n_buckets=B * 2, total=raw.total
    )
    with pytest.raises(ValueError, match="bucket spaces differ"):
        dsir_logweights(docs, target, other)


def test_dists_are_bounded(dists):
    _, target, raw = dists
    assert target.dist.count() <= B and raw.dist.count() <= B
    assert target.total > 0 and raw.total > target.total / 2


def test_scoring_plan_broadcasts_dims_and_shuffles_no_text(dists):
    docs, target, raw = dists
    plan = (
        dsir_logweights(docs, target, raw)
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


# ------------------------------------------------- one-pass pair training


def test_pair_training_bit_identical_to_separate(dists):
    """train_hashed_dist_pair must reproduce two separate trainings
    EXACTLY: same dist rows, same lq0/total, and the end-to-end Gumbel
    top-k over the reused feature pass must be row-for-row identical."""
    from docling_jobkit_spark.operators.dsir import train_hashed_dist_pair

    docs, target, raw = dists
    t2, r2, feats = train_hashed_dist_pair(
        docs, F.col("doc_id") % 5 == 0, n_buckets=B
    )
    assert (t2.lq0, t2.total, t2.n_buckets) == (
        target.lq0,
        target.total,
        target.n_buckets,
    )
    assert (r2.lq0, r2.total) == (raw.lq0, raw.total)
    for a, b in ((t2.dist, target.dist), (r2.dist, raw.dist)):
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
    sep = [
        tuple(r)
        for r in dsir_sample(docs, target, raw, k=50).orderBy("rank").collect()
    ]
    pair = [
        tuple(r)
        for r in dsir_sample(docs, t2, r2, k=50, feats=feats)
        .orderBy("rank")
        .collect()
    ]
    assert sep == pair


def test_pair_training_lazy_feats_identical(dists):
    """materialize_feats=False (the 100 TB path — feats stays a lazy
    scan-shaped projection) must not change a single value."""
    from docling_jobkit_spark.operators.dsir import train_hashed_dist_pair

    docs, target, raw = dists
    t2, r2, feats = train_hashed_dist_pair(
        docs, F.col("doc_id") % 5 == 0, n_buckets=B, materialize_feats=False
    )
    a = sorted(tuple(r) for r in dsir_logweights(docs, target, raw).collect())
    b = sorted(
        tuple(r) for r in dsir_logweights(docs, t2, r2, feats=feats).collect()
    )
    assert a == b
