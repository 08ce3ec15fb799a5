"""Quality classifier + GPT-3 Pareto keep rule (operators/quality_clf.py):
exact DuckDB twin of the full train→score→keep pipeline, discrimination,
determinism under repartition, alpha semantics, and plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.quality_clf import (
    PARETO_ALPHA,
    pareto_filter,
    quality_scores,
    train_quality_classifier,
)

B = 512  # small bucket space so collisions actually occur in the test
_NEG_EXP = repr(-1.0 / PARETO_ALPHA)  # identical double literal in SQL

# positives = lang 'en', negatives = the rest; NB log-odds + sigmoid +
# deterministic Pareto keep, every step mirroring the operator exactly.
_TWIN_SQL = f"""
    with docs as (
      select doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') as ws
      from read_parquet('{{path}}/documents.parquet')
    ), grams as (
      select doc_id, lang, unnest(ws) as g from docs
      union all
      select doc_id, lang, ws[i] || chr(31) || ws[i + 1] as g
      from docs, unnest(range(1, len(ws))) as t(i)
      where len(ws) >= 2
    ), feats as (
      select doc_id, lang,
             (('0x' || substr(sha256(g), 1, 14))::ubigint
              % {B})::int as bucket
      from grams
    ), pos as (
      select bucket, count(*)::bigint as c from feats
      where lang = 'en' group by bucket
    ), neg as (
      select bucket, count(*)::bigint as c from feats
      where lang <> 'en' group by bucket
    ), tot as (
      select (select coalesce(sum(c), 0) from pos) as tp,
             (select coalesce(sum(c), 0) from neg) as tn,
             (select count(*) from docs where lang = 'en') as np,
             (select count(*) from docs where lang <> 'en') as nn
    ), pdist as (
      select bucket,
             round(ln((c + 1) / (tp + {B})) / 1e-4, 0)::bigint as lq
      from pos, tot
    ), ndist as (
      select bucket,
             round(ln((c + 1) / (tn + {B})) / 1e-4, 0)::bigint as lq
      from neg, tot
    ), consts as (
      select round(ln(1.0 / (tp + {B})) / 1e-4, 0)::bigint as p0,
             round(ln(1.0 / (tn + {B})) / 1e-4, 0)::bigint as n0,
             round(ln((np + 1.0) / (nn + 1.0)) / 1e-4, 0)::bigint as prior
      from tot
    ), per_doc as (
      select f.doc_id, count(*)::bigint as n_feats,
             sum(coalesce(p.lq, c.p0) - coalesce(n.lq, c.n0))::bigint
                 as lqw
      from feats f
      left join pdist p using (bucket)
      left join ndist n using (bucket)
      cross join consts c
      group by f.doc_id
    ), scored as (
      select d.doc_id,
             coalesce(p.n_feats, 0)::bigint as n_feats,
             (coalesce(p.lqw, 0) + c.prior)::bigint as logodds_lq,
             round((coalesce(p.lqw, 0) + c.prior) * 1e-4, 6) as logodds,
             round(1.0 / (1.0 + exp(-((coalesce(p.lqw, 0) + c.prior)
                 * 1e-4))), 6) as p_quality
      from docs d
      left join per_doc p using (doc_id)
      cross join consts c
    ), kept as (
      select *,
             round(pow(1.0 - ((('0x' || substr(sha256(
                 'quality|' || doc_id::varchar), 1, 14))::ubigint
                 % 9007199254740992 + 0.5) / 9007199254740992.0),
                 {_NEG_EXP}) - 1.0, 6) as pareto
      from scored
    )
    select doc_id, n_feats, logodds_lq, logodds, p_quality, pareto,
           pareto > round(1.0 - p_quality, 6) as keep
    from kept
    order by doc_id
"""


@pytest.fixture(scope="module")
def clf_and_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clf = train_quality_classifier(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        n_buckets=B,
    )
    return docs, clf


def test_train_score_keep_matches_duckdb_exactly(spark, sf_dir, clf_and_docs):
    docs, clf = clf_and_docs
    got = [
        tuple(r)
        for r in pareto_filter(quality_scores(docs, clf))
        .orderBy("doc_id")
        .collect()
    ]
    want = duckdb.sql(_TWIN_SQL.format(path=sf_dir)).fetchall()
    assert got == want


def test_classifier_discriminates(clf_and_docs):
    """English docs (the positive seed) must average a higher posterior
    than the rest — the classifier actually learned the classes."""
    docs, clf = clf_and_docs
    rows = quality_scores(docs, clf).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["is_en"]: r["m"]
        for r in rows.withColumn("is_en", F.col("lang") == "en")
        .groupBy("is_en")
        .agg(F.avg("p_quality").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_keep_rule_is_stochastic_not_cutoff(clf_and_docs):
    """GPT-3's point: some low-score docs survive and some high-score
    docs are dropped — keep is NOT a threshold on p_quality."""
    docs, clf = clf_and_docs
    rows = pareto_filter(quality_scores(docs, clf)).collect()
    kept_p = sorted(r["p_quality"] for r in rows if r["keep"])
    dropped_p = sorted(r["p_quality"] for r in rows if not r["keep"])
    assert kept_p and dropped_p
    # overlap: the lowest kept score sits below the highest dropped one
    assert kept_p[0] < dropped_p[-1]


def test_higher_alpha_keeps_less(clf_and_docs):
    """Pareto(alpha) concentrates near 0 as alpha grows → fewer keeps;
    alpha is the selectivity knob, exactly as in GPT-3 Appendix A."""
    docs, clf = clf_and_docs
    scored = quality_scores(docs, clf).localCheckpoint(eager=True)
    n_loose = pareto_filter(scored, alpha=2.0).where("keep").count()
    n_tight = pareto_filter(scored, alpha=30.0).where("keep").count()
    assert n_tight < n_loose


def test_deterministic_under_repartition(clf_and_docs):
    docs, clf = clf_and_docs
    a = sorted(
        tuple(r)
        for r in pareto_filter(quality_scores(docs, clf)).collect()
    )
    b = sorted(
        tuple(r)
        for r in pareto_filter(
            quality_scores(docs.repartition(13), clf)
        ).collect()
    )
    assert a == b


def test_featureless_doc_scores_prior_alone(spark, clf_and_docs):
    _, clf = clf_and_docs
    empty = spark.range(1).select(
        F.lit(999999).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
    )
    row = quality_scores(empty, clf).collect()[0]
    assert row["n_feats"] == 0
    assert row["logodds_lq"] == clf.prior_lq


def test_scoring_plan_broadcasts_dims_and_shuffles_no_text(clf_and_docs):
    docs, clf = clf_and_docs
    plan = (
        quality_scores(docs, clf)
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


# ---------------------------------------------- one-pass split training


def test_split_training_bit_identical_to_separate(clf_and_docs):
    """train_quality_classifier_split (one labeled-frame feature pass,
    complement aggregation) must reproduce the two filtered trainings
    EXACTLY, end to end through the Pareto keep rule."""
    from docling_jobkit_spark.operators.quality_clf import (
        train_quality_classifier_split,
    )

    docs, clf = clf_and_docs
    clf2, feats = train_quality_classifier_split(
        docs, F.col("lang") == "en", n_buckets=B
    )
    assert clf2.prior_lq == clf.prior_lq
    assert (clf2.pos.lq0, clf2.pos.total) == (clf.pos.lq0, clf.pos.total)
    assert (clf2.neg.lq0, clf2.neg.total) == (clf.neg.lq0, clf.neg.total)
    sep = [
        tuple(r)
        for r in pareto_filter(quality_scores(docs, clf))
        .orderBy("doc_id")
        .collect()
    ]
    split = [
        tuple(r)
        for r in pareto_filter(quality_scores(docs, clf2, feats=feats))
        .orderBy("doc_id")
        .collect()
    ]
    assert sep == split
