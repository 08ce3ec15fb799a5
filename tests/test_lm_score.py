"""LM-perplexity scoring (operators/lm_score.py): trained pruned bigram
model + quantized relational scoring — DuckDB-exact end to end."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.lm_score import (
    BigramLM,
    perplexity_cutoffs,
    ppl_bucket,
    score_perplexity,
    train_bigram_lm,
)

# the synthetic corpus has 31 distinct words — V=16 forces a real OOV
# population so the <unk> mapping is exercised in the cross-engine twin
V, B, K = 16, 65536, 1.0


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def lm(docs):
    return train_bigram_lm(docs, vocab_size=V, max_bigrams=B, k=K)


def _duckdb_scores(sf_dir, v_size):
    """Full twin: train the same pruned model and score, in one SQL
    statement. B is set above the corpus' distinct-bigram count at test
    scale so the prune keeps everything (the cap path has its own unit
    test)."""
    sql = f"""
        with toks as (
          select doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') as ws
          from '{sf_dir}/documents.parquet'
          where trim(text) <> ''
        ),
        uni as (
          select w, count(*)::bigint c1
          from (select unnest(ws) w from toks) group by w
        ),
        vocab as (select w, c1 from uni order by c1 desc, w asc limit {V}),
        unk as (
          select (select sum(c1) from uni) - (select sum(c1) from vocab) cu
        ),
        pairs as (
          select doc_id, ws[i] w1, ws[i+1] w2
          from toks, unnest(generate_series(1, len(ws)-1)) as g(i)
          where len(ws) >= 2
        ),
        mapped as (
          select doc_id,
                 coalesce(v1.w, '<unk>') w1m,
                 coalesce(v2.w, '<unk>') w2m,
                 coalesce(v1.c1, (select cu from unk)) c1m
          from pairs
          left join vocab v1 on pairs.w1 = v1.w
          left join vocab v2 on pairs.w2 = v2.w
        ),
        big as (
          select w1m w1, w2m w2, count(*)::bigint c12
          from mapped group by 1, 2
        ),
        terms as (
          select m.doc_id,
                 round((ln(coalesce(b.c12, 0) + {K}) -
                        ln(m.c1m + {K} * {v_size})) / 1e-4, 0)::bigint lq
          from mapped m
          left join big b on m.w1m = b.w1 and m.w2m = b.w2
        ),
        per_doc as (
          select doc_id, count(*)::bigint n_bigrams, sum(lq) lqs
          from terms group by doc_id
        )
        select d.doc_id,
               coalesce(p.n_bigrams, 0)::bigint n_bigrams,
               round(-(p.lqs * 1e-4) / p.n_bigrams, 6) nll,
               round(exp(-(p.lqs * 1e-4) / p.n_bigrams), 6) ppl
        from '{sf_dir}/documents.parquet' d
        left join per_doc p using (doc_id)
        order by d.doc_id
    """
    return duckdb.sql(sql).fetchall()


def test_lm_score_matches_duckdb_exactly(docs, lm, sf_dir):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in score_perplexity(docs, lm).collect()
    }
    want = {
        did: (nb, nll, ppl)
        for did, nb, nll, ppl in _duckdb_scores(sf_dir, lm.v_size)
    }
    assert set(got) == set(want)
    for did in want:
        gn, gl, gp = got[did]
        wn, wl, wp = want[did]
        assert gn == wn, (did, "n_bigrams", gn, wn)
        assert (gl is None) == (wl is None) and (
            gl is None or abs(gl - wl) < 1e-9
        ), (did, "nll", gl, wl)
        assert (gp is None) == (wp is None) and (
            gp is None or abs(gp - wp) < 1e-9
        ), (did, "ppl", gp, wp)


def test_lm_model_is_deterministic(docs):
    """Same corpus + params → identical vocab and bigram dims (the model
    is a pure function — repartitioning must not change top-K picks)."""
    lm1 = train_bigram_lm(docs, vocab_size=64, max_bigrams=256)
    lm2 = train_bigram_lm(docs.repartition(13), vocab_size=64, max_bigrams=256)
    assert lm1.v_size == lm2.v_size
    v1 = sorted(map(tuple, lm1.vocab.collect()))
    v2 = sorted(map(tuple, lm2.vocab.collect()))
    assert v1 == v2
    b1 = sorted(map(tuple, lm1.bigrams.collect()))
    b2 = sorted(map(tuple, lm2.bigrams.collect()))
    assert b1 == b2


def test_lm_prune_cap_respected(docs):
    lm = train_bigram_lm(docs, vocab_size=8, max_bigrams=40)
    assert lm.bigrams.count() <= 40
    assert lm.vocab.count() == 9  # 8 words + <unk>
    assert lm.v_size == 9
    # a vocab cap above the corpus' 31 distinct words keeps everything
    # and the <unk> row aggregates to zero
    lm_all = train_bigram_lm(docs, vocab_size=64, max_bigrams=B)
    assert lm_all.vocab.count() == 32  # 31 words + <unk>
    unk = lm_all.vocab.where(F.col("w") == "<unk>").collect()[0]
    assert unk["c1"] == 0


def test_fluent_text_scores_below_gibberish(spark, docs, lm):
    """The whole point of the CCNet stage: in-distribution text gets a
    LOWER perplexity than shuffled gibberish made of the same words."""
    sample = docs.orderBy("doc_id").limit(1).collect()[0]
    words = sample["text"].lower().split()[:60]
    fluent = " ".join(words)
    gibberish = " ".join(words[::-1][::2] + words[1::2][::-1])
    probe = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("doc_id"), F.lit(fluent).alias("text")),
                F.struct(F.lit(1).alias("doc_id"), F.lit(gibberish).alias("text")),
            )
        ).alias("r")
    ).select("r.*")
    out = {r["doc_id"]: r["ppl"] for r in score_perplexity(probe, lm).collect()}
    assert out[0] < out[1]


def test_short_docs_unscored(spark, lm):
    probe = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("doc_id"), F.lit("one").alias("text")),
                F.struct(F.lit(1).alias("doc_id"), F.lit("").alias("text")),
                F.struct(
                    F.lit(2).alias("doc_id"),
                    F.lit(None).cast("string").alias("text"),
                ),
                F.struct(F.lit(3).alias("doc_id"), F.lit("two words").alias("text")),
            )
        ).alias("r")
    ).select("r.*")
    rows = {r["doc_id"]: r for r in score_perplexity(probe, lm).collect()}
    for did in (0, 1, 2):
        assert rows[did]["n_bigrams"] == 0 and rows[did]["ppl"] is None
    assert rows[3]["n_bigrams"] == 1 and rows[3]["ppl"] is not None
    b = probe.join(
        score_perplexity(probe, lm).select("doc_id", "ppl"), "doc_id"
    ).select("doc_id", ppl_bucket("ppl", 10.0, 100.0))
    assert {r["ppl_bucket"] for r in b.where(F.col("doc_id") < 3).collect()} == {
        "unscored"
    }


def test_bucket_split_covers_corpus(docs, lm):
    scored = score_perplexity(docs, lm)
    h, t = perplexity_cutoffs(scored)
    assert h < t
    dist = {
        r["ppl_bucket"]: r["n"]
        for r in scored.select(ppl_bucket("ppl", h, t))
        .groupBy("ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_scored = sum(v for k, v in dist.items() if k != "unscored")
    # exact thirds up to ties at the cutoffs
    assert dist["head"] >= 1 and dist["middle"] >= 1 and dist["tail"] >= 1
    assert abs(dist["head"] - n_scored / 3) <= max(2, 0.05 * n_scored)
