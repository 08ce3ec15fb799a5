"""End-to-end curation funnel (plans/curation.py): ledger arithmetic,
per-stage agreement with the independently-applied operators,
sequential keep-first election (a dropped canonical promotes the next
surviving member), PII redaction of the kept text, and plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import content_hash
from docling_jobkit_spark.operators.pii import EMAIL_TOKEN
from docling_jobkit_spark.plans.curation import (
    STAGES,
    CurationConfig,
    CurationResult,
    curate_corpus,
)

CFG = CurationConfig(blocked_domains=("spamtracker.net",), blocked_exts=("exe", "jpg"))


def _corpus(spark, sf_dir):
    """The entry's corpus: documents + verbatim re-posts (%41, mirror
    url) + canonical-url clones (%43, tracking junk + text suffix)."""
    import __spark_entry__ as e

    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "lang", "text")
        .withColumn("url", e._synth_url())
    )
    reposts = base.where(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(
            F.lit("https://mirror.example.com/copy/"),
            F.col("doc_id").cast("string"),
            F.lit(".html"),
        ).alias("url"),
        F.col("text"),
    )
    clones = base.where(F.col("doc_id") % 43 == 0).select(
        (F.col("doc_id") + 600_000).alias("doc_id"),
        F.concat(F.col("url"), F.lit("&utm_source=feed")).alias("url"),
        F.concat(F.col("text"), F.lit(" repost edition")).alias("text"),
    )
    docs = (
        base.select("doc_id", "url", "text")
        .unionByName(reposts)
        .unionByName(clones)
    )
    bench = base.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return docs, bench


@pytest.fixture(scope="module")
def funnel(spark, sf_dir) -> tuple:
    docs, bench = _corpus(spark, sf_dir)
    res = curate_corpus(docs, benchmark=bench, config=CFG)
    stamped = res.stamped.localCheckpoint(eager=True)
    return docs, bench, CurationResult(stamped, res.kept, res.ledger)


def test_ledger_arithmetic(spark, funnel):
    docs, _, res = funnel
    rows = res.ledger.collect()
    assert [r["stage"] for r in rows] == list(STAGES)
    assert rows[0]["docs_in"] == docs.count()
    for prev, cur in zip(rows, rows[1:]):
        assert prev["docs_in"] - prev["docs_dropped"] == prev["docs_kept"]
        assert cur["docs_in"] == prev["docs_kept"]
    assert rows[-1]["docs_kept"] == res.kept.count()
    assert rows[-1]["docs_dropped"] == 0  # pii_redact transforms, never drops
    # every stage in this corpus has real work except the transform
    for r in rows[:-1]:
        assert r["docs_dropped"] > 0, r["stage"]


def test_drop_reasons_populated(funnel):
    _, _, res = funnel
    bad = res.stamped.where(
        (
            F.col("drop_stage").isNotNull() & F.col("drop_reason").isNull()
        )
        | (F.col("drop_stage").isNull() & F.col("drop_reason").isNotNull())
    )
    assert bad.count() == 0


def test_stages_agree_with_independent_operators(spark, funnel):
    from docling_jobkit_spark.operators.decontam import contamination
    from docling_jobkit_spark.operators.dedup import (
        minhash_near_duplicates,
        near_dup_clusters,
    )
    from docling_jobkit_spark.operators.webfilter import url_filter

    docs, bench, res = funnel
    s = res.stamped

    def dropped_at(stage):
        return {
            r["doc_id"]
            for r in s.where(F.col("drop_stage") == stage).select("doc_id").collect()
        }

    def survivors_before(stage):
        idx = STAGES.index(stage)
        return s.where(
            F.col("drop_stage").isNull()
            | ~F.col("drop_stage").isin(*STAGES[:idx])
        )

    # stage 1: url filter == the operator's verdict on the raw corpus
    want_url = {
        r["doc_id"]
        for r in url_filter(
            docs,
            blocked_domains=CFG.blocked_domains,
            blocked_exts=CFG.blocked_exts,
        )
        .where(~F.col("url_ok"))
        .select("doc_id")
        .collect()
    }
    assert dropped_at("url_filter") == want_url

    # stage 4: exact dedup == keep-first by content_hash among stage-3
    # survivors, computed independently
    surv3 = survivors_before("exact_dedup").select("doc_id", "text")
    keyed = surv3.select("doc_id", content_hash(F.col("text")).alias("h"))
    keepers = keyed.groupBy("h").agg(F.min("doc_id").alias("keep"))
    want_exact = {
        r["doc_id"]
        for r in keyed.join(keepers, on="h")
        .where(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
        .collect()
    }
    assert dropped_at("exact_dedup") == want_exact

    # stage 6: fuzzy dedup == clusters over stage-5 survivors
    surv5 = survivors_before("fuzzy_dedup").select("doc_id", "text")
    pairs = minhash_near_duplicates(
        surv5,
        threshold_num=CFG.minhash_threshold_num,
        threshold_den=CFG.minhash_threshold_den,
    )
    clusters = near_dup_clusters(pairs)
    want_fuzzy = {
        r["id"]
        for r in clusters.where(F.col("cluster_id") != F.col("id"))
        .select("id")
        .collect()
    }
    assert dropped_at("fuzzy_dedup") == want_fuzzy

    # stage 7: decontamination == the operator on stage-6 survivors
    surv6 = survivors_before("decontaminate").select("doc_id", "text")
    want_contam = {
        r["doc_id"]
        for r in contamination(surv6, bench, k=CFG.contam_k)
        .where(F.col("contaminated"))
        .select("doc_id")
        .collect()
    }
    assert dropped_at("decontaminate") == want_contam


def test_sequential_election_promotes_next_survivor(spark, funnel):
    """If an exact-dup group's smallest id dies at the URL filter, the
    NEXT surviving member must be elected keeper — dropping the whole
    group (what independent stage application would do) under-keeps."""
    _, _, res = funnel
    donor = (
        res.stamped.where(F.col("drop_stage").isNull() & ~F.col("has_pii"))
        .select("text")
        .first()["text"]
    )
    tiny = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") == 0, F.lit("https://h.example.com/a.exe")
        )
        .otherwise(
            F.concat(
                F.lit("https://h.example.com/p"),
                F.col("id").cast("string"),
                F.lit(".html"),
            )
        )
        .alias("url"),
        F.lit(donor).alias("text"),
    )
    out = curate_corpus(tiny, config=CFG).stamped
    got = {r["doc_id"]: r["drop_stage"] for r in out.collect()}
    assert got[0] == "url_filter"
    assert got[1] is None  # promoted keeper — NOT dropped as an exact dup
    assert got[2] == "exact_dedup"


def test_kept_text_is_redacted(spark, funnel):
    _, _, res = funnel
    donor = (
        res.stamped.where(F.col("drop_stage").isNull() & ~F.col("has_pii"))
        .select("doc_id", "url", "text")
        .first()
    )
    doctored = spark.range(1).select(
        F.lit(donor["doc_id"]).alias("doc_id"),
        F.lit(donor["url"]).alias("url"),
        F.concat(F.lit(donor["text"]), F.lit(" reach me at a.b@mail.test")).alias(
            "text"
        ),
    )
    out = curate_corpus(doctored, config=CFG)
    kept = out.kept.collect()
    assert len(kept) == 1
    assert "a.b@mail.test" not in kept[0]["text"]
    assert EMAIL_TOKEN in kept[0]["text"]


def test_plan_no_cartesian_payload_never_a_shuffle_key(funnel):
    _, _, res = funnel
    for df in (res.kept, res.ledger):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "text#" not in ln.split("Exchange hashpartitioning", 1)[1]
