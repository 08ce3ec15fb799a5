"""Upsert verb pair (plans/ingest.py): ``read_corpus_latest`` (the
merge-on-read latest-copy-per-url view) and ``supersede_batch`` (its
copy-on-write materialization) — latest semantics across re-crawls,
MOR==COW equivalence when the verb is applied in commit order,
idempotence, dedup-memory retention for superseded content, refusals,
and the payload-never-shuffles plan pin (broadcast LEFT ANTI).

Same-session caveat (CLAUDE.md): DataFrames created before a
copy-on-write rewrite hold the OLD file listing — the fixture
materializes every pre-rewrite fact to plain Python values, and tests
that read the corpus after ``supersede_batch`` re-read the dirs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.plans.ingest import (
    IngestConfig,
    ingest_batch,
    read_corpus_asof,
    read_corpus_latest,
    supersede_batch,
)

CFG = IngestConfig()


def _base(spark, sf_dir):
    import __spark_entry__ as e

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "lang", "text")
        .withColumn("url", e._synth_url())
        .select("doc_id", "url", "text")
    )


def _recrawl(kept, id_offset: int):
    """Re-crawl rows: SAME url, word-reversed text. The exact hash
    changes and the word-shingle set is disjoint from the original
    (estimated Jaccard ~ 0, so the fuzzy history probe keeps it) while
    the length / stopword / lang statistics the curation funnel gates
    on survive word reordering."""
    return kept.select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.col("url"),
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias(
            "text"
        ),
    )


def _urls(df):
    return {r["url"] for r in df.select("url").distinct().collect()}


@pytest.fixture(scope="module")
def ustate(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_state"))
    base = _base(spark, sf_dir)
    a = base.where(F.col("doc_id") % 3 == 0)
    res_a = ingest_batch(spark, a, root, "2026-01", config=CFG)
    # B = fresh docs + re-crawls of half of A's committed urls
    fresh_b = base.where(F.col("doc_id") % 3 == 1)
    rec_b = _recrawl(res_a.kept.where(F.col("doc_id") % 2 == 0), 900_000)
    res_b = ingest_batch(
        spark, fresh_b.unionByName(rec_b), root, "2026-02", config=CFG
    )
    # C = re-crawls AGAIN of some urls B itself re-crawled: every other
    # word of B's committed text (word k-shingles disjoint from BOTH
    # A's and B's consecutive-word shingles), long docs only so the
    # halved word count still clears the funnel's min_tokens=20 floor
    # (this corpus tops out near 540 chars — CLAUDE.md session-8 note)
    twice = res_b.kept.where(
        (F.col("doc_id") >= 900_000) & (F.length("text") > 400)
    )
    rec_c = twice.select(
        (F.col("doc_id") + 900_000).alias("doc_id"),
        F.col("url"),
        F.concat_ws(
            " ",
            F.filter(F.split(F.col("text"), " "), lambda w, i: i % 2 == 0),
        ).alias("text"),
    )
    res_c = ingest_batch(spark, rec_c, root, "2026-03", config=CFG)
    # materialize every pre-rewrite fact the tests need (plain Python)
    b_rec = res_b.kept.where(F.col("doc_id") >= 900_000)
    facts = {
        "n_a": res_a.kept.count(),
        "n_b": res_b.kept.count(),
        "n_c": res_c.kept.count(),
        "a_urls": _urls(res_a.kept),
        "b_rec_urls": _urls(b_rec),
        "n_b_rec": b_rec.count(),
        "c_urls": _urls(res_c.kept),
        # a text batch B superseded out of A — committed bytes, so a
        # later re-post of it probes the seen table exactly
        "stale_text": res_a.kept.where(F.col("doc_id") % 2 == 0)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]["text"],
    }
    return root, facts


def test_latest_view_resolves_each_url_to_its_newest_batch(spark, ustate):
    root, fx = ustate
    mor = read_corpus_latest(spark, root)
    per_url = mor.groupBy("url").agg(
        F.count_distinct("batch").alias("nb"), F.max("batch").alias("b")
    )
    # one batch per url, and it is the newest committed batch holding it
    assert per_url.where(F.col("nb") > 1).count() == 0
    got = {r["url"]: r["b"] for r in per_url.collect()}
    assert fx["c_urls"], "batch C must commit re-crawls for the test to bite"
    for u in fx["c_urls"]:
        assert got[u] == "2026-03"
    for u in fx["b_rec_urls"] - fx["c_urls"]:
        assert got[u] == "2026-02"
    a_only = fx["a_urls"] - fx["b_rec_urls"]
    assert a_only
    for u in a_only:
        assert got[u] == "2026-01"
    # row accounting: everything committed minus one older copy per
    # supersession (B re-crawled A once, C re-crawled B once)
    n_all = fx["n_a"] + fx["n_b"] + fx["n_c"]
    n_superseded = len(fx["b_rec_urls"]) + len(fx["c_urls"])
    assert mor.count() == n_all - n_superseded


def test_latest_view_payload_side_is_broadcast_anti_joined(spark, ustate):
    """The loser set is removed via a broadcast LEFT ANTI join — the
    payload (text) side streams, it is never exchanged for the join
    (the narrow (doc_id, url, batch) branch is the only one allowed to
    shuffle)."""
    root, _ = ustate
    mor = read_corpus_latest(spark, root)
    plan = mor._jdf.queryExecution().executedPlan().toString()
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti, plan
    assert any("BroadcastHashJoin" in ln for ln in anti), plan


def test_supersede_in_commit_order_materializes_latest_view(spark, ustate):
    root, fx = ustate
    mor = read_corpus_latest(spark, root)
    # materialize the view BEFORE the rewrites invalidate file listings
    want = {
        (r["doc_id"], r["url"], r["content_hash"])
        for r in mor.select("doc_id", "url", "content_hash").collect()
    }
    stats_b = supersede_batch(spark, root, "2026-02")
    stats_c = supersede_batch(spark, root, "2026-03")
    assert stats_b.n_superseded == len(fx["b_rec_urls"])
    assert stats_c.n_superseded == len(fx["c_urls"])
    cow = read_corpus_asof(spark, root, "2026-03")
    got = {
        (r["doc_id"], r["url"], r["content_hash"])
        for r in cow.select("doc_id", "url", "content_hash").collect()
    }
    assert got == want
    # the MOR view over the superseded layout is now the identity
    assert read_corpus_latest(spark, root).count() == len(want)
    # idempotent: a second application finds nothing to remove
    again = supersede_batch(spark, root, "2026-03")
    assert again.n_superseded == 0 and again.delete is None
    # dedup memory KEPT: a later crawl re-surfacing the superseded OLD
    # content is dropped by the history probe — supersession is not
    # rollback (which forgets)
    repost = spark.range(1).select(
        F.lit(7_777_777).alias("doc_id"),
        F.lit("https://stale.example.org/repost").alias("url"),
        F.lit(fx["stale_text"]).alias("text"),
    )
    res_d = ingest_batch(spark, repost, root, "2026-04", config=CFG)
    assert res_d.kept.count() == 0
    drops = {r["stage"]: r["docs_dropped"] for r in res_d.ledger.collect()}
    assert drops.get("history_exact", 0) == 1


def test_supersede_refuses_uncommitted_batch(spark, tmp_path):
    with pytest.raises(ValueError, match="not committed"):
        supersede_batch(spark, str(tmp_path / "nostate"), "never")
