"""CommitLog unit tests: idempotency, atomicity discipline, stale-attempt
replacement (the first-terminal-state-wins contract,
``redis_helper.py:950-1078`` analog)."""

from __future__ import annotations

import os

from docling_jobkit_spark.checkpoint import CommitLog


def _df(spark, urls):
    return spark.createDataFrame([(u, f"text-{u}") for u in urls], "url string, extracted_text string")


def test_commit_is_idempotent(spark, tmp_path):
    log = CommitLog(str(tmp_path / "o"))
    m1 = log.commit_group(0, _df(spark, ["a", "b"]))
    m2 = log.commit_group(0, _df(spark, ["c", "d"]))  # second writer loses
    assert m1 == m2  # the recorded manifest is the FIRST commit's
    rows = {r["url"] for r in spark.read.parquet(log.group_result_path(0)).collect()}
    assert rows == {"a", "b"}


def test_partial_write_without_manifest_is_invisible(spark, tmp_path):
    log = CommitLog(str(tmp_path / "o"))
    # simulate a crashed attempt: results dir present, no manifest
    _df(spark, ["x"]).write.parquet(log.group_result_path(1))
    assert log.committed_groups() == set()
    assert log.committed_results(spark) is None
    # a later successful commit replaces the stale directory atomically
    log.commit_group(1, _df(spark, ["y"]))
    rows = {r["url"] for r in spark.read.parquet(log.group_result_path(1)).collect()}
    assert rows == {"y"}
    assert log.committed_groups() == {1}


def test_remaining_pages_prunes_committed_groups(spark, tmp_path):
    from pyspark.sql import functions as F

    log = CommitLog(str(tmp_path / "o"))
    pages = spark.createDataFrame(
        [(f"u{i}", i % 4) for i in range(20)], "url string, g int"
    )
    done = pages.filter("g = 2").select("url", F.lit("t").alias("extracted_text"))
    log.commit_group(2, done)
    remaining = log.remaining_pages(spark, pages, F.col("g"))
    got = {r["url"] for r in remaining.collect()}
    assert got == {f"u{i}" for i in range(20) if i % 4 != 2}
