"""Malformed inputs become FAILURE rows; the job never fails
(FIXTURES.md §6; analog ``serve_deployment.py:1504-1547`` degrade path
and ``tests/test_chunking.py:75-101`` failure propagation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_jobkit_spark.metrics import job_summary
from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig


def test_failure_rows_present_with_error_struct(spark, pages_path, corpus_rows):
    pipe = ExtractionPipeline(spark, PipelineConfig(max_bytes=1 << 26, num_partitions=8))
    out = pipe.extract(spark.read.parquet(pages_path)).cache()
    try:
        failures = out.filter(F.col("status") == "FAILURE")
        n_empty = sum(1 for r in corpus_rows if len(r["html"]) == 0)
        assert failures.count() == n_empty
        for row in failures.collect():
            assert row["error"] is not None
            assert row["error"]["category"] == "SOURCE_UNAVAILABLE"
            assert row["error"]["phase"] == "admission"
            assert row["extracted_text"] == ""
        # one output row per input row — nothing dropped
        assert out.count() == len(corpus_rows)
    finally:
        out.unpersist()


def test_admission_size_cap_routes_to_policy_failure(spark, pages_path):
    pipe = ExtractionPipeline(
        spark, PipelineConfig(max_bytes=5_000, num_partitions=4, use_slicing=False)
    )
    out = pipe.extract(spark.read.parquet(pages_path))
    cats = (
        out.filter(F.col("status") == "FAILURE")
        .groupBy(F.col("error.category").alias("cat"))
        .count()
        .collect()
    )
    by_cat = {r["cat"]: r["count"] for r in cats}
    assert by_cat.get("POLICY", 0) > 0          # oversize pages
    assert by_cat.get("SOURCE_UNAVAILABLE", 0) > 0  # empty pages


def test_job_summary_counters(spark, pages_path, corpus_rows):
    pipe = ExtractionPipeline(spark, PipelineConfig(max_bytes=1 << 26, num_partitions=8))
    out = pipe.extract(spark.read.parquet(pages_path))
    row = job_summary(out).collect()[0]
    assert row["num_converted"] == len(corpus_rows)
    assert (
        row["num_succeeded"] + row["num_partially_succeeded"] + row["num_failed"]
        == len(corpus_rows)
    )
    assert row["num_succeeded"] > 0.75 * len(corpus_rows)


def test_admission_page_cap_routes_to_policy_failure(spark, pages_path, corpus_rows):
    """max_num_pages gate (reference materialization.py:158-213): over-page
    docs become POLICY failure rows; Spark output == single-shot oracle."""
    from docling_jobkit_spark.extractor.extract import extract

    cap = 3
    pipe = ExtractionPipeline(
        spark, PipelineConfig(max_bytes=1 << 26, max_pages=cap, num_partitions=8)
    )
    out = pipe.extract(spark.read.parquet(pages_path)).cache()
    try:
        over = out.filter(F.col("error.message").like("page count %"))
        n_over = sum(
            1 for r in corpus_rows
            if r["html"].count(b"<!--PAGE_BREAK-->") + 1 > cap and len(r["html"]) > 0
        )
        assert n_over > 0, "fixture must contain multi-page docs over the cap"
        assert over.count() == n_over
        for row in over.collect():
            assert row["status"] == "FAILURE"
            assert row["error"]["category"] == "POLICY"
            assert row["error"]["phase"] == "admission"
        assert out.count() == len(corpus_rows)
        # oracle parity on one over-cap doc
        big = next(
            r for r in corpus_rows
            if r["html"].count(b"<!--PAGE_BREAK-->") + 1 > cap and len(r["html"]) > 0
        )
        exp = extract(big["html"], big["url"], max_pages=cap)
        assert exp.status == "FAILURE" and exp.error.category == "POLICY"
        assert "max_num_pages" in exp.error.message
    finally:
        out.unpersist()


def test_target_unavailable_classification():
    from docling_jobkit_spark.extractor.errors import (
        CATEGORY_INTERNAL,
        CATEGORY_TARGET_UNAVAILABLE,
        PHASE_SINK,
        classify_failure,
    )

    sink_err = classify_failure(ConnectionRefusedError("sink down"), phase=PHASE_SINK)
    assert sink_err.category == CATEGORY_TARGET_UNAVAILABLE
    assert sink_err.retryable is True
    assert sink_err.phase == PHASE_SINK
    # the same exception outside the sink phase stays INTERNAL
    other = classify_failure(ConnectionRefusedError("fetch down"))
    assert other.category == CATEGORY_INTERNAL
