"""Document-identity stamping (content_hash + confidence on extraction
output — the reference's ExportableDocument carries document_hash and
confidence, ``datamodel/exportable_document.py:53-122``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import content_hash
from docling_jobkit_spark.operators.extract_op import (
    FULL_RESULT_SCHEMA,
    extract_documents,
)
from docling_jobkit_spark.operators.slices import extract_documents_sliced


def test_stamped_hash_matches_canonical_dedup_key(spark, pages_path):
    """The stamped column IS functions.scalar.content_hash of the final
    text — downstream dedup can consume it without re-normalizing."""
    out = extract_documents(spark.read.parquet(pages_path))
    mismatches = (
        out.filter(F.col("status") != "FAILURE")
        .filter(F.col("content_hash") != content_hash("extracted_text"))
        .count()
    )
    assert mismatches == 0


def test_failure_rows_have_null_hash_and_zero_confidence(spark, pages_path):
    out = extract_documents(spark.read.parquet(pages_path), max_bytes=2_000)
    failed = out.filter(F.col("status") == "FAILURE")
    assert failed.count() > 0  # the byte cap rejects some docs
    assert failed.filter(F.col("content_hash").isNotNull()).count() == 0
    assert failed.filter(F.col("confidence") != 0.0).count() == 0


def test_confidence_is_bounded_density(spark, pages_path):
    out = extract_documents(spark.read.parquet(pages_path))
    bad = out.filter(
        (F.col("confidence") < 0.0) | (F.col("confidence") > 1.0)
        | F.col("confidence").isNull()
    ).count()
    assert bad == 0
    # extraction strips boilerplate: confidence must not be degenerate
    stats = out.filter(F.col("status") == "SUCCESS").agg(
        F.min("confidence").alias("lo"), F.max("confidence").alias("hi")
    ).first()
    assert 0.0 < stats["lo"] and stats["hi"] <= 1.0


def test_sliced_and_direct_stamp_identical_identity(spark, pages_path):
    """Identity is a projection over FINAL rows, so the sliced fan-out
    stamps byte-identical values to the single-shot path."""
    pages = spark.read.parquet(pages_path)
    cols = ["url", "content_hash", "confidence"]
    direct = sorted(
        map(tuple, extract_documents(pages).select(*cols).collect())
    )
    sliced = sorted(
        map(tuple, extract_documents_sliced(pages).select(*cols).collect())
    )
    assert direct == sliced


def test_full_result_schema_matches_operator_output(spark, pages_path):
    out = extract_documents(spark.read.parquet(pages_path))
    assert [f.name for f in out.schema.fields] == [
        f.name for f in FULL_RESULT_SCHEMA.fields
    ]
