"""Giant-doc skew handling (FIXTURES.md §6): salted repartition spreads
byte load; slice-explode keeps reassembled output byte-exact; no
partition carries a disproportionate share of bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_jobkit_spark.extractor import extract
from docling_jobkit_spark.operators.partitioning import (
    salted_repartition,
    with_url_bucket,
)


def test_salted_repartition_spreads_bytes(spark, pages_path):
    pages = spark.read.parquet(pages_path).filter(F.length("html") > 0)
    parts = 8
    dist = (
        salted_repartition(pages, parts)
        .select(F.spark_partition_id().alias("p"), F.length("html").alias("b"))
        .groupBy("p")
        .agg(F.sum("b").alias("bytes"), F.count("*").alias("docs"))
        .collect()
    )
    tot = sum(r["bytes"] for r in dist)
    top = max(r["bytes"] for r in dist)
    # no partition may own more than ~3x its fair byte share — the giant
    # page (~25x median) must not pile up with other giants
    assert len(dist) == parts
    assert top <= 3.2 * tot / parts, [r["bytes"] for r in dist]


def test_bucket_is_stable_and_uniform(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    b1 = {r["url"]: r["bucket"] for r in with_url_bucket(pages, 64).collect()}
    b2 = {r["url"]: r["bucket"] for r in with_url_bucket(pages, 64).collect()}
    assert b1 == b2  # deterministic
    counts: dict[int, int] = {}
    for v in b1.values():
        counts[v] = counts.get(v, 0) + 1
    assert max(counts.values()) <= 5 * (len(b1) / 64) + 5  # roughly uniform


def test_giant_doc_sliced_output_byte_exact(spark, corpus_rows):
    """The biggest multi-page doc goes through explode/reassembly and
    must still match the single-threaded oracle byte-for-byte."""
    from docling_jobkit_spark.operators.slices import extract_documents_sliced

    paged = [r for r in corpus_rows if b"<!--PAGE_BREAK-->" in r["html"]]
    biggest = max(paged, key=lambda r: len(r["html"]))
    df = spark.createDataFrame(
        [(biggest["url"], biggest["html"])], "url string, html binary"
    )
    got = extract_documents_sliced(df, pages_per_slice=1, slice_min_pages=2).collect()
    exp = extract(biggest["html"], biggest["url"])
    assert len(got) == 1
    assert got[0]["extracted_text"] == exp.text
    assert got[0]["n_pages"] == exp.n_pages
