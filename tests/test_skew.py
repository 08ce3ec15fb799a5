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


def _paged_doc(n_pages: int, seed: int = 0) -> bytes:
    page = b"<p>" + (b"paragraph with plenty of body text %d " % seed) * 8 + b"</p>"
    return b"<!--PAGE_BREAK-->".join(page for _ in range(n_pages))


def test_slices_spread_across_partitions_without_amplification(spark):
    """The fan-out's reason to exist: one giant doc's slices must land on
    MANY partitions (wall-time spread), and each slice row must carry only
    its own pages' bytes — not the whole document (Arrow/shuffle cost)."""
    from docling_jobkit_spark.operators.slices import split_slices, spread_slices

    html = _paged_doc(40)
    df = spark.createDataFrame([(0, "u1", html)], "_doc_key long, url string, html binary")
    slices = spread_slices(split_slices(df, pages_per_slice=1), 16)
    rows = slices.select(
        F.spark_partition_id().alias("p"), F.length("slice_html").alias("b")
    ).collect()
    assert len(rows) == 40
    assert len({r["p"] for r in rows}) > 4  # genuinely spread, not one task
    # sum of slice bytes == doc bytes minus the dropped inter-slice markers
    assert sum(r["b"] for r in rows) == len(html) - 39 * len(b"<!--PAGE_BREAK-->")
    assert max(r["b"] for r in rows) < len(html) // 10  # no full-payload rows


def test_duplicate_urls_with_distinct_payloads_stay_distinct(spark):
    """Reassembly groups by a per-row doc key, not url: two multi-page docs
    sharing a url must come back as two rows with their own texts."""
    from docling_jobkit_spark.operators.slices import extract_documents_sliced

    a = _paged_doc(5, seed=1)
    b = _paged_doc(7, seed=2)
    df = spark.createDataFrame(
        [("dup://same", a), ("dup://same", b)], "url string, html binary"
    )
    got = extract_documents_sliced(df, pages_per_slice=1, slice_min_pages=2).collect()
    assert len(got) == 2
    exp = {extract(a, "dup://same").text, extract(b, "dup://same").text}
    assert {r["extracted_text"] for r in got} == exp
    assert sorted(r["n_pages"] for r in got) == [5, 7]


def test_sliced_path_enforces_max_bytes_policy(spark):
    """A multi-page doc over max_bytes must produce the same POLICY
    FAILURE row the single-shot oracle returns — not get extracted."""
    from docling_jobkit_spark.operators.slices import extract_documents_sliced

    html = _paged_doc(6)
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    cap = len(html) - 1
    got = extract_documents_sliced(
        df, pages_per_slice=1, slice_min_pages=2, max_bytes=cap
    ).collect()
    exp = extract(html, "u1", max_bytes=cap)
    assert len(got) == 1
    assert got[0]["status"] == "FAILURE" == exp.status
    assert got[0]["error"]["category"] == "POLICY" == exp.error.category


def test_pipeline_assigns_doc_key_before_shuffle(spark):
    """Full pipeline (salted repartition ON + slicing) over paged docs
    with duplicate urls: _doc_key is assigned upstream of the shuffle, so
    reassembly stays per-input-row even after repartitioning."""
    from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig

    a = _paged_doc(5, seed=1)
    b = _paged_doc(7, seed=2)
    rows = [("dup://same", a), ("dup://same", b)] + [
        (f"u{i}", _paged_doc(1, seed=i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    pipe = ExtractionPipeline(
        spark,
        PipelineConfig(num_partitions=8, use_slicing=True, repartition=True,
                       slice_min_pages=2, pages_per_slice=1),
    )
    got = pipe.extract(df).collect()
    assert len(got) == 22
    dup = sorted(
        (r["n_pages"] for r in got if r["url"] == "dup://same")
    )
    assert dup == [5, 7]
    exp = {extract(a, "dup://same").text, extract(b, "dup://same").text}
    assert {r["extracted_text"] for r in got if r["url"] == "dup://same"} == exp


def test_presigned_ann_rejects_mismatched_bits(spark):
    import pytest as _pytest

    from docling_jobkit_spark.operators.similarity import (
        ann_topk_presigned,
        with_ann_signatures,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    signed = with_ann_signatures(emb, dim=len(q), n_bits=10, n_tables=2)
    with _pytest.raises(ValueError, match="n_bits=10"):
        ann_topk_presigned(signed, q, n_bits=8, n_tables=2)
    with _pytest.raises(ValueError, match="sig_2 missing"):
        ann_topk_presigned(signed, q, n_bits=10, n_tables=4)


def test_session_enables_aqe_skew_join(spark):
    """The runtime skew backstop must be on: crawl corpora are Zipfian
    in host/template keys, and the dedup/frequency joins would otherwise
    serialize on one oversized shuffle partition at scale."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
