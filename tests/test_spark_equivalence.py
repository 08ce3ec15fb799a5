"""Spark pipeline ≡ single-threaded oracle, byte-identical per url
(BASELINE.json input_hint; FIXTURES.md §6 test_spark_equivalence)."""

from __future__ import annotations

from docling_jobkit_spark.extractor import extract
from docling_jobkit_spark.operators.extract_op import extract_documents
from docling_jobkit_spark.operators.slices import extract_documents_sliced
from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig


def _oracle_map(rows, max_bytes=None):
    """The reference loop: sequential extraction, last-write-wins per url
    (matches Spark's dedup-free semantics only when urls are unique, so we
    key by url and assert on unique urls)."""
    out = {}
    for r in rows:
        res = extract(r["html"], r["url"], max_bytes=max_bytes)
        out.setdefault(r["url"], []).append(res)
    return out


def _assert_matches_oracle(result_rows, oracle):
    assert len(result_rows) == sum(len(v) for v in oracle.values())
    by_url = {}
    for row in result_rows:
        by_url.setdefault(row["url"], []).append(row)
    for url, expected_list in oracle.items():
        got_list = by_url[url]
        assert len(got_list) == len(expected_list), url
        # duplicate urls carry different payloads — compare as multisets
        got_set = sorted(
            (
                g["extracted_text"],
                g["status"],
                tuple(
                    (s["start"], s["end"], s["kind"], s["path"])
                    for s in (g["spans"] or [])
                ),
            )
            for g in got_list
        )
        exp_set = sorted(
            (
                e.text,
                e.status,
                tuple((s.start, s.end, s.kind, s.path) for s in e.spans),
            )
            for e in expected_list
        )
        assert got_set == exp_set, f"mismatch for {url}"


def test_direct_map_equivalence(spark, pages_path, corpus_rows):
    pages = spark.read.parquet(pages_path)
    got = extract_documents(pages).collect()
    _assert_matches_oracle([r.asDict(recursive=True) for r in got], _oracle_map(corpus_rows))


def test_sliced_map_equivalence(spark, pages_path, corpus_rows):
    """Slice-explode + reassembly must be byte-identical to the direct
    path (analog of the reference's slice-fanout == passthrough contract,
    ``serve_deployment.py:510-549``)."""
    pages = spark.read.parquet(pages_path)
    got = extract_documents_sliced(pages, pages_per_slice=2, slice_min_pages=3).collect()
    _assert_matches_oracle([r.asDict(recursive=True) for r in got], _oracle_map(corpus_rows))


def test_full_pipeline_equivalence(spark, pages_path, corpus_rows):
    cfg = PipelineConfig(max_bytes=1 << 26, num_partitions=8, n_commit_groups=4)
    pipe = ExtractionPipeline(spark, cfg)
    pages = spark.read.parquet(pages_path)
    got = pipe.extract(pages).collect()
    _assert_matches_oracle(
        [r.asDict(recursive=True) for r in got],
        _oracle_map(corpus_rows, max_bytes=cfg.max_bytes),
    )


def test_column_pruning_reaches_scan(spark, pages_path):
    """The extraction plan must not read text/lang/warc_ts from parquet —
    ReadSchema pruned to url+html (SURVEY §4 pushdown requirement)."""
    pages = spark.read.parquet(pages_path)
    plan = extract_documents(pages)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    schema = m.group(1)
    assert "url" in schema and "html" in schema
    assert "warc_ts" not in schema and "lang" not in schema
