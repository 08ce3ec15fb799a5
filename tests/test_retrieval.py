"""BM25 retrieval (operators/retrieval.py): exact DuckDB twin plus
hand-computed semantics on a tiny corpus."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.retrieval import (
    TERM_BUCKET_COL,
    bm25_oracle_sql,
    bm25_topk,
    build_postings,
    query_terms,
    read_postings,
    tokens,
    write_postings,
)

QUERIES = [
    ("q_join", "hash join merge strategy"),
    ("q_stream", "window stream aggregation"),
    ("q_scan", "fast table scan filter"),
]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def _multiset(rows):
    return sorted("|".join(_canon(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bm25_matches_duckdb_exactly(docs, sf_dir):
    got = _multiset(
        tuple(r) for r in bm25_topk(docs, QUERIES, k=10).collect()
    )
    sql = bm25_oracle_sql(
        QUERIES,
        k=10,
        docs_sql=f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'",
    )
    want = _multiset(duckdb.sql(sql).fetchall())
    assert got and got == want


def _tiny(spark, rows):
    # range+explode literal frame per the repo invariant (never
    # createDataFrame(list) for small dims)
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("doc_id"), F.lit(t).alias("text")
            )
            for i, t in rows
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(structs).alias("d"))
        .select("d.doc_id", "d.text")
    )


def test_bm25_hand_computed(spark):
    # 3 docs, query = "apple": df=2, N=3, dls 2/2/2, avgdl=2
    docs = _tiny(
        spark,
        [(1, "apple pie"), (2, "apple tart"), (3, "banana bread")],
    )
    out = bm25_topk(docs, [("q", "apple")], k=10).collect()
    assert [(r.query_id, r.rank, r.doc_id) for r in out] == [
        ("q", 1, 1),
        ("q", 2, 2),
    ]
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    # tf=1, dl=avgdl → norm = k1*(1-b+b) = k1
    expected = idf * 1.0 / (1.0 + 1.2)
    assert out[0].score == pytest.approx(expected, abs=1e-6)
    # equal scores tie-break on doc_id ascending
    assert out[0].score == out[1].score


def test_bm25_rewards_tf_and_penalizes_length(spark):
    docs = _tiny(
        spark,
        [
            (1, "cat cat cat dog"),
            (2, "cat dog bird fish mouse horse goat sheep cow hen"),
            (3, "dog dog dog dog"),
        ],
    )
    out = bm25_topk(docs, [("q", "cat")], k=10).collect()
    # doc 1: higher tf AND shorter than doc 2 → ranks first
    assert [r.doc_id for r in out] == [1, 2]


def test_bm25_query_term_repeats_count_once(spark):
    docs = _tiny(spark, [(1, "alpha beta"), (2, "alpha gamma")])
    once = bm25_topk(docs, [("q", "alpha")], k=10).collect()
    twice = bm25_topk(docs, [("q", "alpha alpha ALPHA")], k=10).collect()
    assert [(r.doc_id, r.score) for r in once] == [
        (r.doc_id, r.score) for r in twice
    ]


def test_bm25_unknown_terms_and_short_result_sets(spark):
    docs = _tiny(spark, [(1, "alpha beta"), (2, "gamma delta")])
    out = bm25_topk(
        docs, [("q1", "alpha zzzzunknown"), ("q2", "qqqnothing")], k=10
    ).collect()
    # q2 matches nothing → zero rows; q1 returns only doc 1
    assert [(r.query_id, r.doc_id) for r in out] == [("q1", 1)]


def test_bm25_accepts_precomputed_postings(spark):
    docs = _tiny(spark, [(1, "alpha beta"), (2, "alpha gamma")])
    postings = build_postings(docs)
    direct = bm25_topk(docs, [("q", "alpha beta")], k=10).collect()
    via_index = bm25_topk(
        docs, [("q", "alpha beta")], k=10, postings=postings
    ).collect()
    assert _multiset(tuple(r) for r in direct) == _multiset(
        tuple(r) for r in via_index
    )


def test_bm25_persisted_index_probe(spark, docs, tmp_path):
    """write → read → probe with NO corpus access (docs=None): equals the
    direct path, prunes at the file listing, and refuses unstamped
    bucketed layouts."""
    postings = build_postings(docs)
    n_docs, total_tokens = docs.select(
        F.count(F.lit(1)), F.sum(F.size(tokens("text")))
    ).first()
    path = str(tmp_path / "postings")
    write_postings(postings, path, corpus_stats=(n_docs, total_tokens))

    idx = read_postings(spark, path)
    probed = bm25_topk(None, QUERIES, k=10, postings=idx)
    direct = bm25_topk(docs, QUERIES, k=10)
    assert _multiset(tuple(r) for r in probed.collect()) == _multiset(
        tuple(r) for r in direct.collect()
    )

    # partition pruning reaches the scan: the listing keeps only the
    # query terms' buckets (pinned on the pruned frame itself — inside
    # bm25_topk the scan sits below a localCheckpoint and the outer plan
    # renders as Scan ExistingRDD)
    import re

    from docling_jobkit_spark.operators.retrieval import (
        prune_to_query_buckets,
    )

    meta = next(f.metadata for f in idx.schema.fields if f.name == "term")
    pruned = prune_to_query_buckets(idx, QUERIES, meta)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any(TERM_BUCKET_COL in f and "IN" in f.upper() for f in pf), plan[
        :1500
    ]

    # unstamped bucketed layout must raise, not silently mis-prune
    stripped = idx.select(
        # cast breaks the attribute ref → metadata stamp is dropped
        F.col("term").cast("string").alias("term"),
        "doc_id", "dl", "tf", TERM_BUCKET_COL,
    )
    with pytest.raises(ValueError, match="bm25_n_buckets"):
        bm25_topk(
            None, QUERIES, k=10, postings=stripped,
            corpus_stats=(n_docs, total_tokens),
        )


def test_query_terms_dim_is_literal_plan(spark):
    qt = query_terms(spark, [("q", "alpha beta alpha")])
    assert [(r.query_id, r.term) for r in qt.collect()] == [
        ("q", "alpha"),
        ("q", "beta"),
    ]
    # built from range(1)+explode — no python-RDD scan in the plan
    plan = qt._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan


def test_bm25_probe_path_broadcasts_not_shuffles_corpus(docs):
    """The scoring path must reach the postings via broadcast joins on
    the query-term dim — never a shuffle of the corpus-sized frame on
    the join key."""
    plan = (
        bm25_topk(docs, QUERIES, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
