"""Training-data assembly operators (operators/training.py): sequence
packing, mixture sampling, split assignment.

Verification strategy mirrors the driver's gate even though these
entries sit past the 50-entry oracle window: ``split_assign`` and
``mixture_sample`` are compared EXACTLY against hand-written DuckDB SQL
over the same parquet (same multiset canonicalization as
test_queries_oracle); ``pack_sequences`` — a sequential recurrence with
no SQL twin — is compared against an independent pure-Python reference
implementation, plus invariants and a partitioning-determinism check.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.training import (
    mixture_sample,
    pack_sequences,
    packed_sequence_stats,
    split_assign,
)

UNIT_DEN = float(1 << 52)


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


# ---------------------------------------------------------------- split


def test_split_assign_matches_duckdb_exactly(docs, sf_dir):
    # key must be a string for the hash; stamp it the same way both sides
    out = split_assign(
        docs.withColumn("doc_id_str", F.col("doc_id").cast("string")),
        key_col="doc_id_str",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("doc_id", "split")
    got = _multiset([tuple(r) for r in out.collect()])
    sql = f"""
        with u as (
          select doc_id,
                 ('0x' || substr(sha256(doc_id::varchar || 'split-v1'), 1, 13))::ubigint
                   / {UNIT_DEN} as uu
          from '{sf_dir}/documents.parquet'
        )
        select doc_id,
               case when uu < 0.8 then 'train'
                    when uu < 0.9 then 'val'
                    else 'test' end as split
        from u
    """
    want = _multiset(duckdb.sql(sql).fetchall())
    assert got == want


def test_split_is_key_stable_and_partitioning_invariant(docs):
    d = docs.withColumn("k", F.col("doc_id").cast("string"))
    a = split_assign(d, key_col="k").select("doc_id", "split")
    b = split_assign(d.repartition(13), key_col="k").select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_fractions_validated(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, key_col="text", fractions={"a": 0.5, "b": 0.2})


# -------------------------------------------------------------- mixture


WEIGHTS = {"src0": 2.5, "src1": 0.0, "src2": 0.4, "src3": 1.0}


def test_mixture_sample_matches_duckdb_exactly(docs, sf_dir):
    out = mixture_sample(
        docs, source_col="source", weights=WEIGHTS, default_weight=1.0
    ).select("doc_id", "source", "epoch")
    got = _multiset([tuple(r) for r in out.collect()])
    cases = " ".join(
        f"when source = '{s}' then {float(w)}" for s, w in WEIGHTS.items()
    )
    sql = f"""
        with w as (
          select doc_id, source,
                 case {cases} else 1.0 end as wt,
                 ('0x' || substr(sha256(doc_id::varchar || 'mix-v1'), 1, 13))::ubigint
                   / {UNIT_DEN} as uu
          from '{sf_dir}/documents.parquet'
        ), n as (
          select doc_id, source,
                 cast(floor(wt) as int)
                   + case when uu < wt - floor(wt) then 1 else 0 end as n_copies
          from w
        )
        select doc_id, source, unnest(range(n_copies)) as epoch
        from n where n_copies > 0
    """
    want = _multiset(duckdb.sql(sql).fetchall())
    assert got == want


def test_mixture_multiplicity_semantics(docs):
    out = (
        mixture_sample(docs, source_col="source", weights=WEIGHTS)
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    by_src = {r["source"]: r for r in out}
    assert "src1" not in by_src  # weight 0 drops the source entirely
    # weight 2.5: every doc appears 2 or 3 times
    r0 = by_src["src0"]
    assert 2 * r0["n_docs"] <= r0["n_rows"] <= 3 * r0["n_docs"]
    # weight 0.4: strict subsample, nonzero (deterministic on this corpus)
    n_src2_total = docs.where(F.col("source") == "src2").count()
    assert 0 < by_src["src2"]["n_rows"] < n_src2_total
    # default weight 1.0: exactly one copy each
    r3 = by_src["src3"]
    assert r3["n_rows"] == r3["n_docs"]


def test_mixture_rejects_negative_weight(docs):
    with pytest.raises(ValueError, match="negative weight"):
        mixture_sample(docs, weights={"src0": -1.0})


# -------------------------------------------------------------- packing


def _reference_pack(rows, budget):
    """Independent greedy-fill reference: rows = [(doc, idx, tokens)],
    already restricted to ONE pack group; returns {(doc, idx): (seq, off)}."""
    rows = sorted(rows)
    out, seq, fill = {}, 0, 0
    for doc, idx, t in rows:
        if fill > 0 and fill + t > budget:
            seq, fill = seq + 1, 0
        out[(doc, idx)] = (seq, fill)
        fill += t
    return out


@pytest.fixture(scope="module")
def chunks(spark, sf_dir):
    from docling_jobkit_spark.operators.chunker import token_window_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_window_chunks(
        docs, text_col="text", id_col="doc_id", max_tokens=32, overlap=0
    )


BUDGET = 256


def test_pack_matches_reference_implementation(chunks):
    assigned = pack_sequences(
        chunks, budget=BUDGET, doc_col="doc_id",
        order_cols=("doc_id", "chunk_index"), num_groups=8,
    )
    rows = assigned.select(
        "pack_group", "doc_id", "chunk_index", "num_tokens",
        "seq_index", "seq_offset",
    ).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(r)
    assert len(by_group) > 1
    for g, grows in by_group.items():
        want = _reference_pack(
            [(r["doc_id"], r["chunk_index"], r["num_tokens"]) for r in grows],
            BUDGET,
        )
        for r in grows:
            assert (r["seq_index"], r["seq_offset"]) == want[
                (r["doc_id"], r["chunk_index"])
            ], f"group {g} doc {r['doc_id']} chunk {r['chunk_index']}"


def test_pack_invariants_and_determinism(chunks):
    a = pack_sequences(chunks, budget=BUDGET, num_groups=8)
    b = pack_sequences(chunks.repartition(7), budget=BUDGET, num_groups=8)
    key = ["doc_id", "chunk_index"]
    rows_a = sorted(
        map(tuple, a.select(*key, "pack_group", "seq_index", "seq_offset").collect())
    )
    rows_b = sorted(
        map(tuple, b.select(*key, "pack_group", "seq_index", "seq_offset").collect())
    )
    assert rows_a == rows_b  # partitioning-invariant
    # every input chunk exactly once
    assert len(rows_a) == chunks.count()
    assert len(set(r[:2] for r in rows_a)) == len(rows_a)
    # budget respected for all multi-chunk sequences
    stats = packed_sequence_stats(a, budget=BUDGET)
    bad = stats.where(
        (F.col("seq_tokens") > BUDGET) & (F.col("n_chunks") > 1)
    ).count()
    assert bad == 0
    # packing is actually packing: mean fill of non-final sequences high
    fills = [r["fill_ratio"] for r in stats.collect()]
    assert sum(fills) / len(fills) > 0.5


def test_pack_document_coherence(chunks):
    """All chunks of a document land in one pack group (doc-level hash)."""
    a = pack_sequences(chunks, budget=BUDGET, num_groups=8)
    n_multi = (
        a.groupBy("doc_id")
        .agg(F.countDistinct("pack_group").alias("g"))
        .where(F.col("g") > 1)
        .count()
    )
    assert n_multi == 0


def test_pack_oversize_chunk_gets_own_sequence(spark):
    pdf = spark.createDataFrame(
        [(0, 0, 300), (0, 1, 10), (0, 2, 10)],
        "doc_id long, chunk_index int, num_tokens int",
    )
    out = {
        (r["chunk_index"]): (r["seq_index"], r["seq_offset"])
        for r in pack_sequences(pdf, budget=BUDGET, num_groups=1).collect()
    }
    assert out[0] == (0, 0)       # oversize chunk emitted, alone
    assert out[1] == (1, 0)       # next chunk starts a fresh sequence
    assert out[2] == (1, 10)


def test_pack_rejects_duplicate_order_keys(spark):
    pdf = spark.createDataFrame(
        [(0, 0, 5), (0, 0, 7)],
        "doc_id long, chunk_index int, num_tokens int",
    )
    with pytest.raises(Exception, match="total order"):
        pack_sequences(pdf, budget=BUDGET, num_groups=1).collect()


def test_pack_rejects_bad_budget(chunks):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(chunks, budget=0)


# ------------------------------------------------------------- shuffle


def test_deterministic_shuffle_matches_duckdb_order(docs, sf_dir):
    from docling_jobkit_spark.operators.training import deterministic_shuffle

    out = deterministic_shuffle(docs, key_cols=("doc_id",)).select("doc_id")
    got = [r["doc_id"] for r in out.collect()]
    sql = f"""
        select doc_id from '{sf_dir}/documents.parquet'
        order by ('0x' || substr(sha256(doc_id::varchar || '|shuffle-v1'), 1, 14))::ubigint
    """
    want = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got == want
    assert got != sorted(got)  # it actually shuffles


def test_deterministic_shuffle_is_epoch_aware(docs):
    from docling_jobkit_spark.operators.training import (
        deterministic_shuffle,
        mixture_sample,
    )

    mixed = mixture_sample(docs, source_col="source", weights={"src0": 2.0})
    out = deterministic_shuffle(mixed, key_cols=("doc_id", "epoch"))
    order = [(r["doc_id"], r["epoch"]) for r in out.select("doc_id", "epoch").collect()]
    # copies of the same doc do not ride adjacent: epochs interleave
    adjacent_same_doc = sum(
        1 for a, b in zip(order, order[1:]) if a[0] == b[0]
    )
    assert adjacent_same_doc < len(order) // 10


# ----------------------------------------------------- stratified sample


def test_stratified_sample_matches_duckdb_exactly(docs, sf_dir):
    from docling_jobkit_spark.operators.training import stratified_sample

    n = 37
    out = stratified_sample(
        docs, n, strata_cols=("source",), key_col="doc_id"
    ).select("doc_id", "sample_rank")
    got = _multiset([tuple(r) for r in out.collect()])
    sql = f"""
        with r as (
          select doc_id, source,
                 ('0x' || substr(sha256('strat-v1' || chr(31) || doc_id::varchar),
                                 1, 14))::ubigint::bigint as rk
          from '{sf_dir}/documents.parquet'
        )
        select doc_id,
               row_number() over (partition by source order by rk, doc_id)
                 as sample_rank
        from r
        qualify sample_rank <= {n}
    """
    want = _multiset(duckdb.sql(sql).fetchall())
    assert got == want


def test_stratified_sample_exact_quota_and_partitioning_invariance(docs):
    from docling_jobkit_spark.operators.training import stratified_sample

    n = 11
    a = stratified_sample(docs, n, strata_cols=("source",))
    sizes = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    got = {
        r["source"]: r["count"]
        for r in a.groupBy("source").count().collect()
    }
    # exactly min(n, |stratum|) per stratum — never Bernoulli variance
    assert got == {s: min(n, c) for s, c in sizes.items()}
    # pure function of (key, salt): the partition layout cannot move it
    b = stratified_sample(docs.repartition(13), n, strata_cols=("source",))
    key = lambda df: sorted(
        (r["doc_id"], r["sample_rank"])
        for r in df.select("doc_id", "sample_rank").collect()
    )
    assert key(a) == key(b)


def test_stratified_sample_rejects_bad_quota(docs):
    from docling_jobkit_spark.operators.training import stratified_sample

    with pytest.raises(ValueError, match="positive"):
        stratified_sample(docs, 0)
