"""Sketch operators (operators/sketches.py): HyperLogLog exact DuckDB
twin + accuracy envelope, n-gram heavy hitters exact twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.sketches import (
    hll_distinct,
    hll_oracle_sql,
    ngram_topk,
)

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_hll_doc_id_matches_duckdb_exactly(spark, docs, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    got = _rows(hll_distinct(docs, "doc_id", p=6))
    want = [tuple(r) for r in duckdb.sql(
        hll_oracle_sql(f"'{path}'", "doc_id", 6, "doc_id")
    ).fetchall()]
    assert got == want
    assert got[0][3] in ("hll_raw", "linear_counting")  # sf-dependent


def test_hll_raw_branch_matches_duckdb_exactly(spark, tmp_path):
    # 2000 distinct keys over m=64 registers force the raw-HLL branch in
    # BOTH engines — branch parity is part of the contract
    path = str(tmp_path / "keys.parquet")
    spark.range(2000).select(
        F.col("id").cast("string").alias("k")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    got = _rows(hll_distinct(df, "k", p=6))
    want = [tuple(r) for r in duckdb.sql(
        hll_oracle_sql(f"'{path}/*.parquet'", "k", 6, "k")
    ).fetchall()]
    assert got == want
    assert got[0][3] == "hll_raw"


def test_hll_low_cardinality_matches_duckdb_exactly(spark, docs, sf_dir):
    # a handful of sources → the linear-counting branch
    path = f"{sf_dir}/documents.parquet"
    got = _rows(hll_distinct(docs, "source", p=6))
    want = [tuple(r) for r in duckdb.sql(
        hll_oracle_sql(f"'{path}'", "source", 6, "source")
    ).fetchall()]
    assert got == want
    assert got[0][3] == "linear_counting"


def test_hll_estimate_accuracy(spark):
    # p=8 → 256 registers, standard error 1.04/sqrt(256) ≈ 6.5%; a 20%
    # envelope on 5000 uniform keys is ~3σ — deterministic, not flaky
    # (the sha-derived hash stream is fixed).
    df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    est = hll_distinct(df, "k", p=8).collect()[0]["estimate"]
    assert abs(est - 5000) / 5000 < 0.20


def test_hll_empty_input_estimates_zero(spark):
    df = (
        spark.range(10)
        .where(F.col("id") < 0)
        .select(F.col("id").cast("string").alias("k"))
    )
    row = hll_distinct(df, "k", p=6).collect()[0]
    assert row["estimate"] == 0.0
    assert row["method"] == "linear_counting"
    assert row["v_zero"] == 64


def test_hll_register_table_is_bounded(spark):
    # THE scale property: whatever the input size, at most 2^p rows
    # survive the aggregate (the shuffle is O(m), not O(n_distinct)).
    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    from docling_jobkit_spark.operators.sketches import hll_registers

    regs = hll_registers(df, "k", p=5)
    assert regs.count() <= 32
    assert regs.agg(F.max("register")).collect()[0][0] <= (60 - 5) + 1


def test_hll_merge_equals_sketch_of_union(spark):
    # the rolling-corpus property: merge-of-sketches == sketch-of-union,
    # EXACTLY (element-wise max of registers), on overlapping snapshots
    from docling_jobkit_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 1200).select(F.col("id").cast("string").alias("k"))
    b = spark.range(800, 2000).select(F.col("id").cast("string").alias("k"))
    merged = hll_merge(hll_registers(a, "k", p=7), hll_registers(b, "k", p=7))
    direct = hll_registers(a.unionByName(b), "k", p=7)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = hll_estimate(merged, 7, "k").collect()[0]["estimate"]
    assert abs(est - 2000) / 2000 < 0.30  # SE at p=7 ≈ 9.2%


def test_hll_intersect_estimate_tracks_true_overlap(spark):
    from docling_jobkit_spark.operators.sketches import (
        hll_intersect_estimate,
        hll_registers,
    )

    # |A| = 1500, |B| = 1500, |A ∩ B| = 1000 — a LARGE overlap relative
    # to the union, where inclusion-exclusion is statistically sound
    a = spark.range(0, 1500).select(F.col("id").cast("string").alias("k"))
    b = spark.range(500, 2000).select(F.col("id").cast("string").alias("k"))
    ra = hll_registers(a, "k", p=9)
    rb = hll_registers(b, "k", p=9)
    est = hll_intersect_estimate(ra, rb, p=9).collect()[0]["estimate"]
    # three estimates at p=9 (SE ≈ 4.6% each) compound; allow 25%
    assert abs(est - 1000) / 1000 < 0.25, est
    # disjoint sketches estimate a near-zero intersection, never negative
    c = spark.range(10_000, 11_500).select(F.col("id").cast("string").alias("k"))
    est0 = hll_intersect_estimate(ra, hll_registers(c, "k", p=9), p=9).collect()[0][
        "estimate"
    ]
    assert est0 >= 0.0 and est0 < 300, est0
    # p mismatch raises (stamp discipline holds end to end)
    with pytest.raises(ValueError, match="rebuild with one p"):
        hll_intersect_estimate(ra, hll_registers(c, "k", p=8), p=9)


def test_hll_p_stamp_enforced(spark, tmp_path):
    # the minhash_index discipline: sketches of different p must RAISE,
    # not silently merge into garbage — and the stamp must survive a
    # parquet round-trip (the persisted-state path streaming uses)
    from docling_jobkit_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    r6 = hll_registers(df, "k", p=6)
    r7 = hll_registers(df, "k", p=7)
    with pytest.raises(ValueError, match="different p"):
        hll_merge(r6, r7)
    with pytest.raises(ValueError, match="p=6"):
        hll_estimate(r6, 7, "k")

    path = str(tmp_path / "regs")
    r6.write.parquet(path)
    back = spark.read.parquet(path)
    with pytest.raises(ValueError, match="p=6"):
        hll_estimate(back, 12, "k")
    # merged output keeps the stamp
    merged = hll_merge(back, r6)
    with pytest.raises(ValueError, match="p=6"):
        hll_estimate(merged, 8, "k")


def test_hll_grouped_matches_duckdb_exactly(spark, docs, sf_dir):
    """Per-group sketch + estimate must equal the DuckDB twin row for
    row (the 'distinct docs per language' query at bounded state)."""
    from docling_jobkit_spark.operators.sketches import (
        hll_estimate_by,
        hll_grouped_oracle_sql,
        hll_registers_by,
    )

    path = f"{sf_dir}/documents.parquet"
    got = sorted(
        map(
            tuple,
            hll_estimate_by(hll_registers_by(docs, "lang", "text", p=7), p=7).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                hll_grouped_oracle_sql(f"'{path}' t", "lang", "text", 7)
            ).fetchall(),
        )
    )
    assert got == want
    # sanity: estimates track the exact per-group distinct counts
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    for grp, _vz, _m, est in got:
        assert abs(est - exact[grp]) / max(exact[grp], 1) < 0.35


def test_hll_grouped_merge_equals_sketch_of_union(spark, docs):
    from docling_jobkit_spark.operators.sketches import (
        hll_merge_by,
        hll_registers_by,
    )

    a = docs.where("doc_id < 300")
    b = docs.where("doc_id >= 200")  # overlapping snapshots
    merged = hll_merge_by(
        hll_registers_by(a, "lang", "text", p=6),
        hll_registers_by(b, "lang", "text", p=6),
    )
    direct = hll_registers_by(a.unionByName(b), "lang", "text", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # p-stamp discipline holds for the grouped family too
    import pytest

    with pytest.raises(ValueError, match="different p"):
        hll_merge_by(
            hll_registers_by(a, "lang", "text", p=6),
            hll_registers_by(b, "lang", "text", p=7),
        )


def test_cms_matches_duckdb_exactly_and_never_underestimates(spark, docs, sf_dir):
    from docling_jobkit_spark.functions.scalar import tokens
    from docling_jobkit_spark.operators.sketches import (
        cms_build,
        cms_oracle_sql,
        cms_query,
    )

    path = f"{sf_dir}/documents.parquet"
    words = docs.where(F.trim("text") != "").select(
        F.explode(tokens(F.lower(F.col("text")))).alias("word")
    )
    exact = words.groupBy("word").agg(F.count("*").alias("n"))
    probes = (
        exact.orderBy(F.col("n").desc(), F.col("word")).limit(10).select("word")
    )
    got = {
        r["key"]: r["est_count"]
        for r in cms_query(
            cms_build(words, "word", depth=4, width=1024),
            probes,
            "word",
            depth=4,
            width=1024,
        ).collect()
    }
    # exact DuckDB twin of build+probe composed
    words_sql = (
        "(select unnest(string_split_regex(trim(lower(text)), '\\s+')) as word"
        f" from '{path}' where trim(text) != '')"
    )
    probes_sql = (
        f"(select word from (select word, count(*) as n from {words_sql} t"
        " group by word order by n desc, word limit 10))"
    )
    want = dict(
        duckdb.sql(
            cms_oracle_sql(f"{words_sql} t2", "word", f"{probes_sql} p", 4, 1024)
        ).fetchall()
    )
    assert got == want
    # the CMS guarantee: estimates never fall below the exact counts
    exact_counts = {r["word"]: r["n"] for r in exact.collect()}
    for k, est in got.items():
        assert est >= exact_counts[k]


def test_cms_merge_equals_sketch_of_union(spark):
    # the rolling-corpus property for frequencies: merge-of-sketches ==
    # sketch-of-union, EXACTLY (count-sum is linear), incl. keys seen in
    # both snapshots
    from docling_jobkit_spark.operators.sketches import cms_build, cms_merge

    a = spark.range(0, 600).select((F.col("id") % 37).cast("string").alias("k"))
    b = spark.range(0, 400).select((F.col("id") % 23).cast("string").alias("k"))
    merged = cms_merge(
        cms_build(a, "k", depth=3, width=64), cms_build(b, "k", depth=3, width=64)
    )
    direct = cms_build(a.unionByName(b), "k", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_shape_stamp_enforced(spark, tmp_path):
    # sketches of different (depth, width) must RAISE on merge AND on
    # probe — and the stamp must survive the parquet round-trip the
    # streaming state takes
    from docling_jobkit_spark.operators.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    s1 = cms_build(df, "k", depth=3, width=64)
    s2 = cms_build(df, "k", depth=4, width=64)
    with pytest.raises(ValueError, match="different shapes"):
        cms_merge(s1, s2)
    probes = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match=r"\(depth, width\)=\(3, 64\)"):
        cms_query(s1, probes, "k", depth=4, width=64)

    path = str(tmp_path / "cms")
    s1.write.parquet(path)
    back = spark.read.parquet(path)
    with pytest.raises(ValueError, match=r"\(3, 64\)"):
        cms_query(back, probes, "k", depth=3, width=128)
    # merged output keeps the stamp
    merged = cms_merge(back, s1)
    with pytest.raises(ValueError, match=r"\(3, 64\)"):
        cms_query(merged, probes, "k", depth=4, width=64)
    # matching shape still works after the round-trip
    assert cms_query(back, probes, "k", depth=3, width=64).count() == 5


def test_ngram_topk_matches_duckdb_exactly(spark, docs, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    got = _rows(ngram_topk(docs, "text", n=2, k=20, min_count=2))
    want = [tuple(r) for r in duckdb.sql(f"""
        with toks as (
          select string_split_regex(trim(lower(text)), '\\s+') as t
          from '{path}' where trim(text) != ''
        ), grams as (
          select unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> array_to_string(t[i:i+1], ' '))) as gram
          from toks where len(t) >= 2
        )
        select gram, count(*)::BIGINT as n_count
        from grams group by gram
        having count(*) >= 2
        order by n_count desc, gram
        limit 20
    """).fetchall()]
    assert got == want
    assert len(got) == 20


def test_ngram_topk_short_docs_emit_nothing(spark):
    # one-token and empty docs must contribute zero bigrams (Spark's
    # sequence(1, 0) steps BACKWARD — guarded in the operator)
    df = spark.range(4).select(
        F.when(F.col("id") == 0, F.lit("solo"))
        .when(F.col("id") == 1, F.lit(""))
        .when(F.col("id") == 2, F.lit("   "))
        .otherwise(F.lit("a b a b"))
        .alias("text")
    )
    rows = _rows(ngram_topk(df, "text", n=2, k=10, min_count=1))
    assert rows == [("a b", 2), ("b a", 1)]


# --- log-bucket quantile sketch (logh_*) ------------------------------


def test_logh_quantiles_match_duckdb_exactly(spark, docs, sf_dir):
    from docling_jobkit_spark.operators.sketches import (
        logh_oracle_sql,
        logh_quantile_sketch,
    )

    path = f"{sf_dir}/documents.parquet"
    qs = (0.25, 0.5, 0.9, 0.99, 1.0)
    got = _rows(logh_quantile_sketch(docs, "n_chars", qs, sub_bits=6))
    want = [tuple(r) for r in duckdb.sql(
        logh_oracle_sql(f"'{path}'", "n_chars", qs, 6, "n_chars")
    ).fetchall()]
    assert got == want
    assert len(got) == len(qs)


def test_logh_envelope_contains_true_quantile(spark, docs):
    # the certificate: the TRUE rank-ceil(q*n) value lies inside
    # [est_lower, est_upper], and the envelope width respects the
    # 2^-sub_bits relative-error bound
    import math

    from docling_jobkit_spark.operators.sketches import logh_quantile_sketch

    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    got = _rows(logh_quantile_sketch(docs, "n_chars", qs, sub_bits=6))
    vals = sorted(r[0] for r in docs.select("n_chars").collect())
    n = len(vals)
    for _, q, n_total, lo, hi in got:
        assert n_total == n
        true_v = vals[math.ceil(q * n) - 1]
        assert lo <= true_v <= hi, (q, lo, true_v, hi)
        assert hi - lo <= max(1, lo >> 6), (q, lo, hi)


def test_logh_merge_equals_sketch_of_union(spark, docs):
    # sum-merge == sketching the concatenated input EXACTLY (the
    # rolling-corpus property; hll_merge's twin for quantiles)
    from docling_jobkit_spark.operators.sketches import logh_buckets, logh_merge

    s1 = logh_buckets(docs.where(F.col("doc_id") % 2 == 0), "n_chars", 6)
    s2 = logh_buckets(docs.where(F.col("doc_id") % 2 == 1), "n_chars", 6)
    merged = sorted(_rows(logh_merge(s1, s2)))
    full = sorted(_rows(logh_buckets(docs, "n_chars", 6)))
    assert merged == full


def test_logh_state_is_bounded_and_small_values_exact(spark):
    # quadratic values spanning 1..10^10: the bucket table stays under
    # the analytic cap while the input has ~1e5 distinct values; values
    # below 2^(sub_bits+1) occupy exact singleton buckets (shift=0)
    from docling_jobkit_spark.operators.sketches import logh_buckets

    wide = spark.range(1, 100_000).select((F.col("id") * F.col("id")).alias("x"))
    bk = logh_buckets(wide, "x", sub_bits=6)
    rows = _rows(bk.where(F.col("shift") == 0))
    assert bk.count() <= (64 - 7 + 1) * 64 + 128
    assert all(cnt == 1 for _, top, cnt in rows if top < 128)


def test_logh_mismatched_sub_bits_merge_raises(spark, docs):
    from docling_jobkit_spark.operators.sketches import logh_buckets, logh_merge

    s6 = logh_buckets(docs, "n_chars", 6)
    s8 = logh_buckets(docs, "n_chars", 8)
    with pytest.raises(ValueError, match="different sub_bits"):
        logh_merge(s6, s8)


def test_logh_negative_value_raises(spark):
    from docling_jobkit_spark.operators.sketches import logh_buckets

    df = spark.range(3).select((F.col("id") - 1).alias("x"))
    with pytest.raises(Exception, match="negative value"):
        logh_buckets(df, "x").collect()
