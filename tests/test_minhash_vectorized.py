"""Bit-identity of the Arrow-batched MinHash signing path.

The vectorized fold (`minhash_sign_many`, selectable via
SIGNING_IMPL="arrow"; the expression fold stays the measured-cheaper
default) must equal the pure-Catalyst expression fold
(`minhash_signature_expr` — the executable spec the DuckDB oracle SQL
mirrors) value-for-value on every row: the whole dedup family
(LSH banding, the persisted index, ingest history probes, fuzzy
decontamination) keys on these longs, and the index stamps the family
digest — a single diverging channel would silently zero fuzzy recall
against previously signed history.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.dedup import (
    _PERMS,
    _SIG_INIT,
    MINHASH_PRIME,
    N_HASHES,
    minhash_sign_many,
    minhash_signature_expr,
    minhash_signature_from_shingles,
    word_shingles,
)

ADVERSARIAL_TEXTS = [
    "",
    "one",
    "one two",
    "one two three",  # exactly k tokens -> 1 shingle
    "a a a a a a a a",  # degenerate repeats -> 1 distinct shingle
    "The  quick\tbrown\nfox jumps over the lazy dog",
    "ünïcødé tökens — em–dash “quotes” …ellipsis",
    "数字 と 漢字 の トークン 列 テスト",
    "MiXeD Case TOKENS lower UPPER lower UPPER",
    " ".join(f"w{i}" for i in range(200)),  # long doc, 198 shingles
    "x " * 500,  # whitespace-heavy, 1 distinct shingle
]


def _pure_python_signature(shingles: list[str]) -> list[int]:
    """Independent big-int reference (no numpy) — guards the uint64
    arithmetic in minhash_sign_many against silent overflow."""
    if not shingles:
        return [_SIG_INIT] * N_HASHES
    mins = [_SIG_INIT] * N_HASHES
    for s in shingles:
        x = int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)
        hi, lo = x >> 30, x & ((1 << 30) - 1)
        for i, (a, c, b) in enumerate(_PERMS):
            v = (hi * a + lo * c + b) % MINHASH_PRIME
            if v < mins[i]:
                mins[i] = v
    return mins


def _py_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) < k:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)))


def test_vectorized_fold_matches_pure_python_reference():
    lists = [_py_shingles(t) for t in ADVERSARIAL_TEXTS] + [None, []]
    got = minhash_sign_many(lists)
    assert got[-2] is None  # null-preserving
    assert list(got[-1]) == [_SIG_INIT] * N_HASHES  # empty = fold init
    for sh, g in zip(lists[:-2], got[:-2]):
        assert [int(v) for v in g] == _pure_python_signature(sh)


def test_arrow_and_expr_paths_bit_equal_on_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("sh", word_shingles("text"))
    )
    adversarial = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)],
        "doc_id long, text string",
    ).withColumn("sh", word_shingles("text"))
    both = docs.unionByName(adversarial).select(
        "doc_id",
        minhash_signature_from_shingles("sh", impl="arrow").alias("sig_arrow"),
        minhash_signature_expr("sh").alias("sig_expr"),
    )
    diverged = both.where(
        ~(F.col("sig_arrow") == F.col("sig_expr"))
        | F.col("sig_arrow").isNull()
        | F.col("sig_expr").isNull()
    )
    assert diverged.count() == 0
    # non-degeneracy spot check: channels disagree across docs
    n_distinct = both.select(
        F.countDistinct(F.element_at("sig_arrow", 1)).alias("d")
    ).collect()[0]["d"]
    assert n_distinct > 100


def test_default_impl_is_expr_and_switch_works(spark):
    """The expression fold is the measured-cheaper default (see
    _sign_udf's A/B numbers); the arrow switch must stay value-equal."""
    from docling_jobkit_spark.operators import dedup

    assert dedup.SIGNING_IMPL == "expr"
    df = spark.createDataFrame([(1, "alpha beta gamma delta")], "id long, text string")
    row = df.select(
        minhash_signature_from_shingles(word_shingles("text"), impl="arrow").alias("a"),
        minhash_signature_from_shingles(word_shingles("text")).alias("e"),
    ).collect()[0]
    assert list(row["a"]) == list(row["e"])
    assert len(row["a"]) == N_HASHES


@pytest.mark.parametrize("n_words,expect_init", [(0, True), (2, True), (3, False)])
def test_short_doc_edge(spark, n_words, expect_init):
    text = " ".join(f"t{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "id long, text string")
    sig = df.select(
        minhash_signature_from_shingles(word_shingles("text")).alias("s")
    ).collect()[0]["s"]
    assert (list(sig) == [_SIG_INIT] * N_HASHES) is expect_init
