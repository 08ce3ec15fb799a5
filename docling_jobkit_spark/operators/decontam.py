"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene op (GPT-3 appendix C / PaLM / Llama
de-duplication against eval sets): any training doc containing a k-gram
that also appears in a benchmark text is contaminated and must be
dropped or scrubbed before training.

Spark-first shape, two regimes:

- **Broadcast regime** (default; benchmark = thousands-to-millions of
  samples): the benchmark reduces to its DISTINCT k-gram hashes — a
  small table — broadcast to every executor. The corpus side is then
  scan -> explode(k-gram hashes) -> broadcast semi-join -> groupBy(doc).
  The corpus never shuffles its text; the only corpus-wide shuffle
  carries (doc_id, matched-hash) pairs AFTER the semi-join, i.e. only
  the contaminated slice.
- **Shuffle regime** (``broadcast_benchmark=False``; benchmark too big
  to broadcast): same plan but a shuffled semi-join on the uniform
  56-bit gram hash — no skew by construction.

Hashes use the cross-engine ``stable_hash64`` (sha256-prefix) so the
DuckDB oracle reproduces the decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import stable_hash64, tokens


def kgram_hashes(text_col, k: int) -> Column:
    """DISTINCT k-gram 56-bit hashes of the lowercased token stream;
    empty array for docs with < k tokens (mirrors word_shingles)."""
    toks = tokens(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: stable_hash64(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS array<long>)")
    )


def benchmark_gram_set(
    benchmark: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """The benchmark's distinct k-gram hashes — one narrow long column,
    the unit that gets broadcast (or shuffled) against the corpus."""
    return (
        benchmark.select(F.explode(kgram_hashes(text_col, k)).alias("bench_gram"))
        .distinct()
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination stats against a benchmark set.

    Returns one row per corpus doc: (id_col, n_grams — distinct k-grams
    in the doc, n_matched — how many of them appear anywhere in the
    benchmark, contaminated — n_matched > 0). Docs with < k tokens have
    n_grams = 0 and are clean by definition.
    """
    from docling_jobkit_spark.operators.dedup import spread_for_compute

    bench = benchmark_gram_set(benchmark, text_col, k)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_grams = spread_for_compute(df).select(
        F.col(id_col), F.explode_outer(kgram_hashes(text_col, k)).alias("gram")
    )
    matched = doc_grams.join(
        bench, doc_grams["gram"] == bench["bench_gram"], "left"
    )
    return matched.groupBy(id_col).agg(
        F.count("gram").cast("int").alias("n_grams"),
        F.count("bench_gram").cast("int").alias("n_matched"),
        (F.count("bench_gram") > 0).alias("contaminated"),
    )
