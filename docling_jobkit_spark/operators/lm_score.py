"""LM-perplexity quality scoring (the CCNet head/middle/tail signal).

Public precedent: CCNet (Wenzek et al. 2020, arXiv:1911.00359) scores
every web document with an n-gram language model (KenLM) trained on a
trusted reference corpus and splits the crawl into head/middle/tail
perplexity buckets; Gopher, LLaMA and RefinedWeb keep the same stage.
The reference repo (docling-jobkit) has no LM-quality stage; this is
part of the training-data-pipeline surface the build brief adds.

From-scratch formulation that stays FULLY RELATIONAL (exact DuckDB twin
in tests/test_lm_score.py — no KenLM, no Python in the hot path):

- model = word-bigram counts with add-k (Lidstone) smoothing over a
  capped vocabulary (everything else maps to ``<unk>``), the classic
  Jurafsky-Martin formulation:  P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k*V);
- training is a pair of exact distributed aggregations (unigram counts
  → top-V vocab; vocab-mapped bigram counts → top-B table), both
  deterministic via (count DESC, key ASC) ordering — the model is a
  pure function of (corpus, V, B, k);
- scoring explodes each doc into its bigrams, broadcast-joins the two
  model dims, and aggregates per doc. Engine-exactness discipline: each
  bigram's log-probability is quantized to 1e-4 BEFORE summing (scaled
  integers sum exactly in any order/engine), so the per-doc perplexity
  is bit-reproducible across partitionings and engines.

Scale design (100 TB):
- the model dims are corpus-vocabulary-bounded and CAPPED (top-V words,
  top-B bigrams — a pruned LM, standard n-gram practice); they stay
  DataFrames (localCheckpoint-ed, broadcastable, persistable as parquet
  — the natural at-scale model format) and NEVER round-trip the corpus
  through the driver;
- scoring is scan-shaped: the explode and both joins are map-side
  (broadcast hash joins), and the per-doc groupBy partial-aggregates to
  ~one (id, sum, count) row per document per partition before the only
  shuffle. No payload text moves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import token_count, tokens

UNK = "<unk>"
# log-prob quantum: sums of round(logp/Q) are exact scaled-integer sums,
# immune to float summation order across engines and partitionings
_LOGP_QUANT = 1e-4


def _words_lower(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return tokens(F.lower(c))


@dataclass(frozen=True)
class BigramLM:
    """A trained, pruned add-k bigram model.

    vocab:   (w, c1) — the top-V words by (count DESC, w ASC) PLUS the
             aggregated ``<unk>`` row; c1 is the unigram count.
    bigrams: (w1, w2, c12) — vocab-mapped bigram counts, top-B by
             (count DESC, w1 ASC, w2 ASC).
    v_size:  number of conditioning outcomes (|vocab| incl. unk) — the
             V in the add-k denominator.
    k:       Lidstone smoothing constant."""

    vocab: DataFrame
    bigrams: DataFrame
    v_size: int
    k: float = 1.0


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    max_bigrams: int = 262144,
    k: float = 1.0,
) -> BigramLM:
    """Train the pruned bigram LM on ``df`` (CCNet trains on a trusted
    reference slice — pass e.g. the gopher_filter survivors).

    Both dims are materialized once (localCheckpoint) so the scorer's
    two broadcast joins never recompute the corpus aggregation, and the
    model can be reused across many scoring jobs in the session."""
    toks = df.select(_words_lower(text_col).alias("ws")).where(
        token_count(F.col(text_col)) >= 1
    )
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    uni = uni.localCheckpoint(eager=False)
    vocab_top = uni.orderBy(F.desc("c1"), F.asc("w")).limit(vocab_size)
    # ONE action for both scalar aggs (corpus total + in-vocab total):
    # a two-branch union over the checkpointed unigram table collects in
    # a single job instead of two sequential driver round trips
    stats = (
        uni.agg(
            F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("_s"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        .select(F.lit("t").alias("_k"), "_s", "_n")
        .unionByName(
            vocab_top.agg(
                F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("_s"),
                F.count(F.lit(1)).cast("long").alias("_n"),
            ).select(F.lit("v").alias("_k"), "_s", "_n")
        )
        .collect()
    )
    by_k = {r["_k"]: r for r in stats}
    unk_count = int(by_k["t"]["_s"]) - int(by_k["v"]["_s"])
    n_vocab = int(by_k["v"]["_n"])
    # the <unk> row rides in the vocab dim so scoring needs ONE join for
    # (mapped word, denominator count); built JVM-side (range+select —
    # repo invariant: never createDataFrame(list) for literal dims)
    spark = df.sparkSession
    unk_row = spark.range(1).select(
        F.lit(UNK).alias("w"), F.lit(unk_count).cast("long").alias("c1")
    )
    vocab = vocab_top.unionByName(unk_row).localCheckpoint(eager=False)

    pairs = _doc_bigrams(
        df.select(F.monotonically_increasing_id().alias("_rid"), text_col),
        text_col,
        "_rid",
    )
    mapped = _map_oov(pairs, vocab)
    bigrams = (
        mapped.groupBy("w1m", "w2m")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .orderBy(F.desc("c12"), F.asc("w1m"), F.asc("w2m"))
        .limit(max_bigrams)
        .select(
            F.col("w1m").alias("w1"), F.col("w2m").alias("w2"), "c12"
        )
        .localCheckpoint(eager=False)
    )
    return BigramLM(vocab=vocab, bigrams=bigrams, v_size=n_vocab + 1, k=k)


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; docs with fewer
    than two tokens emit nothing (they score as 'unscored')."""
    ws = _words_lower(text_col)
    return (
        df.select(F.col(id_col), ws.alias("_ws"))
        .where(token_count(F.col(text_col)) >= 2)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("_ws") - 1)
            ).alias("_i"),
            F.col("_ws"),
        )
        .select(
            id_col,
            F.element_at("_ws", F.col("_i")).alias("w1"),
            F.element_at("_ws", F.col("_i") + 1).alias("w2"),
        )
    )


def _map_oov(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map both bigram sides through the vocab (miss → <unk>), carrying
    the conditioning count c1 of the MAPPED w1. Two broadcast joins."""
    v1 = F.broadcast(
        vocab.where(F.col("w") != UNK).select(
            F.col("w").alias("_v1w"), F.col("c1").alias("_v1c")
        )
    )
    v2 = F.broadcast(
        vocab.where(F.col("w") != UNK).select(F.col("w").alias("_v2w"))
    )
    unk_c1 = F.broadcast(
        vocab.where(F.col("w") == UNK).select(F.col("c1").alias("_unkc"))
    )
    return (
        pairs.join(v1, pairs["w1"] == F.col("_v1w"), "left")
        .join(v2, pairs["w2"] == F.col("_v2w"), "left")
        .join(unk_c1, F.lit(True), "left")
        .select(
            *[c for c in pairs.columns if c not in ("w1", "w2")],
            F.coalesce(F.col("_v1w"), F.lit(UNK)).alias("w1m"),
            F.coalesce(F.col("_v2w"), F.lit(UNK)).alias("w2m"),
            F.coalesce(F.col("_v1c"), F.col("_unkc")).alias("c1m"),
        )
    )


def score_perplexity(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input document: (id, n_bigrams, nll, ppl).

    nll is the mean negative log-probability per bigram under the model
    (natural log); ppl = round(exp(nll), 6). Documents with < 2 tokens
    get NULL nll/ppl and n_bigrams = 0.

    Engine-exact: each bigram's logp is quantized to 1e-4 before the
    per-doc sum, so results are identical across partitionings and in
    the DuckDB twin."""
    pairs = _doc_bigrams(df, text_col, id_col)
    mapped = _map_oov(pairs, lm.vocab)
    big = F.broadcast(lm.bigrams)
    joined = mapped.join(
        big,
        (mapped["w1m"] == big["w1"]) & (mapped["w2m"] == big["w2"]),
        "left",
    ).select(
        id_col,
        F.coalesce(F.col("c12"), F.lit(0)).alias("_c12"),
        F.col("c1m"),
    )
    k = float(lm.k)
    logp = F.log(F.col("_c12") + F.lit(k)) - F.log(
        F.col("c1m") + F.lit(k * lm.v_size)
    )
    lq = F.round(logp / F.lit(_LOGP_QUANT), 0).cast("long")
    per_doc = joined.select(id_col, lq.alias("_lq")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_lq").alias("_lqs"),
    )
    nll = -(F.col("_lqs") * F.lit(_LOGP_QUANT)) / F.col("n_bigrams")
    scored = per_doc.select(
        id_col,
        "n_bigrams",
        F.round(nll, 6).alias("nll"),
        F.round(F.exp(nll), 6).alias("ppl"),
    )
    base = df.select(id_col)
    return (
        base.join(scored, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)).cast("long"))
    )


def ppl_bucket(ppl_col, head_cutoff: float, tail_cutoff: float) -> Column:
    """CCNet's corpus split: 'head' (lowest perplexity = most fluent),
    'middle', 'tail'; 'unscored' for docs with no bigrams. Cutoffs come
    from ``perplexity_cutoffs`` (the percentile practice) or fixed ops
    policy."""
    c = F.col(ppl_col) if isinstance(ppl_col, str) else ppl_col
    return (
        F.when(c.isNull(), F.lit("unscored"))
        .when(c <= F.lit(float(head_cutoff)), F.lit("head"))
        .when(c <= F.lit(float(tail_cutoff)), F.lit("middle"))
        .otherwise(F.lit("tail"))
    ).alias("ppl_bucket")


def perplexity_cutoffs(
    scored: DataFrame, fractions: tuple[float, float] = (1 / 3, 2 / 3)
) -> tuple[float, float]:
    """Exact percentile cutoffs over the scored corpus (CCNet buckets at
    training-distribution percentiles). Bounded collect: one row."""
    row = scored.where(F.col("ppl").isNotNull()).agg(
        F.percentile(F.col("ppl"), F.lit(float(fractions[0]))).alias("h"),
        F.percentile(F.col("ppl"), F.lit(float(fractions[1]))).alias("t"),
    ).collect()[0]
    return float(row["h"]), float(row["t"])
