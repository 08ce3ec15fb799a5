"""DSIR-style data selection via importance resampling.

Public precedent: DSIR (Xie et al. 2023, arXiv:2302.03169, "Data
Selection for Language Models via Importance Resampling") — the standard
recipe for picking raw-web documents that LOOK LIKE a target domain:

- featurize every document as a bag of hashed n-grams (unigrams +
  bigrams of lowercased whitespace tokens, hashed into ``n_buckets``);
- fit two smoothed multinomials over the buckets — ``p_target`` on the
  target-domain corpus and ``p_raw`` on the raw corpus;
- per-document importance log-weight = sum over the document's feature
  occurrences of ``log p_target[b] - log p_raw[b]``;
- sample k documents without replacement via the Gumbel top-k trick
  over the log-weights.

The reference repo (docling-jobkit) has no selection stage; this family
is part of the training-data-pipeline surface the build brief adds
(same tier as gopher_filter / lm_score in this repo).

From-scratch formulation, fully relational (exact DuckDB twin in
tests/test_dsir.py):

- features are an explode over (id, bucket) pairs; the bucket is the
  cross-engine 56-bit sha hash mod ``n_buckets`` (repo-standard
  ``stable_hash64`` — engine-native hashes differ per engine);
- each distribution is ONE distributed aggregation producing a
  <= n_buckets-row dim (bucket, quantized-log-prob), Laplace-smoothed;
  dims are localCheckpoint-ed and broadcast — the corpus never drives
  through the driver (only the scalar total does, one row);
- engine-exactness discipline (same as lm_score): log-probs quantize
  to 1e-4 BEFORE any sum, so per-doc weights are scaled-INTEGER sums —
  bit-reproducible across engines and partitionings; the Gumbel key is
  quantized onto the same grid, so the top-k ranking is exact too;
- the Gumbel noise is deterministic: u = (sha(salt|id) mod 2^53 + 0.5)
  / 2^53, g = -ln(-ln(u)) — no RNG, stable under any partitioning.

Scale design (100 TB): both dims are bounded by n_buckets (default
4096) and broadcast; scoring is scan-shaped — explode, two broadcast
hash joins, and a per-doc groupBy that partial-aggregates to one
(id, n, sum) row per partition before the only shuffle. Selection is
a global top-k (TakeOrdered — per-partition heaps, no full sort); the
k-row rank window runs on k rows, not the corpus.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import stable_hash64, tokens

N_BUCKETS = 4096
# log-prob quantum shared with lm_score: sums of round(log/Q) are exact
# scaled-integer sums, immune to float summation order across engines
_LOG_QUANT = 1e-4
_SEP = "\x1f"
_U_DENOM = float(1 << 53)  # 53-bit uniform: exactly representable doubles


def _words_lower(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return tokens(F.lower(c))


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket, *extra_cols) — one row per unigram AND bigram
    occurrence.

    Bigrams join their two tokens with the 0x1f unit separator before
    hashing (so ("a b", "c") and ("a", "b c") land in different
    buckets); docs with < 2 tokens emit unigrams only. ``extra_cols``
    (e.g. a per-doc class flag) ride the explode unchanged so a single
    feature pass can feed per-class aggregations."""
    extras = [F.col(c) for c in extra_cols]
    base = df.select(
        F.col(id_col), *extras, _words_lower(text_col).alias("_ws")
    )
    unis = base.select(id_col, *extras, F.explode("_ws").alias("_g"))
    bis = (
        base.where(F.size("_ws") >= 2)
        .select(
            id_col,
            *extras,
            F.explode(F.sequence(F.lit(1), F.size("_ws") - 1)).alias("_i"),
            "_ws",
        )
        .select(
            id_col,
            *extras,
            F.concat_ws(
                _SEP,
                F.element_at("_ws", F.col("_i")),
                F.element_at("_ws", F.col("_i") + 1),
            ).alias("_g"),
        )
    )
    return unis.unionByName(bis).select(
        id_col,
        *extras,
        F.pmod(stable_hash64(F.col("_g")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )


@dataclass(frozen=True)
class HashedNgramDist:
    """A trained Laplace-smoothed hashed-n-gram multinomial.

    dist:  (bucket, lq) — quantized log-prob (units of 1e-4) for every
           OBSERVED bucket; <= n_buckets rows, broadcastable.
    lq0:   quantized log-prob of an unobserved bucket.
    n_buckets, total: the smoothing denominator is total + n_buckets."""

    dist: DataFrame
    lq0: int
    n_buckets: int
    total: int


def _lq_col(c, denom: float):
    """Quantized Laplace-smoothed log-prob — the ONE expression both
    training paths share, so pair-training is bit-identical to two
    separate trainings by construction."""
    return (
        F.round(F.log((c + 1) / F.lit(denom)) / F.lit(_LOG_QUANT), 0)
        .cast("long")
        .alias("lq")
    )


def train_hashed_dist(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> HashedNgramDist:
    """One distributed aggregation; only the scalar total (one row)
    crosses the driver. log p(b) = ln((c_b + 1) / (total + B))."""
    counts = (
        hashed_features(df, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # consumed by total AND the dim (lazy: the totals collect materializes it in its own job)
    )
    total = int(counts.agg(F.sum("c")).collect()[0][0] or 0)
    denom = float(total + n_buckets)
    # NOT checkpointed: lineage is one select over the checkpointed
    # counts — a second eager checkpoint here was a pure extra job
    dist = counts.select("bucket", _lq_col(F.col("c"), denom))
    lq0 = int(round(math.log(1.0 / denom) / _LOG_QUANT))
    return HashedNgramDist(
        dist=dist, lq0=lq0, n_buckets=n_buckets, total=total
    )


def train_hashed_dist_pair(
    df: DataFrame,
    target_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    complement: bool = False,
    materialize_feats: bool = True,
) -> tuple[HashedNgramDist, HashedNgramDist, DataFrame]:
    """Both multinomials of the DSIR/NB recipe from ONE feature pass.

    Returns ``(p_target, p_other, feats)`` where ``p_target`` is trained
    on the rows where ``target_col`` is true and ``p_other`` on the FULL
    corpus (``complement=False`` — DSIR's p_raw) or on the complement
    rows (``complement=True`` — Naive Bayes negatives). Bit-identical to
    two separate :func:`train_hashed_dist` calls on the filtered frames
    (the per-class count of a bucket is the conditional sum in the same
    aggregation; unobserved-in-class buckets are excluded exactly as a
    filtered scan would never emit them) — pinned in tests/test_dsir.py.

    ``feats`` is the corpus feature table (id, bucket) for scoring reuse
    (the sign-once discipline: the explode+hash projection is the
    family's dominant per-doc cost — pay it once, not three times per
    select). With ``materialize_feats=True`` (default) the flagged
    feature table is localCheckpoint-ed and every downstream consumer —
    the training aggregation AND the scoring joins — reads the stored
    blocks. At 100 TB, storing (id, bucket) per n-gram occurrence is
    corpus-sized: pass ``materialize_feats=False`` to keep ``feats`` a
    lazy scan-shaped projection instead (recomputed per consumer, zero
    storage — the cluster-scale default).

    Job-count motivation (measured at sf0.1, local[32]): two separate
    trainings + lazy rescoring ran 17 Spark jobs for ~7 CPU-s — wall was
    fixed per-job latency, not compute. One pass removes a full corpus
    hash pass per training plus two checkpoints and one collect.

    A NULL ``target_col`` counts as false (the row trains the raw /
    complement side); pre-filter rows whose label is genuinely unknown
    if that is not the intended semantics."""
    tcol = F.col(target_col) if isinstance(target_col, str) else target_col
    flagged = hashed_features(
        df.withColumn("_is_t", tcol.cast("boolean")),
        text_col,
        id_col,
        n_buckets,
        extra_cols=("_is_t",),
    )
    if materialize_feats:
        flagged = flagged.localCheckpoint(eager=False)
    counts = (
        flagged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_all"),
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
            .cast("long")
            .alias("c_t"),
        )
        .localCheckpoint(eager=False)  # consumed by totals AND both dims (lazy: the totals collect materializes it)
    )
    row = counts.agg(F.sum("c_all"), F.sum("c_t")).collect()[0]
    total_all = int(row[0] or 0)
    total_t = int(row[1] or 0)
    total_o = total_all if not complement else total_all - total_t
    c_o = F.col("c_all") if not complement else F.col("c_all") - F.col("c_t")
    denom_t = float(total_t + n_buckets)
    denom_o = float(total_o + n_buckets)
    t_dist = counts.where(F.col("c_t") >= 1).select(
        "bucket", _lq_col(F.col("c_t"), denom_t)
    )
    o_dist = counts.where(c_o >= 1).select("bucket", _lq_col(c_o, denom_o))
    target = HashedNgramDist(
        dist=t_dist,
        lq0=int(round(math.log(1.0 / denom_t) / _LOG_QUANT)),
        n_buckets=n_buckets,
        total=total_t,
    )
    other = HashedNgramDist(
        dist=o_dist,
        lq0=int(round(math.log(1.0 / denom_o) / _LOG_QUANT)),
        n_buckets=n_buckets,
        total=total_o,
    )
    return target, other, flagged.select(id_col, "bucket")


def dsir_logweights(
    df: DataFrame,
    target: HashedNgramDist,
    raw: HashedNgramDist,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id, n_feats, lqw, logw) — per-doc importance log-weight.

    lqw is the exact scaled-integer sum (units of 1e-4); logw = lqw *
    1e-4 rounded to 6 places, for humans. Featureless docs get 0/0.
    Pass ``feats`` (the (id, bucket) table from
    :func:`train_hashed_dist_pair`) to reuse an already-materialized
    feature pass instead of re-hashing the corpus."""
    if target.n_buckets != raw.n_buckets:
        raise ValueError(
            f"bucket spaces differ: {target.n_buckets} vs {raw.n_buckets}"
        )
    if feats is None:
        feats = hashed_features(df, text_col, id_col, target.n_buckets)
    else:
        feats = feats.select(id_col, "bucket")
    t = F.broadcast(
        target.dist.select(
            F.col("bucket").alias("_tb"), F.col("lq").alias("_tl")
        )
    )
    r = F.broadcast(
        raw.dist.select(F.col("bucket").alias("_rb"), F.col("lq").alias("_rl"))
    )
    contrib = F.coalesce(F.col("_tl"), F.lit(target.lq0)) - F.coalesce(
        F.col("_rl"), F.lit(raw.lq0)
    )
    per_doc = (
        feats.join(t, feats["bucket"] == F.col("_tb"), "left")
        .join(r, feats["bucket"] == F.col("_rb"), "left")
        .select(id_col, contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("_c").alias("lqw"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("lqw", F.lit(0)).cast("long").alias("lqw"),
            F.round(
                F.coalesce("lqw", F.lit(0)) * F.lit(_LOG_QUANT), 6
            ).alias("logw"),
        )
    )


def gumbel_quantized(id_col, salt: str = "dsir") -> Column:
    """Deterministic quantized Gumbel noise keyed by (salt, id):
    u = (sha(salt|id) mod 2^53 + 0.5) / 2^53;  g = -ln(-ln(u)),
    rounded onto the 1e-4 grid as a long (same units as lqw)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.pmod(
        stable_hash64(F.concat_ws("|", F.lit(salt), c.cast("string"))),
        F.lit(1 << 53),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)
    g = -F.log(-F.log(u))
    return F.round(g / F.lit(_LOG_QUANT), 0).cast("long")


def dsir_sample(
    df: DataFrame,
    target: HashedNgramDist,
    raw: HashedNgramDist,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Gumbel top-k selection: key = lqw + quantized-gumbel (exact long
    arithmetic → the ranking is engine- and partitioning-exact). Output
    (rank, id, n_feats, logw, key) for the k selected docs; the rank
    window runs over k rows only (post-limit), never the corpus."""
    from pyspark.sql import Window

    lw = dsir_logweights(df, target, raw, text_col, id_col, feats=feats)
    keyed = lw.select(
        id_col,
        "n_feats",
        "logw",
        (F.col("lqw") + gumbel_quantized(id_col, salt)).alias("key"),
    )
    top = keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("key"), F.asc(id_col))
    return top.select(
        F.row_number().over(w).alias("rank"),
        id_col,
        "n_feats",
        "logw",
        "key",
    )
