"""Trained quality classifier + GPT-3-style Pareto keep rule.

Public precedent: GPT-3 (Brown et al. 2020, arXiv:2005.14165, Appendix
A) filters Common Crawl with a classifier trained to separate curated
reference text (positives) from raw crawl (negatives), then keeps each
document stochastically via ``np.random.pareto(alpha) > 1 - score`` —
so low-scoring documents still enter the corpus at a controlled rate
instead of a hard cutoff. LLaMA / PaLM / RedPajama keep the same stage
(fastText or logistic classifiers). The reference repo (docling-jobkit)
has no quality-classifier stage; this family is part of the
training-data-pipeline surface the build brief adds.

From-scratch formulation, fully relational (exact DuckDB twin in
tests/test_quality_clf.py — no fastText, no Python in the hot path):

- the classifier is multinomial Naive Bayes over hashed n-gram features
  (unigrams + bigrams, sha-hashed buckets) — EXACTLY the DSIR machinery
  (operators/dsir.py): per-class Laplace-smoothed multinomials trained
  as one distributed aggregation each, plus a quantized log-prior-ratio
  scalar. NB log-odds == DSIR log-weight + prior, so scoring reuses
  ``dsir_logweights`` verbatim (two broadcast joins, one per-doc agg).
- engine-exactness discipline (repo standard): per-feature log-ratio
  contributions are 1e-4-quantized longs summed exactly; the sigmoid
  and the Pareto draw follow the lm_score precedent — computed from
  bit-identical inputs and rounded to 6 places, so the keep decision is
  reproducible across engines and partitionings.
- the Pareto draw is deterministic, keyed by (salt, id):
  u = (sha(salt|id) mod 2^53 + 0.5) / 2^53 (exact double);
  x = (1-u)^(-1/alpha) - 1 (the inverse CDF of numpy's Lomax/Pareto-II
  with scale 1, i.e. the distribution of ``np.random.pareto(alpha)``).

Scale design (100 TB): both class dims are bounded by n_buckets and
broadcast; scoring is scan-shaped (explode → two broadcast hash joins →
partial-aggregating per-doc groupBy — the only shuffle carries
(id, long) pairs). The keep rule is a pure codegen projection over the
scored table; document text never moves after featurization.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import stable_hash64
from docling_jobkit_spark.operators.dsir import (
    _LOG_QUANT,
    _U_DENOM,
    N_BUCKETS,
    HashedNgramDist,
    dsir_logweights,
    train_hashed_dist,
    train_hashed_dist_pair,
)

PARETO_ALPHA = 9.0  # GPT-3 Appendix A's alpha


@dataclass(frozen=True)
class QualityClassifier:
    """Per-class hashed-n-gram multinomials + quantized log-prior ratio
    (units of 1e-4, like every other quantized log in the repo)."""

    pos: HashedNgramDist
    neg: HashedNgramDist
    prior_lq: int


def train_quality_classifier(
    pos_df: DataFrame,
    neg_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> QualityClassifier:
    """Train NB on labeled seeds (GPT-3: positives = curated reference,
    negatives = raw crawl). Two distributed aggregations; only scalar
    totals cross the driver (one row each, same as train_hashed_dist).

    Priors are add-one smoothed so an empty seed class cannot produce
    an infinite prior."""
    pos = train_hashed_dist(pos_df, text_col, id_col, n_buckets)
    neg = train_hashed_dist(neg_df, text_col, id_col, n_buckets)
    n_pos = pos_df.count()
    n_neg = neg_df.count()
    prior_lq = int(
        round(math.log((n_pos + 1.0) / (n_neg + 1.0)) / _LOG_QUANT)
    )
    return QualityClassifier(pos=pos, neg=neg, prior_lq=prior_lq)


def train_quality_classifier_split(
    df: DataFrame,
    pos_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    materialize_feats: bool = True,
) -> tuple[QualityClassifier, DataFrame]:
    """Train on a LABELED single frame (``pos_col`` boolean splits
    positives from negatives) in ONE feature pass — bit-identical to
    :func:`train_quality_classifier` on the two filtered frames (pinned
    in tests/test_quality_clf.py), at a third of the Spark jobs: the
    two class multinomials come from one conditional aggregation
    (``train_hashed_dist_pair(complement=True)``) and the two prior
    counts from one two-row aggregation. Returns ``(clf, feats)``;
    pass ``feats`` to :func:`quality_scores` to also skip the scoring
    re-hash (``materialize_feats`` semantics as in
    ``train_hashed_dist_pair`` — False is the 100 TB default)."""
    pcol = F.col(pos_col) if isinstance(pos_col, str) else pos_col
    pos, neg, feats = train_hashed_dist_pair(
        df,
        pcol,
        text_col,
        id_col,
        n_buckets,
        complement=True,
        materialize_feats=materialize_feats,
    )
    row = df.agg(
        F.sum(F.when(pcol, 1).otherwise(0)),
        F.count(F.lit(1)),
    ).collect()[0]
    n_pos = int(row[0] or 0)
    n_neg = int(row[1]) - n_pos
    prior_lq = int(
        round(math.log((n_pos + 1.0) / (n_neg + 1.0)) / _LOG_QUANT)
    )
    return QualityClassifier(pos=pos, neg=neg, prior_lq=prior_lq), feats


def quality_scores(
    df: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id, n_feats, logodds_lq, logodds, p_quality) — NB posterior.

    logodds_lq is the exact scaled-integer log-odds (1e-4 units,
    prior included); logodds / p_quality are rounded to 6 places for
    humans and for the engine-exact keep rule. Featureless docs score
    the prior alone. ``feats`` reuses a materialized feature pass
    (see :func:`train_quality_classifier_split`)."""
    lw = dsir_logweights(df, clf.pos, clf.neg, text_col, id_col, feats=feats)
    lo_lq = (F.col("lqw") + F.lit(clf.prior_lq)).alias("logodds_lq")
    lo = F.col("logodds_lq") * F.lit(_LOG_QUANT)
    return lw.select(id_col, "n_feats", lo_lq).select(
        id_col,
        "n_feats",
        "logodds_lq",
        F.round(lo, 6).alias("logodds"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lo)), 6).alias(
            "p_quality"
        ),
    )


def pareto_draw(id_col, alpha: float = PARETO_ALPHA, salt: str = "quality") -> Column:
    """Deterministic ``np.random.pareto(alpha)`` stand-in keyed by
    (salt, id): inverse-CDF of the Lomax distribution over an exact
    53-bit uniform, rounded to 6 places (lm_score's cross-engine
    discipline for transcendental outputs)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.pmod(
        stable_hash64(F.concat_ws("|", F.lit(salt), c.cast("string"))),
        F.lit(1 << 53),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return F.round(x, 6)


def pareto_filter(
    scored: DataFrame,
    alpha: float = PARETO_ALPHA,
    salt: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-3's stochastic keep rule over ``quality_scores`` output:
    keep ⟺ pareto_draw > 1 - p_quality. Pure codegen projection — both
    sides are 6-place-rounded doubles built from bit-identical inputs,
    so the decision replays exactly in any engine."""
    draw = pareto_draw(id_col, alpha, salt)
    return scored.select(
        "*",
        draw.alias("pareto"),
        (draw > F.round(F.lit(1.0) - F.col("p_quality"), 6)).alias("keep"),
    )
