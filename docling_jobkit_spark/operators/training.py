"""Training-data assembly operators: deterministic corpus mixing,
leakage-safe splits, and token-budget sequence packing.

These are the operations a large-scale LLM training pipeline runs AFTER
curation (dedup/filter/decontaminate) to turn a cleaned corpus into
training input — the stage the reference delegates to downstream
consumers of its chunker output (``docling_jobkit/convert/chunking.py``
ends at token-budgeted chunks; assembling those chunks into
fixed-length, source-weighted, split-assigned training sequences is the
published next step: GPT-3 / The Pile / LLaMA data recipes describe
per-source sampling weights and context-window packing).

Design rules shared by every operator here:

- **Deterministic by content, never by partitioning.** All randomness is
  derived from sha-256 of row keys (``stable_hash64``), so re-running on
  a repartitioned / resumed corpus yields byte-identical decisions. No
  ``rand()`` anywhere — Spark's ``rand`` is seed-per-partition and
  changes with the partition layout.
- **Codegen where possible.** ``split_assign`` and ``mixture_sample``
  are pure JVM-side column expressions (whole-stage codegen; exact
  DuckDB twins in the test suite). Only ``pack_sequences`` — a
  sequential recurrence — drops to one ``applyInPandas``.
- **Metadata-narrow shuffles.** Packing shuffles each chunk row once on
  a doc-level hash group; the heavy ``text`` column moves exactly once,
  together with its assignment (re-joining text later would shuffle the
  same bytes anyway and pay a join).

At 100 TB: ``num_groups`` bounds the per-task state of the packing
recurrence (a group ≈ one training shard); groups are independent, so
the stage parallelizes to min(num_groups, cores) with no cross-group
coordination and restarts idempotently (pure function of the group's
rows).
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_jobkit_spark.functions.scalar import stable_hash64

# 52 bits → the numerator is exactly representable in a double, so the
# unit uniform is bit-reproducible in Spark, DuckDB, and Python.
_UNIT_BITS = 52
_UNIT_DEN = float(1 << _UNIT_BITS)


def unit_uniform(col, salt: str) -> Column:
    """Deterministic cross-engine uniform in [0, 1): sha256-prefix of
    (value || salt) scaled to the unit interval. The salt namespaces
    independent decisions (split vs mixture) so they are uncorrelated.

    DuckDB twin (exact):
    ``('0x' || substr(sha256(col || salt), 1, 13))::ubigint / 4503599627370496.0``
    """
    c = F.col(col) if isinstance(col, str) else col
    return stable_hash64(F.concat(c, F.lit(salt)), _UNIT_BITS).cast(
        "double"
    ) / F.lit(_UNIT_DEN)


def split_assign(
    df: DataFrame,
    key_col: str = "url",
    fractions: Mapping[str, float] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment by stable hash of a
    DOCUMENT key: every row with the same key lands in the same split,
    regardless of partitioning, ordering, or corpus growth — adding new
    documents never moves an existing one across the boundary (the
    hash-threshold property that makes the split safe to recompute
    incrementally at 100 TB).

    ``fractions`` maps split name → fraction; must sum to ~1. Assignment
    walks the cumulative thresholds in the given order.
    """
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    u = unit_uniform(key_col, salt)
    df = df.withColumn("_split_u", u)
    expr: Column | None = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = F.col("_split_u") < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr).drop("_split_u")


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    weights: Mapping[str, float] | None = None,
    default_weight: float = 1.0,
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Weighted corpus mixture with oversampling epochs (the GPT-3 /
    LLaMA data-recipe sampling step): a source with weight ``w`` keeps
    each document ``floor(w)`` times plus one more with probability
    ``frac(w)`` — so the EXPECTED multiplicity is exactly ``w`` and the
    realized multiset is a pure function of (key, salt). Output adds an
    ``epoch`` column (0-based copy index); weight ≤ 1 is plain
    subsampling, weight 0 drops the source.

    Implementation is a codegen-only explode of
    ``sequence(0, n_copies-1)``: the weight table is tiny and folds into
    a literal CASE expression — no join, no UDF, nothing shuffles.
    """
    if weights is None:
        weights = {}
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    src = F.col(source_col)
    w_expr: Column = F.lit(float(default_weight))
    if weights:
        w_case = None
        for s, w in weights.items():
            cond = src == F.lit(s)
            w_case = (
                F.when(cond, F.lit(float(w)))
                if w_case is None
                else w_case.when(cond, F.lit(float(w)))
            )
        w_expr = w_case.otherwise(F.lit(float(default_weight)))
    u = unit_uniform(
        F.col(key_col).cast("string"), salt
    )
    n_copies = (
        F.floor(w_expr).cast("int")
        + F.when(u < (w_expr - F.floor(w_expr)), F.lit(1)).otherwise(F.lit(0))
    )
    out = df.withColumn("_n_copies", n_copies).where(F.col("_n_copies") > 0)
    return out.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
    ).drop("_n_copies")


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: Iterable[str] = ("source",),
    key_col: str = "doc_id",
    salt: str = "strat-v1",
) -> DataFrame:
    """Exact-quota stratified sampling: exactly ``min(n, |stratum|)``
    documents per stratum, chosen as the ``n`` smallest deterministic
    hash ranks — the carve-out primitive for eval sets / ablations
    where :func:`mixture_sample`'s Bernoulli multiplicity variance is
    unacceptable ("exactly 10k docs per language", not "10k expected").
    Output adds ``sample_rank`` (1-based within stratum). Same
    determinism contract as the rest of this module: the selection is a
    pure function of (key, salt) — repartitioning, resume, or cluster
    size cannot change it (ties in the 56-bit rank break on the key).

    Plan shape at 100 TB: ranking runs on a NARROW (key, strata, rank)
    projection — payload never enters a window. The giant-stratum skew
    of a naive ``row_number over (partition by stratum)`` (one task
    sorts the whole stratum) is pre-pruned partition-locally first:
    a row outside its input-partition's top-``n`` has ``>= n`` smaller
    ranks in that partition alone, so it cannot be in the stratum's
    global top-``n`` — the final window sees at most ``n x P``
    candidate rows per stratum regardless of stratum size. The pruned
    keep-set re-attaches by key equi-join (AQE broadcasts it when the
    quota is small). Pre-prune correctness does not depend on the
    partition layout, only the candidate count does."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    strata = list(strata_cols)
    rank = stable_hash64(
        F.concat_ws("\x1f", F.lit(salt), F.col(key_col).cast("string"))
    )
    narrow = (
        df.select(F.col(key_col), *[F.col(c) for c in strata])
        .withColumn("_rank", rank)
        # materialized as a column so the pre-prune window keys on the
        # pid of the SCAN partition, not of a post-exchange one
        .withColumn("_pid", F.spark_partition_id())
    )
    pre = Window.partitionBy(*strata, "_pid").orderBy("_rank", key_col)
    cand = (
        narrow.withColumn("_prn", F.row_number().over(pre))
        .where(F.col("_prn") <= n_per_stratum)
        .drop("_prn", "_pid")
    )
    w = Window.partitionBy(*strata).orderBy("_rank", key_col)
    keep = (
        cand.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
        .select(key_col, "sample_rank")
    )
    return df.join(keep, on=key_col)


_PACK_EXTRA = [
    T.StructField("pack_group", T.IntegerType()),
    T.StructField("seq_index", T.LongType()),
    T.StructField("seq_offset", T.IntegerType()),
]


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    token_col: str = "num_tokens",
    doc_col: str = "doc_id",
    order_cols: Iterable[str] = ("doc_id", "chunk_index"),
    num_groups: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assign chunks to fixed token-budget
    training sequences (context windows). The classic fill: walk chunks
    in a deterministic order; if the current sequence cannot fit the
    next chunk, start a new one. A chunk larger than the budget gets a
    sequence of its own (callers should cap chunk size upstream; the
    oversize row is still emitted, flagged by seq_offset 0 and
    num_tokens > budget, never dropped — failures-are-rows).

    Distribution strategy: chunks are grouped by a doc-level hash
    (``pmod(stable_hash64(doc), num_groups)``) so (a) all chunks of a
    document pack into the same group — sequences are mostly
    document-coherent, and packing never interleaves a document across
    groups; (b) each group's recurrence runs independently in one
    ``applyInPandas`` call — the ONLY non-codegen step, looping over an
    int array (metadata-speed; the text bytes just ride along in the
    same shuffle they would need anyway to reach a training-shard sink).
    Group sizes concentrate around corpus/num_groups (hash of uniform
    doc keys), so no group is a straggler; pick num_groups ≈ the number
    of output training shards.

    Output: input columns + (pack_group, seq_index, seq_offset). The
    (pack_group, seq_index) pair is the global sequence id; seq_offset
    is the chunk's token offset within its sequence. Deterministic
    under any input partitioning: assignment depends only on the sorted
    group content (``order_cols`` must be a total order within a group —
    duplicates raise).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive (got {budget})")
    order_cols = list(order_cols)
    out_schema = T.StructType(list(chunks.schema.fields) + _PACK_EXTRA)
    in_cols = [f.name for f in chunks.schema.fields]

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        if pdf.duplicated(order_cols).any():
            raise ValueError(
                f"order_cols {order_cols} are not a total order within "
                "a pack group (duplicate keys found)"
            )
        toks = pdf[token_col].to_numpy()
        seq_idx = [0] * len(toks)
        seq_off = [0] * len(toks)
        seq, fill = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            seq_idx[i] = seq
            seq_off[i] = fill
            fill += t
        out = pdf[in_cols].copy()
        out["pack_group"] = pdf["_pack_group"].iloc[0] if len(pdf) else 0
        out["seq_index"] = pd.array(seq_idx, dtype="int64")
        out["seq_offset"] = pd.array(seq_off, dtype="int32")
        return out

    grouped = chunks.withColumn(
        "_pack_group",
        F.pmod(stable_hash64(F.col(doc_col).cast("string")), num_groups).cast(
            "int"
        ),
    )
    return grouped.groupBy("_pack_group").applyInPandas(
        pack_group, schema=out_schema
    )


def deterministic_shuffle(
    df: DataFrame,
    key_cols: Iterable[str] = ("doc_id",),
    salt: str = "shuffle-v1",
    out_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global training order: sort by a sha256-derived key
    of the row identity. Reproducible under any partitioning (unlike
    ``orderBy(rand())``), and epoch-aware — include ``epoch`` from
    ``mixture_sample`` in ``key_cols`` and each epoch's copies land in
    different positions, which is exactly the "reshuffle every epoch"
    training-loader contract. Cost: the one range-partition exchange any
    total ordering pays; at 100 TB this is the final sort before the
    shard sink and AQE sizes the ranges from runtime statistics."""
    key_cols = list(key_cols)
    k = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )
    return df.withColumn(out_col, stable_hash64(k)).orderBy(out_col)


def packed_sequence_stats(assigned: DataFrame, budget: int) -> DataFrame:
    """Per-sequence packing summary: chunk count, token total, fill
    ratio — the packing-efficiency report a training pipeline monitors
    (wasted budget = unfilled context). Pure groupBy, map-side
    combinable."""
    return (
        assigned.groupBy("pack_group", "seq_index")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.sum("num_tokens").cast("int").alias("seq_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(
                F.least(F.lit(1.0), F.col("seq_tokens") / F.lit(float(budget))),
                6,
            ),
        )
    )
