"""End-to-end training-set assembly plan: curated documents → split →
mixture → chunk → pack → shuffle → JSONL shards.

The composite a pretraining data engineer actually runs, chaining the
training family (operators/training.py) with the chunker and the shard
sink into ONE deterministic lineage. Stage order encodes the recipe
semantics:

1. **Split first, doc-level** (``split_assign``) — eval membership is
   decided before any oversampling, so a val/test document can never
   leak a copy into train.
2. **Mixture on TRAIN only** (``mixture_sample``) — oversampling epochs
   apply to training data; val/test keep exactly one copy (epoch 0).
3. **Chunk ONCE per document** (``token_window_chunks``), then join the
   (doc, epoch) assignment onto the chunks — epoch copies are
   replicated relationally instead of re-running the chunker per epoch
   (at 10^12 docs the chunker is the expensive stage; the join is a
   plain co-partitionable equi-join AQE handles).
4. **Pack train chunks** into fixed token-budget sequences
   (``pack_sequences``) grouped by (doc, epoch) so different epochs of
   one document can interleave into different sequences.
5. **Deterministic epoch-aware shuffle** of sequences (sha256 sort
   key), chunks ordered inside their sequence by offset.
6. **Size-capped gzip JSONL shards per split** (``write_training_shards``).

Everything is a pure function of (corpus content, config): re-running
on a repartitioned or resumed corpus writes value-identical shards.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import stable_hash64
from docling_jobkit_spark.operators.chunker import token_window_chunks
from docling_jobkit_spark.operators.training import (
    mixture_sample,
    pack_sequences,
    packed_sequence_stats,
    split_assign,
)
from docling_jobkit_spark.sinks.writers import write_training_shards


@dataclass(frozen=True)
class TrainingSetConfig:
    weights: Mapping[str, float] = field(default_factory=dict)
    default_weight: float = 1.0
    fractions: Mapping[str, float] = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    chunk_tokens: int = 64
    budget: int = 512
    num_groups: int = 64
    max_shard_bytes: int = 8 << 20
    source_col: str = "source"
    id_col: str = "doc_id"
    text_col: str = "text"
    salt: str = "trainset-v1"


def assemble_training_set(
    docs: DataFrame, config: TrainingSetConfig | None = None
) -> dict[str, DataFrame]:
    """Build the per-split chunk streams (no I/O). Returns
    {"train": <packed+shuffled chunk rows>, "val": ..., "test": ...};
    train rows carry (pack_group, seq_index, seq_offset, shuffle_key),
    eval rows are plain document-ordered chunks (eval loaders read
    documents, not packed context windows)."""
    cfg = config or TrainingSetConfig()
    did = F.col(cfg.id_col)

    meta_cols = [cfg.id_col, cfg.source_col]
    assigned = split_assign(
        docs.select(*meta_cols).withColumn("_k", did.cast("string")),
        key_col="_k",
        fractions=dict(cfg.fractions),
        salt=cfg.salt + ":split",
    ).drop("_k")

    train_meta = mixture_sample(
        assigned.where(F.col("split") == "train"),
        source_col=cfg.source_col,
        weights=dict(cfg.weights),
        default_weight=cfg.default_weight,
        key_col=cfg.id_col,
        salt=cfg.salt + ":mix",
    )
    eval_meta = assigned.where(F.col("split") != "train").withColumn(
        "epoch", F.lit(0)
    )

    chunks = token_window_chunks(
        docs,
        text_col=cfg.text_col,
        id_col=cfg.id_col,
        max_tokens=cfg.chunk_tokens,
        overlap=0,
    )

    train_chunks = chunks.join(
        train_meta.select(cfg.id_col, "split", "epoch"), cfg.id_col
    )
    packed = pack_sequences(
        train_chunks.withColumn(
            "_pack_doc", F.concat_ws(":", did.cast("string"), F.col("epoch"))
        ),
        budget=cfg.budget,
        doc_col="_pack_doc",
        order_cols=(cfg.id_col, "epoch", "chunk_index"),
        num_groups=cfg.num_groups,
    ).drop("_pack_doc")
    shuffled = packed.withColumn(
        "shuffle_key",
        stable_hash64(
            F.concat_ws(
                "|",
                F.col("pack_group").cast("string"),
                F.col("seq_index").cast("string"),
                F.lit(cfg.salt + ":shuffle"),
            )
        ),
    ).orderBy("shuffle_key", "seq_offset")

    out = {"train": shuffled}
    for split in cfg.fractions:
        if split == "train":
            continue
        out[split] = (
            chunks.join(
                eval_meta.where(F.col("split") == split).select(
                    cfg.id_col, "split", "epoch"
                ),
                cfg.id_col,
            )
            # document order — eval loaders consume whole documents
            .orderBy(cfg.id_col, "chunk_index")
        )
    return out


def write_training_set(
    docs: DataFrame,
    out_dir: str,
    config: TrainingSetConfig | None = None,
) -> dict[str, dict]:
    """Assemble and write one shard directory per split; returns
    {split: {"n_chunks": int, "n_docs": int, and for train
    "n_sequences"/"mean_fill"}} — the report a data-build job logs.
    Stats are computed on the SAME DataFrames that feed the sink (one
    extra count-style agg per split, no corpus rescan of text)."""
    cfg = config or TrainingSetConfig()
    splits = assemble_training_set(docs, cfg)
    report: dict[str, dict] = {}
    for split, df in splits.items():
        meta: tuple[str, ...] = (cfg.id_col, "epoch", "chunk_index")
        if split == "train":
            meta = meta + ("pack_group", "seq_index", "seq_offset")
        write_training_shards(
            df,
            f"{out_dir}/{split}",
            text_col="chunk_text",
            meta_cols=meta,
            max_shard_bytes=cfg.max_shard_bytes,
        )
        stats_row = df.agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct(cfg.id_col).alias("n_docs"),
        ).collect()[0]
        report[split] = {
            "n_chunks": stats_row["n_chunks"],
            "n_docs": stats_row["n_docs"],
        }
        if split == "train":
            seq = packed_sequence_stats(df, budget=cfg.budget).agg(
                F.count(F.lit(1)).alias("n_sequences"),
                F.round(F.avg("fill_ratio"), 6).alias("mean_fill"),
            ).collect()[0]
            report[split]["n_sequences"] = seq["n_sequences"]
            report[split]["mean_fill"] = float(seq["mean_fill"])
    return report
