"""End-to-end training-set assembly (plans/training_set.py): split →
mixture → chunk-once → pack → shuffle → shards, as one lineage."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.plans.training_set import (
    TrainingSetConfig,
    assemble_training_set,
    write_training_set,
)

CFG = TrainingSetConfig(
    weights={"src0": 2.0, "src1": 0.0},
    fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    chunk_tokens=32,
    budget=256,
    num_groups=8,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def splits(docs):
    return assemble_training_set(docs, CFG)


def test_no_split_leakage(splits):
    ids = {
        name: {r["doc_id"] for r in df.select("doc_id").distinct().collect()}
        for name, df in splits.items()
    }
    assert ids["train"] & ids["val"] == set()
    assert ids["train"] & ids["test"] == set()
    assert ids["val"] & ids["test"] == set()
    assert all(len(s) > 0 for s in ids.values())


def test_mixture_applies_to_train_only(splits):
    for name in ("val", "test"):
        eps = splits[name].select("epoch").distinct().collect()
        assert [r["epoch"] for r in eps] == [0]
        # exactly one copy of each chunk
        dup = (
            splits[name]
            .groupBy("doc_id", "chunk_index")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert dup == 0
    # src0 (weight 2) train docs carry epochs {0, 1}; src1 absent
    train = splits["train"]
    assert train.where(F.col("epoch") == 1).count() > 0


def test_train_respects_budget_and_is_deterministic(docs, splits):
    from docling_jobkit_spark.operators.training import packed_sequence_stats

    train = splits["train"]
    stats = packed_sequence_stats(train, budget=CFG.budget)
    assert (
        stats.where(
            (F.col("seq_tokens") > CFG.budget) & (F.col("n_chunks") > 1)
        ).count()
        == 0
    )
    # re-assembly on a repartitioned corpus is value-identical
    again = assemble_training_set(docs.repartition(11), CFG)["train"]
    cols = ["doc_id", "epoch", "chunk_index", "pack_group", "seq_index", "seq_offset"]
    assert sorted(map(tuple, train.select(*cols).collect())) == sorted(
        map(tuple, again.select(*cols).collect())
    )


def test_write_training_set_shards_and_report(docs, tmp_path):
    out = str(tmp_path / "trainset")
    report = write_training_set(docs, out, CFG)
    assert set(report) == {"train", "val", "test"}
    tr = report["train"]
    assert tr["n_sequences"] > 0 and 0 < tr["mean_fill"] <= 1.0
    for split in ("train", "val", "test"):
        files = glob.glob(os.path.join(out, split, "part-*.json.gz"))
        assert files, f"no shards written for {split}"
        n = 0
        for f in files:
            with gzip.open(f, "rt") as fh:
                for line in fh:
                    rec = json.loads(line)
                    assert rec["text"]
                    assert "doc_id" in rec and "chunk_index" in rec
                    n += 1
        assert n == report[split]["n_chunks"]
