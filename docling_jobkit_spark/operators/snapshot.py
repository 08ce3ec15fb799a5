"""Crawl-snapshot delta (CDC-style incremental corpus merge).

Public precedent: every recurring web corpus (Common Crawl monthlies,
incremental enterprise re-crawls — the reference's own resume model,
``docling_jobkit/connectors/`` re-listing source documents per run)
needs the delta between two snapshots before paying for downstream
processing: which documents are NEW, which CHANGED (same key, different
content), which are UNCHANGED (skip them), which DISAPPEARED.

Relational shape — one full-outer join on the snapshot key with
content-hash comparison:

- both sides reduce to (key, content_hash) BEFORE the join: the only
  corpus-wide shuffle carries a key string and a sha hex, never the
  payload;
- the verdict joins back to the NEW snapshot payload only for the
  added/changed subset (the work list), which is delta-bounded — the
  steady-state re-crawl joins back almost nothing;
- content identity is the repo-canonical ``content_hash`` (sha256 of
  normalized text — single definition shared with exact dedup and the
  streaming path), so "changed" means the text changed, not that
  whitespace or fetch metadata wiggled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.functions.scalar import content_hash

STATUS_ADDED = "added"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"
STATUS_REMOVED = "removed"


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, delta_status, old_hash, new_hash) for every key present in
    either snapshot. Assumes the key is unique per snapshot (a keyed
    snapshot, not a raw crawl log — canonical-url dedup runs first)."""
    o = old.select(
        F.col(key_col).alias("_k"), content_hash(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(key_col).alias("_k"), content_hash(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, on="_k", how="full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("new_hash").isNull(), F.lit(STATUS_REMOVED))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit(STATUS_UNCHANGED))
        .otherwise(F.lit(STATUS_CHANGED))
    )
    return j.select(
        F.col("_k").alias(key_col),
        status.alias("delta_status"),
        "old_hash",
        "new_hash",
    )


def snapshot_worklist(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The rows of ``new`` that actually need processing (added or
    changed), with ``delta_status`` stamped. The join-back side is
    delta-bounded; AQE broadcasts it on a steady-state re-crawl."""
    delta = snapshot_delta(old, new, key_col, text_col).where(
        F.col("delta_status").isin(STATUS_ADDED, STATUS_CHANGED)
    )
    return new.join(
        delta.select(key_col, "delta_status"), on=key_col, how="inner"
    )


def snapshot_delta_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per delta_status with its key count — the log line an
    incremental ingest emits before dispatching the worklist."""
    return (
        snapshot_delta(old, new, key_col, text_col)
        .groupBy("delta_status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
