"""Per-partition lineage / metrics (SURVEY §2.7 O9, FIXTURES.md §4).

The reference records a ``BatchResult`` per worker batch
(``cli/multiproc.py:54-63``: chunk_index, num_docs, num_succeeded,
num_failed, failed[], processing_time) and monotonic per-tenant lifecycle
counters (``orchestrators/ray/models.py:71-93``). Spark-first analog:

- the extraction operator's output already carries per-row status and
  byte counts, so the metrics table is a pure relational aggregation of
  the results — no second pass over the payload, no accumulators needed
  for correctness (Spark accumulators double-count on task retry; a
  groupBy over committed results does not);
- ``spark_partition_id()`` stamps lineage before the shuffle-free agg.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_lineage(results: DataFrame, run_id: str, attempt: int = 0) -> DataFrame:
    """Stamp each result row with its producing run/partition — the
    lineage columns ride into the results table itself."""
    return (
        results.withColumn("run_id", F.lit(run_id))
        .withColumn("partition_id", F.spark_partition_id())
        .withColumn("attempt", F.lit(attempt))
    )


def partition_metrics(results_with_lineage: DataFrame) -> DataFrame:
    """One row per (run_id, partition_id): the BatchResult analog."""
    return results_with_lineage.groupBy("run_id", "partition_id", "attempt").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("status") == "PARTIAL_SUCCESS", 1).otherwise(0)).alias(
            "n_partial"
        ),
        F.sum(F.when(F.col("status") == "FAILURE", 1).otherwise(0)).alias("n_failed"),
        F.sum("n_bytes").alias("bytes_in"),
        F.sum(F.length("extracted_text")).alias("chars_out"),
    )


def job_summary(results: DataFrame) -> DataFrame:
    """The DoclingTaskResult counter row (``datamodel/result.py:3-28``)."""
    return results.agg(
        F.count("*").alias("num_converted"),
        F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias(
            "num_succeeded"
        ),
        F.sum(F.when(F.col("status") == "PARTIAL_SUCCESS", 1).otherwise(0)).alias(
            "num_partially_succeeded"
        ),
        F.sum(F.when(F.col("status") == "FAILURE", 1).otherwise(0)).alias("num_failed"),
    )


def stamp_committed_at(metrics: DataFrame) -> DataFrame:
    """committed_at is assigned once at commit time (first-terminal-state
    -wins discipline — ``redis_helper.py:950-1078``)."""
    return metrics.withColumn(
        "committed_at", F.lit(time.time()).cast("timestamp")
    )
