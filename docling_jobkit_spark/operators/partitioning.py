"""url-hash bucketing + salted, size-aware repartitioning (north rule).

Reference precedents:
- stable sha-prefix key per source: ``connectors/artifact_paths.py:9-10``
  (``sha256(uri)[:12]``) → our bucket key is
  ``substring(sha2(url,256), 1, 8)`` parsed as a hex int;
- skew controls: one-doc dispatch batches
  (``orchestrators/ray/config.py:277-281``) and page-slice splitting of
  huge docs (``:242-246``) → our analog is the size-decile salt here plus
  the slice explode in slices.py.

Why it scales: hash-bucketing by url gives a uniform key distribution
regardless of crawl-host skew (urls from one host hash apart); the size
decile spreads the *byte* load so one partition never accumulates several
giant documents — partition wall-time spread is what caps scaling
efficiency at 4× parallelism. All expressions are JVM-side (sha2/conv —
whole-stage codegen), no Python involved in partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 1024


def url_bucket_col(n_buckets: int = N_BUCKETS_DEFAULT):
    """Deterministic bucket id in [0, n_buckets) from sha256(url)."""
    return F.pmod(
        F.conv(F.substring(F.sha2(F.col("url"), 256), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def with_url_bucket(df: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    return df.withColumn("bucket", url_bucket_col(n_buckets))


def size_decile_col(size_col: str = "html"):
    """Integer log2-ish size class of the payload — cheap, deterministic,
    and unlike ntile() it needs NO global sort/shuffle to compute."""
    return F.when(F.col(size_col).isNull(), F.lit(0)).otherwise(
        F.floor(F.log2(F.greatest(F.length(size_col).cast("double"), F.lit(1.0))))
    ).cast("int")


# NOTE: an earlier ``balanced_repartition`` helper (global row_number rank
# dealt round-robin) was REMOVED: the unpartitioned Window.orderBy funnels
# every row through one task, and repartition(n, pmod(rank, n))
# hash-collides the n key values (~37% empty partitions) — BENCH.md's skew
# section measured and rejected the pattern. Use ``salted_repartition``
# for byte-balance and the slice fan-out (slices.py) for giant docs.


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    n_buckets: int = N_BUCKETS_DEFAULT,
    size_col: str = "html",
) -> DataFrame:
    """Repartition by (url bucket, size class) so both the document count
    AND the byte volume spread evenly across tasks."""
    return df.repartition(
        num_partitions,
        url_bucket_col(n_buckets),
        size_decile_col(size_col),
    )
