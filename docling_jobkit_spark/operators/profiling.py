"""Per-column table profiling (completeness / distinctness / ranges).

Beyond the reference's own surface (build brief): the dataset-card
sibling of ``textstats.corpus_report`` — before any curation decision,
data teams profile the raw table itself: how complete is each column,
how many distinct values, what ranges, how long are the strings. This
is the Deequ/"analyze" capability re-expressed as ONE Spark aggregate:

- a single wide ``agg`` row computes every column's metrics in one
  corpus scan (null counts, exact distinct counts, min/max, exact
  integer length sums) — Catalyst fuses all of it into the scan, and
  every aggregate is map-side combinable except the exact
  ``count(DISTINCT ...)``s, which Spark plans as expand+two-phase
  aggregation (the standard multi-distinct strategy; at 100 TB swap in
  ``approx_count_distinct`` via ``exact_distinct=False`` and the scan
  stays one pass with a constant-size HLL sketch per column);
- the 1-row aggregate is then exploded into the per-column report
  (literal struct array over the agg outputs — no second scan, no
  driver loop).

Cross-engine discipline: numeric min/max are emitted as DOUBLE and
string min/max as STRING (never numbers through string formatting,
which differs per engine); ``avg_len`` is one division of two exact
integer sums (the domain_quality rule). The exact DuckDB twin is pinned
in tests/test_profiling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:

    (column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str, avg_len)

    - ``n_distinct`` counts distinct NON-NULL values (exact by default;
      ``exact_distinct=False`` switches to approx_count_distinct for
      the single-pass sketch path at scale).
    - ``min_num``/``max_num`` are populated for numeric columns (as
      double), ``min_str``/``max_str``/``avg_len`` for strings; the
      others are NULL — typed lanes instead of engine-specific
      number-to-string formatting.
    - ``avg_len`` = exact integer total length / non-null count, one
      division (cross-engine exact), NULL when no non-null strings.

    Unsupported types (arrays, structs, maps, binary) still get
    completeness (n_null) and distinctness is NULL for them.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = list(fields)
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    def n_distinct(c: str) -> Column:
        if isinstance(fields[c], (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
            # not an aggregate by itself — wrap the typed NULL so it is
            # legal inside agg()
            return F.max(F.lit(None).cast("long"))
        if exact_distinct:
            return F.count_distinct(F.col(c)).cast("long")
        return F.approx_count_distinct(c).cast("long")

    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in columns:
        dt = fields[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"_null_{c}")
        )
        aggs.append(n_distinct(c).alias(f"_dist_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(c).alias(f"_min_{c}"))
            aggs.append(F.max(c).alias(f"_max_{c}"))
            aggs.append(
                F.sum(F.length(c)).cast("long").alias(f"_len_{c}")
            )
    one = df.agg(*aggs)

    def report_row(c: str) -> Column:
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        n_nonnull = F.col("_n_rows") - F.col(f"_null_{c}")
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(dt.simpleString()).alias("dtype"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if is_num else null_d).alias("min_num"),
            (F.col(f"_max_{c}") if is_num else null_d).alias("max_num"),
            (F.col(f"_min_{c}") if is_str else null_s).alias("min_str"),
            (F.col(f"_max_{c}") if is_str else null_s).alias("max_str"),
            (
                F.when(n_nonnull > 0, F.col(f"_len_{c}") / n_nonnull)
                if is_str else null_d
            ).alias("avg_len"),
        )

    return one.select(
        F.explode(F.array(*[report_row(c) for c in columns])).alias("r")
    ).select("r.*")
