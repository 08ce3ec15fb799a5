"""Temporal joins Spark lacks as primitives: as-of join and range join.

Web-corpus uses: join each fetched page to the LATEST robots.txt /
site-policy snapshot at fetch time (as-of); attribute events/pages to
validity intervals — crawl windows, policy epochs, incident ranges
(range join). Naive formulations are quadratic: an inequality join
(``l.ts >= r.ts``) plans a BroadcastNestedLoopJoin or cartesian that
explodes at corpus scale.

**As-of join — the union + window formulation** (the classic
distributed answer, also how kdb/QuestDB/Flink think about it):
tag both sides, union the NARROW columns only, sort within key by
(ts, side-priority), and carry the most recent right-side values
forward with ``last(ignorenulls=True)``. Cost: ONE shuffle of
(key, ts, right-payload) — no inequality join anywhere, no row
explosion, and Spark's SQL engine executes the window as a single
sort-based pass per key partition. DuckDB has a native ``ASOF JOIN``,
which is the test oracle.

**Range join — bucketed interval overlap**: intervals are exploded to
the fixed-width buckets they overlap, points hash to their bucket, and
the join becomes an equi-join on (key?, bucket) with a residual exact
range predicate. Explosion factor = mean interval width / bucket width
(the caller picks the bucket to bound it); skew from one giant interval
is bounded by ``max_buckets_per_interval`` which RAISES rather than
silently exploding. This is exactly Spark's own
``spark.databricks``-style range-join-hint strategy re-expressed with
public primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch(df: DataFrame, ts_col: str):
    """Seconds-as-long from any timestamp flavor. TIMESTAMP_NTZ cannot
    cast straight to BIGINT under ANSI — the repo's epoch convention is
    the two-step cast."""
    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, (T.TimestampNTZType, T.TimestampType)):
        return c.cast("timestamp").cast("long")
    return c.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_id: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` key (inclusive),
    optionally no older than ``tolerance`` (same units as ``ts_col``
    after cast to long — pass seconds for timestamps).

    ``left_id`` must be a UNIQUE left key (every corpus table here has
    one: doc_id, _doc_key, url+rep). It is what lets the left PAYLOAD
    stay out of the window sort: only (id, key, ts, right-payload) ride
    the one shuffle, and the full left row hash-joins back on the id at
    the end. An id is required rather than synthesized —
    monotonically_increasing_id computed independently on two plan
    branches is only accidentally aligned, and a corpus-scale silent
    misalignment is exactly the class of bug this repo bans.

    Left rows with no admissible right row keep NULL right columns
    (left-outer semantics, like DuckDB's ``ASOF LEFT JOIN``).

    Ties (right.ts == left.ts) match; among equal right timestamps the
    LAST in (ts, tie) order wins deterministically because right rows
    sort before left rows at the same instant and ``last`` takes the
    latest seen. Multiple right rows at one instant should be
    pre-deduplicated by the caller if "which one" matters.
    """
    rcols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (on, ts_col)]
    )
    lcols = [c for c in left.columns if c not in (on, ts_col, left_id)]

    # narrow union frame: key, ts, side priority, left row id, right
    # payload (null on the left side)
    lt = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(left_id).alias("_lid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        *([F.lit(None).cast("long").alias("_rts")] if tolerance is not None else []),
    )
    rt = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        *(
            [_epoch(right, ts_col).alias("_rts")]
            if tolerance is not None
            else []
        ),
    )
    u = lt.unionByName(rt)

    # right rows (side 0) sort before left rows (side 1) at equal ts →
    # a right update at t is visible to a left row at the same t
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in rcols
        ],
        *(
            [F.last("_rts", ignorenulls=True).over(w).alias("_c_rts")]
            if tolerance is not None
            else []
        ),
    )
    matched = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        in_window = F.col("_c_rts").isNotNull() & (
            _epoch(matched, ts_col) - F.col("_c_rts") <= F.lit(tolerance)
        )
        matched = matched.select(
            "*",
            *[
                F.when(in_window, F.col(f"_c_{c}"))
                .otherwise(F.lit(None))
                .alias(f"_t_{c}")
                for c in rcols
            ],
        )
        picked = [F.col(f"_t_{c}").alias(c) for c in rcols]
    else:
        picked = [F.col(f"_c_{c}").alias(c) for c in rcols]
    slim = matched.select(F.col("_lid").alias(left_id), *picked)

    out = left.join(slim, left_id, "left")
    return out.select(left_id, on, ts_col, *lcols, *rcols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    on: str | None = None,
    bucket_width: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (``start <= point <= end``, optionally also matching key ``on``)
    WITHOUT an inequality join: intervals explode to the fixed-width
    buckets they overlap, points equi-join on their bucket, and the
    exact range predicate filters the (bounded) candidates.

    Catalyst plans a naked inequality join as BroadcastNestedLoopJoin —
    per-point × per-interval work. Here the join is a hash equi-join on
    (bucket[, on]); candidates per point = intervals overlapping its
    bucket only. Pick ``bucket_width`` near the MEDIAN interval width:
    explosion ≈ width/bucket + 1 per interval. An interval wider than
    ``max_buckets_per_interval`` buckets RAISES (one year-wide interval
    at second-buckets would silently emit 31M rows — loud beats slow).
    """
    p = _epoch(points, point_col)
    s, e = _epoch(intervals, start_col), _epoch(intervals, end_col)

    too_wide = intervals.where(
        (e / bucket_width).cast("long") - (s / bucket_width).cast("long")
        > max_buckets_per_interval
    )
    n_wide = too_wide.limit(1).count()
    if n_wide:
        raise ValueError(
            f"range_join: interval(s) span more than {max_buckets_per_interval} "
            f"buckets of width {bucket_width} — raise bucket_width or split "
            "the intervals (silent explosion forbidden)"
        )

    ib = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(s / bucket_width).cast("long"),
                F.floor(e / bucket_width).cast("long"),
            )
        ).alias("_bucket"),
    )
    pb = points.select("*", F.floor(p / bucket_width).cast("long").alias("_bucket"))
    keys = ["_bucket"] + ([on] if on else [])
    return (
        pb.join(ib, keys, "inner")
        .where((p >= s) & (p <= e))
        .drop("_bucket")
    )
