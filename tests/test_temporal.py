"""As-of join + range join (operators/temporal.py): DuckDB oracles
(native ASOF LEFT JOIN / plain inequality join), tie and tolerance
semantics, and the no-nested-loop plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    """Deterministic (key, ts) frames with ties, gaps, and keys missing
    on one side — everything the semantics must pin down."""
    base = str(tmp_path_factory.mktemp("temporal"))
    left = spark.range(120).select(
        F.col("id").alias("lid"),
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 37) % 199).cast("long").alias("ts"),
    )
    right = spark.range(60).select(
        (F.col("id") % 9).alias("k"),
        ((F.col("id") * 53) % 199).cast("long").alias("ts"),
        (F.col("id") * 10).alias("v"),
    )
    # dedup right at identical (k, ts): largest v wins, deterministically
    from pyspark.sql import Window

    w = Window.partitionBy("k", "ts").orderBy(F.col("v").desc())
    right = (
        right.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .drop("_r")
    )
    lp, rp = f"{base}/left.parquet", f"{base}/right.parquet"
    left.coalesce(1).write.parquet(lp)
    right.coalesce(1).write.parquet(rp)
    return left, right, lp, rp


def test_asof_matches_duckdb_native(spark, frames):
    left, right, lp, rp = frames
    got = sorted(
        tuple(r)
        for r in asof_join(
            left, right, on="k", left_id="lid", ts_col="ts", right_cols=("v",)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT l.lid, l.k, l.ts, r.v
            FROM '{lp}/*.parquet' l
            ASOF LEFT JOIN '{rp}/*.parquet' r
              ON l.k = r.k AND l.ts >= r.ts
            """
        ).fetchall()
    )
    assert got == want
    # both populated and unmatched rows exist, or the test proves nothing
    vs = [t[3] for t in got]
    assert any(v is None for v in vs) and any(v is not None for v in vs)


def test_asof_tolerance_matches_correlated_oracle(spark, frames):
    left, right, lp, rp = frames
    tol = 25
    got = sorted(
        tuple(r)
        for r in asof_join(
            left,
            right,
            on="k",
            left_id="lid",
            ts_col="ts",
            right_cols=("v",),
            tolerance=tol,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT l.lid, l.k, l.ts,
                   (SELECT r.v FROM '{rp}/*.parquet' r
                     WHERE r.k = l.k AND r.ts <= l.ts AND l.ts - r.ts <= {tol}
                     ORDER BY r.ts DESC LIMIT 1) AS v
            FROM '{lp}/*.parquet' l
            """
        ).fetchall()
    )
    assert got == want
    # tolerance must actually exclude something vs the unbounded join
    unbounded = asof_join(
        left, right, on="k", left_id="lid", ts_col="ts", right_cols=("v",)
    )
    n_matched_unbounded = unbounded.where(F.col("v").isNotNull()).count()
    n_matched_tol = sum(1 for t in got if t[3] is not None)
    assert n_matched_tol < n_matched_unbounded


def test_asof_tie_is_inclusive(spark):
    # a right update AT the left timestamp is visible (>= semantics,
    # matching DuckDB ASOF)
    left = spark.range(1).select(
        F.lit(0).alias("lid"), F.lit(1).alias("k"), F.lit(100).cast("long").alias("ts")
    )
    right = spark.range(1).select(
        F.lit(1).alias("k"), F.lit(100).cast("long").alias("ts"), F.lit(7).alias("v")
    )
    row = asof_join(
        left, right, on="k", left_id="lid", ts_col="ts", right_cols=("v",)
    ).collect()[0]
    assert row["v"] == 7


def test_asof_plan_has_no_nested_loop(spark, frames):
    left, right, *_ = frames
    df = asof_join(left, right, on="k", left_id="lid", ts_col="ts", right_cols=("v",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_inequality_oracle(spark, frames):
    left, right, lp, rp = frames
    points = left.select("lid", F.col("ts").alias("t"))
    intervals = right.select(
        F.col("v").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + 30).alias("end"),
    )
    got = sorted(
        (r["lid"], r["window_id"])
        for r in range_join(
            points,
            intervals,
            point_col="t",
            start_col="start",
            end_col="end",
            bucket_width=16,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT l.lid, r.v AS window_id
            FROM '{lp}/*.parquet' l JOIN '{rp}/*.parquet' r
              ON l.ts >= r.ts AND l.ts <= r.ts + 30
            """
        ).fetchall()
    )
    assert got == want and got


def test_range_join_plan_is_equi_join(spark, frames):
    left, right, *_ = frames
    points = left.select("lid", F.col("ts").alias("t"))
    intervals = right.select(
        F.col("v").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + 30).alias("end"),
    )
    df = range_join(points, intervals, "t", bucket_width=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # negative control: the naked inequality join DOES nested-loop
    naked = points.join(
        intervals,
        (F.col("t") >= F.col("start")) & (F.col("t") <= F.col("end")),
    )
    naked_plan = naked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naked_plan or "CartesianProduct" in naked_plan


def test_range_join_raises_on_silent_explosion(spark, frames):
    left, right, *_ = frames
    points = left.select("lid", F.col("ts").alias("t"))
    wide = right.select(
        F.col("v").alias("window_id"),
        F.lit(0).cast("long").alias("start"),
        F.lit(10**9).cast("long").alias("end"),
    )
    with pytest.raises(ValueError, match="span more than"):
        range_join(points, wide, "t", bucket_width=1, max_buckets_per_interval=100)
