"""Z-order layout (operators/layout.py): Spark==python bit-math
differential, cell-rect exactness, partition-pruned rectangle reads."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.layout import (
    _cell_rect,
    compact1by1,
    hash_dim_col,
    part1by1,
    quantize_linear,
    read_pruned,
    with_zorder,
    zbuckets_for_rect,
    zvalue,
    zvalue_col,
    zorder_write,
)

BITS, BB = 10, 6


def test_part1by1_roundtrip_and_zvalue_python():
    for v in [0, 1, 2, 3, 0x2AAAAAAA, 0x3FFFFFFF, 12345, 999_999_937 % (1 << 30)]:
        assert compact1by1(part1by1(v)) == v
    # x=101 in even bits (1,0,1 at bits 4,2,0), y=011 in odd bits
    # (0,1,1 at bits 5,3,1) → 011011 = 27
    assert zvalue(0b101, 0b011) == 0b011011
    z = zvalue(0x155, 0x2AA)
    assert compact1by1(z) == 0x155 and compact1by1(z >> 1) == 0x2AA


def test_spark_zvalue_matches_python_exactly(spark):
    df = spark.range(512).select(
        (F.col("id") * 1103515245 % (1 << BITS)).cast("int").alias("x"),
        (F.col("id") * 12345 % (1 << BITS)).cast("int").alias("y"),
    )
    rows = df.withColumn("z", zvalue_col(F.col("x"), F.col("y"))).collect()
    for r in rows:
        assert r["z"] == zvalue(r["x"], r["y"])


def test_cell_rect_covers_exactly():
    # exhaustive at small widths: a cell's decoded rectangle equals the
    # true min/max of the de-interleaved coordinates over its z range
    bits, bb = 4, 4
    for b in range(1 << bb):
        lo = b << (2 * bits - bb)
        span = 1 << (2 * bits - bb)
        xs = [compact1by1(z) for z in range(lo, lo + span)]
        ys = [compact1by1(z >> 1) for z in range(lo, lo + span)]
        assert _cell_rect(b, bits, bb) == (min(xs), max(xs), min(ys), max(ys))


def test_zbuckets_for_rect_is_sound():
    # soundness: every point in the rectangle lands in a kept bucket
    rect_x, rect_y = (3, 101), (17, 240)
    kept = set(zbuckets_for_rect(rect_x, rect_y, 8, BB))
    for x in range(rect_x[0], rect_x[1] + 1, 7):
        for y in range(rect_y[0], rect_y[1] + 1, 11):
            assert (zvalue(x, y) >> (2 * 8 - BB)) in kept


@pytest.fixture(scope="module")
def zordered(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    stamped = with_zorder(
        docs.withColumn("xdim", hash_dim_col(F.col("doc_id"), BITS)).withColumn(
            "ydim", quantize_linear(F.col("n_chars"), float(lo), float(hi), BITS)
        ),
        F.col("xdim"),
        F.col("ydim"),
        bits=BITS,
        bucket_bits=BB,
    )
    path = os.path.join(str(tmp_path_factory.mktemp("zorder")), "table")
    zorder_write(stamped, path)
    return path, stamped


def test_pruned_read_equals_full_filter(spark, zordered):
    path, stamped = zordered
    x_range = (0, (1 << BITS) // 8 - 1)
    y_range = ((1 << BITS) // 4, 3 * (1 << BITS) // 4 - 1)
    got = sorted(
        r["doc_id"]
        for r in read_pruned(
            spark, path, x_range, y_range, BITS, BB
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in stamped.where(
            F.col("xdim").between(*x_range) & F.col("ydim").between(*y_range)
        ).collect()
    )
    assert got == want
    assert got  # the rectangle is non-empty at every sf


def test_rectangle_prunes_cells_and_partitions(spark, zordered):
    path, _ = zordered
    x_range = (0, (1 << BITS) // 8 - 1)
    y_range = ((1 << BITS) // 4, 3 * (1 << BITS) // 4 - 1)
    kept = zbuckets_for_rect(x_range, y_range, BITS, BB)
    # an eighth × a half of the domain must keep well under half the
    # 64 cells (this rect keeps 1/8 of x-cells × overlapping y-cells)
    assert 0 < len(kept) < (1 << BB) // 2
    # and the isin lands in the scan's PartitionFilters — pruning at the
    # file listing, not a post-scan filter
    df = read_pruned(spark, path, x_range, y_range, BITS, BB)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("zbucket" in f for f in pf), plan


def test_zorder_locality_beats_single_dim_sort(spark, zordered):
    """The reason to z-order at all: per-cell spans are narrow in BOTH
    dims, where a single-dim sort leaves the other dim full-domain.
    Compare mean per-file xdim span of the z layout against a layout
    sorted only by ydim."""
    path, stamped = zordered
    z_spans = (
        spark.read.parquet(path)
        .groupBy("zbucket")
        .agg((F.max("xdim") - F.min("xdim")).alias("xspan"))
        .agg(F.avg("xspan"))
        .collect()[0][0]
    )
    n_cells = 1 << BB
    y_sorted_spans = (
        stamped.withColumn(
            "ybucket", F.floor(F.col("ydim") / F.lit((1 << BITS) / n_cells)).cast("int")
        )
        .groupBy("ybucket")
        .agg((F.max("xdim") - F.min("xdim")).alias("xspan"))
        .agg(F.avg("xspan"))
        .collect()[0][0]
    )
    assert z_spans < y_sorted_spans * 0.6, (z_spans, y_sorted_spans)
