"""Z-order (Morton) multi-dimensional file layout + prefix-cell pruning.

The problem at 100 TB: a corpus table is typically laid out along ONE
dimension (ingestion time), so a query like "host X over March" prunes
files on the time predicate but scans every file for the host predicate
— min/max footer stats on a randomly-distributed column span the whole
domain in every file. Iceberg/Delta answer with a z-order rewrite; this
is the from-scratch Spark-native analog, with pruning that happens at
the FILE LISTING (Spark partition pruning over ``zbucket=`` directories,
the same mechanism ivf_presigned_topk pins for ANN cells) rather than at
footer-stats time — no files are even listed for excluded cells.

Design (all public knowledge: Morton 1966; the litmax/bigmin refinement
in Tropf & Herzog 1981 — we use the simpler prefix-cell decomposition):

- two dimension columns are QUANTIZED to ``bits``-wide non-negative ints
  by the caller (hash-derived dims are already uniform; time dims use
  ``quantize_linear`` with driver-side min/max — a 2-value bounded agg);
- ``zvalue_col`` interleaves them JVM-side with the classic 5-step
  magic-mask bit spread (shift/or/and only — whole-stage codegen, no
  Python, no overflow: every mask < 2^63, shifts are bitwise);
- ``zbucket = zvalue >> (2*bits - bucket_bits)`` — a FIXED-PREFIX cell
  id. Deterministic by construction, unlike ``repartitionByRange`` whose
  range boundaries come from per-run sampling; uniform because the
  leading z bits alternate between the two dims (hash dims are uniform,
  quantized time is near-uniform over the crawl window);
- the write is ``partitionBy("zbucket")`` — one directory per cell;
- a rectangle query decodes each cell's prefix back into its (x, y) cell
  rectangle driver-side (``compact1by1`` — the exact inverse of the
  spread) and keeps the cells that overlap: an ``isin`` over at most
  ``2^bucket_bits`` ids that Spark turns into partition pruning.

The one shuffle is the rewrite itself (``partitionBy`` write with a
cell-hash repartition so each cell is written by one task) — inherent to
ANY clustering layout, paid once, amortized over every pruned query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# 5-step bit spread: 30-bit int -> even bit positions of a 60-bit long.
_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def part1by1_col(c: Column) -> Column:
    """JVM-side Morton spread of a (< 2^30) non-negative int column."""
    x = c.cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def part1by1(v: int) -> int:
    """Python twin of ``part1by1_col`` (differential-tested)."""
    for shift, mask in _SPREAD_STEPS:
        v = (v | (v << shift)) & mask
    return v


def compact1by1(z: int) -> int:
    """Inverse spread: gather the even bits of ``z`` back into an int
    (the masks differ from the spread's — each step halves the gaps)."""
    z &= 0x5555555555555555
    z = (z | (z >> 1)) & 0x3333333333333333
    z = (z | (z >> 2)) & 0x0F0F0F0F0F0F0F0F
    z = (z | (z >> 4)) & 0x00FF00FF00FF00FF
    z = (z | (z >> 8)) & 0x0000FFFF0000FFFF
    z = (z | (z >> 16)) & 0x00000000FFFFFFFF
    return z


def zvalue_col(x: Column, y: Column) -> Column:
    """Interleaved Morton code: x in even bits, y in odd bits."""
    return part1by1_col(x).bitwiseOR(F.shiftleft(part1by1_col(y), 1))


def zvalue(x: int, y: int) -> int:
    return part1by1(x) | (part1by1(y) << 1)


def quantize_linear(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) — for time-like dims.
    ``lo``/``hi`` come from a driver-side 2-value agg (bounded, like the
    IVF codebook sample). Values at ``hi`` clamp into the top cell."""
    n = 1 << bits
    span = max(hi - lo, 1e-12)
    q = F.floor((c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(n))
    return F.least(F.greatest(q, F.lit(0)), F.lit(n - 1)).cast("int")


def hash_dim_col(c: Column, bits: int) -> Column:
    """Uniform ``bits``-wide dimension from any key column — the
    repo-standard sha256-prefix hash, masked to width."""
    h = F.conv(F.substring(F.sha2(c.cast("string"), 256), 1, 15), 16, 10).cast(
        "long"
    )
    return (h % F.lit(1 << bits)).cast("int")


def with_zorder(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 15,
    bucket_bits: int = 6,
) -> DataFrame:
    """Stamp ``zvalue`` + ``zbucket``. ``x``/``y`` must already be
    quantized to [0, 2^bits) ints; ``bucket_bits`` ≤ 2*bits is the cell
    prefix width (2^bucket_bits directories)."""
    if bucket_bits > 2 * bits:
        raise ValueError("bucket_bits cannot exceed 2*bits")
    z = zvalue_col(x, y)
    return df.withColumn("zvalue", z).withColumn(
        "zbucket", F.shiftright(F.col("zvalue"), 2 * bits - bucket_bits).cast("int")
    )


def zorder_write(df_with_z: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One directory per z-cell; the repartition on the cell id makes
    each cell a single task's output (one file per cell instead of
    n_tasks × n_cells fragments — compaction by construction). This is
    the layout rewrite's one shuffle, inherent to clustering."""
    (
        df_with_z.repartition(F.col("zbucket"))
        .sortWithinPartitions("zvalue")
        .write.mode(mode)
        .partitionBy("zbucket")
        .parquet(path)
    )


def _cell_rect(bucket: int, bits: int, bucket_bits: int) -> tuple[int, int, int, int]:
    """The (x_min, x_max, y_min, y_max) rectangle covered by one z-cell:
    the bucket id is the top ``bucket_bits`` bits of the z-value, i.e. a
    fixed prefix; de-interleaving the prefix (padded with 0s / 1s) gives
    the cell's corner coordinates."""
    total = 2 * bits
    z_lo = bucket << (total - bucket_bits)
    z_hi = z_lo | ((1 << (total - bucket_bits)) - 1)
    return (
        compact1by1(z_lo),
        compact1by1(z_hi),
        compact1by1(z_lo >> 1),
        compact1by1(z_hi >> 1),
    )


def zbuckets_for_rect(
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int,
    bucket_bits: int,
) -> list[int]:
    """Every z-cell whose rectangle overlaps the query rectangle —
    driver-side over at most 2^bucket_bits cells (bucket_bits stays
    small: 6-10 → 64-1024 cells; the listing this prunes is the
    million-file corpus, not the cell table)."""
    (x0, x1), (y0, y1) = x_range, y_range
    out = []
    for b in range(1 << bucket_bits):
        cx0, cx1, cy0, cy1 = _cell_rect(b, bits, bucket_bits)
        if cx1 >= x0 and cx0 <= x1 and cy1 >= y0 and cy0 <= y1:
            out.append(b)
    return out


def read_pruned(
    spark: SparkSession,
    path: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int,
    bucket_bits: int,
    x_col: str = "xdim",
    y_col: str = "ydim",
) -> DataFrame:
    """Rectangle query over a z-ordered table: the ``zbucket`` isin
    predicate is a PARTITION filter (pruned at file listing — the
    excluded cells' directories are never even listed); the exact
    per-row ranges still apply on the surviving cells' rows. ``x_col``/
    ``y_col`` are the QUANTIZED dimension columns the table was
    z-ordered on (persist them alongside zvalue/zbucket)."""
    buckets = zbuckets_for_rect(x_range, y_range, bits, bucket_bits)
    df = spark.read.parquet(path)
    return df.where(
        F.col("zbucket").isin(buckets)
        & F.col(x_col).between(*x_range)
        & F.col(y_col).between(*y_range)
    )
