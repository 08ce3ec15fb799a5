"""Similarity search over embedding columns (array<float>).

Two paths, as the build brief requires:

- **brute-force cosine top-k** — the exact baseline: one narrow
  projection computing dot/norms with higher-order functions
  (zip_with + aggregate — JVM-side, codegen), then a global top-k
  (``orderBy(...).limit(k)`` = Spark's TakeOrdered, no full sort).
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (hyperplanes derived deterministically from sha256 via stable integer
  arithmetic, no RNG state), candidates = same-bucket rows in any of
  ``n_tables`` tables, exact cosine re-rank inside buckets. At 10^12
  rows the bucket join replaces the O(N) scan per query with a hash
  lookup; recall tunes via (n_bits, n_tables).

Cross-engine note: cosine is computed in float64 with a fixed left-fold
order so the DuckDB oracle (list_dot_product) agrees to well below the
1e-6 rounding applied on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# --- random-hyperplane LSH --------------------------------------------------


def _hyperplane(table: int, bit: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane from a counter-based hash (splitmix-ish
    integer mixing; no RNG object, so identical everywhere)."""
    out = []
    for d in range(dim):
        x = (table * 0x9E3779B97F4A7C15 + bit * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & ((1 << 64) - 1)
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) & ((1 << 64) - 1)
        x ^= x >> 27
        out.append(1 if x & 1 else -1)
    return out


def lsh_signature(vec_col, dim: int, n_bits: int = 12, table: int = 0) -> Column:
    """Integer bucket id: sign bits against n_bits hyperplanes."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = _hyperplane(table, b, dim)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """ANN: rows sharing the query's bucket in ANY table, re-ranked by
    exact cosine. The candidate filter is a pure predicate — at scale,
    store the signatures as partition/bucket columns and this becomes a
    partition-pruned point lookup instead of a scan."""
    dim = len(query_vec)

    def py_sig(table: int) -> int:
        s = 0
        for b in range(n_bits):
            plane = _hyperplane(table, b, dim)
            proj = sum(float(x) * p for x, p in zip(query_vec, plane))
            if proj > 0:
                s |= 1 << b
        return s

    cond = F.lit(False)
    for t in range(n_tables):
        cond = cond | (lsh_signature(vec_col, dim, n_bits, t) == F.lit(py_sig(t)))
    candidates = df.filter(cond)
    return brute_force_topk(candidates, query_vec, k, vec_col, id_col)
