"""Link-graph centrality — the web-graph quality signal.

Public precedent: PageRank (Brin & Page 1998) and the host-level link
centrality rankings published alongside Common Crawl (harmonic /
PageRank host rankings) — web corpora use link centrality as a
document/domain quality prior (seed lists, crawl prioritization,
quality stratification). The reference repo has no graph stage; this is
part of the training-data-pipeline surface the build brief adds.

Relational power iteration, deterministic to the bit:

- ranks are SCALED LONGS (units of 1e-12): every iteration quantizes
  each node's contribution BEFORE the sum, so the per-destination
  aggregation is an exact integer sum — immune to float summation
  order across partitionings and engines. The pure-Python reference in
  tests/test_linkgraph.py reproduces every iteration exactly.
- each iteration is one broadcast-or-shuffle join (edges ⋈ ranks on
  src, narrow long columns) + one groupBy dst; ranks are
  localCheckpoint-ed per iteration (iterative lineage — same policy as
  the connected-components pointer jumping in dedup.py).
- dangling mass (nodes without out-edges) is one bounded scalar agg per
  iteration (a single row crosses the driver, like the k-means
  centroid sample — the corpus never does).

Scale: the node/edge tables are graph-sized, not corpus-sized (host
graphs are millions of rows where the corpus is billions); every
shuffle carries (node, long) pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUANT = 1e-12  # rank unit: total mass 1.0 = 1e12 — exact in a long
DAMPING = 0.85
N_ITER_DEFAULT = 10


def in_degree(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, in_degree) — the cheapest centrality; one narrow shuffle."""
    return edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )


def _nodes(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = N_ITER_DEFAULT,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, pr) after ``n_iter`` power iterations with uniform
    teleport; pr is the quantized rank as a double (node ranks sum to
    ~1 up to quantization). Handles dangling nodes by redistributing
    their mass uniformly each iteration."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = _nodes(e, "_s", "_d").localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("node"), F.lit(0.0).alias("pr")
        )
    outdeg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("_deg")
    )
    init_q = int(math.floor(1.0 / n / _QUANT + 0.5))
    # stamp out-degrees once (left join; dangling nodes keep _deg = 0)
    ranks = (
        nodes.join(outdeg, on="node", how="left")
        .select(
            "node",
            F.lit(init_q).cast("long").alias("_rq"),
            F.coalesce("_deg", F.lit(0)).alias("_deg"),
        )
        .localCheckpoint(eager=False)
    )
    teleport_q = int(math.floor((1.0 - damping) / n / _QUANT + 0.5))
    for _ in range(int(n_iter)):
        # bounded: ONE scalar row (dangling mass) per iteration
        dangling_q = (
            ranks.where(F.col("_deg") == 0)
            .agg(F.coalesce(F.sum("_rq"), F.lit(0)))
            .collect()[0][0]
        )
        dangling_share_q = int(
            math.floor(float(dangling_q) * damping / n + 0.5)
        )
        contrib = (
            e.join(ranks.where(F.col("_deg") > 0), e["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                # quantize BEFORE summing: exact integer aggregation
                F.round(
                    F.col("_rq") * F.lit(damping) / F.col("_deg"), 0
                )
                .cast("long")
                .alias("_cq"),
            )
            .groupBy("node")
            .agg(F.sum("_cq").alias("_in"))
        )
        ranks = (
            ranks.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(teleport_q + dangling_share_q)
                    + F.coalesce("_in", F.lit(0))
                )
                .cast("long")
                .alias("_rq"),
                "_deg",
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", (F.col("_rq") * F.lit(_QUANT)).alias("pr")
    )
