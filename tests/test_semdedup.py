"""SemDeDup (operators/semdedup.py): cluster-then-pairwise semantic
dedup — DuckDB-exact twin, keep-rule semantics, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.semdedup import (
    semantic_dedup_summary,
    semantic_duplicates,
)
from docling_jobkit_spark.operators.similarity import deterministic_centroids


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return deterministic_centroids(emb, k=4)


def _duckdb_verdicts(sf_dir, centroids, tau):
    """The full relational twin: argmax cell, rank, upper-triangular
    pairwise test — same 6-rounding discipline as the Spark side."""
    cent_rows = ",".join(
        f"({i}, {list(c)}::DOUBLE[])" for i, c in enumerate(centroids)
    )
    sql = f"""
        with cents(cell, cv) as (values {cent_rows}),
        base as (
          select vec_id, embedding::DOUBLE[] as v
          from '{sf_dir}/embeddings.parquet'
        ),
        scored as (
          select b.vec_id, b.v, c.cell,
                 round(list_dot_product(b.v, c.cv) /
                       (sqrt(list_dot_product(b.v, b.v)) *
                        sqrt(list_dot_product(c.cv, c.cv))), 6) as sim
          from base b cross join cents c
        ),
        assigned as (
          select vec_id, v, cell, sim as centroid_sim
          from (select *, row_number() over
                  (partition by vec_id order by sim desc, cell asc) as rn
                from scored)
          where rn = 1
        ),
        ranked as (
          select *, row_number() over
                   (partition by cell order by centroid_sim asc, vec_id asc)
                 as sem_rank
          from assigned
        ),
        hits as (
          select r.vec_id,
                 max(round(list_dot_product(l.v, r.v) /
                     (sqrt(list_dot_product(l.v, l.v)) *
                      sqrt(list_dot_product(r.v, r.v))), 6)) as max_prior_sim
          from ranked l join ranked r
            on l.cell = r.cell and l.sem_rank < r.sem_rank
          where round(list_dot_product(l.v, r.v) /
                (sqrt(list_dot_product(l.v, l.v)) *
                 sqrt(list_dot_product(r.v, r.v))), 6) >= {tau}
          group by r.vec_id
        )
        select k.vec_id, k.cell, k.centroid_sim, k.sem_rank,
               h.max_prior_sim, h.vec_id is null as keep
        from ranked k left join hits h using (vec_id)
        order by k.vec_id
    """
    return duckdb.sql(sql).fetchall()


def test_semdedup_matches_duckdb_exactly(emb, centroids, sf_dir):
    tau = 0.8
    got = {
        r["vec_id"]: (
            r["ivf_cell"],
            r["centroid_sim"],
            r["sem_rank"],
            r["max_prior_sim"],
            r["keep"],
        )
        for r in semantic_duplicates(emb, centroids, tau=tau).collect()
    }
    want = {
        vid: (cell, cs, rank, mps, keep)
        for vid, cell, cs, rank, mps, keep in _duckdb_verdicts(
            sf_dir, centroids, tau
        )
    }
    assert set(got) == set(want)
    for vid in want:
        g, w = got[vid], want[vid]
        assert g[0] == w[0], (vid, "cell", g, w)
        assert g[2] == w[2], (vid, "rank", g, w)
        assert g[4] == w[4], (vid, "keep", g, w)
        assert (g[1] is None) == (w[1] is None) and (
            g[1] is None or abs(g[1] - w[1]) < 1e-9
        )
        assert (g[3] is None) == (w[3] is None) and (
            g[3] is None or abs(g[3] - w[3]) < 1e-9
        )


def test_semdedup_keep_rule_semantics(spark):
    """Constructed micro-corpus: two near-identical pairs and one
    singleton in the same cell. The FAR-from-centroid copy of each dup
    pair survives (rank asc = centroid_sim asc); the closer copy drops."""
    rows = [
        (0, [1.0, 0.0, 0.0]),       # aligned with centroid -> ranks last
        (1, [1.0, 0.02, 0.0]),      # near-dup of 0, slightly off-axis
        (2, [0.4, 0.9, 0.0]),       # far from centroid, unique
        (3, [0.41, 0.9, 0.01]),     # near-dup of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0]]
    out = {
        r["vec_id"]: r
        for r in semantic_duplicates(df, cents, tau=0.99).collect()
    }
    # ranks: 2 and 3 are farthest from the centroid -> lowest ranks
    assert out[2]["sem_rank"] < out[0]["sem_rank"]
    # one survivor per dup pair, and it is the far-from-centroid one
    assert out[2]["keep"] and not out[3]["keep"]
    pair01 = sorted([0, 1], key=lambda i: out[i]["sem_rank"])
    assert out[pair01[0]]["keep"] and not out[pair01[1]]["keep"]
    # dropped rows carry the auditing similarity
    assert out[3]["max_prior_sim"] >= 0.99


def test_semdedup_null_embedding_kept(spark):
    rows = [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_duplicates(df, [[1.0, 0.0]], tau=0.99).collect()
    }
    assert out[1]["ivf_cell"] == -1 and out[1]["keep"]
    assert not (out[0]["keep"] and out[2]["keep"])  # the dup pair collapsed


def test_semdedup_no_cartesian_join(emb, centroids):
    """The pairwise stage must be an equi-join on ivf_cell — never a
    cartesian/broadcast-nested-loop over the corpus."""
    plan = (
        semantic_duplicates(emb, centroids, tau=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_summary_consistent(emb, centroids):
    v = semantic_duplicates(emb, centroids, tau=0.8)
    s = semantic_dedup_summary(v).collect()
    assert sum(r["n_vectors"] for r in s) == emb.count()
    for r in s:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
        assert r["n_kept"] >= 1  # rank-1 of a non-empty cell always survives


def test_semdedup_salt_invariant(emb, centroids):
    """The skew-salting fan-out (n_salts) is a pure parallelism knob:
    every (l, r) pair matches exactly once regardless of salt count, so
    the verdicts are value-identical for n_salts=1 (salting disabled)
    and the default fan-out."""
    base = {
        r["vec_id"]: (r["ivf_cell"], r["sem_rank"], r["max_prior_sim"], r["keep"])
        for r in semantic_duplicates(emb, centroids, tau=0.8, n_salts=1).collect()
    }
    salted = {
        r["vec_id"]: (r["ivf_cell"], r["sem_rank"], r["max_prior_sim"], r["keep"])
        for r in semantic_duplicates(emb, centroids, tau=0.8, n_salts=8).collect()
    }
    assert base == salted

    with pytest.raises(ValueError, match="n_salts"):
        semantic_duplicates(emb, centroids, n_salts=0)
