"""Persisted IVF vector index (operators/ivf_index.py): layout
roundtrip, append==rebuild, codebook-stamp enforcement, maintenance
report arithmetic, and partition pruning surviving appends."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.ivf_index import (
    append_ivf_index,
    ivf_index_report,
    read_ivf_index,
    write_ivf_index,
)
from docling_jobkit_spark.operators.similarity import (
    deterministic_centroids,
    ivf_topk_presigned,
    with_ivf_cells,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def centroids(emb):
    return deterministic_centroids(emb, k=4)


@pytest.fixture(scope="module")
def index_dir(spark, emb, centroids, tmp_path_factory):
    """Index built incrementally: write the even half, append the odd
    half — every test below sees the post-append state."""
    path = str(tmp_path_factory.mktemp("ivf_idx") / "index")
    write_ivf_index(emb.where(F.col("vec_id") % 2 == 0), path, centroids)
    append_ivf_index(
        spark, emb.where(F.col("vec_id") % 2 == 1), path, centroids
    )
    return path


def _query_vec(emb):
    row = emb.orderBy("vec_id").select("embedding").first()
    return [float(x) for x in row["embedding"]]


def test_append_equals_rebuild(spark, emb, centroids, index_dir, tmp_path):
    """write(batch1) + append(batch2) must read back value-identical to
    write(batch1 ∪ batch2) — incremental maintenance is a pure layout
    operation."""
    full = str(tmp_path / "full")
    write_ivf_index(emb, full, centroids)

    def snap(path):
        return {
            (r["vec_id"], int(r["ivf_cell"]), tuple(r["embedding"]))
            for r in read_ivf_index(spark, path).collect()
        }

    assert snap(index_dir) == snap(full)
    assert len(snap(index_dir)) == emb.count()


def test_probe_matches_in_memory_presigned(spark, emb, centroids, index_dir):
    """ivf_topk_presigned over the read-back incremental index returns
    exactly what it returns over the in-memory with_ivf_cells frame —
    the stamp survives the partitioned write + append."""
    q = _query_vec(emb)
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_presigned(
            read_ivf_index(spark, index_dir), q, centroids, k=5, n_probe=2
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_presigned(
            with_ivf_cells(emb, centroids), q, centroids, k=5, n_probe=2
        ).collect()
    ]
    assert got == want and len(got) == 5


def test_append_foreign_codebook_raises(spark, emb, centroids, index_dir):
    retrained = [[x + 0.25 for x in c] for c in centroids]
    with pytest.raises(ValueError, match="codebook mismatch"):
        append_ivf_index(spark, emb.limit(5), index_dir, retrained)
    k8 = deterministic_centroids(emb, k=8)
    with pytest.raises(ValueError, match="codebook mismatch"):
        append_ivf_index(spark, emb.limit(5), index_dir, k8)


def test_read_unstamped_layout_raises(spark, emb, centroids, tmp_path):
    bare = str(tmp_path / "bare")
    # same shape, no stamp: a foreign parquet dir must refuse to serve
    emb.withColumn("ivf_cell", F.lit(0)).write.partitionBy("ivf_cell").parquet(
        bare
    )
    with pytest.raises(ValueError, match="no codebook stamp"):
        read_ivf_index(spark, bare)
    with pytest.raises(ValueError, match="no codebook stamp"):
        ivf_index_report(spark, bare)


def test_report_arithmetic(spark, emb, centroids, index_dir):
    rep = {r["ivf_cell"]: r for r in ivf_index_report(spark, index_dir).collect()}
    want = {
        r["ivf_cell"]: r["count"]
        for r in read_ivf_index(spark, index_dir)
        .groupBy("ivf_cell")
        .count()
        .collect()
    }
    assert {c: r["n_vectors"] for c, r in rep.items()} == want
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 1e-4
    # uniform-ish synthetic cells: nothing 4x above uniform
    assert not any(r["hot"] for r in rep.values())
    # a planted hot cell flips the flag
    hot = ivf_index_report(spark, index_dir, hot_factor=0.5)
    assert any(r["hot"] for r in hot.collect())


def test_report_centroid_sim_and_mismatch(spark, emb, centroids, index_dir):
    rep = ivf_index_report(spark, index_dir, centroids=centroids).collect()
    for r in rep:
        if r["ivf_cell"] >= 0:
            assert r["min_centroid_sim"] <= r["mean_centroid_sim"] <= 1.0
    with pytest.raises(ValueError, match="codebook mismatch"):
        ivf_index_report(
            spark, index_dir, centroids=[[x + 1.0 for x in c] for c in centroids]
        )


def test_pruning_survives_append(spark, emb, centroids, index_dir):
    """The probe over the incrementally-built index still prunes at the
    file listing: the scan's PartitionFilters carry the cell IN-list."""
    q = _query_vec(emb)
    plan = (
        ivf_topk_presigned(
            read_ivf_index(spark, index_dir), q, centroids, k=5, n_probe=2
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("ivf_cell" in f for f in pf)
