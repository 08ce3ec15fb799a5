"""Embedding preprocessing (operators/embedding_prep.py): distributed
moments vs a straight numpy reference, whitening achieves identity
covariance, ragged rows become NULL projections."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.embedding_prep import (
    apply_whitening,
    moment_stats,
    whiten_report,
    whitening_matrix,
)


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def ref(embs):
    rows = sorted(
        embs.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    return np.asarray([r.embedding for r in rows], dtype=np.float64)


def test_moment_stats_match_numpy(embs, ref):
    stats = moment_stats(embs)
    assert stats.n == ref.shape[0]
    np.testing.assert_allclose(stats.mean, ref.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(
        stats.cov, np.cov(ref, rowvar=False, bias=True), rtol=0, atol=1e-9
    )


def test_moment_stats_partitioning_invariant(embs):
    a = moment_stats(embs.repartition(3))
    b = moment_stats(embs.repartition(11))
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-11)
    np.testing.assert_allclose(a.cov, b.cov, rtol=0, atol=1e-10)


def test_whitening_yields_identity_covariance(embs, ref):
    stats = moment_stats(embs)
    w = whitening_matrix(stats)
    y = (ref - stats.mean) @ w
    cov = np.cov(y, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, np.eye(w.shape[1]), atol=1e-3)


def test_whitening_matrix_sign_fixed_and_truncates(embs):
    stats = moment_stats(embs)
    w8 = whitening_matrix(stats, n_components=8)
    assert w8.shape == (stats.cov.shape[0], 8)
    # sign convention: largest-|entry| of each column is positive
    for j in range(w8.shape[1]):
        col = w8[:, j]
        assert col[np.argmax(np.abs(col))] > 0
    # truncation is a prefix of the full transform
    w_full = whitening_matrix(stats)
    np.testing.assert_allclose(w8, w_full[:, :8], rtol=1e-12)


def test_apply_whitening_matches_driver_math_and_nulls_ragged(spark, embs, ref):
    stats = moment_stats(embs)
    w = whitening_matrix(stats, n_components=4)
    out = (
        apply_whitening(embs, stats, w)
        .select("vec_id", "whitened")
        .orderBy("vec_id")
        .collect()
    )
    got = np.asarray([r.whitened for r in out], dtype=np.float64)
    # out is ordered by vec_id; ref is built in vec_id order
    want = (ref - stats.mean) @ w
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)

    ragged = embs.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 == 0, F.slice("embedding", 1, 3))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    rows = (
        apply_whitening(ragged, stats, w)
        .select("vec_id", "whitened")
        .collect()
    )
    for r in rows:
        if r.vec_id % 5 == 0:
            assert r.whitened is None
        else:
            assert r.whitened is not None and len(r.whitened) == 4


def test_whiten_report_components(embs):
    rep = whiten_report(embs, n_components=16).collect()
    assert [r.component for r in rep] == list(range(16))
    eigs = [r.eigenvalue for r in rep]
    assert eigs == sorted(eigs, reverse=True)
    for r in rep:
        assert r.whitened_var == pytest.approx(1.0, abs=5e-3)
