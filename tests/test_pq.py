"""Product quantization: the relational encode/ADC search must agree
code-for-code and distance-for-distance with a pure-Python reference
implementation (the executable spec), training must be deterministic,
and the codebook stamp must make mismatched searches fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _sq_l2(a, b):
    return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))


def _ref_encode(vec, codebooks):
    """Pure-Python reference: per subspace, argmin of the 6-rounded
    squared L2, FIRST minimum (lowest code) wins ties."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code = []
    for mi in range(m):
        sub = [float(x) for x in vec[mi * dsub : (mi + 1) * dsub]]
        dists = [round(_sq_l2(sub, c), 6) for c in codebooks[mi]]
        code.append(min(range(len(dists)), key=lambda i: (dists[i], i)))
    return code


def _ref_adc(code, lut):
    return round(sum(lut[mi][c] for mi, c in enumerate(code)), 6)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def books(emb):
    from docling_jobkit_spark.operators.pq import train_pq_codebooks

    return train_pq_codebooks(emb, m=8, ksub=16, n_iter=3, sample_n=256)


def test_training_is_deterministic(emb, books):
    from docling_jobkit_spark.operators.pq import train_pq_codebooks

    again = train_pq_codebooks(emb, m=8, ksub=16, n_iter=3, sample_n=256)
    assert books == again
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # dsub = 64/8


def test_spark_encode_matches_python_reference_exactly(spark, emb, books):
    from docling_jobkit_spark.operators.pq import pq_encode

    rows = (
        pq_encode(emb, books)
        .select("vec_id", "embedding", "pq_code")
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert list(r["pq_code"]) == _ref_encode(r["embedding"], books), r["vec_id"]


def test_adc_distances_match_python_reference(spark, emb, books):
    from docling_jobkit_spark.operators.pq import (
        adc_lookup_table,
        pq_encode,
        pq_topk,
    )

    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    lut = adc_lookup_table(q, books)
    encoded = pq_encode(emb, books)
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk(encoded, q, books, k=20).collect()
    }
    codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in encoded.select("vec_id", "pq_code").collect()
    }
    for vid, dist in got.items():
        assert dist == pytest.approx(_ref_adc(codes[vid], lut), abs=2e-6)
    # the query's own row quantizes to itself → ADC distance is the
    # quantization residual, and it must appear in the top-k
    assert 0 in got


def test_rerank_recall_beats_plain_adc(spark, emb, books):
    """Two-stage PQ (ADC shortlist + exact re-rank) must recover most of
    the exact top-k on the fixture — the property that makes the 50-100x
    smaller code column usable as the primary scan at scale."""
    from docling_jobkit_spark.operators.pq import pq_encode, pq_topk
    from docling_jobkit_spark.operators.similarity import brute_force_topk

    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    encoded = pq_encode(emb, books)
    got = {r["vec_id"] for r in pq_topk(encoded, q, books, k=10, rerank=50).collect()}
    recall = len(got & exact) / 10
    assert recall >= 0.5, recall


def test_stamp_survives_parquet_and_mismatch_raises(spark, emb, books, tmp_path):
    from docling_jobkit_spark.operators.pq import pq_encode, pq_topk

    path = str(tmp_path / "pq_table")
    pq_encode(emb, books).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    meta = {f.name: f.metadata for f in back.schema.fields}["pq_code"]
    assert meta.get("pq_m") == 8 and meta.get("pq_ksub") == 16

    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    assert pq_topk(back, q, books, k=5).count() == 5
    wrong = [[[x + 1.0 for x in c] for c in b] for b in books]
    with pytest.raises(ValueError, match="different PQ codebook"):
        pq_topk(back, q, wrong, k=5)
    with pytest.raises(ValueError, match="pq_code missing"):
        pq_topk(emb, q, books, k=5)


def test_ivf_pq_composed_layout_roundtrip(spark, emb, books, tmp_path):
    """The full at-scale layout: with_ivf_cells + pq_encode, written
    partitionBy(ivf_cell), read back, probed — results must equal the
    in-memory composition, both stamps must survive the roundtrip, and
    either wrong codebook must raise."""
    from docling_jobkit_spark.operators.pq import ivf_pq_topk, pq_encode, pq_topk
    from docling_jobkit_spark.operators.similarity import (
        kmeans_centroids,
        with_ivf_cells,
    )
    from pyspark.sql import functions as F

    cents = kmeans_centroids(emb, k=4, n_iter=3, sample_n=128)
    laid = pq_encode(with_ivf_cells(emb, cents), books)
    path = str(tmp_path / "ivf_pq_table")
    laid.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)
    back = spark.read.parquet(path)

    q = [float(x) for x in emb.filter("vec_id = 17").first()["embedding"]]
    got = ivf_pq_topk(back, q, cents, books, k=5, n_probe=2, rerank=25).collect()
    want = ivf_pq_topk(laid, q, cents, books, k=5, n_probe=2, rerank=25).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    # consistency with plain pq_topk over the probed subset
    from docling_jobkit_spark.operators.similarity import probe_cells

    probe = probe_cells(q, cents, 2)
    subset = laid.filter(F.col("ivf_cell").isin(probe))
    direct = pq_topk(subset, q, books, k=5, rerank=25).collect()
    assert [(r["vec_id"], r["cosine"]) for r in want] == [
        (r["vec_id"], r["cosine"]) for r in direct
    ]

    wrong_cents = [[x + 1.0 for x in c] for c in cents]
    with pytest.raises(ValueError, match="different IVF codebook"):
        ivf_pq_topk(back, q, wrong_cents, books, k=5)
    wrong_books = [[[x + 1.0 for x in c] for c in b] for b in books]
    with pytest.raises(ValueError, match="different PQ codebook"):
        ivf_pq_topk(back, q, cents, wrong_books, k=5)


def test_null_embedding_gets_null_code_and_is_filtered(spark, books):
    from docling_jobkit_spark.operators.pq import pq_encode, pq_topk

    df = spark.createDataFrame(
        [(0, [0.5] * 64), (1, None)], "vec_id long, embedding array<float>"
    )
    enc = pq_encode(df, books)
    rows = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert rows[1] is None and rows[0] is not None
    got = pq_topk(enc, [0.5] * 64, books, k=5).collect()
    assert [r["vec_id"] for r in got] == [0]
