"""Trained-merge BPE: determinism, classic-BPE semantics on a
hand-checkable corpus, and Spark-UDF == pure-python row equivalence."""

from __future__ import annotations

from docling_jobkit_spark.functions.bpe import (
    WORD_END,
    bpe_encode,
    bpe_token_count_col,
    count_tokens_text,
    train_bpe,
    train_bpe_from_df,
)


def test_train_bpe_hand_checkable():
    """'low low low lower lowest': the most frequent pairs merge in the
    classic order and 'low' collapses to a single token."""
    merges = train_bpe(["low low low lower lowest"], n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    # 'low' appears 5 times as a prefix — its internal pairs dominate
    assert ("l", "o") in ranks or ("o", "w") in ranks
    low = bpe_encode("low", ranks)
    assert "".join(low).replace(WORD_END, "") == "low"  # lossless
    assert len(low) <= 2  # merged far below the 4-symbol baseline
    # unseen characters degrade gracefully to character symbols
    assert "".join(bpe_encode("xyz", ranks)).replace(WORD_END, "") == "xyz"


def test_train_bpe_is_deterministic():
    corpus = ["spark engine data spark data engine", "data data spark"]
    m1 = train_bpe(corpus, n_merges=50)
    m2 = train_bpe(list(corpus), n_merges=50)
    assert m1 == m2
    # tie-break rule: equal-frequency pairs resolve lexicographically
    # smallest — training on a reordered corpus gives the same table
    m3 = train_bpe(corpus[::-1], n_merges=50)
    assert m1 == m3


def test_count_tokens_invariants():
    corpus = ["the engine shuffles the data", "the data engine"]
    merges = train_bpe(corpus, n_merges=100)
    ranks = {m: i for i, m in enumerate(merges)}
    for t in corpus:
        n = count_tokens_text(t, ranks)
        n_words = len(t.split())
        n_chars_plus_ends = len(t.replace(" ", "")) + n_words
        # each word is >= 1 token; merges can only reduce the
        # character-level baseline
        assert n_words <= n <= n_chars_plus_ends
    # trained merges genuinely compress vs character-level on seen text
    assert count_tokens_text("the the the", ranks) < len("thethethe") + 3
    assert count_tokens_text(None, ranks) == 0
    assert count_tokens_text("", ranks) == 0


def test_spark_udf_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    merges = train_bpe_from_df(docs, sample_rows=32, n_merges=64)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count_col(merges, "text").alias("n")
        ).collect()
    }
    want = {
        r["doc_id"]: count_tokens_text(r["text"], ranks)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want


def test_budgeted_chunker_cost1_equals_chunk_text():
    """chunk_text_budgeted with unit costs must reproduce chunk_text
    EXACTLY (same windows, same metadata) — the differential that pins
    the budget loop's window arithmetic to the flat chunker's."""
    from docling_jobkit_spark.operators.chunker import (
        chunk_text,
        chunk_text_budgeted,
    )

    text = "Head One " + " ".join(f"w{i}" for i in range(57))
    spans = [{"start": 0, "end": 8, "kind": "heading", "path": "h"}]
    flat = chunk_text(text, spans, max_tokens=8, overlap=2)
    budg = chunk_text_budgeted(text, spans, lambda w: 1, max_tokens=8, overlap=2)
    assert budg == flat


def test_budgeted_chunker_respects_bpe_budget():
    """With trained-BPE costs, every window's cost stays within the
    budget (single over-budget words get a window of their own), windows
    advance, and nothing is dropped."""
    from docling_jobkit_spark.operators.chunker import chunk_text_budgeted

    corpus = "alpha beta gamma delta " * 6
    merges = train_bpe([corpus], n_merges=6)  # partial merges only
    ranks = {m: i for i, m in enumerate(merges)}

    def cost(w):
        return len(bpe_encode(w, ranks))

    text = corpus.strip()
    chunks = chunk_text_budgeted(text, [], cost, max_tokens=10, overlap=1)
    assert len(chunks) > 1
    for c in chunks:
        words = c["raw_text"].split()
        got = sum(cost(w) for w in words)
        assert got == c["num_tokens"]
        assert got <= 10 or len(words) == 1
    # full coverage: every word of the doc appears in some window
    seen = set()
    for c in chunks:
        seen.update(c["raw_text"].split())
    assert seen == set(text.split())


def test_chunk_documents_budgeted_mode(spark, sf_dir):
    from docling_jobkit_spark.operators.chunker import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(16)
    merges = train_bpe_from_df(docs, sample_rows=16, n_merges=24)
    rows = [
        ("u1", "SUCCESS", "Head One " + " ".join(f"w{i}" for i in range(30)),
         [{"start": 0, "end": 8, "kind": "heading", "path": "h"}]),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, status string, extracted_text string, "
        "spans array<struct<start:long,end:long,kind:string,path:string>>",
    )
    out = chunk_documents(
        df, max_tokens=16, overlap=2, mode="budgeted", merges=merges
    ).collect()
    assert out and all(r["num_tokens"] <= 16 for r in out)
    import pytest

    with pytest.raises(ValueError, match="requires a trained merges"):
        chunk_documents(df, mode="budgeted")


def test_train_bpe_from_df_deterministic_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = train_bpe_from_df(docs, sample_rows=64, n_merges=32)
    # a different partitioning must not change the ordered sample
    m2 = train_bpe_from_df(docs.repartition(7), sample_rows=64, n_merges=32)
    assert m1 == m2 and len(m1) == 32
