"""Chunking — the explode-style UDTF (SURVEY §2.4 C1-C3).

Reference: ``DocumentChunkerManager.chunk_document``
(``convert/chunking.py:201-264``) produces per-document chunk lists with
contextualized text, token counts, headings, sorted-distinct page
numbers; failures propagate as zero chunks with FAILURE status
(``tests/test_chunking.py:75-101``).

Two Spark-first forms:

- **token-window chunker over extraction results** — pure Python logic on
  the already-extracted text, applied via mapInPandas (1 row → N chunk
  rows, the UDTF shape). Deterministic: whitespace tokens, fixed window/
  overlap, block-boundary metadata from the spans column; page numbers
  derived from PAGE_JOIN offsets, emitted sorted-distinct
  (``chunking.py:229-231`` analog = array_sort ∘ array_distinct).
- **fixed-width char chunker** — a pure relational posexplode(sequence)
  + substring, used where SQL-oracle checkability matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("num_tokens", T.IntegerType()),
        T.StructField("headings", T.ArrayType(T.StringType())),
        T.StructField("page_numbers", T.ArrayType(T.IntegerType())),
        T.StructField("status", T.StringType()),
    ]
)


def chunk_text(
    text: str,
    spans: list[dict] | None,
    max_tokens: int = 64,
    overlap: int = 8,
) -> list[dict]:
    """Deterministic token-window chunking of one document.

    Headings: the most recent heading span whose start precedes the
    chunk's first character (document-order context, the analog of the
    reference chunker's heading propagation). Page numbers: 1-based pages
    (PAGE_JOIN-delimited) overlapped by the chunk, sorted distinct.
    """
    from docling_jobkit_spark.extractor.extract import PAGE_JOIN

    if not text:
        return []
    # token offsets (start, end) in document order
    toks: list[tuple[int, int]] = []
    pos = 0
    for part in text.split():
        start = text.index(part, pos)
        toks.append((start, start + len(part)))
        pos = start + len(part)
    if not toks:
        return []

    # page boundary offsets
    page_starts = [0]
    idx = text.find(PAGE_JOIN)
    while idx != -1:
        page_starts.append(idx + len(PAGE_JOIN))
        idx = text.find(PAGE_JOIN, idx + 1)

    headings = sorted(
        (
            (int(s["start"]), text[int(s["start"]) : int(s["end"])])
            for s in (spans or [])
            if s.get("kind") == "heading"
        ),
    )

    step = max_tokens - overlap
    chunks = []
    ci = 0
    for t0 in range(0, len(toks), step):
        window = toks[t0 : t0 + max_tokens]
        lo, hi = window[0][0], window[-1][1]
        chunk_str = text[lo:hi]
        # all pages the chunk crosses (1-based), sorted distinct
        p_lo = sum(1 for p in page_starts if p <= lo)
        p_hi = sum(1 for p in page_starts if p <= hi - 1)
        pages = list(range(p_lo, p_hi + 1))
        hs = [h for off, h in headings if off <= lo]
        chunks.append(
            {
                "chunk_index": ci,
                "text": chunk_str,
                "num_tokens": len(window),
                "headings": hs[-1:],  # nearest preceding heading
                "page_numbers": pages,
            }
        )
        ci += 1
        if t0 + max_tokens >= len(toks):
            break
    return chunks


def _chunk_batches(
    batches: Iterator[pd.DataFrame], max_tokens: int, overlap: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "url", "chunk_index", "text", "num_tokens",
            "headings", "page_numbers", "status",
        )}
        for _, row in pdf.iterrows():
            status = row["status"]
            spans = row["spans"]
            spans = list(spans) if spans is not None else []
            if status == "FAILURE":
                # failure propagation: zero chunks (test_chunking.py:75-101)
                continue
            for ch in chunk_text(row["extracted_text"], spans, max_tokens, overlap):
                out["url"].append(row["url"])
                out["chunk_index"].append(ch["chunk_index"])
                out["text"].append(ch["text"])
                out["num_tokens"].append(ch["num_tokens"])
                out["headings"].append(ch["headings"])
                out["page_numbers"].append(ch["page_numbers"])
                out["status"].append(status)
        if out["url"]:
            # an all-filtered batch would make pandas infer float64 for the
            # list columns, which Arrow can't cast to list<string>
            yield pd.DataFrame(out)


def chunk_documents(
    results: DataFrame, max_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """Extraction results → chunk rows (1→N explode via mapInPandas)."""
    cols = results.select("url", "status", "extracted_text", "spans")
    return cols.mapInPandas(
        lambda it: _chunk_batches(it, max_tokens, overlap), schema=CHUNK_SCHEMA
    )


def char_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 100
) -> DataFrame:
    """Fixed-width char chunking — fully relational (posexplode+substring),
    SQL-oracle-checkable; the degenerate-but-scalable chunker."""
    # greatest(...,0) guard: Spark's sequence(0,-1) would generate a
    # DESCENDING sequence for empty docs instead of an empty one
    n_chunks = F.greatest(
        F.ceil(F.length(text_col) / F.lit(width)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "_i"),
        F.length(text_col).alias("n_chars_doc"),
        F.substring(F.col(text_col), F.col("_i") * width + 1, width).alias("chunk_text"),
    ).drop("_i").filter(F.length("chunk_text") > 0)
