"""The flagship per-document map as a Spark operator.

Re-expresses the reference's ``convert_documents``
(``docling_jobkit/convert/manager.py:1725-1745``) + per-batch worker
(``cli/multiproc.py:247-368``) as ONE ``mapInPandas`` over the pages
table. Design points, each mapped to reference behavior:

- **Arrow-batched, no per-row Python at the Spark boundary** — the
  iterator-of-DataFrames form streams Arrow batches through a generator,
  the same laziness as the reference's one-doc-in-flight generator
  (``convert/chunk_execution.py:44-71``); batch size is capped in
  session.py for binary payloads.
- **Init-once-per-worker** — the reference LRU-caches expensive converter
  objects keyed by an options hash (``convert/manager.py:369-479``). Our
  extractor is a pure function so the only per-worker state is the
  compiled regexes, imported once per Python worker process.
- **Failures are rows** — per-document try/except inside ``extract()``
  yields an ``error`` struct column; a malformed page can never fail the
  Spark task (``serve_deployment.py:1590-1627`` degrade precedent).
- **Per-partition metrics rows** — emitted via a companion operator in
  metrics.py (the reference's ``BatchResult``, ``cli/multiproc.py:54-63``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    pass

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("path", T.StringType()),
        ]
    )
)

ERROR_TYPE = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("retryable", T.BooleanType()),
        T.StructField("phase", T.StringType()),
    ]
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("error", ERROR_TYPE),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("timings", T.MapType(T.StringType(), T.DoubleType())),
    ]
)

# document-identity columns stamped ON TOP of RESULT_SCHEMA by every
# extraction operator (the reference's ExportableDocument carries
# document_hash + confidence, ``datamodel/exportable_document.py:53-122``)
FULL_RESULT_SCHEMA = T.StructType(
    [
        *RESULT_SCHEMA.fields,
        T.StructField("content_hash", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def with_document_identity(results: DataFrame) -> DataFrame:
    """Stamp the canonical dedup key + a confidence proxy onto extraction
    results (ref ``exportable_document.py:53-122``: document_hash,
    confidence ride in the result payload):

    - ``content_hash``: THE canonical dedup key — the same normalized
      sha256 every dedup/curation operator uses (functions.scalar), so
      downstream dedup consumes the stamped column instead of
      re-normalizing corpus-scale text. NULL for FAILURE rows: failed
      docs all have empty text and must not collapse into one group.
    - ``confidence``: extracted-to-input character density, clipped to
      [0,1] — a deterministic proxy for the reference's model-derived
      confidence (boilerplate-heavy or barely-parsed pages score low).
      0.0 for FAILURE rows.

    A pure codegen projection over the FINAL rows, so the sliced and
    single-shot paths stamp byte-identical values by construction."""
    from pyspark.sql import functions as F

    from docling_jobkit_spark.functions.scalar import content_hash

    failed = F.col("status") == "FAILURE"
    density = F.least(
        F.lit(1.0),
        F.length("extracted_text").cast("double")
        / F.greatest(F.col("n_bytes"), F.lit(1)).cast("double"),
    )
    return results.withColumn(
        "content_hash",
        F.when(failed, F.lit(None).cast("string")).otherwise(
            content_hash("extracted_text")
        ),
    ).withColumn(
        "confidence",
        F.when(failed, F.lit(0.0)).otherwise(F.round(density, 6)),
    )


def _extract_batches(
    batches: Iterator[pd.DataFrame], max_bytes: int | None, profile: str
) -> Iterator[pd.DataFrame]:
    # import inside the worker so the function closure stays tiny when
    # pickled to executors (standard pandas-UDF pattern); the profile
    # travels as its NAME and resolves once per worker — the analog of
    # the reference's options-hash converter cache (manager.py:369-479)
    from docling_jobkit_spark.extractor.extract import PROFILES, extract

    prof = PROFILES[profile]

    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        out: dict[str, list] = {
            "url": [], "status": [], "extracted_text": [], "spans": [],
            "error": [], "n_pages": [], "n_bytes": [], "n_spans": [],
            "timings": [],
        }
        for url, html in zip(urls, htmls):
            payload = bytes(html) if html is not None else None
            res = extract(payload, url, max_bytes=max_bytes, profile=prof)
            out["url"].append(url)
            out["status"].append(res.status)
            out["extracted_text"].append(res.text)
            # Span is a NamedTuple: pyarrow converts tuples to struct
            # values directly — no per-span dict materialization
            out["spans"].append(res.spans)
            out["error"].append(res.error.as_dict() if res.error else None)
            out["n_pages"].append(res.n_pages)
            out["n_bytes"].append(len(payload) if payload is not None else 0)
            out["n_spans"].append(len(res.spans))
            out["timings"].append(res.timings)
        yield pd.DataFrame(out)


def extract_documents(
    pages: DataFrame,
    max_bytes: int | None = None,
    profile: str = "default",
) -> DataFrame:
    """pages(url, html, ...) → results(RESULT_SCHEMA).

    Column pruning: only (url, html) cross the Arrow boundary — Catalyst
    prunes the parquet scan down to those two columns (verify with
    ``.explain``: ReadSchema contains url,html only). Output carries the
    document-identity columns (FULL_RESULT_SCHEMA).
    """
    pruned = pages.select("url", "html")
    mapped = pruned.mapInPandas(
        lambda it: _extract_batches(it, max_bytes, profile), schema=RESULT_SCHEMA
    )
    return with_document_identity(mapped)


def _extract_pdf_batches(
    batches: Iterator[pd.DataFrame],
    max_bytes: int | None,
    payload_col: str,
    auto: bool,
    profile: str,
) -> Iterator[pd.DataFrame]:
    from docling_jobkit_spark.extractor.extract import PROFILES, extract
    from docling_jobkit_spark.extractor.pdf import extract_pdf, is_pdf

    prof = PROFILES[profile]
    for batch in batches:
        urls = batch["url"].tolist()
        payloads = batch[payload_col].tolist()
        out: dict[str, list] = {
            "url": [], "status": [], "extracted_text": [], "spans": [],
            "error": [], "n_pages": [], "n_bytes": [], "n_spans": [],
            "timings": [],
        }
        for url, raw in zip(urls, payloads):
            payload = bytes(raw) if raw is not None else None
            if auto and not (payload is not None and is_pdf(payload)):
                res = extract(payload, url, max_bytes=max_bytes, profile=prof)
            else:
                res = extract_pdf(payload, url, max_bytes=max_bytes)
            out["url"].append(url)
            out["status"].append(res.status)
            out["extracted_text"].append(res.text)
            out["spans"].append(res.spans)
            out["error"].append(res.error.as_dict() if res.error else None)
            out["n_pages"].append(res.n_pages)
            out["n_bytes"].append(len(payload) if payload is not None else 0)
            out["n_spans"].append(len(res.spans))
            out["timings"].append(res.timings)
        yield pd.DataFrame(out)


def extract_pdf_documents(
    pages: DataFrame,
    max_bytes: int | None = None,
    payload_col: str = "pdf",
) -> DataFrame:
    """pages(url, <payload_col>) → results(FULL_RESULT_SCHEMA) through the
    from-scratch PDF layout extractor (extractor/pdf.py — the analog of
    the reference's PDF pipeline selection, ``convert/manager.py:
    1672-1723``). Same operator shape as ``extract_documents``: Arrow
    batches, column-pruned scan, failures as rows."""
    pruned = pages.select("url", payload_col)
    mapped = pruned.mapInPandas(
        lambda it: _extract_pdf_batches(it, max_bytes, payload_col, False, "default"),
        schema=RESULT_SCHEMA,
    )
    return with_document_identity(mapped)


def extract_documents_auto(
    pages: DataFrame,
    max_bytes: int | None = None,
    payload_col: str = "html",
    profile: str = "default",
) -> DataFrame:
    """Mixed-corpus flagship map: per-row content sniff routes each
    payload to the PDF extractor (``%PDF-`` magic within the first 1 KB)
    or the HTML extractor — the reference's per-document backend
    selection (``convert/manager.py:1554-1565``) re-expressed as one
    format-dispatching ``mapInPandas`` so a crawl table whose binary
    column mixes formats converts in a single pass."""
    pruned = pages.select("url", payload_col)
    mapped = pruned.mapInPandas(
        lambda it: _extract_pdf_batches(it, max_bytes, payload_col, True, profile),
        schema=RESULT_SCHEMA,
    )
    return with_document_identity(mapped)
