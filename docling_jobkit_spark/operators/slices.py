"""Page-slice fan-out + reassembly (F1/F2 in SURVEY §2.3).

The reference splits huge PDFs into page ranges, converts slices
concurrently, and reassembles in slice order:
- slice plan: ``orchestrators/ray/serve_deployment.py:437-464``;
- dispatch: ``:1656-1725``; reassembly (sort by slice_index, concat,
  status = SUCCESS iff all slices SUCCESS else PARTIAL, errors merged):
  ``:510-549``.

Spark-first re-expression:
- the slice plan is a JVM-side ``posexplode(sequence(...))`` — one row per
  (url, slice_index, page_lo, page_hi); no Python, no driver loop;
- slice extraction reuses the same ``extract_page_range`` pure function;
- reassembly is an ``applyInPandas`` group-by url — the direct analog of
  ``_assemble_slice_results``, and provably byte-equal to single-shot
  extraction because ``extract()`` DEFINES full-document text as the
  page-wise join (see extract.py docstring).

At 100 TB the point of this operator is wall-time skew: a 400-page
document would pin one task for minutes; exploded, its slices run on many
cores. Only oversized documents are routed here (``extract_documents_sliced``),
so the groupBy shuffle touches a small fraction of rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_jobkit_spark.operators.extract_op import (
    ERROR_TYPE,
    RESULT_SCHEMA,
    SPAN_TYPE,
    extract_documents,
)

SLICE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("slice_index", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("error", ERROR_TYPE),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("timings", T.MapType(T.StringType(), T.DoubleType())),
    ]
)

_PAGE_COUNT_SCHEMA = T.IntegerType()


@F.pandas_udf(_PAGE_COUNT_SCHEMA)
def page_count_udf(html: pd.Series) -> pd.Series:
    """Vectorized page counter (marker occurrences + 1)."""
    marker = b"<!--PAGE_BREAK-->"
    return html.map(lambda b: (bytes(b).count(marker) + 1) if b is not None else 0).astype("int32")


def with_page_count(pages: DataFrame) -> DataFrame:
    return pages.withColumn("n_pages", page_count_udf("html"))


def explode_slices(pages_with_count: DataFrame, pages_per_slice: int) -> DataFrame:
    """(url, html, n_pages) → one row per slice with page bounds.

    Pure relational explode — the slice plan never touches Python.
    """
    k = pages_per_slice
    n_slices = F.ceil(F.col("n_pages") / F.lit(k)).cast("int")
    return (
        pages_with_count.withColumn(
            "slice_index", F.explode(F.sequence(F.lit(1), n_slices))
        )
        .withColumn("page_lo", (F.col("slice_index") - 1) * k + 1)
        .withColumn(
            "page_hi", F.least(F.col("slice_index") * k, F.col("n_pages"))
        )
    )


def _extract_slice_batches(
    batches: Iterator[pd.DataFrame], profile: str = "default"
) -> Iterator[pd.DataFrame]:
    from docling_jobkit_spark.extractor.extract import PROFILES, extract_page_range
    from docling_jobkit_spark.extractor.errors import classify_failure

    prof = PROFILES[profile]

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "url", "slice_index", "status", "extracted_text",
            "spans", "error", "n_pages", "n_bytes", "timings",
        )}
        for url, html, sidx, lo, hi in zip(
            pdf["url"], pdf["html"], pdf["slice_index"], pdf["page_lo"], pdf["page_hi"]
        ):
            payload = bytes(html)
            try:
                import time as _time

                t0 = _time.perf_counter()
                text, spans, n_pages = extract_page_range(payload, int(lo), int(hi), prof)
                out["timings"].append({"extract": _time.perf_counter() - t0})
                try:
                    payload.decode("utf-8", errors="strict")
                    clean = True
                except UnicodeDecodeError:
                    clean = False
                out["status"].append("SUCCESS" if clean else "PARTIAL_SUCCESS")
                out["extracted_text"].append(text)
                out["spans"].append([s.as_dict() for s in spans])
                out["error"].append(None)
                out["n_pages"].append(n_pages)
            except Exception as exc:
                out["status"].append("FAILURE")
                out["extracted_text"].append("")
                out["spans"].append([])
                out["error"].append(classify_failure(exc).as_dict())
                out["n_pages"].append(0)
                out["timings"].append({})
            out["url"].append(url)
            out["slice_index"].append(int(sidx))
            out["n_bytes"].append(len(payload))
        yield pd.DataFrame(out)


def extract_slices(slices: DataFrame, profile: str = "default") -> DataFrame:
    cols = slices.select("url", "html", "slice_index", "page_lo", "page_hi")
    return cols.mapInPandas(
        lambda it: _extract_slice_batches(it, profile), schema=SLICE_RESULT_SCHEMA
    )


def _reassemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the reference's ``_assemble_slice_results``: sort by
    slice_index, join texts with the page separator, shift span offsets,
    SUCCESS iff every slice SUCCESS (else PARTIAL; FAILURE if all failed)."""
    from docling_jobkit_spark.extractor.extract import PAGE_JOIN

    pdf = pdf.sort_values("slice_index")
    parts: list[str] = []
    spans: list[dict] = []
    offset = 0
    statuses = list(pdf["status"])
    first_error = None
    merged_timings: dict[str, float] = {}
    for _, row in pdf.iterrows():
        if row["status"] == "FAILURE":
            err = row["error"]
            if first_error is None and err is not None:
                first_error = err
            continue
        if parts:
            offset += len(PAGE_JOIN)
        row_spans = row["spans"]
        if row_spans is None:
            row_spans = []
        for s in row_spans:
            spans.append(
                {
                    "start": int(s["start"]) + offset,
                    "end": int(s["end"]) + offset,
                    "kind": s["kind"],
                    "path": s["path"],
                }
            )
        row_t = row["timings"]
        if row_t is not None:
            # F3 map-merge: sum per stage across slices
            for k, v in dict(row_t).items():
                merged_timings[k] = merged_timings.get(k, 0.0) + float(v)
        parts.append(row["extracted_text"])
        offset += len(row["extracted_text"])
    if all(s == "FAILURE" for s in statuses):
        status = "FAILURE"
    elif all(s == "SUCCESS" for s in statuses):
        status = "SUCCESS"
    else:
        status = "PARTIAL_SUCCESS"
    text = PAGE_JOIN.join(parts)
    if status == "SUCCESS" and not text:
        status = "PARTIAL_SUCCESS"
    return pd.DataFrame(
        {
            "url": [pdf["url"].iloc[0]],
            "status": [status],
            "extracted_text": [text],
            "spans": [spans],
            "error": [first_error],
            "n_pages": [int(pdf["n_pages"].max())],
            "n_bytes": [int(pdf["n_bytes"].iloc[0])],
            "n_spans": [len(spans)],
            "timings": [merged_timings],
        }
    )


def reassemble_slices(slice_results: DataFrame) -> DataFrame:
    return slice_results.groupBy("url").applyInPandas(
        _reassemble_group, schema=RESULT_SCHEMA
    )


def extract_documents_sliced(
    pages: DataFrame,
    pages_per_slice: int = 2,
    slice_min_pages: int = 3,
    max_bytes: int | None = None,
    profile: str = "default",
) -> DataFrame:
    """Route: multi-page docs above the slice threshold go through
    explode → slice-extract → reassemble; everything else takes the
    direct single-shot map. Output schema identical either way, and the
    values are byte-identical by construction."""
    counted = with_page_count(pages)
    big = counted.filter(F.col("n_pages") >= slice_min_pages)
    small = counted.filter(F.col("n_pages") < slice_min_pages).drop("n_pages")

    direct = extract_documents(small, max_bytes=max_bytes, profile=profile)
    sliced = reassemble_slices(
        extract_slices(explode_slices(big, pages_per_slice), profile)
    )
    return direct.unionByName(sliced)
