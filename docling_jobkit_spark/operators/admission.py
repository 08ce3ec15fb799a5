"""Admission preflight — cheap filters BEFORE the expensive UDF.

Analog of ``convert/materialization.py:158-213`` (size / page-count gates
with typed errors). Catalyst will not reorder relational filters across an
opaque Python UDF (SURVEY §4), so this operator is applied explicitly
upstream of ``extract_documents``.

Two policies, as in the reference:
- ``admission_split`` routes violations to FAILURE rows (so the output
  keeps one row per input url — the reference returns a FAILURE result,
  it does not drop the document);
- callers that want to drop instead just use ``admitted`` and ignore
  ``rejected``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.extract_op import RESULT_SCHEMA


def admission_split(
    pages: DataFrame, max_bytes: int | None = None, max_pages: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Return (admitted_pages, rejected_results).

    ``rejected_results`` already has RESULT_SCHEMA (FAILURE rows with the
    POLICY/SOURCE_UNAVAILABLE error struct) and can be unioned with the
    extraction output. All gates — size, page count, non-empty — are pure
    relational predicates (the page count is a JVM-side marker split, see
    slices.page_count_col), so Catalyst pushes/prunes them freely. The
    reference preflight enforces BOTH max_file_size and max_num_pages
    (``convert/materialization.py:158-213``)."""
    from docling_jobkit_spark.operators.slices import page_count_col

    size_ok = F.lit(True) if max_bytes is None else (F.length("html") <= max_bytes)
    pages_ok = (
        F.lit(True) if max_pages is None else (page_count_col("html") <= max_pages)
    )
    nonempty = F.col("html").isNotNull() & (F.length("html") > 0)

    admitted = pages.filter(size_ok & pages_ok & nonempty)

    def _policy(message):
        return F.struct(
            F.lit("POLICY").alias("category"),
            message.alias("message"),
            F.lit(False).alias("retryable"),
            F.lit("admission").alias("phase"),
        )

    rejected = pages.filter(~(size_ok & pages_ok & nonempty)).select(
        F.col("url"),
        F.lit("FAILURE").alias("status"),
        F.lit("").alias("extracted_text"),
        F.expr("CAST(array() AS array<struct<start:bigint,end:bigint,kind:string,path:string>>)").alias("spans"),
        F.when(
            ~nonempty,
            F.struct(
                F.lit("SOURCE_UNAVAILABLE").alias("category"),
                F.lit("empty document").alias("message"),
                F.lit(False).alias("retryable"),
                F.lit("admission").alias("phase"),
            ),
        )
        .when(
            ~size_ok,
            _policy(
                F.concat(
                    F.lit("document size "),
                    F.length("html").cast("string"),
                    F.lit(f" exceeds max_file_size {max_bytes}"),
                )
            ),
        )
        .otherwise(
            _policy(
                F.concat(
                    F.lit("page count "),
                    page_count_col("html").cast("string"),
                    F.lit(f" exceeds max_num_pages {max_pages}"),
                )
            )
        )
        .alias("error"),
        F.lit(1).alias("n_pages"),
        F.coalesce(F.length("html").cast("long"), F.lit(0).cast("long")).alias("n_bytes"),
        F.lit(0).alias("n_spans"),
        F.expr("map()").cast("map<string,double>").alias("timings"),
    )
    # lock the exact schema (nullable binary edge cases), then stamp the
    # identity columns so rejected rows union cleanly with extraction
    # output (FAILURE rows: NULL hash, 0.0 confidence)
    from docling_jobkit_spark.operators.extract_op import with_document_identity

    rejected = rejected.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in RESULT_SCHEMA.fields]
    )
    return admitted, with_document_identity(rejected)
