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
    pages: DataFrame, max_bytes: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Return (admitted_pages, rejected_results).

    ``rejected_results`` already has RESULT_SCHEMA (FAILURE rows with the
    POLICY/SOURCE_UNAVAILABLE error struct) and can be unioned with the
    extraction output. Both filters are pure relational predicates —
    pushed into the parquet scan by Catalyst.
    """
    size_ok = F.lit(True) if max_bytes is None else (F.length("html") <= max_bytes)
    nonempty = F.col("html").isNotNull() & (F.length("html") > 0)

    admitted = pages.filter(size_ok & nonempty)

    rejected = pages.filter(~(size_ok & nonempty)).select(
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
        .otherwise(
            F.struct(
                F.lit("POLICY").alias("category"),
                F.concat(
                    F.lit("document size "),
                    F.length("html").cast("string"),
                    F.lit(f" exceeds max_file_size {max_bytes}"),
                ).alias("message"),
                F.lit(False).alias("retryable"),
                F.lit("admission").alias("phase"),
            )
        )
        .alias("error"),
        F.lit(1).alias("n_pages"),
        F.coalesce(F.length("html").cast("long"), F.lit(0).cast("long")).alias("n_bytes"),
        F.lit(0).alias("n_spans"),
        F.expr("map()").cast("map<string,double>").alias("timings"),
    )
    # lock the exact schema (nullable binary edge cases)
    rejected = rejected.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in RESULT_SCHEMA.fields]
    )
    return admitted, rejected
