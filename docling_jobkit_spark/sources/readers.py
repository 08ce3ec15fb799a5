"""Sources / scans (SURVEY §2.1).

The reference ships 7 per-store connectors (S3, local path, HTTP, Azure
Blob, GCS, GDrive, FileNet — ``connectors/plugins/defaults.py:16-45``)
that all implement the same list+fetch contract. On Spark they collapse
to table/path scans: Hadoop FS URIs (``s3a://``, ``abfss://``, ``gs://``)
plug into the SAME ``binaryFile``/parquet readers used here, so no
per-store code exists at all — the scheme in the path selects the store.

- ``scan_binary_files`` = S1/S2/S3/S5 (listing scan + fetch-by-ref +
  glob/recursive/junk-filter rules of
  ``connectors/local_path/source_processor.py:17-50,78-116``);
- ``union_sources`` = S6 multi-source expansion
  (``convert/source_expansion.py:12-39``);
- ``read_table`` = the Iceberg/parquet table scan (the north-rule input);
- ``pages_from_documents`` derives a deterministic pages table from the
  driver's ``documents`` testdata (JVM-side concat — used by the driver
  entry point so the flagship query runs on driver-provided inputs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's junk-file ignore rules (hidden files, Office lockfiles,
# Thumbs.db, .DS_Store — local_path/source_processor.py:17-50)
JUNK_FILE_PATTERN = r"(^|/)(\.[^/]*|~\$[^/]*|Thumbs\.db|desktop\.ini)$"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scan_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    max_file_size: int | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Directory/bucket scan → (path, modificationTime, length, content).

    The size gate is a relational predicate on the file length —
    evaluated from listing metadata, i.e. oversized files are never
    fetched (same contract as ``s3/source_processor.py:121-147``
    pre-checking size before download). ``limit`` = max_num_elements
    (``s3/source_processor.py:66-81``).
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path).filter(~F.col("path").rlike(JUNK_FILE_PATTERN))
    if max_file_size is not None:
        df = df.filter(F.col("length") <= max_file_size)
    if limit is not None:
        df = df.limit(limit)
    return df


def binary_files_as_pages(scanned: DataFrame) -> DataFrame:
    """binaryFile scan → the canonical pages schema."""
    return scanned.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def union_sources(sources: list[DataFrame]) -> DataFrame:
    """Multi-source expansion: heterogeneous source list → one DataFrame
    (``expand_task_sources`` analog). unionByName keeps it schema-safe."""
    if not sources:
        raise ValueError("at least one source required")
    return reduce(lambda a, b: a.unionByName(b), sources)


def pages_from_documents(
    spark: SparkSession, sf_dir: str, sectioned: bool = False
) -> DataFrame:
    """Deterministic pages table derived from the driver's ``documents``
    testdata: text wrapped in an article shell with nav/footer boilerplate,
    entirely with JVM string functions (no Python, no RNG).

    The '|'-separated sentence split gives multi-paragraph structure so the
    extractor has real block work to do.

    ``sectioned=True`` additionally inserts an ``<h2>`` heading every
    25 words — a heading-DENSE corpus variant whose section boundaries
    survive extraction mid-document, so the hierarchical chunker
    actually diverges from flat windowing on it (the default variant
    has exactly one ``<h1>`` at offset 0, where hierarchical
    degenerates to flat by definition; and the documents' text has no
    sentence punctuation, so the split is word-indexed). Built with an
    indexed ``F.transform`` over the word array — still pure JVM."""
    docs = read_table(spark, sf_dir, "documents")
    if sectioned:
        words = F.split(F.col("text"), " ")
        parts = F.transform(
            words,
            lambda w, i: F.concat(
                F.when(
                    (i > F.lit(0)) & (i % F.lit(25) == F.lit(0)),
                    F.concat(
                        F.lit("</p><h2>Section "),
                        (i / F.lit(25)).cast("int").cast("string"),
                        F.lit(" overview</h2><p>"),
                    ),
                )
                .when(i > F.lit(0), F.lit(" "))
                .otherwise(F.lit("")),
                w,
            ),
        )
        body = F.concat(F.lit("<p>"), F.concat_ws("", parts), F.lit("</p>"))
    else:
        body = F.concat(
            F.lit("<p>"),
            F.regexp_replace(F.col("text"), r"\. ", ".</p><p>"),
            F.lit("</p>"),
        )
    html = F.concat(
        F.lit(
            '<!DOCTYPE html><html><head><title>d</title><script>var a=1;</script>'
            '</head><body><nav><a href="/">home</a> <a href="/x">links</a> '
            '<a href="/y">more</a></nav><header><h1>site</h1></header><article><h1>'
        ),
        F.col("source"),
        F.lit(" document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>"),
        body,
        F.lit('</article><footer><a href="/l">legal</a> © corp</footer></body></html>'),
    )
    return docs.select(
        F.concat(
            F.lit("https://corpus.local/"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
