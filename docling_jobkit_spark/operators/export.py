"""Multi-format export projections (SURVEY §2.5 P1, §2.5 P4).

The reference derives md/html/txt/json/doctags columns per document from
the converted payload (``convert/results.py:210-251``,
``convert/export.py:43-211``) and a per-document feature vector (counts
of texts/tables/pictures..., ``convert/results_processor.py:289-370``).

Spark-first: every export is a pure projection over (extracted_text,
spans) built from higher-order functions — JVM-side, codegen, zero
Python. Column pruning makes unrequested formats free (the reference's
"compute only requested formats" loop is just ``select``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MD_PREFIX = {
    "heading": "## ",
    "list": "- ",
    "quote": "> ",
    "table": "| ",
    "caption": "*",
}


def markdown_col() -> Column:
    """Markdown rendering: each span's slice of extracted_text prefixed
    by its block kind's marker, joined by blank lines."""
    def render(s):
        body = F.substring(
            F.col("extracted_text"),
            (s.start + 1).cast("int"),
            (s.end - s.start).cast("int"),
        )
        prefix = F.lit("")
        for kind, p in _MD_PREFIX.items():
            prefix = F.when(s.kind == kind, F.lit(p)).otherwise(prefix)
        suffix = F.when(s.kind == "caption", F.lit("*")).otherwise(F.lit(""))
        return F.concat(prefix, body, suffix)

    return F.array_join(F.transform(F.col("spans"), render), "\n\n")


def plain_text_col() -> Column:
    return F.col("extracted_text")


def _escape_html(c: Column) -> Column:
    """Minimal HTML entity escaping (&, <, > — amp first), JVM-side."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _escape_attr(c: Column) -> Column:
    """Attribute-position escaping: body entities plus the quote char —
    a path containing '\"' or '>' must not break out of the attribute."""
    return F.regexp_replace(_escape_html(c), '"', "&quot;")


_HTML_TAG = {
    "heading": "h2",
    "para": "p",
    "list": "li",
    "quote": "blockquote",
    "table": "table",
    "pre": "pre",
    "caption": "figcaption",
}


def _span_body(s) -> Column:
    return F.substring(
        F.col("extracted_text"),
        (s.start + 1).cast("int"),
        (s.end - s.start).cast("int"),
    )


def html_col() -> Column:
    """HTML rendering (ref export family ``convert/results.py:234-248``):
    each span's slice wrapped in its block kind's element, entity-escaped,
    newline-joined. Same pure-projection shape as markdown_col — an
    unrequested format costs nothing (column pruning)."""
    def render(s):
        body = _escape_html(_span_body(s))
        tag = F.lit("p")
        for kind, t in _HTML_TAG.items():
            tag = F.when(s.kind == kind, F.lit(t)).otherwise(tag)
        return F.concat(F.lit("<"), tag, F.lit(">"), body, F.lit("</"), tag, F.lit(">"))

    return F.array_join(F.transform(F.col("spans"), render), "\n")


def doctags_col() -> Column:
    """Doctags-style rendering: one tag per block carrying its kind, char
    offsets, and structural path — the lossless span serialization (the
    analog of the reference's doctags export, which preserves layout
    provenance alongside text)."""
    def render(s):
        body = _escape_html(_span_body(s))
        # kind is constrained to the known block vocabulary (html_col's
        # discipline): anything unexpected renders as a neutral "block"
        # tag instead of interpolating free text into tag position
        tag = F.lit("block")
        for kind in _HTML_TAG:
            tag = F.when(s.kind == kind, s.kind).otherwise(tag)
        return F.concat(
            F.lit("<"), tag,
            F.lit(' loc="'), s.start.cast("string"), F.lit(":"), s.end.cast("string"),
            F.lit('" path="'), _escape_attr(s.path), F.lit('">'),
            body,
            F.lit("</"), tag, F.lit(">"),
        )

    return F.array_join(F.transform(F.col("spans"), render), "\n")


def json_doc_col() -> Column:
    """The reference stores the full document payload as a JSON string
    (``results_processor.py:348``)."""
    return F.to_json(
        F.struct(
            F.col("url"), F.col("status"), F.col("extracted_text"), F.col("spans")
        )
    )


def feature_counts() -> list[Column]:
    """P4 feature vector: per-kind span counts + sizes (the analog of
    the reference's texts/tables/pictures counters)."""
    def count_kind(k: str) -> Column:
        return F.size(F.filter(F.col("spans"), lambda s: s.kind == k)).alias(
            f"n_{k}"
        )

    return [
        count_kind("heading"),
        count_kind("para"),
        count_kind("list"),
        count_kind("table"),
        count_kind("quote"),
        F.length("extracted_text").alias("n_chars_out"),
        F.size("spans").alias("n_blocks"),
    ]


def export_documents(results: DataFrame, formats: tuple[str, ...] = ("md", "txt")) -> DataFrame:
    """results → one column per requested export format (the reference
    exports json/html/txt/md/doctags, ``convert/results.py:234-248``)."""
    cols = [F.col("url"), F.col("status")]
    if "md" in formats:
        cols.append(markdown_col().alias("md"))
    if "txt" in formats:
        cols.append(plain_text_col().alias("txt"))
    if "json" in formats:
        cols.append(json_doc_col().alias("json_doc"))
    if "html" in formats:
        cols.append(html_col().alias("html_doc"))
    if "doctags" in formats:
        cols.append(doctags_col().alias("doctags"))
    return results.select(*cols)


def document_features(results: DataFrame) -> DataFrame:
    return results.select(F.col("url"), F.col("status"), *feature_counts())
