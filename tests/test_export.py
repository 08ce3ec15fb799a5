"""Export projections (P1) + feature vector (P4) over extraction output."""

from __future__ import annotations

from docling_jobkit_spark.operators.export import document_features, export_documents
from docling_jobkit_spark.operators.extract_op import extract_documents


def test_markdown_export_marks_kinds(spark):
    html = (
        b"<body><article><h1>The Main Title</h1>"
        b"<p>First paragraph with a decent amount of content in it for scoring.</p>"
        b"<ul><li>item one of the list with enough text</li>"
        b"<li>item two of the list with enough text</li></ul>"
        b"<blockquote>a sufficiently long quoted passage of text here</blockquote>"
        b"</article></body>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    out = export_documents(
        extract_documents(df), formats=("md", "txt", "json")
    ).collect()[0]
    md = out["md"]
    assert "## The Main Title" in md
    assert "- item one" in md
    assert "> a sufficiently long quoted" in md
    assert out["txt"].startswith("The Main Title")
    assert '"url":"u1"' in out["json_doc"].replace(" ", "")


def test_document_features_counts(spark):
    html = (
        b"<body><h1>Heading Text Here</h1>"
        b"<p>Paragraph number one with plenty of content to be kept here.</p>"
        b"<p>Paragraph number two with plenty of content to be kept here.</p>"
        b"<table><tr><td>a table cell with enough text to score well</td>"
        b"<td>another table cell with enough text to score</td></tr></table></body>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    row = document_features(extract_documents(df)).collect()[0]
    assert row["n_heading"] == 1
    assert row["n_para"] == 2
    assert row["n_table"] == 2
    assert row["n_blocks"] == row["n_heading"] + row["n_para"] + row["n_table"]
    assert row["n_chars_out"] > 100
