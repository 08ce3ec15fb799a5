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


def test_html_and_doctags_export(spark):
    html = (
        b"<body><h1>The Main Title</h1>"
        b"<p>A paragraph with 5 < 7 &amp; plenty of body text to keep.</p></body>"
    )
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    out = export_documents(
        extract_documents(df), formats=("html", "doctags")
    ).collect()[0]
    assert "<h2>The Main Title</h2>" in out["html_doc"]
    assert "<p>" in out["html_doc"] and "</p>" in out["html_doc"]
    # entity escaping: raw < in extracted text must not survive unescaped
    assert "5 &lt; 7" in out["html_doc"]
    assert "&amp;" in out["html_doc"]
    # doctags: kind tags with char offsets + structural path
    assert out["doctags"].startswith('<heading loc="0:')
    assert 'path="' in out["doctags"]
    assert "</para>" in out["doctags"]


def test_chunk_contextualization_and_metadata(spark):
    """Ref chunking.py:236-262: heading context prepended into chunk text;
    captions / doc_items / has_image metadata carried per chunk."""
    from docling_jobkit_spark.operators.chunker import chunk_text

    p1 = " ".join(f"a{i}" for i in range(30))
    text = "Title Here\n\n" + p1 + "\n\nCap text"
    spans = [
        {"start": 0, "end": 10, "kind": "heading", "path": "html/body/h1"},
        {"start": 12, "end": 12 + len(p1), "kind": "para", "path": "html/body/p"},
        {"start": 14 + len(p1), "end": 22 + len(p1), "kind": "caption",
         "path": "html/body/figcaption"},
    ]
    chunks = chunk_text(text, spans, max_tokens=8, overlap=0)
    # first chunk starts AT the heading: no duplication, raw == text
    assert chunks[0]["text"] == chunks[0]["raw_text"]
    # later chunks are contextualized: heading prepended
    assert chunks[1]["text"].startswith("Title Here\n")
    assert chunks[1]["raw_text"] == chunks[1]["text"].split("\n", 1)[1]
    assert chunks[1]["headings"] == ["Title Here"]
    assert chunks[1]["doc_items"] == ["html/body/p"]
    assert all(c["has_image"] is False for c in chunks)
    # the caption lands in the final chunk's captions
    assert chunks[-1]["captions"] == ["Cap text"]
