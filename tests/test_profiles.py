"""Extraction preset registry (T3 analog — ``manager.py:484-703``)."""

from __future__ import annotations

import pytest

from docling_jobkit_spark.extractor.extract import PROFILES, extract
from docling_jobkit_spark.operators.extract_op import extract_documents

HTML = (
    b"<body><p>short blk</p>"
    b"<p>A longer paragraph with plenty of characters to be counted as "
    b"good content under the default profile thresholds.</p>"
    b'<p><a href="/x">linky</a> text with a link making up a third of it '
    b"or so, borderline under default.</p></body>"
)


def test_profiles_change_selection():
    n_default = len(extract(HTML, profile="default").spans)
    n_strict = len(extract(HTML, profile="strict").spans)
    n_lenient = len(extract(HTML, profile="lenient").spans)
    assert n_strict <= n_default <= n_lenient
    assert n_strict < n_lenient


def test_unknown_profile_becomes_failure_row():
    # extract() never raises — config errors surface as INTERNAL failures
    res = extract(HTML, profile="nope")
    assert res.status == "FAILURE"
    assert res.error.category == "INTERNAL"


def test_spark_operator_profile_matches_oracle(spark):
    df = spark.createDataFrame([("u", HTML)], "url string, html binary")
    for name in PROFILES:
        got = extract_documents(df, profile=name).collect()[0]
        exp = extract(HTML, "u", profile=name)
        assert got["extracted_text"] == exp.text, name
