"""Text normalization (operators/textnorm.py): Spark == DuckDB twin
exactly on adversarial unicode and on corpus text; NFC fast path;
idempotence; dialect-hazard regressions (final line terminators)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.textnorm import (
    NORMALIZE_STEPS,
    normalize_col,
    normalize_oracle_sql,
    normalize_text,
)

def _c(*cps: int) -> str:
    return "".join(chr(c) for c in cps)


ADVERSARIAL = [
    "plain ascii stays put",
    "cafe" + _c(0x0301) + " NFD composes",  # combining acute -> NFC
    "caf" + _c(0xE9) + " already NFC",
    _c(0x201C) + "curly" + _c(0x201D) + " " + _c(0x2018) + "quotes" + _c(0x2019),
    "em" + _c(0x2014) + "en" + _c(0x2013) + " ellipsis" + _c(0x2026),
    "nbsp" + _c(0xA0) + "enquad" + _c(0x2000) + "thin" + _c(0x2009) + "ideo" + _c(0x3000) + "x",
    "zw" + _c(0x200B) + "nj" + _c(0x200C) + "j" + _c(0x200D) + "wj" + _c(0x2060) + "bom" + _c(0xFEFF) + "shy" + _c(0xAD) + "end",
    "ctrl\x00chars\x08here\x0b\x0c\x1f\x7fgone",
    "crlf\r\nlone cr\rend",
    "tab\tand   run    of spaces",
    "spaces  \n  around\n\n\n\n many newlines",
    "  outer trim  ",
    "trailing space before nel " + _c(0x85),
    "line" + _c(0x2028) + "sep para" + _c(0x2029) + "sep",
    "prime 5" + _c(0x2032) + " double 5" + _c(0x2033),
    "minus " + _c(0x2212) + "5 hyphen " + _c(0x2010) + "x bar " + _c(0x2015) + "y",
    "",
    _c(0x200B, 0xAD),  # normalizes to empty
    "mixed: cafe" + _c(0x0301) + " " + _c(0x201C) + "ok" + _c(0x201D) + "\r\n\t x",
]


def _oracle(texts):
    con = duckdb.connect()
    expr = normalize_oracle_sql("t")
    out = []
    for t in texts:
        out.append(con.execute(f"select {expr} from (select ? as t)", [t]).fetchone()[0])
    con.close()
    return out


def test_spark_matches_duckdb_on_adversarial(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ADVERSARIAL)], "i long, text string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_col(F.col("text")).alias("n")).collect()
    }
    want = _oracle(ADVERSARIAL)
    for i, w in enumerate(want):
        assert got[i] == w, (i, ADVERSARIAL[i], got[i], w)


def test_spark_matches_duckdb_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    rows = docs.select(
        "doc_id", "text", normalize_col(F.col("text")).alias("n")
    ).collect()
    want = _oracle([r["text"] for r in rows])
    for r, w in zip(rows, want):
        assert r["n"] == w


def test_idempotent_and_null_safe(spark):
    df = spark.createDataFrame(
        [(t,) for t in ADVERSARIAL] + [(None,)], "text string"
    )
    once = normalize_text(df, "text", "n1")
    twice = once.withColumn("n2", normalize_col(F.col("n1")))
    for r in twice.collect():
        assert r["n2"] == r["n1"]
        if r["text"] is None:
            assert r["n1"] is None


def test_output_is_clean(spark):
    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    for r in normalize_text(df).collect():
        n = r["text_norm"]
        assert n == n.strip()
        for ch in n:
            o = ord(ch)
            assert ch == "\n" or not (o < 0x20 or o == 0x7F)
            assert o not in (0x85, 0x2028, 0x2029, 0xA0, 0x200B, 0xFEFF, 0xAD)
        assert "  " not in n and "\t" not in n and "\n\n\n" not in n
        assert " \n" not in n and "\n " not in n


def test_patterns_are_ascii():
    # the shared step table must stay escape-rendered (both engines get
    # byte-identical ASCII patterns — the cross-engine guarantee)
    for pat, rep in NORMALIZE_STEPS:
        assert all(ord(c) < 0x80 for c in pat), pat
