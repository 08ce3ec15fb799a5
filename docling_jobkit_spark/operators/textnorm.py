"""Unicode text normalization for webtext corpora.

Every large-scale text pipeline (CCNet, Gopher, RefinedWeb, C4)
normalizes extracted text before hashing, deduplication, or training:
un-normalized text makes byte-level dedup miss visually-identical
documents (NFC vs NFD accents, curly vs straight quotes, NBSP vs
space) and leaks zero-width/control bytes into training data. The
reference delegates this to the docling conversion stack; this is the
from-scratch Spark-native stage.

Pipeline (applied in order — order is part of the contract):

1. NFC canonical composition (UAX #15). Spark has no built-in, so this
   is the one Python step: an Arrow-batched pandas UDF with an
   ``unicodedata.is_normalized`` fast path — ASCII/already-NFC rows
   (the overwhelming majority of web text) pay a single C-level check,
   no recomposition.
2..n. Typographic + whitespace canonicalization, entirely JVM-side
   (a fused ``regexp_replace`` chain inside whole-stage codegen):
   CRLF/CR → LF; zero-width/BOM/soft-hyphen strip; curly quotes →
   ASCII; dash family → '-'; ellipsis → '...'; unicode spaces →
   space; control chars (except \\n, \\t) strip; tabs → space;
   space runs → one; spaces hugging newlines dropped; 3+ newlines
   → 2; outer trim.

Cross-engine exactness: the step table is built from CODEPOINTS and
rendered once into ``\\x{XXXX}``-escaped pattern strings — a syntax
both Java regex (Spark) and RE2 (DuckDB) accept — so the two engines
consume byte-identical patterns; ``normalize_oracle_sql`` nests the
same chain around ``nfc_normalize`` with the mandatory ``'g'`` flag
(DuckDB replaces only the first match otherwise — repo rule).
Patterns stick to literal char classes, explicit ranges and ``{m,}``
quantifiers — the dialect-safe intersection; ``\\s`` appears only in
the final trim, after every char where Java and RE2 disagree has
already been stripped.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _x(cp: int) -> str:
    return "\\x{%04X}" % cp


def _cls(*parts: int | tuple[int, int]) -> str:
    """Char class from codepoints / (lo, hi) ranges, fully escaped."""
    out = ["["]
    for p in parts:
        if isinstance(p, tuple):
            out.append(_x(p[0]) + "-" + _x(p[1]))
        else:
            out.append(_x(p))
    out.append("]")
    return "".join(out)


# (pattern, replacement), applied top to bottom AFTER NFC. Both engines
# receive these exact strings.
NORMALIZE_STEPS: list[tuple[str, str]] = [
    ("\\r\\n", "\n"),  # CRLF first, lone CR next
    ("\\r", "\n"),
    # NEL, LINE/PARA SEPARATOR → \n: Java's '$' matches BEFORE a final
    # line terminator while RE2's does not — once every terminator is a
    # plain \n, the trim steps are dialect-identical
    (_cls(0x0085, 0x2028, 0x2029), "\n"),
    # zero-width space/joiners, word-joiner, BOM, soft hyphen
    (_cls(0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD), ""),
    # curly single quotes, low-9, prime
    (_cls(0x2018, 0x2019, 0x201A, 0x2032), "'"),
    # curly double quotes, low-9, double prime
    (_cls(0x201C, 0x201D, 0x201E, 0x2033), '"'),
    # hyphen..horizontal bar, minus sign
    (_cls((0x2010, 0x2015), 0x2212), "-"),
    (_x(0x2026), "..."),
    # NBSP, en/em/etc spaces, narrow NBSP, math space, ideographic space
    (_cls(0x00A0, (0x2000, 0x200A), 0x202F, 0x205F, 0x3000), " "),
    # control chars except \t (09) and \n (0A); DEL
    (_cls((0x0000, 0x0008), 0x000B, 0x000C, (0x000E, 0x001F), 0x007F), ""),
    ("\\t", " "),
    (" {2,}", " "),
    (" {1,}\\n", "\n"),
    ("\\n {1,}", "\n"),
    ("\\n{3,}", "\n\n"),
    ("^\\s{1,}", ""),
    ("\\s{1,}$", ""),
]


def nfc_col(c: Column) -> Column:
    """NFC-normalize a string column (Arrow-batched pandas UDF; the
    ``is_normalized`` fast path makes already-NFC rows ~free)."""
    import pyspark.sql.types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _nfc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import unicodedata

        def one(s):
            if s is None:
                return None
            if unicodedata.is_normalized("NFC", s):
                return s
            return unicodedata.normalize("NFC", s)

        for s in it:
            yield s.map(one)

    return _nfc(c)


def normalize_col(c: Column) -> Column:
    """The full normalization chain as one Column expression: NFC
    (Python, batched) then the JVM-side regexp chain (codegen)."""
    out = nfc_col(c)
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def normalize_text(
    df: DataFrame, col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    from docling_jobkit_spark.operators.dedup import spread_for_compute

    # NFC (batched Python) + the regex chain are per-char costs — spread
    # a single-split scan before paying them (no-op at corpus scale)
    return spread_for_compute(df).withColumn(out_col, normalize_col(F.col(col)))


def normalize_oracle_sql(col_expr: str) -> str:
    """DuckDB expression computing the exact same normalization:
    ``nfc_normalize`` innermost, then the identical pattern chain as
    nested ``regexp_replace(..., 'g')``. DuckDB's standard single-quote
    strings are backslash-literal, so patterns pass through verbatim
    (only quotes double); newline replacements are emitted as
    ``chr(10)`` concatenations to keep the SQL one line."""
    expr = f"nfc_normalize({col_expr})"
    for pat, rep in NORMALIZE_STEPS:
        p = pat.replace("'", "''")
        if "\n" in rep:
            r = " || ".join(
                "chr(10)" if part == "\n" else f"'{part}'"
                for part in _split_keep_newlines(rep)
            ) or "''"
        else:
            r = f"'{rep.replace(chr(39), chr(39) * 2)}'"
        expr = f"regexp_replace({expr}, '{p}', {r}, 'g')"
    return expr


def _split_keep_newlines(s: str) -> list[str]:
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ch == "\n":
            if buf:
                parts.append(buf)
                buf = ""
            parts.append("\n")
        else:
            buf += ch
    if buf:
        parts.append(buf)
    return parts
