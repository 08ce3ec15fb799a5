"""PII detection and redaction for training-data curation.

Regex-family PII scrubbing (the C4/RefinedWeb preprocessing step):
detect and mask emails, IPv4 addresses, and dash/dot-delimited phone
numbers. Everything is a JVM-side codegen projection — patterns are
class-portable (no lookaround, no engine-specific escapes) so the exact
same regexes run in the DuckDB oracle; redaction order is fixed
(email -> phone -> ip) and deterministic — phone BEFORE ip, so a
dot-delimited phone like 555.123.4567 can't have its leading octets
eaten by the IPv4 pass first (see pii_signals).

Scale note: pure narrow projections — at 100 TB these run at scan speed
with full column pruning, no shuffle; the counts ride along for
corpus-level PII-rate reporting (groupBy comes later, on ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class-portable patterns (Java regex + RE2 agree on all of these)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PHONE_RE = r"\+?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def _count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("int")


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stamp per-doc PII match counts and the redacted text.

    Adds ``n_emails``/``n_ipv4``/``n_phones`` (pattern occurrences in
    the RAW text — the corpus-level PII-rate signals), ``has_pii``, and
    ``redacted_text``. Redaction order is email -> phone -> ip: phone
    runs BEFORE ip because a dot-delimited phone (555.123.4567) contains
    an IPv4-shaped prefix — ip-first would mask '555.123.456' and leak
    the trailing digit. The reverse overlap cannot happen: a valid IPv4
    never has the 4-digit final group PHONE_RE requires."""
    t = F.col(text_col)
    n_emails = _count(t, EMAIL_RE)
    n_ipv4 = _count(t, IPV4_RE)
    n_phones = _count(t, PHONE_RE)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
        ),
        IPV4_RE,
        IP_TOKEN,
    )
    return df.select(
        "*",
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ipv4 + n_phones) > 0).alias("has_pii"),
        redacted.alias("redacted_text"),
    )
