"""URL / domain filtering for web-corpus curation.

Beyond the reference's own surface (build brief): the standard first
gate of a Common-Crawl-style pipeline — drop documents by URL scheme,
blocklisted domain (UT1-style lists), or file extension, BEFORE paying
for extraction. The reference's admission gate is size/page based
(``docling_jobkit/convert/chunked_processor.py`` preflight); this is the
URL-shaped twin, kept as pure codegen projections so Catalyst fuses the
whole decision into the scan and prunes every other column.

Two shapes:

- :func:`url_filter` — small literal blocklists compiled into the plan
  (codegen OR-chain). Right for config-sized lists (10s-100s entries).
- :func:`url_filter_against` — a blocklist TABLE (millions of domains,
  the UT1 case): host label-suffixes are exploded (bounded by label
  count, <= ~6) and semi-joined against the broadcast blocklist, so a
  subdomain of a blocked domain matches without any suffix LIKE scan.
  At 100 TB this is one broadcast hash join on uniform string keys —
  no shuffle of the corpus.

Failure posture matches the repo: filtering never drops rows silently —
it stamps ``url_ok`` + ``url_reject_reason`` and the caller decides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic precedence of rejection reasons (first match wins)
REASON_INVALID = "unparseable"
REASON_SCHEME = "scheme"
REASON_DOMAIN = "blocked_domain"
REASON_EXT = "blocked_extension"


def url_columns(url_col) -> dict[str, Column]:
    """scheme/host/ext projections shared by both filter shapes (same
    class-portable regexes as ``functions.scalar.uri_parts``).

    The extension is taken from the PATH component only — deriving it
    from the whole URL would misread a hostname's TLD as a file
    extension for path-less URLs (``https://example.zip`` is not a zip
    download)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    upath = F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    filename = F.regexp_extract(upath, r"([^/]+)$", 1)
    return {
        "scheme": F.lower(F.regexp_extract(c, r"^([a-z][a-z0-9+.-]*)://", 1)),
        "host": F.lower(F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)),
        "ext": F.lower(F.regexp_extract(filename, r"\.([A-Za-z0-9]+)$", 1)),
    }


def _domain_blocked(host: Column, blocked_domains: tuple[str, ...]) -> Column:
    """host == d OR host endswith '.d' for any blocked d (subdomains of a
    blocked domain are blocked; 'notexample.com' is NOT)."""
    if not blocked_domains:
        return F.lit(False)
    checks = [
        (host == F.lit(d)) | host.endswith("." + d) for d in blocked_domains
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out | chk
    return out


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: tuple[str, ...] = (),
    blocked_exts: tuple[str, ...] = (),
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Stamp ``scheme``/``host``/``ext`` plus ``url_ok`` and
    ``url_reject_reason`` (NULL when ok). Literal-blocklist shape: the
    whole decision is one codegen projection, zero shuffles."""
    cols = url_columns(url_col)
    scheme, host, ext = cols["scheme"], cols["host"], cols["ext"]
    url_c = F.col(url_col) if isinstance(url_col, str) else url_col
    # NULL / scheme-less URLs must be REJECTED, not silently passed: a
    # NULL url makes every predicate below NULL, and a when-chain whose
    # branches are all NULL falls through to the ok branch.
    unparseable = url_c.isNull() | (scheme == "")
    bad_scheme = ~scheme.isin(*allowed_schemes)
    bad_domain = _domain_blocked(host, tuple(d.lower() for d in blocked_domains))
    bad_ext = ext.isin(*[e.lower() for e in blocked_exts]) if blocked_exts else F.lit(False)
    reason = (
        F.when(unparseable, F.lit(REASON_INVALID))
        .when(bad_scheme, F.lit(REASON_SCHEME))
        .when(bad_domain, F.lit(REASON_DOMAIN))
        .when(bad_ext, F.lit(REASON_EXT))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        ext.alias("ext"),
        reason.alias("url_reject_reason"),
        reason.isNull().alias("url_ok"),
    )


def host_suffixes(host: Column) -> Column:
    """All label-suffixes of a host: a.b.c -> [a.b.c, b.c, c]. Bounded by
    the label count, so the explode fan-out is ~4-6 rows per doc."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def url_filter_against(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Blocklist-TABLE shape: reduce the corpus to its DISTINCT hosts
    (the only corpus-wide shuffle, narrow strings with map-side partial
    aggregation), explode each host's label-suffixes, semi-join against
    the broadcast blocklist to get the blocked hosts actually present in
    the corpus (a small set, <= distinct hosts), then broadcast THAT back
    onto the corpus keyed by host. The document payload never shuffles
    and never explodes. Returns the input plus ``host`` and
    ``domain_blocked``."""
    host = url_columns(url_col)["host"]
    with_host = df.withColumn("host", host)
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_bl_domain")).distinct()
    )
    hosts = with_host.select("host").distinct()
    sfx = hosts.select("host", F.explode(host_suffixes(F.col("host"))).alias("_sfx"))
    blocked_hosts = (
        sfx.join(bl, sfx["_sfx"] == bl["_bl_domain"], "left_semi")
        .select("host")
        .distinct()
        .withColumn("domain_blocked", F.lit(True))
    )
    return with_host.join(F.broadcast(blocked_hosts), on="host", how="left").withColumn(
        "domain_blocked", F.coalesce(F.col("domain_blocked"), F.lit(False))
    )
