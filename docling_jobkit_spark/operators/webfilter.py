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

from pyspark.sql import Column, DataFrame, Window
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


# --- URL canonicalization, canonical dedup, per-host caps ------------------
#
# Public precedent: crawler-frontier URL normalization (RFC 3986 §6
# syntax-based normalization plus the tracking-parameter strip every
# crawl pipeline applies) and RefinedWeb/CCNet-style per-host document
# caps (no single site may dominate the corpus).

# tracking parameters stripped during canonicalization (full-name match)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)="


def canonical_url(url_col="url") -> Column:
    """RFC-3986-style syntax normalization as one codegen projection:
    lowercase scheme+authority, strip the fragment, drop default ports
    (:80 http / :443 https), empty path -> "/", remove tracking query
    parameters (order of survivors preserved), drop an emptied "?".
    Scheme-less / unparseable urls pass through untouched (the url_filter
    gate rejects them; canonicalization must not invent a value)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    newq = F.array_join(params, "&")
    return F.when(scheme == "", c).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            auth,
            path,
            F.when(newq == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), newq)
            ),
        )
    )


def canonical_url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Stamp ``url_canonical`` and ``url_canon_keep`` (True for the
    first occurrence — smallest id — of each canonical url).

    Plan shape at 100 TB: only (id, canonical-url) rides the dedup
    shuffle; the verdict side is DUPLICATION-BOUNDED (one row per
    non-first occurrence, empty for a junk-free corpus), so the
    join-back onto the payload is AQE-broadcastable in the common case.
    The payload itself never shuffles."""
    canon = canonical_url(url_col)
    narrow = df.select(F.col(id_col), canon.alias("_cu"))
    w = Window.partitionBy("_cu").orderBy(F.asc(id_col))
    dups = (
        narrow.select(id_col, F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") > 1)
        .select(id_col, F.lit(True).alias("_dup"))
    )
    return (
        df.withColumn("url_canonical", canon)
        .join(dups, on=id_col, how="left")
        .withColumn("url_canon_keep", F.col("_dup").isNull())
        .drop("_dup")
    )


def host_cap(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_by: Column | None = None,
) -> DataFrame:
    """RefinedWeb-style per-host cap: stamp ``host`` and ``host_kept``
    (True for a host's first ``max_per_host`` docs). Ranking is by
    ``order_by`` ASCENDING then id ASC (deterministic tie-break) —
    pass a NEGATED quality score to keep the best; default is id ASC.

    Same duplication-bounded shape as canonical_url_dedup: ranking runs
    on a narrow (id, host[, order key]) projection; only OVERFLOW rows
    (rank > cap — nonempty only for hosts that exceed the cap) join
    back to the payload."""
    host = url_columns(url_col)["host"]
    if order_by is None:
        narrow = df.select(F.col(id_col), host.alias("_h"))
        order = [F.asc(id_col)]
    else:
        narrow = df.select(F.col(id_col), host.alias("_h"), order_by.alias("_ord"))
        order = [F.asc("_ord"), F.asc(id_col)]
    w = Window.partitionBy("_h").orderBy(*order)
    over = (
        narrow.select(F.col(id_col), F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") > int(max_per_host))
        .select(id_col, F.lit(True).alias("_over"))
    )
    return (
        df.withColumn("host", host)
        .join(over, on=id_col, how="left")
        .withColumn("host_kept", F.col("_over").isNull())
        .drop("_over")
    )


def host_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-host corpus footprint: (host, n_docs) plus the sum of any
    ``n_chars`` column if present — the numbers behind a cap decision.
    One narrow shuffle with map-side partial aggregation."""
    host = url_columns(url_col)["host"]
    cols = [F.col(id_col), host.alias("host")]
    has_chars = "n_chars" in df.columns
    if has_chars:
        cols.append(F.col("n_chars"))
    narrow = df.select(*cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    if has_chars:
        aggs.append(F.sum("n_chars").cast("long").alias("n_chars"))
    return narrow.groupBy("host").agg(*aggs)


def domain_quality_report(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_rate: float = 0.5,
    max_pii_rate: float = 0.3,
    min_avg_tokens: float = 10.0,
) -> DataFrame:
    """Per-host curation report — the table a LEARNED domain blocklist
    is read off of (production URL filters are mostly derived from
    exactly these aggregates, then fed back into ``url_filter_against``
    as the blocklist table; UT1/RefinedWeb curation practice).

    One row per host: doc count, exact-duplicate membership rate
    (corpus-WIDE duplicate attribution, the corpus_report posture —
    mirror hosts get flagged even when each copy is unique within its
    host), PII-bearing doc rate, punctuation ratio, mean tokens per
    doc, and the ``flagged`` verdict with a fixed reason precedence
    (dup_farm > pii_source > low_text).

    Cross-engine determinism: every rate is ONE division of two exact
    integer sums, rounded to 6 places (the decimal-exact-sums repo
    rule); ``punct_ratio`` NULL-guards an all-empty host (x/0 is NULL
    in Spark but inf in DuckDB).

    Scale shape: one narrow projection (id, host, hash, 4 ints), one
    hash-only self-aggregation for dup membership joined back on the
    uniform sha key, one map-side-combinable groupBy(host). Text never
    shuffles; hosts are the output cardinality."""
    from docling_jobkit_spark.functions.scalar import content_hash, token_count
    from docling_jobkit_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE
    from docling_jobkit_spark.operators.textstats import PUNCT_CLASS

    t = F.col(text_col)
    n_pii = sum(
        F.size(F.regexp_extract_all(t, F.lit(p), 0))
        for p in (EMAIL_RE, IPV4_RE, PHONE_RE)
    )
    narrow = df.select(
        F.col(id_col),
        url_columns(url_col)["host"].alias("host"),
        content_hash(t).alias("_h"),
        token_count(t).alias("_ntok"),
        F.length(t).alias("_nchar"),
        F.size(F.regexp_extract_all(t, F.lit(PUNCT_CLASS), 0)).alias("_npunct"),
        (n_pii > 0).cast("int").alias("_pii"),
    )
    dup_hashes = (
        narrow.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("_h", F.lit(1).alias("_dup"))
    )
    joined = narrow.join(dup_hashes, on="_h", how="left").withColumn(
        "_dup", F.coalesce("_dup", F.lit(0))
    )
    agg = joined.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_dup").cast("long").alias("n_dup_docs"),
        F.sum("_pii").cast("long").alias("n_pii_docs"),
        F.sum("_ntok").cast("long").alias("_stok"),
        F.sum("_nchar").cast("long").alias("_schar"),
        F.sum("_npunct").cast("long").alias("_spunct"),
    )
    dup_rate = F.round(F.col("n_dup_docs") / F.col("n_docs"), 6)
    pii_rate = F.round(F.col("n_pii_docs") / F.col("n_docs"), 6)
    avg_tokens = F.round(F.col("_stok") / F.col("n_docs"), 6)
    punct_ratio = F.when(
        F.col("_schar") > 0, F.round(F.col("_spunct") / F.col("_schar"), 6)
    )
    reason = (
        F.when(dup_rate > max_dup_rate, F.lit("dup_farm"))
        .when(pii_rate > max_pii_rate, F.lit("pii_source"))
        .when(avg_tokens < min_avg_tokens, F.lit("low_text"))
        .otherwise(F.lit(None).cast("string"))
    )
    return agg.select(
        "host",
        "n_docs",
        "n_dup_docs",
        dup_rate.alias("dup_rate"),
        "n_pii_docs",
        pii_rate.alias("pii_rate"),
        punct_ratio.alias("punct_ratio"),
        avg_tokens.alias("avg_tokens"),
        reason.alias("flag_reason"),
        reason.isNotNull().alias("flagged"),
    )
