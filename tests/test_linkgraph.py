"""Link-graph centrality (operators/linkgraph.py): exact pure-Python
reference of the quantized power iteration, known-graph semantics,
in-degree twin, determinism, and plan pins."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.linkgraph import (
    _QUANT,
    in_degree,
    pagerank,
)

DAMP = 0.85
ITER = 10


def _round_half_up(x: float) -> int:
    # Spark round(double, 0) = BigDecimal.valueOf(double).setScale(0,
    # HALF_UP); BigDecimal.valueOf goes through Double.toString, which
    # repr() reproduces.
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _reference_pagerank(edges, n_iter=ITER, damping=DAMP):
    """Bit-exact mirror of the operator's scaled-long iteration."""
    import math

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    init_q = int(math.floor(1.0 / n / _QUANT + 0.5))
    teleport_q = int(math.floor((1.0 - damping) / n / _QUANT + 0.5))
    rq = {v: init_q for v in nodes}
    for _ in range(n_iter):
        dangling_q = sum(rq[v] for v in nodes if deg[v] == 0)
        dangling_share_q = int(math.floor(float(dangling_q) * damping / n + 0.5))
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += _round_half_up(rq[s] * damping / deg[s])
        rq = {v: teleport_q + dangling_share_q + incoming[v] for v in nodes}
    return {v: rq[v] * _QUANT for v in nodes}


def _synth_edges(n_docs=500):
    """Deterministic per-doc edge pair (the entry uses the same rule)."""
    edges = []
    for i in range(n_docs):
        edges.append((i, (i * 2654435761 >> 15) % n_docs))
        edges.append((i, (i * 40503 >> 7) % n_docs))
    return [(s, d) for s, d in edges if s != d]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(_synth_edges(), "src long, dst long")


def test_pagerank_matches_python_reference_exactly(edges_df):
    got = {r["node"]: r["pr"] for r in pagerank(edges_df).collect()}
    want = _reference_pagerank(_synth_edges())
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-15), v


def test_mass_conserved(edges_df):
    total = pagerank(edges_df).agg(F.sum("pr")).collect()[0][0]
    # total mass 1 up to per-node quantization (<= n * 1e-12 drift)
    assert abs(total - 1.0) < 1e-6


def test_star_graph_center_wins(spark):
    leaves = list(range(1, 9))
    edges = [(v, 0) for v in leaves] + [(0, v) for v in leaves]
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = {r["node"]: r["pr"] for r in pagerank(df).collect()}
    assert pr[0] > max(pr[v] for v in leaves) * 2


def test_cycle_is_uniform(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = [r["pr"] for r in pagerank(df).collect()]
    assert max(pr) - min(pr) < 1e-9


def test_dangling_mass_redistributed(spark):
    # 1 -> 2, 2 dangling: total mass must still be ~1
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    pr = {r["node"]: r["pr"] for r in pagerank(df).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr[2] > pr[1]


def test_deterministic_under_repartition(edges_df):
    a = sorted(tuple(r) for r in pagerank(edges_df).collect())
    b = sorted(tuple(r) for r in pagerank(edges_df.repartition(13)).collect())
    assert a == b


def test_in_degree_matches_duckdb(spark, edges_df):
    got = sorted(tuple(r) for r in in_degree(edges_df).collect())
    rows = _synth_edges()
    con = duckdb.connect()
    con.execute("create table e (src bigint, dst bigint)")
    con.executemany("insert into e values (?, ?)", rows)
    want = sorted(
        con.execute(
            "select dst as node, count(*)::bigint from e group by 1"
        ).fetchall()
    )
    assert got == want


def test_plan_no_cartesian(edges_df):
    plan = (
        pagerank(edges_df, n_iter=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- anchor extraction + URL resolution --------------------------------------


def test_resolve_href_cases(spark):
    from docling_jobkit_spark.operators.linkgraph import resolve_href
    from pyspark.sql import functions as F

    base = "https://ex.com/a/b/page.html"
    cases = [
        ("https://other.org/x", "https://other.org/x"),
        ("//cdn.ex.com/lib.js", "https://cdn.ex.com/lib.js"),
        ("/root.html", "https://ex.com/root.html"),
        ("sib.html", "https://ex.com/a/b/sib.html"),
        ("sib.html#frag", "https://ex.com/a/b/sib.html"),
        ("#top", None),
        ("", None),
        ("mailto:x@y.z", None),
        ("javascript:void(0)", None),
        ("tel:+123", None),
    ]
    df = spark.createDataFrame(
        [(base, h) for h, _ in cases], "url string, href string"
    ).withColumn("got", resolve_href("url", "href"))
    got = [r["got"] for r in df.collect()]
    assert got == [want for _, want in cases]


def test_resolve_href_pathless_base(spark):
    from docling_jobkit_spark.operators.linkgraph import resolve_href

    df = spark.createDataFrame(
        [("https://ex.com", "x.html")], "url string, href string"
    ).withColumn("got", resolve_href("url", "href"))
    assert df.collect()[0]["got"] == "https://ex.com/x.html"


def test_url_link_edges_match_duckdb_exactly(spark, sf_dir):
    """The extraction+resolution projection replayed in DuckDB over the
    SAME pages (registered via Arrow) — engine-exact edge set."""
    from docling_jobkit_spark.operators.linkgraph import url_link_edges
    from docling_jobkit_spark.sources.readers import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).select("url", "html")
    got = sorted(
        tuple(r) for r in url_link_edges(pages).collect()
    )
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    want = sorted(
        con.execute(
            r"""
        with links as (
          select url, unnest(regexp_extract_all(decode(html), 'href="([^"]*)"', 1)) as href
          from pages
        ), parts as (
          select url, trim(href) as h,
                 lower(regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1)) as scheme,
                 lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)) as host,
                 regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) as path
          from links
        ), res as (
          select url,
                 regexp_replace(
                   case
                     when h = '' then null
                     when h like '#%' then null
                     when regexp_matches(lower(h), '^(mailto|javascript|tel|data):') then null
                     when regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*://') then h
                     when h like '//%' then scheme || ':' || h
                     when h like '/%' then scheme || '://' || host || h
                     else scheme || '://' || host ||
                          (case when path = '' then '/'
                                else regexp_replace(path, '[^/]*$', '') end) || h
                   end, '#.*$', '') as dst
          from parts
        )
        select distinct url as src, dst from res
        where dst is not null and dst <> url
        order by src, dst
        """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_pagerank_over_real_edges(spark, sf_dir):
    """End-to-end: corpus anchors → edges → centrality. The shared
    boilerplate targets (/legal, /privacy) are linked from every page,
    so they must out-rank any ordinary page (the shell links /, /x,
    /y, /l from every page)."""
    from docling_jobkit_spark.operators.linkgraph import (
        pagerank,
        url_link_edges,
    )
    from docling_jobkit_spark.sources.readers import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).select("url", "html")
    edges = url_link_edges(pages)
    pr = pagerank(edges, n_iter=5)
    rows = {r["node"]: r["pr"] for r in pr.collect()}
    legal = [v for k, v in rows.items() if k.endswith("/l")]
    assert legal, "corpus footer must produce its /l (legal) node"
    import statistics

    assert legal[0] > 10 * statistics.median(rows.values())
    assert abs(sum(rows.values()) - 1.0) < 1e-6


def test_host_graph_aggregation(spark):
    from docling_jobkit_spark.operators.linkgraph import (
        host_centrality,
        host_edges,
    )

    edges = spark.createDataFrame(
        [
            ("https://a.com/1", "https://hub.org/x"),
            ("https://a.com/2", "https://hub.org/y"),
            ("https://b.net/1", "https://hub.org/z"),
            ("https://hub.org/x", "https://a.com/1"),
            ("https://a.com/1", "https://a.com/2"),  # intra-host: dropped
        ],
        "src string, dst string",
    )
    he = {(r["src_host"], r["dst_host"]): r["n_links"] for r in host_edges(edges).collect()}
    assert he == {
        ("a.com", "hub.org"): 2,
        ("b.net", "hub.org"): 1,
        ("hub.org", "a.com"): 1,
    }
    hc = {r["host"]: r for r in host_centrality(edges).collect()}
    assert set(hc) == {"a.com", "b.net", "hub.org"}
    assert hc["hub.org"]["pr"] > hc["b.net"]["pr"]
    assert hc["hub.org"]["in_degree"] == 2
    assert abs(sum(r["pr"] for r in hc.values()) - 1.0) < 1e-6
