"""Deterministic synthetic Common-Crawl-style corpus generator.

The analog of the reference's bundled fixture PDF
(``tests/2206.01062v1-pg4.pdf`` driven through every orchestrator test,
``tests/test_local_orchestrator.py:343-364``): a seeded generator whose
output is fully reproducible, covering normal articles plus every
pathological case the pipeline must survive (FIXTURES.md §1):

- nav/header/footer/sidebar boilerplate with high link density;
- main content with headings/paragraphs/lists/tables;
- empty html, oversized html, broken/unclosed tags, non-UTF-8 bytes;
- duplicate urls (dedup tests), near-duplicate texts (minhash tests);
- giant pages (skew / salting tests);
- multi-page payloads with ``<!--PAGE_BREAK-->`` (slice fan-out tests).

No external data; ``random.Random(seed)`` is the only entropy source.
Output schema matches BASELINE.json input_hint exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

_WORDS = (
    "data spark engine document pipeline extraction content analysis web "
    "crawl corpus table page layout text block density heuristic model "
    "system result partition cluster shuffle executor batch arrow vector "
    "schema column parquet manifest commit resume metric lineage quality "
    "language token chunk span offset heading paragraph article section "
    "filter join union window stream state checkpoint throughput scale"
).split()

_LANGS = ("en", "de", "fr", "es", "it")

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random, n_sent: int | None = None) -> str:
    n_sent = n_sent or rng.randint(2, 6)
    return " ".join(_sentence(rng, rng.randint(6, 18)) for _ in range(n_sent))


def _nav(rng: random.Random) -> str:
    links = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a></li>'
        for _ in range(rng.randint(4, 9))
    )
    return f"<nav><ul>{links}</ul></nav>"


def _sidebar(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/t/{rng.choice(_WORDS)}">{_sentence(rng, rng.randint(2, 4))}</a>'
        for _ in range(rng.randint(3, 7))
    )
    return f'<div class="sidebar"><h3>{rng.choice(_WORDS)}</h3><p>{links}</p></div>'


def _table(rng: random.Random) -> str:
    rows = "".join(
        "<tr>"
        + "".join(f"<td>{_sentence(rng, rng.randint(3, 8))}</td>" for _ in range(3))
        + "</tr>"
        for _ in range(rng.randint(2, 4))
    )
    return f"<table>{rows}</table>"


def _article_body(rng: random.Random, n_paras: int | None = None) -> str:
    parts = [f"<h1>{_sentence(rng, rng.randint(4, 8))}</h1>"]
    for _ in range(n_paras or rng.randint(3, 8)):
        roll = rng.random()
        if roll < 0.12:
            parts.append(f"<h2>{_sentence(rng, rng.randint(3, 6))}</h2>")
        elif roll < 0.22:
            items = "".join(
                f"<li>{_sentence(rng, rng.randint(5, 12))}</li>"
                for _ in range(rng.randint(2, 5))
            )
            parts.append(f"<ul>{items}</ul>")
        elif roll < 0.30:
            parts.append(_table(rng))
        else:
            parts.append(f"<p>{_paragraph(rng)}</p>")
    return "".join(parts)


def _page_shell(rng: random.Random, body: str, lang: str) -> str:
    return (
        f'<!DOCTYPE html><html lang="{lang}"><head><title>t</title>'
        f"<style>.x{{color:red}}</style><script>var x=1;</script></head>"
        f"<body>{_nav(rng)}<header><h1>{rng.choice(_WORDS)} site</h1></header>"
        f'<div class="wrap"><article>{body}</article>{_sidebar(rng)}</div>'
        f"<footer><p>© 2026 {rng.choice(_WORDS)} — "
        f'<a href="/legal">legal</a> <a href="/privacy">privacy</a></p></footer>'
        f"</body></html>"
    )


def generate_pages(
    n: int,
    seed: int = 42,
    min_paras: int = 3,
    max_paras: int = 8,
    giant_paras: int = 400,
) -> list[dict]:
    """Generate n corpus rows. Row i is fully determined by the args.

    Default paragraph counts give ~4 KB pages (fast unit tests); pass
    e.g. ``min_paras=20, max_paras=60`` for a Common-Crawl-realistic
    size profile (tens of KB per page) in benchmarks.
    """
    rows: list[dict] = []
    for i in range(n):
        rng = random.Random((seed << 20) ^ i)
        lang = rng.choice(_LANGS)
        url = f"https://example{i % 97}.org/{rng.choice(_WORDS)}/{i}"
        kind = i % 20

        def body(lo=min_paras, hi=max_paras):
            return _article_body(rng, rng.randint(lo, hi))

        if kind == 17:  # empty html
            html = b""
        elif kind == 18:  # non-UTF8 bytes mixed into a real page
            page = _page_shell(rng, body(), lang)
            html = page.encode("utf-8") + b"\xff\xfe\x80<p>tail of broken bytes content</p>"
        elif kind == 19:  # broken/unclosed tags
            html = (
                "<html><body><div><p>"
                + _paragraph(rng)
                + "<p>"
                + _paragraph(rng)
                + "<div><ul><li>"
                + _sentence(rng, 9)
                + "</body>"
            ).encode("utf-8")
        elif kind == 15:  # multi-page payload (slice fan-out case)
            n_pages = rng.randint(3, 6)
            pages = [
                _page_shell(rng, body(max(min_paras // 2, 2), max(max_paras // 2, 4)), lang)
                for _ in range(n_pages)
            ]
            html = b"<!--PAGE_BREAK-->".join(p.encode("utf-8") for p in pages)
        elif kind == 16 and i % 100 == 16:  # giant page (skew case), ~1/100 rows
            html = _page_shell(rng, _article_body(rng, giant_paras), lang).encode("utf-8")
        else:
            html = _page_shell(rng, body(), lang).encode("utf-8")

        # duplicate urls: every 41st row repeats the url of the previous row
        if i % 41 == 40 and rows:
            url = rows[-1]["url"]

        rows.append(
            {
                "url": url,
                "warc_ts": _BASE_TS + timedelta(seconds=i),
                "html": html,
                "text": _paragraph(rng, 2),
                "lang": lang,
            }
        )
    return rows


def write_pages_parquet(path: str, n: int, seed: int = 42) -> str:
    """Materialize the corpus as a parquet file usable by spark/duckdb."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_pages(n, seed)
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)
    return path
