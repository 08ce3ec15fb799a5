"""Property-based invariants (hypothesis) for the pure extraction core.

These pin the definitional identities the Spark operators rely on,
over arbitrary byte inputs — not just the golden corpus:

1. slice-concat == single-shot: for ANY payload and ANY slice width,
   extracting page ranges slice-by-slice and joining with PAGE_JOIN is
   byte-identical to full extraction (this is what makes the distributed
   slice fan-out correct BY CONSTRUCTION, not by test coverage).
2. the relational token-window chunker's window-count formula equals the
   reference python loop's emission count for every token count.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_jobkit_spark.extractor.extract import (
    PAGE_BREAK,
    PAGE_JOIN,
    extract,
    extract_page_range,
    split_pages,
)

# html-ish fragments + arbitrary bytes + explicit page markers
_frag = st.one_of(
    st.binary(max_size=60),
    st.sampled_from(
        [
            b"<p>some sufficiently long paragraph body text for keeping</p>",
            b"<h1>Heading</h1>",
            b"<nav>boilerplate links</nav>",
            b"\xff\xfe\xc3",  # invalid utf-8
            PAGE_BREAK,
            b"",
        ]
    ),
)
_payloads = st.lists(_frag, min_size=1, max_size=12).map(b"".join)


@settings(max_examples=150, deadline=None)
@given(payload=_payloads, k=st.integers(min_value=1, max_value=4))
def test_slice_concat_equals_single_shot(payload: bytes, k: int):
    if len(payload) == 0:
        return  # admission failure path, covered elsewhere
    full = extract(payload, "u")
    assert full.status != "FAILURE"

    n = len(split_pages(payload))
    parts: list[str] = []
    spans: list = []
    offset = 0
    for lo in range(1, n + 1, k):
        hi = min(lo + k - 1, n)
        text, s, n_total = extract_page_range(payload, lo, hi)
        assert n_total == n
        if parts:
            offset += len(PAGE_JOIN)
        for sp in s:
            spans.append((sp.start + offset, sp.end + offset, sp.kind))
        parts.append(text)
        offset += len(text)

    assert PAGE_JOIN.join(parts) == full.text
    assert spans == [(sp.start, sp.end, sp.kind) for sp in full.spans]


@given(n=st.integers(min_value=1, max_value=2000),
       max_tokens=st.integers(min_value=2, max_value=64),
       overlap=st.integers(min_value=0, max_value=32))
def test_token_window_count_formula(n: int, max_tokens: int, overlap: int):
    """ceil(max(n-MT,0)/step)+1 == the python loop's emission count —
    the identity the relational token_window_chunks and its DuckDB
    oracle are built on."""
    if overlap >= max_tokens:
        return
    step = max_tokens - overlap
    emitted = 0
    for t0 in range(0, n, step):
        emitted += 1
        if t0 + max_tokens >= n:
            break
    formula = (max(n - max_tokens, 0) + step - 1) // step + 1
    assert formula == emitted


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
            min_size=1,
            max_size=8,
        ),
        min_size=0,
        max_size=120,
    ),
    seps=st.lists(
        st.sampled_from([" ", "  ", "\t", "\n", " ", " ", "\x1c", "\f"]),
        min_size=0,
        max_size=120,
    ),
    max_tokens=st.integers(min_value=2, max_value=32),
    overlap=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=150, deadline=None)
def test_chunk_text_invariants(words, seps, max_tokens, overlap):
    """chunk_text structural invariants under arbitrary Unicode tokens
    and whitespace (incl. the \\x1c class where str.split() and re \\S
    semantics could diverge): indices sequential, token counts exact,
    every split() token covered in order, raw windows are exact
    substrings at the token offsets, and total chunk count matches the
    window formula."""
    if overlap >= max_tokens:
        return
    from docling_jobkit_spark.operators.chunker import chunk_text

    text = "".join(w + s for w, s in zip(words, seps + [" "] * len(words)))
    toks = text.split()
    chunks = chunk_text(text, [], max_tokens=max_tokens, overlap=overlap)
    if not toks:
        assert chunks == []
        return
    step = max_tokens - overlap
    formula = (max(len(toks) - max_tokens, 0) + step - 1) // step + 1
    assert len(chunks) == formula
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    for i, c in enumerate(chunks):
        want = toks[i * step : i * step + max_tokens]
        assert c["num_tokens"] == len(want)
        assert c["raw_text"].split() == want
        assert c["text"] == c["raw_text"]  # no spans -> no contextualization
