"""Reference main-content extractor — the byte-identical oracle.

Pure function ``extract(html_bytes) -> ExtractResult``. This single module
defines the semantics the Spark pipeline must reproduce byte-for-byte per
url (BASELINE.json ``input_hint``); the ``mapInPandas`` operator imports
and calls exactly this function, so equivalence is by construction and the
pytest suite pins it against golden files.

Algorithm (jusText / boilerpipe family, re-derived from the published
descriptions — block-level text-density + link-density scoring over a flat
block stream; see PAPERS.md):

1. tokenize html → flat Block stream (tokenizer.py);
2. per-block integer features: text length, link-char count, kind,
   boilerplate-subtree flag;
3. classify GOOD / SHORT / BAD with integer thresholds;
4. neighborhood smoothing: SHORT promoted next to GOOD (one pass);
5. heading rule: a heading survives only if GOOD content follows it before
   the next heading (jusText's "header with content" heuristic);
6. emit kept blocks joined by "\\n\\n" with span offsets.

Paged documents (the PDF-slice analog — reference fan-out
``orchestrators/ray/serve_deployment.py:437-464`` and reassembly
``:510-549``): pages are delimited by the literal comment
``<!--PAGE_BREAK-->``; full-document extraction is DEFINED as the
page-wise extraction joined by "\\f". That definition makes the Spark
slice-explode → extract → groupBy(url)+sort_array reassembly byte-equal to
the single-threaded path by construction.

All failure modes become structured results, never exceptions
(reference precedent ``serve_deployment.py:1590-1627`` degrade-to-document
-failure).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import NamedTuple

from docling_jobkit_spark.extractor import tokenizer as tok
from docling_jobkit_spark.extractor.errors import (
    CATEGORY_POLICY,
    CATEGORY_SOURCE_UNAVAILABLE,
    PHASE_ADMISSION,
    PHASE_EXTRACT,
    FailureInfo,
    classify_failure,
)

# integer thresholds — no floats in any classification decision
MIN_GOOD_CHARS = 25          # block length for standalone GOOD
MIN_SHORT_CHARS = 8          # below this a block is noise
MIN_HEADING_CHARS = 2
LINK_DENSITY_NUM = 1         # GOOD requires link_chars * DEN < text_len * NUM ...
LINK_DENSITY_DEN = 3         # ... i.e. link density < 1/3
HEADING_LINK_NUM = 1
HEADING_LINK_DEN = 2         # headings tolerate link density < 1/2


@dataclass(frozen=True)
class ExtractionProfile:
    """Named extraction preset — the analog of the reference's pluggable
    stage-preset registry (``convert/manager.py:484-703``): a job selects
    a profile by name; all thresholds stay integers for determinism."""

    name: str
    min_good_chars: int = MIN_GOOD_CHARS
    min_short_chars: int = MIN_SHORT_CHARS
    min_heading_chars: int = MIN_HEADING_CHARS
    link_density_num: int = LINK_DENSITY_NUM
    link_density_den: int = LINK_DENSITY_DEN
    heading_link_den: int = HEADING_LINK_DEN


PROFILES: dict[str, ExtractionProfile] = {
    "default": ExtractionProfile("default"),
    # strict: longer blocks required, lower link tolerance — high-precision
    # corpus building
    "strict": ExtractionProfile(
        "strict", min_good_chars=40, min_short_chars=15,
        link_density_num=1, link_density_den=5, heading_link_den=3,
    ),
    # lenient: keep shorter blocks, tolerate more links — high-recall
    "lenient": ExtractionProfile(
        "lenient", min_good_chars=15, min_short_chars=5,
        link_density_num=1, link_density_den=2,
    ),
}

PAGE_BREAK = b"<!--PAGE_BREAK-->"
_PAGE_BREAK_STR = PAGE_BREAK.decode("ascii")
PAGE_JOIN = "\f"

STATUS_SUCCESS = "SUCCESS"
STATUS_PARTIAL = "PARTIAL_SUCCESS"
STATUS_FAILURE = "FAILURE"

_GOOD, _SHORT, _BAD, _HEADING = 2, 1, 0, 3


class Span(NamedTuple):
    """A kept block's offsets + structural context. NamedTuple (not a
    frozen dataclass): ~2x cheaper to construct per block, and — being a
    real tuple — it crosses the Arrow boundary as a struct value with no
    per-span dict materialization (pyarrow accepts tuples for struct
    columns)."""

    start: int
    end: int
    kind: str
    path: str

    def as_dict(self) -> dict:
        return {"start": self.start, "end": self.end, "kind": self.kind, "path": self.path}


@dataclass
class ExtractResult:
    url: str | None
    status: str
    text: str
    spans: list[Span] = field(default_factory=list)
    error: FailureInfo | None = None
    n_pages: int = 1
    # per-stage seconds (reference: timings dict[str, ProfilingItem],
    # exportable_document.py:67-69); values are wall-clock, NOT part of
    # the byte-identical contract
    timings: dict[str, float] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.status != STATUS_FAILURE


def split_pages(html: bytes) -> list[bytes]:
    """Split a paged payload on the PAGE_BREAK marker (1 page if absent)."""
    if PAGE_BREAK not in html:
        return [html]
    return html.split(PAGE_BREAK)


def _classify(blocks: list[tok.Block], p: ExtractionProfile) -> list[int]:
    labels = []
    for b in blocks:
        if b.in_boilerplate:
            labels.append(_BAD)
            continue
        tl = b.text_len
        if b.kind == "heading":
            # headings tolerate a higher link density than body blocks
            if tl >= p.min_heading_chars and b.link_chars * p.heading_link_den < tl:
                labels.append(_HEADING)
            else:
                labels.append(_BAD)
            continue
        if tl < p.min_short_chars:
            labels.append(_BAD)
            continue
        low_link = b.link_chars * p.link_density_den < tl * p.link_density_num
        if tl >= p.min_good_chars and low_link:
            labels.append(_GOOD)
        elif low_link:
            labels.append(_SHORT)
        else:
            labels.append(_BAD)
    return labels


def _smooth(labels: list[int]) -> list[int]:
    """Promote SHORT blocks adjacent to GOOD (single deterministic pass over
    the ORIGINAL labels, so the result does not depend on scan direction)."""
    out = list(labels)
    n = len(labels)
    for i, lab in enumerate(labels):
        if lab != _SHORT:
            continue
        prev_good = i > 0 and labels[i - 1] == _GOOD
        next_good = i + 1 < n and labels[i + 1] == _GOOD
        if prev_good or next_good:
            out[i] = _GOOD
    return out


def _heading_pass(labels: list[int]) -> list[int]:
    """A heading is kept only if GOOD content follows before the next
    heading; otherwise it is boilerplate (site name, widget titles...)."""
    out = list(labels)
    n = len(labels)
    for i, lab in enumerate(labels):
        if lab != _HEADING:
            continue
        keep = False
        for j in range(i + 1, n):
            if labels[j] == _HEADING:
                break
            if labels[j] == _GOOD:
                keep = True
                break
        out[i] = _GOOD if keep else _BAD
    return out


def _extract_single_page(
    html_text: str, profile: ExtractionProfile
) -> tuple[str, list[Span]]:
    blocks = tok.tokenize_blocks(html_text)
    labels = _heading_pass(_smooth(_classify(blocks, profile)))
    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for b, lab in zip(blocks, labels):
        if lab != _GOOD:
            continue
        t = b.text
        if parts:
            offset += 2  # the "\n\n" separator
        spans.append(Span(offset, offset + len(t), b.kind, b.path))
        parts.append(t)
        offset += len(t)
    return "\n\n".join(parts), spans


def _extract_pages_str(
    pages: list[str], profile: ExtractionProfile
) -> tuple[str, list[Span]]:
    """Shared per-page loop over ALREADY-DECODED page strings. The
    offset-0 branch reuses the first page's Span objects unchanged
    (shifting by zero would rebuild identical tuples — single-page
    documents, the common case, now allocate each Span exactly once)."""
    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for page in pages:
        text, page_spans = _extract_single_page(page, profile)
        if parts:
            offset += len(PAGE_JOIN)
        if offset:
            spans.extend(
                Span(s.start + offset, s.end + offset, s.kind, s.path)
                for s in page_spans
            )
        else:
            spans.extend(page_spans)
        parts.append(text)
        offset += len(text)
    return PAGE_JOIN.join(parts), spans


def extract_page_range(
    html: bytes,
    page_lo: int,
    page_hi: int,
    profile: ExtractionProfile | None = None,
) -> tuple[str, list[Span], int]:
    """Extract pages [page_lo, page_hi] (1-based inclusive) of a paged
    payload. Returns (text, spans, n_pages_total). Used by the slice
    fan-out operator; ``extract`` == concat of slices joined by PAGE_JOIN.
    """
    profile = profile or PROFILES["default"]
    pages = split_pages(html)
    n = len(pages)
    lo = max(1, page_lo)
    hi = min(n, page_hi)
    text, spans = _extract_pages_str(
        [p.decode("utf-8", errors="replace") for p in pages[lo - 1 : hi]], profile
    )
    return text, spans, n


def extract(
    html: bytes | None,
    url: str | None = None,
    max_bytes: int | None = None,
    profile: ExtractionProfile | str | None = None,
    max_pages: int | None = None,
) -> ExtractResult:
    """The flagship per-document map (analog of the reference's
    ``DoclingConverterManager.convert_documents``,
    ``convert/manager.py:1725-1745``). Never raises."""
    try:
        if html is None or len(html) == 0:
            return ExtractResult(
                url,
                STATUS_FAILURE,
                "",
                error=FailureInfo(
                    CATEGORY_SOURCE_UNAVAILABLE, "empty document", False, PHASE_ADMISSION
                ),
            )
        if max_bytes is not None and len(html) > max_bytes:
            return ExtractResult(
                url,
                STATUS_FAILURE,
                "",
                error=FailureInfo(
                    CATEGORY_POLICY,
                    f"document size {len(html)} exceeds max_file_size {max_bytes}",
                    False,
                    PHASE_ADMISSION,
                ),
            )
        if max_pages is not None:
            n = html.count(PAGE_BREAK) + 1
            if n > max_pages:
                return ExtractResult(
                    url,
                    STATUS_FAILURE,
                    "",
                    error=FailureInfo(
                        CATEGORY_POLICY,
                        f"page count {n} exceeds max_num_pages {max_pages}",
                        False,
                        PHASE_ADMISSION,
                    ),
                )
        # one strict decode doubles as validity probe AND payload decode:
        # for valid UTF-8 (the overwhelming case) splitting the DECODED
        # string on the ASCII page marker is byte-identical to splitting
        # the bytes then replace-decoding each page (ASCII substrings
        # cannot align inside multi-byte sequences, and errors="replace"
        # equals strict on valid input) — saves a second full-payload
        # decode per document
        decoded: str | None
        try:
            decoded = html.decode("utf-8", errors="strict")
            had_decode_errors = False
        except UnicodeDecodeError:
            decoded = None
            had_decode_errors = True

        if isinstance(profile, str):
            profile = PROFILES[profile]
        if profile is None:
            profile = PROFILES["default"]

        t0 = _time.perf_counter()
        if decoded is not None:
            pages = decoded.split(_PAGE_BREAK_STR)
            n_pages = len(pages)
            text, spans = _extract_pages_str(pages, profile)
        else:
            text, spans, n_pages = extract_page_range(html, 1, 1 << 30, profile)
        timings = {"extract": _time.perf_counter() - t0}
        if not text:
            return ExtractResult(
                url, STATUS_PARTIAL, "", spans=[], n_pages=n_pages, timings=timings
            )
        status = STATUS_PARTIAL if had_decode_errors else STATUS_SUCCESS
        return ExtractResult(
            url, status, text, spans=spans, n_pages=n_pages, timings=timings
        )
    except Exception as exc:  # absolute backstop: failures are rows
        return ExtractResult(
            url, STATUS_FAILURE, "", error=classify_failure(exc, PHASE_EXTRACT)
        )
