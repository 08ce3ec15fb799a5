"""Deterministic PDF fixture generator — the test/bench twin of pdf.py.

Builds real, spec-conformant PDF bytes (proper xref table, page tree,
Flate-compressible content streams, image XObjects) from a typed page
spec, AND computes the exact text ``extract_pdf`` must return for it —
the pair forms a closed, exactly-testable system (the posture of
``tests/test_extractor.py``'s corpus-digest oracle, applied to PDFs).

The layout engine here uses the SAME width model as the extractor
(``advance = 0.5 * size`` per character, pdf.py ``CHAR_ADVANCE_PCT``) and
positions EVERY line/cell with an explicit ``Tm``, so extraction never
depends on font metrics the subset doesn't carry. Geometry guarantees,
each matched to an extractor threshold:

- intra-block leading 1.2×size  (< 1.8×size block-gap threshold),
- between-block gap  2.5×size  (> 1.8×size threshold),
- table cell padding 1.8×size  (> 1.0×size cell-gap threshold),
- column gutter 36 pt           (> 6 pt minimum gutter),
- heading sizes 14/18 pt vs 10 pt body (> 1.2× heading threshold).

No randomness anywhere: ``build_pdf(spec)`` is a pure function.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

from docling_jobkit_spark.extractor.pdf import FIGURE_TEXT

PAGE_W = 612.0
PAGE_H = 792.0
MARGIN = 72.0
GUTTER = 36.0
BODY_SIZE = 10.0
HEADING_SIZE = 14.0
TITLE_SIZE = 18.0
LEADING_PCT = 1.2
BLOCK_GAP_PCT = 2.5
CELL_PAD_PCT = 1.8
FIGURE_H = 50.0
CHAR_W_PCT = 0.5  # MUST equal pdf.CHAR_ADVANCE_PCT / 100


@dataclass(frozen=True)
class Block:
    kind: str  # "para" | "heading" | "table" | "figure"
    text: str = ""
    rows: tuple[tuple[str, ...], ...] = ()


def para(text: str) -> Block:
    return Block("para", text=text)


def heading(text: str) -> Block:
    return Block("heading", text=text)


def table(rows) -> Block:
    return Block("table", rows=tuple(tuple(_norm(c) or "-" for c in r) for r in rows))


def figure() -> Block:
    return Block("figure")


@dataclass(frozen=True)
class Page:
    columns: tuple[tuple[Block, ...], ...] = field(default_factory=tuple)
    title: str | None = None

    @staticmethod
    def of(*columns, title: str | None = None) -> "Page":
        return Page(tuple(tuple(c) for c in columns), title=title)


def _norm(text: str) -> str:
    return " ".join(text.split())


def _wrap(text: str, budget: int) -> list[str]:
    """Greedy word wrap; over-budget words hard-split. Pure + total."""
    budget = max(1, budget)
    out: list[str] = []
    cur = ""
    for word in _norm(text).split(" "):
        if not word:
            continue
        while len(word) > budget:
            if cur:
                out.append(cur)
                cur = ""
            out.append(word[:budget])
            word = word[budget:]
        if not cur:
            cur = word
        elif len(cur) + 1 + len(word) <= budget:
            cur = cur + " " + word
        else:
            out.append(cur)
            cur = word
    if cur:
        out.append(cur)
    return out


def _esc(text: str) -> bytes:
    raw = text.encode("utf-8")
    return (
        raw.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
    )


def _f(v: float) -> str:
    s = f"{v:.2f}"
    return s.rstrip("0").rstrip(".") if "." in s else s


class _ColumnWriter:
    """Emits positioned text lines down one column."""

    def __init__(self, x: float, y: float, width: float):
        self.x = x
        self.y = y
        self.width = width
        self.ops: list[bytes] = []

    def _line(self, x: float, size: float, text: str) -> None:
        self.ops.append(
            b"BT /F1 %s Tf 1 0 0 1 %s %s Tm (%s) Tj ET"
            % (_f(size).encode(), _f(x).encode(), _f(self.y).encode(), _esc(text))
        )

    def text_block(self, text: str, size: float) -> None:
        lines = _wrap(text, int(self.width / (CHAR_W_PCT * size)))
        for i, ln in enumerate(lines):
            if i:
                self.y -= size * LEADING_PCT
            self._line(self.x, size, ln)
        self.y -= size * BLOCK_GAP_PCT

    def table_block(self, rows: tuple[tuple[str, ...], ...], size: float) -> None:
        n_cols = max(len(r) for r in rows)
        widths = [
            max((len(r[j]) if j < len(r) else 1) for r in rows) * CHAR_W_PCT * size
            + CELL_PAD_PCT * size
            for j in range(n_cols)
        ]
        for i, row in enumerate(rows):
            if i:
                self.y -= size * LEADING_PCT
            cx = self.x
            for j, cell in enumerate(row):
                self._line(cx, size, cell)
                cx += widths[j]
        self.y -= size * BLOCK_GAP_PCT

    def figure_block(self) -> None:
        self.y -= FIGURE_H
        self.ops.append(
            b"q %s 0 0 %s %s %s cm /Im0 Do Q"
            % (_f(FIGURE_H).encode(), _f(FIGURE_H).encode(),
               _f(self.x).encode(), _f(self.y).encode())
        )
        self.y -= BODY_SIZE * BLOCK_GAP_PCT


def _render_page(page: Page) -> tuple[bytes, bool]:
    """One page's content stream; returns (stream, uses_image)."""
    ops: list[bytes] = []
    uses_image = False
    top = PAGE_H - MARGIN
    n_cols = max(1, len(page.columns))
    col_w = (PAGE_W - 2 * MARGIN - (n_cols - 1) * GUTTER) / n_cols
    if page.title is not None:
        w = _ColumnWriter(MARGIN, top, PAGE_W - 2 * MARGIN)
        w.text_block(page.title, TITLE_SIZE)
        ops.extend(w.ops)
        top = w.y
    for ci, col_blocks in enumerate(page.columns):
        w = _ColumnWriter(MARGIN + ci * (col_w + GUTTER), top, col_w)
        for b in col_blocks:
            if b.kind == "para":
                if _norm(b.text):
                    w.text_block(b.text, BODY_SIZE)
            elif b.kind == "heading":
                if _norm(b.text):
                    w.text_block(b.text, HEADING_SIZE)
            elif b.kind == "table":
                if b.rows:
                    w.table_block(b.rows, BODY_SIZE)
            elif b.kind == "figure":
                w.figure_block()
                uses_image = True
        ops.extend(w.ops)
    return b"\n".join(ops), uses_image


def build_pdf(pages, compress: bool = False) -> bytes:
    """Assemble a complete PDF (header, objects, xref, trailer)."""
    pages = list(pages)
    rendered = [_render_page(p) for p in pages]
    any_image = any(ui for _, ui in rendered)

    objects: dict[int, bytes] = {}
    font_num = 3
    image_num = 4 if any_image else None
    first_page_num = 5 if any_image else 4

    kids = " ".join(
        f"{first_page_num + 2 * i} 0 R" for i in range(len(pages))
    ).encode()
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(pages))
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    if any_image:
        img = b"\x80"
        objects[image_num] = (
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length %d >>"
            b"\nstream\n%s\nendstream" % (len(img), img)
        )

    res = b"<< /Font << /F1 %d 0 R >>" % font_num
    if any_image:
        res += b" /XObject << /Im0 %d 0 R >>" % image_num
    res += b" >>"

    for i, (content, _ui) in enumerate(rendered):
        page_num = first_page_num + 2 * i
        cont_num = page_num + 1
        objects[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %s %s] "
            b"/Resources %s /Contents %d 0 R >>"
            % (_f(PAGE_W).encode(), _f(PAGE_H).encode(), res, cont_num)
        )
        body = content
        filt = b""
        if compress:
            body = zlib.compress(content, 6)
            filt = b" /Filter /FlateDecode"
        objects[cont_num] = (
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body)
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n%s\nendobj\n" % (num, objects[num])
    xref_pos = len(out)
    max_num = max(objects)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# the expected-extraction oracle
# ---------------------------------------------------------------------------
def _expected_block(b: Block, budget: int, size: float) -> tuple[str, str] | None:
    if b.kind == "figure":
        return ("figure", FIGURE_TEXT)
    if b.kind == "table":
        if not b.rows:
            return None
        return ("table", "\n".join("\t".join(r) for r in b.rows))
    if not _norm(b.text):
        return None
    kind = "heading" if b.kind == "heading" else "text"
    # wrap-then-rejoin == normalized text unless a word hard-split
    return (kind, " ".join(_wrap(b.text, budget)))


def expected_blocks(page: Page) -> list[tuple[str, str]]:
    """(kind, text) per block, in the extractor's reading order."""
    out: list[tuple[str, str]] = []
    n_cols = max(1, len(page.columns))
    col_w = (PAGE_W - 2 * MARGIN - (n_cols - 1) * GUTTER) / n_cols
    if page.title is not None and _norm(page.title):
        budget = int((PAGE_W - 2 * MARGIN) / (CHAR_W_PCT * TITLE_SIZE))
        out.append(("heading", " ".join(_wrap(page.title, budget))))
    for col_blocks in page.columns:
        for b in col_blocks:
            size = HEADING_SIZE if b.kind == "heading" else BODY_SIZE
            eb = _expected_block(b, int(col_w / (CHAR_W_PCT * size)), size)
            if eb is not None:
                out.append(eb)
    return out


def expected_text(pages) -> str:
    return "\f".join(
        "\n\n".join(t for _k, t in expected_blocks(p)) for p in pages
    )


def expected_kinds(pages) -> list[str]:
    return [k for p in pages for k, _t in expected_blocks(p)]
