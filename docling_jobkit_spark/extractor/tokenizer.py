"""Deterministic HTML tokenizer → flat block stream.

A from-scratch, dependency-free tokenizer (regex scanner + explicit tag
stack). It is the analog of the DOM walk inside the reference's conversion
pipeline (``docling_jobkit/convert/manager.py:1725-1745`` delegates to
docling's HTML backend); here it is a pure function so the Spark UDF and
the single-threaded oracle share it verbatim — the byte-identical
invariant of BASELINE.json depends on that.

Determinism rules (SURVEY §7 "What's hard" #1):
- all thresholds are integers; no floats anywhere in scoring;
- fixed entity table + numeric entity decoding, no locale-dependent calls;
- whitespace collapse via a single compiled regex;
- unclosed/mismatched tags resolved by a fixed pop-until-match rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- lexical grammar -------------------------------------------------------

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",
    re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DOCTYPE_RE = re.compile(r"<![^>]*>", re.DOTALL)
_WS_RE = re.compile(r"\s+")

# content of these elements is never document text
RAW_TEXT_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head"})
# elements that can never contain children (no closing tag expected)
VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)
# starting (or ending) one of these flushes the current text block
BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption",
        "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure",
        "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
        "hr", "html", "li", "main", "nav", "ol", "p", "pre", "section",
        "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
    }
)
# subtrees that are boilerplate by construction (jusText/boilerpipe prior)
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})

_KIND_BY_TAG = {
    "h1": "heading", "h2": "heading", "h3": "heading",
    "h4": "heading", "h5": "heading", "h6": "heading",
    "li": "list", "dt": "list", "dd": "list",
    "td": "table", "th": "table", "caption": "table",
    "pre": "pre",
    "blockquote": "quote",
    "figcaption": "caption",
}

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–",
    "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”",
    "hellip": "…", "copy": "©", "reg": "®",
    "trade": "™", "deg": "°", "middot": "·",
    "bull": "•", "laquo": "«", "raquo": "»",
}
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def decode_entities(s: str) -> str:
    if "&" not in s:  # fast path: most blocks carry no entities
        return s

    def _sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#"):
            try:
                cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:], 10)
            except ValueError:
                return m.group(0)
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                return chr(cp)
            return "�"
        return _ENTITIES.get(body, m.group(0))

    return _ENTITY_RE.sub(_sub, s)


def collapse_ws(s: str) -> str:
    # " ".join(s.split()) is byte-identical to _WS_RE.sub(" ", s).strip()
    # (str.split and re \s share the Unicode whitespace set — verified on
    # randomized strings incl. \xa0/\x1c) and ~4x faster; _WS_RE is kept
    # as the documented definition.
    return " ".join(s.split())


# --- block model -----------------------------------------------------------


@dataclass
class Block:
    """One flushed run of text with its structural context."""

    path: str                    # e.g. "html/body/div/p"
    kind: str                    # heading | para | list | table | pre | quote | caption
    depth: int
    in_boilerplate: bool
    text_parts: list[str] = field(default_factory=list)
    link_chars: int = 0          # chars contributed while inside <a>

    _text: str | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            self._text = collapse_ws(decode_entities("".join(self.text_parts)))
        return self._text

    @property
    def text_len(self) -> int:
        return len(self.text)


def _kind_for_stack(stack: list[str]) -> str:
    for tag in reversed(stack):
        k = _KIND_BY_TAG.get(tag)
        if k is not None:
            return k
    return "para"


def tokenize_blocks(html: str) -> list[Block]:
    """Scan html text into a flat list of Blocks (order = document order).

    Single pass, O(n). Unknown / mismatched closes: pop to the matching
    open tag if present in the stack, else ignore (fixed rule → identical
    behavior for broken markup everywhere).
    """
    blocks: list[Block] = []
    stack: list[str] = []
    boiler_depth = 0          # >0 while inside any BOILERPLATE_TAGS subtree
    link_depth = 0            # >0 while inside <a>
    raw_until: str | None = None  # inside script/style/…: skip until this close

    cur: Block | None = None

    def flush() -> None:
        nonlocal cur
        if cur is not None and cur.text_parts:
            blocks.append(cur)
        cur = None

    def ensure_block() -> Block:
        nonlocal cur
        if cur is None:
            cur = Block(
                path="/".join(stack) if stack else "",
                kind=_kind_for_stack(stack),
                depth=len(stack),
                in_boilerplate=boiler_depth > 0,
            )
        return cur

    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            if raw_until is None:
                text = html[i:]
                if text:
                    b = ensure_block()
                    b.text_parts.append(text)
                    if link_depth > 0:
                        b.link_chars += len(collapse_ws(decode_entities(text)))
            break
        if lt > i and raw_until is None:
            text = html[i:lt]
            b = ensure_block()
            b.text_parts.append(text)
            if link_depth > 0:
                b.link_chars += len(collapse_ws(decode_entities(text)))
        i = lt

        if raw_until is not None:
            # only the matching close tag ends a raw-text element
            m = _TAG_RE.match(html, i)
            if m and m.group(1) == "/" and m.group(2).lower() == raw_until:
                raw_until = None
                tag = m.group(2).lower()
                if tag in stack:
                    while stack and stack[-1] != tag:
                        stack.pop()
                    if stack:
                        stack.pop()
                i = m.end()
            else:
                i += 1
            continue

        # Tag first (the common case): no overlap with comments/doctype —
        # _TAG_RE requires a letter after "<" or "</", both "<!--" and
        # "<!" forms need "!". Comment stays BEFORE doctype (a comment
        # containing ">" must not be cut short by the doctype rule).
        m = _TAG_RE.match(html, i)
        if m is None:
            m = _COMMENT_RE.match(html, i)
            if m:
                i = m.end()
                continue
        if m:
            closing, tag, _attrs, selfclose = m.groups()
            tag = tag.lower()
            if closing:
                if tag in BLOCK_TAGS:
                    flush()
                if tag in stack:
                    # pop-until-match: fixed recovery rule for bad nesting
                    while stack and stack[-1] != tag:
                        popped = stack.pop()
                        if popped in BOILERPLATE_TAGS:
                            boiler_depth -= 1
                        if popped == "a":
                            link_depth -= 1
                    if stack:
                        stack.pop()
                        if tag in BOILERPLATE_TAGS:
                            boiler_depth -= 1
                        if tag == "a":
                            link_depth -= 1
            else:
                if tag in BLOCK_TAGS:
                    flush()
                if tag == "br":
                    # line break inside a block = whitespace
                    if cur is not None:
                        cur.text_parts.append(" ")
                if not selfclose and tag not in VOID_TAGS:
                    if tag in RAW_TEXT_TAGS:
                        stack.append(tag)
                        raw_until = tag
                    else:
                        stack.append(tag)
                        if tag in BOILERPLATE_TAGS:
                            boiler_depth += 1
                        if tag == "a":
                            link_depth += 1
            i = m.end()
            continue
        m = _DOCTYPE_RE.match(html, i)
        if m:
            i = m.end()
            continue
        # lone '<' that is not a tag: literal text
        b = ensure_block()
        b.text_parts.append("<")
        if link_depth > 0:
            b.link_chars += 1
        i += 1

    flush()
    return [b for b in blocks if b.text_len > 0]
