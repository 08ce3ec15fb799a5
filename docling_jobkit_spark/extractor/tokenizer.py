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

# --- lexical grammar -------------------------------------------------------

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",
    re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DOCTYPE_RE = re.compile(r"<![^>]*>", re.DOTALL)
_WS_RE = re.compile(r"\s+")
# one alternation for the stream scanner: branch order TAG | COMMENT |
# DOCTYPE reproduces the positional matcher's precedence exactly (regex
# alternation is first-branch-wins at each position, and all branches
# start with '<' so matches begin only where the positional scanner
# attempted them). group(2) is non-None iff the TAG branch matched;
# comments and doctypes are both pure skips.
_SCAN_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
    r"|<!--.*?-->"
    r"|<![^>]*>",
    re.DOTALL,
)

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


class Block:
    """One flushed run of text with its structural context.

    ``text`` is computed eagerly at flush time (every surviving block's
    text is consumed downstream anyway — classification reads it, and
    the emit loop joins it); slots + a plain ``__init__`` measured ~2x
    cheaper per block than the dataclass-with-lazy-property form at
    ~80 blocks/page."""

    __slots__ = ("path", "kind", "depth", "in_boilerplate", "text", "link_chars")

    def __init__(self, path, kind, depth, in_boilerplate, text, link_chars):
        self.path = path
        self.kind = kind
        self.depth = depth
        self.in_boilerplate = in_boilerplate
        self.text = text
        self.link_chars = link_chars

    @property
    def text_len(self) -> int:
        return len(self.text)


def _kind_for_stack(stack: list[str]) -> str:
    """Innermost tag with a mapped kind (documentation twin of the
    incremental kind tracking inside tokenize_blocks; kept for tests)."""
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

    Hot path notes (byte-identical to the straightforward positional
    form — pinned by the differential test in tests/test_tokenizer_equiv
    .py and the corpus digest): block state lives in locals instead of
    closure calls; the block KIND is tracked incrementally on the tag
    stack (push = own kind or inherit, pop = mirror); and scanning runs
    on a single combined-alternation ``finditer`` STREAM, so the
    find-next-'<' / try-match / lone-'<' bookkeeping happens in C — text
    between matches arrives as one gap string. Two exactness details:

    - lone '<' literals live inside gap strings; concatenated text is
      unchanged, and the per-segment link-char accounting is reproduced
      by splitting the gap on '<' (each lone '<' contributes exactly 1,
      each piece its collapsed-decoded length) — the positional form
      collapsed each piece separately, so whole-gap collapse would
      differ around the '<'.
    - raw-text elements (script/style/…) are scanned POSITIONALLY (the
      only-matching-close-ends-it rule, including the advance-by-one on
      any other '<'), and the stream iterator is RECREATED after the
      raw section: a stale stream could have consumed a tag straddling
      the close (e.g. the close tag inside another tag's attribute) and
      would diverge from the positional scan.
    """
    blocks: list[Block] = []
    stack: list[str] = []
    kinds: list[str] = []     # incremental _kind_for_stack: kinds[-1] is current
    boiler_depth = 0          # >0 while inside any BOILERPLATE_TAGS subtree
    link_depth = 0            # >0 while inside <a>
    raw_until: str | None = None  # inside script/style/…: skip until this close

    # open-block state (None parts = no open block); meta is captured at
    # the block's FIRST text segment, exactly as the closure form did
    cur_parts: list[str] | None = None
    cur_path = cur_kind = ""
    cur_depth = 0
    cur_boiler = False
    cur_link_chars = 0

    tag_match = _TAG_RE.match
    scan_iter = _SCAN_RE.finditer
    find = html.find
    kind_by_tag = _KIND_BY_TAG
    block_tags = BLOCK_TAGS
    void_tags = VOID_TAGS
    raw_tags = RAW_TEXT_TAGS
    boiler_tags = BOILERPLATE_TAGS

    def _link_len(seg: str) -> int:
        """Exact positional-form link-char accounting for a gap string:
        the positional scanner appended each lone '<' as its own 1-char
        part and collapsed the pieces AROUND it separately — whole-gap
        collapse would merge whitespace across the '<' differently."""
        if "<" not in seg:
            return len(collapse_ws(decode_entities(seg)))
        pieces = seg.split("<")
        total = len(pieces) - 1
        for p in pieces:
            if p:
                total += len(collapse_ws(decode_entities(p)))
        return total

    i, n = 0, len(html)
    while i < n:
        if raw_until is not None:
            # positional scan: only the matching close tag ends a
            # raw-text element; any other '<' advances by one
            lt = find("<", i)
            if lt == -1:
                i = n
                break
            m = tag_match(html, lt)
            if m and m.group(1) == "/" and m.group(2).lower() == raw_until:
                raw_until = None
                tag = m.group(2).lower()
                if tag in stack:
                    while stack and stack[-1] != tag:
                        stack.pop()
                        kinds.pop()
                    if stack:
                        stack.pop()
                        kinds.pop()
                i = m.end()
            else:
                i = lt + 1
            continue

        # stream scan from i (recreated after every raw section — see
        # docstring); gaps between matches are text, incl. lone '<'s
        for m in scan_iter(html, i):
            a, e = m.span()
            if a > i:
                text = html[i:a]
                if cur_parts is None:
                    cur_parts = [text]
                    cur_path = "/".join(stack) if stack else ""
                    cur_kind = kinds[-1] if kinds else "para"
                    cur_depth = len(stack)
                    cur_boiler = boiler_depth > 0
                    cur_link_chars = 0
                else:
                    cur_parts.append(text)
                if link_depth > 0:
                    cur_link_chars += _link_len(text)
            i = e
            closing, tag, selfclose = m.group(1, 2, 4)
            if tag is None:
                continue  # comment or doctype: pure skip
            tag = tag.lower()
            if closing:  # closing tag
                if tag in block_tags:
                    if cur_parts:
                        t = collapse_ws(decode_entities("".join(cur_parts)))
                        if t:
                            blocks.append(Block(
                                cur_path, cur_kind, cur_depth, cur_boiler,
                                t, cur_link_chars,
                            ))
                    cur_parts = None
                if tag in stack:
                    # pop-until-match: fixed recovery rule for bad nesting
                    while stack and stack[-1] != tag:
                        popped = stack.pop()
                        kinds.pop()
                        if popped in boiler_tags:
                            boiler_depth -= 1
                        if popped == "a":
                            link_depth -= 1
                    if stack:
                        stack.pop()
                        kinds.pop()
                        if tag in boiler_tags:
                            boiler_depth -= 1
                        if tag == "a":
                            link_depth -= 1
            else:
                if tag in block_tags:
                    if cur_parts:
                        t = collapse_ws(decode_entities("".join(cur_parts)))
                        if t:
                            blocks.append(Block(
                                cur_path, cur_kind, cur_depth, cur_boiler,
                                t, cur_link_chars,
                            ))
                    cur_parts = None
                if tag == "br":
                    # line break inside a block = whitespace
                    if cur_parts is not None:
                        cur_parts.append(" ")
                if not selfclose and tag not in void_tags:
                    stack.append(tag)
                    kinds.append(
                        kind_by_tag.get(tag) or (kinds[-1] if kinds else "para")
                    )
                    if tag in raw_tags:
                        raw_until = tag
                        break  # leave the stream; raw section is positional
                    if tag in boiler_tags:
                        boiler_depth += 1
                    if tag == "a":
                        link_depth += 1
        else:
            # stream exhausted: everything left is text
            if i < n:
                text = html[i:]
                if cur_parts is None:
                    cur_parts = [text]
                    cur_path = "/".join(stack) if stack else ""
                    cur_kind = kinds[-1] if kinds else "para"
                    cur_depth = len(stack)
                    cur_boiler = boiler_depth > 0
                    cur_link_chars = 0
                else:
                    cur_parts.append(text)
                if link_depth > 0:
                    cur_link_chars += _link_len(text)
            i = n

    if cur_parts:
        t = collapse_ws(decode_entities("".join(cur_parts)))
        if t:
            blocks.append(
                Block(cur_path, cur_kind, cur_depth, cur_boiler, t, cur_link_chars)
            )
    return blocks
