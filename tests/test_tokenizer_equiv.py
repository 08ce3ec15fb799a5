"""Differential pin: the optimized tokenize_blocks (inlined state,
incremental kind tracking, eager text) must produce a block stream
IDENTICAL to the straightforward legacy form on the full pathological
corpus and on adversarial fragments. The legacy implementation is kept
here verbatim as the executable spec — any semantic drift in the hot
path fails this test before it can move extraction goldens."""

from __future__ import annotations

from docling_jobkit_spark.extractor.tokenizer import (
    BLOCK_TAGS,
    BOILERPLATE_TAGS,
    RAW_TEXT_TAGS,
    VOID_TAGS,
    _COMMENT_RE,
    _DOCTYPE_RE,
    _KIND_BY_TAG,
    _TAG_RE,
    collapse_ws,
    decode_entities,
    tokenize_blocks,
)


class _LegacyBlock:
    def __init__(self, path, kind, depth, in_boilerplate):
        self.path = path
        self.kind = kind
        self.depth = depth
        self.in_boilerplate = in_boilerplate
        self.text_parts = []
        self.link_chars = 0
        self._text = None

    @property
    def text(self):
        if self._text is None:
            self._text = collapse_ws(decode_entities("".join(self.text_parts)))
        return self._text


def _kind_for_stack(stack):
    for tag in reversed(stack):
        k = _KIND_BY_TAG.get(tag)
        if k is not None:
            return k
    return "para"


def legacy_tokenize_blocks(html):
    """The pre-optimization implementation, verbatim (closure form)."""
    blocks = []
    stack = []
    boiler_depth = 0
    link_depth = 0
    raw_until = None
    cur = None

    def flush():
        nonlocal cur
        if cur is not None and cur.text_parts:
            blocks.append(cur)
        cur = None

    def ensure_block():
        nonlocal cur
        if cur is None:
            cur = _LegacyBlock(
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
        b = ensure_block()
        b.text_parts.append("<")
        if link_depth > 0:
            b.link_chars += 1
        i += 1

    flush()
    return [b for b in blocks if len(b.text) > 0]


def _key(b):
    return (b.path, b.kind, b.depth, b.in_boilerplate, b.text, b.link_chars)


def _assert_equiv(html: str):
    got = [_key(b) for b in tokenize_blocks(html)]
    want = [_key(b) for b in legacy_tokenize_blocks(html)]
    assert got == want, html[:200]


ADVERSARIAL = [
    "",
    "plain text no tags",
    "<p>a</p><p>b</p>",
    "a < b and < c",                       # lone '<' literals
    "<a href='/x'>link < text</a> tail",   # lone '<' INSIDE a link
    "<div><p>unclosed<p>again<div><ul><li>x</body>",
    "<script>var a = '<p>not text</p>';</script><p>real</p>",
    "<nav><a href='/'>h</a><p>navtext</p></nav><article><h1>T</h1><p>body</p></article>",
    "<ul><li>one<li>two<li>three</ul>",
    "<table><tr><td>c1</td><td><a>c2</a></td></tr></table>",
    "<!-- c --><!DOCTYPE html><p>x&amp;y &#65; &#x42; &unknown; &bad</p>",
    "<h2>Head</h2><blockquote>q</blockquote><pre>  pre  text </pre>",
    "<p>a<br>b<br/>c</p>",
    "<style>p{color:red}</style><p>after style</p>",
    "</div></p>stray closes<p>ok</p>",
    "<a><a><p>nested links</p></a></a>",
    "<svg><circle r='1'/><text>svg text</text></svg><p>after svg</p>",
    "<P><B>UPPER tags</B></P>",
    "<div class='x\"quoted\"'><p a='>' >attr with gt</p></div>",
    "<footer><aside><form><p>all boiler</p></form></aside></footer>",
    "<script><p>never closed script",
    "text<",
    "<",
    "<notatag",
    "<1notag><p>x</p>",
]


def test_adversarial_fragments_equivalent():
    for frag in ADVERSARIAL:
        _assert_equiv(frag)


def test_full_pathological_corpus_equivalent():
    from docling_jobkit_spark.corpus import generate_pages

    rows = generate_pages(400, seed=11)
    for r in rows:
        html = r["html"]
        if not html:
            continue
        _assert_equiv(html.decode("utf-8", errors="replace"))


def test_fuzz_equivalent():
    import random

    rng = random.Random(1234)
    tags = ["p", "div", "a", "li", "ul", "nav", "script", "br", "h2", "span",
            "table", "td", "tr", "em", "img"]
    pieces = []
    for _ in range(4000):
        roll = rng.random()
        if roll < 0.35:
            pieces.append(rng.choice(["x", " ", "a b", "&amp;", "<", ">", "&#65;",
                                      "word ", "  ", "\n"]))
        elif roll < 0.65:
            pieces.append(f"<{rng.choice(tags)}>")
        elif roll < 0.9:
            pieces.append(f"</{rng.choice(tags)}>")
        elif roll < 0.95:
            pieces.append(f"<{rng.choice(tags)}/>")
        else:
            pieces.append("<!-- c -->")
    # one long adversarial document + many short ones
    _assert_equiv("".join(pieces))
    for start in range(0, 4000, 80):
        _assert_equiv("".join(pieces[start:start + 80]))
