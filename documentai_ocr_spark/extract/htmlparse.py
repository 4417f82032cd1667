"""Stdlib DOM-block tokenizer shared by engine and oracle.

Parses an HTML payload into a flat sequence of text *blocks* with
link-character counts — the input to the jusText/Boilerpipe-family
text-density classification (SURVEY.md §2.10: the reference's pixel
density profile `/root/reference/font/project_rec.py:16-54` generalized
from pixel columns to DOM nodes). Parsing is shared between the Spark
engine and the golden oracle; *classification* (the density thresholds)
is implemented independently on each side.

No lxml/bs4 in this environment — html.parser is the stdlib fallback and
is deterministic, which is what the golden tests need.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from ..rules import HTML_BLOCK_TAGS, HTML_DROP_TAGS

# HTML void elements never get a closing tag; don't push them on the stack
_VOID = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _BlockParser(HTMLParser):
    """Accumulate whitespace-normalized text chunks; flush a block at
    every block-element boundary."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (block_text, n_link_chars)
        self._chunks: list[tuple[str, bool]] = []  # (normalized chunk, in_link)
        self._drop_depth = 0
        self._link_depth = 0

    # -- block assembly -----------------------------------------------
    def _flush(self) -> None:
        if not self._chunks:
            return
        text = " ".join(c for c, _ in self._chunks)
        link_chars = sum(len(c) for c, in_link in self._chunks if in_link)
        self._chunks = []
        if text:
            self.blocks.append((text, link_chars))

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            if tag == "br":
                self._flush()
            return
        if tag in HTML_DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in HTML_BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        if tag in HTML_DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in HTML_BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        norm = " ".join(data.split())
        if norm:
            self._chunks.append((norm, self._link_depth > 0))


def html_blocks_ref(text: str) -> list[tuple[str, int]]:
    """Reference implementation on stdlib HTMLParser (slow path; kept as
    the cross-check for the regex scanner below — tests assert equality
    on the fixture corpus)."""
    parser = _BlockParser()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        # malformed markup: fall through with whatever was collected
        pass
    parser._flush()
    return parser.blocks


# one token per <!-- comment -->, <tag ...>, or text run. A '<' opens a
# tag token ONLY when followed by a tag-opener char (letter, '/', '!',
# '?') — the HTMLParser/HTML5 rule; a bare '<' in prose ('a < b',
# 'price 1 < 2', '<3') is literal text. Without that guard the scanner
# swallowed everything from a bare '<' to the next '>' as one junk tag,
# silently losing body text the stdlib reference parser keeps.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)|<[a-zA-Z/!?][^>]*>?|<|[^<]+", re.DOTALL
)
_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)")
# CDATA close finders, mirroring HTMLParser's endtagfind ('</ name >'
# exactly — '</script foo>' does NOT end CDATA there either): inside
# <script>/<style> the content is raw text, so '<div>' or 'a<b' in a
# script body must not be tokenized as markup
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
    for t in ("script", "style")
}


def html_blocks(text: str) -> list[tuple[str, int]]:
    """HTML payload → ``[(block_text, n_link_chars), ...]`` in document
    order. ``block_text`` is whitespace-normalized (runs of whitespace
    collapsed, chunks joined by single spaces).

    Single-pass regex scanner (~8× the stdlib parser): one compiled
    pattern tokenizes the document; the state machine below mirrors
    ``_BlockParser`` (drop-tag depth, link depth, block-boundary flush,
    void elements, script/style CDATA skip, literal bare ``<`` in
    prose). Known approximation vs HTMLParser: a literal ``>`` inside a
    quoted attribute ends the tag early."""
    blocks: list[tuple[str, int]] = []
    chunks: list[str] = []
    link_chars = 0
    drop_depth = 0
    link_depth = 0

    def flush() -> None:
        nonlocal chunks, link_chars
        if chunks:
            block = " ".join(chunks)
            if block:
                blocks.append((block, link_chars))
            chunks = []
            link_chars = 0

    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        tok = m.group()
        pos = m.end()
        if tok[0] != "<" or tok == "<":  # text run, or literal bare '<'
            if drop_depth:
                continue
            if "&" in tok:  # unescape BEFORE normalizing: &nbsp; → \xa0
                tok = unescape(tok)  # which str.split() then collapses
            norm = " ".join(tok.split())
            if norm:
                chunks.append(norm)
                if link_depth:
                    link_chars += len(norm)
            continue
        if tok.startswith("<!"):
            continue  # comment / doctype
        nm = _NAME_RE.match(tok)
        if not nm:
            continue
        tag = nm.group(1).lower()
        closing = tok[1] == "/"
        selfclose = not closing and tok.endswith("/>")
        if tag in _VOID:
            if tag == "br" and not closing:
                flush()
            continue
        if tag in HTML_DROP_TAGS:
            if selfclose:
                continue
            drop_depth += 1 if not closing else -1
            if drop_depth < 0:
                drop_depth = 0
            if not closing and tag in _CDATA_CLOSE:
                # CDATA: jump straight to the close tag — a '<div>' or
                # 'a<b' inside a script body is content, not markup
                mm = _CDATA_CLOSE[tag].search(text, pos)
                if mm is None:
                    break  # unterminated: rest of doc is raw CDATA
                pos = mm.end()
                drop_depth = max(0, drop_depth - 1)
            continue
        if tag == "a" and not selfclose:
            link_depth += 1 if not closing else -1
            if link_depth < 0:
                link_depth = 0
        if tag in HTML_BLOCK_TAGS:
            flush()
            # HTMLParser reports <x/> as start+end; both flush — a no-op
            # for the second call, so one flush is equivalent
    flush()
    return blocks
