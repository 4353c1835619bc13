"""Streaming HTML tokenizer + main-content block classification.

A from-scratch, dependency-free boilerplate stripper in the spirit of the
published jusText (Pomikálek 2011, "Removing Boilerplate and Duplicate Content
from Web Corpora") and Readability text-density heuristics: the page is
tokenized in one streaming pass, segmented into text blocks at block-level
tags, and each block is classified content/boilerplate from its length,
stopword density, link density, and ancestor tags. Deterministic by
construction — the same bytes always produce the same extracted text, which is
what the byte-identical-per-url invariant (BASELINE.json input_hint) requires.

This runs inside the extraction pandas UDF (extract.py) — per Arrow batch on
executors, never on the driver.
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import NamedTuple

# Tags that delimit text blocks.
_BLOCK_TAGS = frozenset(
    (
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
        "td", "th", "tr", "table", "section", "article", "main", "aside",
        "header", "footer", "nav", "form", "blockquote", "pre", "br", "hr",
        "figure", "figcaption", "dl", "dt", "dd", "body", "title",
    )
)

# Ancestors that mark a block as boilerplate outright.
_BOILERPLATE_ANCESTORS = frozenset(("nav", "header", "footer", "aside", "form"))

# Content inside these is skipped entirely.
_RAW_SKIP_TAGS = frozenset(("script", "style", "noscript", "svg", "template"))

_VOID_TAGS = frozenset(
    ("br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr")
)

# Small English stopword list (from the public jusText english list, truncated
# to the most frequent entries — enough for density classification).
_STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own same she should so some such than that the their
    theirs them themselves then there these they this those through to too
    under until up very was we were what when where which while who whom why
    will with you your yours yourself yourselves""".split()
)

_TAG_RE = re.compile(
    r"<!--.*?-->"  # comment
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<!DOCTYPE[^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][a-zA-Z0-9:-]*)\s*>"  # end tag   (group 1)
    r"|<\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:\s+[^<>]*?)?)(/?)>",  # start tag (2,3,4)
    re.DOTALL | re.IGNORECASE,
)

_WS_RE = re.compile(r"\s+")


class Block(NamedTuple):
    text: str
    n_chars: int
    n_link_chars: int
    stop_density: float
    boiler_ancestor: bool
    heading: bool


class ExtractionResult(NamedTuple):
    text: str
    title: str
    blocks: list  # list[tuple[Block, str]] — (block, label) for debugging


def _classify(b: Block) -> str:
    """jusText-style coarse classification -> 'good' | 'short' | 'bad'."""
    if b.boiler_ancestor:
        return "bad"
    if b.n_chars == 0:
        return "bad"
    link_density = b.n_link_chars / b.n_chars
    if link_density > 0.4:
        return "bad"
    if b.n_chars < 12:
        return "short" if link_density == 0 else "bad"
    if b.stop_density >= 0.25 and b.n_chars >= 40:
        return "good"
    if b.n_chars >= 100 and link_density < 0.2:
        return "good"
    if b.heading and b.n_chars >= 12 and link_density < 0.2:
        return "short"  # headings promoted only next to good content
    if b.n_chars >= 40 and b.stop_density >= 0.15:
        return "good"
    return "short"


def extract_main_content(html_text: str) -> ExtractionResult:
    """One streaming pass: tokenize, segment into blocks, classify, join the
    content blocks (two-pass neighbor promotion for 'short' blocks)."""
    blocks: list[Block] = []
    title_parts: list[str] = []

    cur_parts: list[str] = []
    cur_link_chars = 0
    stack: list[str] = []  # open-tag stack (lowercased)
    link_depth = 0
    boiler_depth = 0
    raw_skip: str | None = None
    in_title = False

    def flush(heading: bool = False) -> None:
        nonlocal cur_parts, cur_link_chars
        raw = _WS_RE.sub(" ", "".join(cur_parts)).strip()
        if raw:
            words = [w for w in re.split(r"[^\w']+", raw.lower()) if w]
            stops = sum(1 for w in words if w in _STOPWORDS)
            blocks.append(
                Block(
                    text=raw,
                    n_chars=len(raw),
                    n_link_chars=min(cur_link_chars, len(raw)),
                    stop_density=(stops / len(words)) if words else 0.0,
                    boiler_ancestor=boiler_depth > 0,
                    heading=heading,
                )
            )
        cur_parts = []
        cur_link_chars = 0

    pos = 0
    n = len(html_text)
    while pos < n:
        m = _TAG_RE.search(html_text, pos)
        text_end = m.start() if m else n
        if text_end > pos:
            chunk = html_text[pos:text_end]
            if raw_skip is None:
                text = _htmlmod.unescape(chunk)
                if in_title:
                    title_parts.append(text)
                else:
                    cur_parts.append(text)
                    if link_depth > 0:
                        cur_link_chars += len(_WS_RE.sub(" ", text).strip())
        if not m:
            break
        pos = m.end()
        end_name, start_name, _attrs, self_close = (
            m.group(1), m.group(2), m.group(3), m.group(4),
        )
        if raw_skip is not None:
            # only the matching close tag ends raw skip
            if end_name and end_name.lower() == raw_skip:
                raw_skip = None
            continue
        if start_name:
            tag = start_name.lower()
            if tag in _RAW_SKIP_TAGS and not self_close:
                raw_skip = tag
                continue
            if tag == "title":
                in_title = True
                continue
            if tag in _BLOCK_TAGS:
                flush(heading=stack[-1].startswith("h") if stack else False)
            if tag == "a":
                link_depth += 1
            if tag in _BOILERPLATE_ANCESTORS:
                boiler_depth += 1
            if not self_close and tag not in _VOID_TAGS:
                stack.append(tag)
        elif end_name:
            tag = end_name.lower()
            if tag == "title":
                in_title = False
                continue
            if tag in _BLOCK_TAGS:
                flush(heading=tag.startswith("h") and len(tag) == 2)
            if tag == "a" and link_depth > 0:
                link_depth -= 1
            if tag in _BOILERPLATE_ANCESTORS and boiler_depth > 0:
                boiler_depth -= 1
            # pop to matching open tag if present
            if tag in stack:
                while stack and stack[-1] != tag:
                    stack.pop()
                if stack:
                    stack.pop()
    flush()

    labels = [_classify(b) for b in blocks]
    # neighbor promotion: a 'short' block adjacent to a 'good' one is content
    # (headings directly above good content, continuation fragments below it)
    promoted = list(labels)
    for i, lab in enumerate(labels):
        if lab != "short":
            continue
        prev_good = any(
            labels[j] == "good" for j in range(max(0, i - 2), i)
        )
        next_good = any(
            labels[j] == "good" for j in range(i + 1, min(len(labels), i + 3))
        )
        if prev_good or next_good:
            promoted[i] = "good"

    content = [b.text for b, lab in zip(blocks, promoted) if lab == "good"]
    title = _WS_RE.sub(" ", "".join(title_parts)).strip()
    return ExtractionResult(
        text="\n".join(content),
        title=title,
        blocks=list(zip(blocks, promoted)),
    )
