"""Xapian-compatible term generation, pure Python.

Reimplements (from the published xapian-core source, not by copying code) the
term-scanning state machine of
``xapian-core-1.4.17.tar.xz!queryparser/termgenerator_internal.cc:136-250``
(``parse_terms``) and the STEM_SOME emission policy of ``index_text``
(same file, lines 249-315), as used by the reference indexer
(/root/reference/src/main.rs:114-143).

Rules covered (SURVEY.md §2.3 K1-K11):
  K1  word chars = Unicode L*, M*, N*, Pc
  K2  lowercasing during scan
  K3  ASCII-uppercase acronyms: ``I.B.M.`` -> ``ibm``
  K4  infix joiners kept inside words: ``'`` ``&`` U+00B7 U+05F4 U+2027
      (U+2019/U+201B normalized to ``'``); zero-width chars ignored
  K5  digit infix ``, . ;`` (+ Unicode list) kept between digits
  K6  up to 3 trailing ``+``/``#`` kept unless followed by a word char
  K7  terms longer than 64 bytes dropped
  K8  positions: 1-based running counter shared across fields of one doc
  K9  STEM_SOME: unstemmed positional term + ``Z``-prefixed stemmed term
      (no position); don't stem terms not starting with a letter
  K10 Porter2 stemming (see porter2.py)
  K11 wdf accumulated per distinct term string

The per-token core is plain Python but is only applied per *input text*, and
stemming is memoized per distinct token, so the enclosing Arrow pandas UDF
(operators/index.py) stays batch-vectorized at the Spark boundary.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache
from typing import NamedTuple

from .porter2 import stem as _porter2_stem

MAX_TERM_BYTES = 64  # termgenerator_internal.h:44

_WORDCHAR_CATS = frozenset(
    (
        "Lu", "Ll", "Lt", "Lm", "Lo",  # letters
        "Mn", "Mc", "Me",  # marks
        "Nd", "Nl", "No",  # numbers
        "Pc",  # connector punctuation (e.g. _)
    )
)

_INFIX = frozenset("'&·״‧")
_INFIX_NORMALIZE = {"’": "'", "‛": "'"}
_INFIX_DIGIT = frozenset(
    ",.;;։؍߸⁄︐︓︔"
)
_IGNORE = frozenset("​‌‍⁠﻿")
_SUFFIX_CHARS = frozenset("+#")

_STEM_FIRST_CATS = frozenset(("Ll", "Lt", "Lm", "Lo"))  # should_stem mask


def _is_wordchar(ch: str) -> bool:
    return unicodedata.category(ch) in _WORDCHAR_CATS


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


class Token(NamedTuple):
    term: str
    # 1-based position for unstemmed terms; None for Z-stemmed terms
    pos: int | None
    stemmed: bool


# Fast-path gates: texts made only of ASCII alphanumerics/underscore and
# whitespace tokenize identically under a plain regex split — none of the
# acronym/infix/suffix rules can trigger without '.', ',', ';', "'", '&',
# '+', '#' or non-ASCII. (Uppercase is fine on the medium path: without '.'
# an acronym can never form, so lowercasing first is equivalent.)
import re as _re

_NO_SPECIALS = _re.compile(r"[^A-Za-z0-9_ \t\r\n]")
_SIMPLE_TOKEN = _re.compile(r"[a-z0-9_]+")


def scan_term_spans(text: str) -> list[tuple[str, int]]:
    """parse_terms state machine with offsets: (term, term_end) per word,
    where term_end is the iterator position at the action() call — the index
    past the last CONSUMED character, which may include an acronym's
    trailing '.' or stripped +/# suffix characters, exactly like the C++
    Utf8Iterator (termgenerator_internal.cc parse_terms). Single source of
    truth for the exact scanner: scan_terms and the snippet highlighter both
    derive from it, so index terms and highlight spans can never diverge."""
    out: list[tuple[str, int]] = []
    n = len(text)
    i = 0
    while True:
        # advance to the start of the next term
        while i < n and not _is_wordchar(text[i]):
            i += 1
        if i >= n:
            return out

        term = ""
        ch0 = text[i]
        # acronym scan: ASCII uppercase letters separated by '.'. Faithful
        # iterator semantics (parse_terms do-while:
        # `*p == '.' && ++p != end && U_isupper(*p)`): a '.' after the last
        # letter is CONSUMED even when the acronym ends there (so "N.A.T.O. "
        # scans past the final dot), and if a wordchar follows that consumed
        # dot the acronym is rejected wholesale ("A.B.x" -> a, b, x).
        if ch0.isascii() and ch0.isupper():
            p = i
            acr = ""
            while True:
                acr += text[p].lower()
                p += 1
                if p < n and text[p] == ".":
                    p += 1  # dot consumed even when the acronym ends here
                    if p < n and text[p].isascii() and text[p].isupper():
                        continue
                break
            if len(acr) > 1 and (p >= n or not _is_wordchar(text[p])):
                out.append((acr, p))
                i = p
                continue
            # else: fall through to normal scan from i

        # normal word scan with infix handling
        while True:
            # consume run of word chars
            while i < n and _is_wordchar(text[i]):
                term += text[i].lower()
                i += 1
            if i >= n:
                break
            # possible infix: exactly one joiner char with word chars both sides
            if i + 1 >= n or not _is_wordchar(text[i + 1]):
                break
            c = text[i]
            prev_digit = _is_digit(text[i - 1])
            next_digit = _is_digit(text[i + 1])
            if prev_digit and next_digit:
                if c in _INFIX_DIGIT:
                    term += c
                elif c not in _IGNORE:
                    break
            else:
                c = _INFIX_NORMALIZE.get(c, c)
                if c in _INFIX:
                    term += c
                elif c not in _IGNORE:
                    break
            i += 1

        # suffix chars: up to 3 of +/# unless followed by a word char
        # (consumed suffix chars advance the iterator even when stripped)
        base_len = len(term)
        count = 0
        while i < n and text[i] in _SUFFIX_CHARS:
            count += 1
            if count > 3:
                term = term[:base_len]
                break
            term += text[i]
            i += 1
        else:
            if i < n and _is_wordchar(text[i]):
                term = term[:base_len]

        out.append((term, i))


def scan_terms(text: str) -> list[str]:
    """Run the parse_terms state machine; yield raw (lowercased) terms in order.

    Mirrors termgenerator_internal.cc parse_terms without CJK n-gramming
    (the reference never enables FLAG_CJK_NGRAM — SURVEY.md K12).
    A regex fast path covers plain alphanumeric text (~10x); everything else
    delegates to the span scanner (one exact state machine in the codebase).
    """
    if not _NO_SPECIALS.search(text):
        return _SIMPLE_TOKEN.findall(text.lower())
    return [t for t, _ in scan_term_spans(text)]


@lru_cache(maxsize=262144)
def _scan_chunk_cached(chunk: str) -> tuple:
    return tuple(scan_terms(chunk))


def scan_terms_chunked(text: str) -> list:
    """scan_terms with a whitespace-chunk cache. Whitespace is never a word
    char, never an infix joiner and never a suffix char, so every scanner
    rule is local to a contiguous non-whitespace run: the terms of the whole
    text are exactly the concatenation of the terms of its whitespace-split
    chunks (property-tested vs scan_terms). Chunks repeat Zipf-style in
    natural text, so the lru-cache skips the state machine for the hot
    vocabulary — and a punctuation character in one chunk no longer forces
    the slow exact scanner over the entire document."""
    if not _NO_SPECIALS.search(text):
        return _SIMPLE_TOKEN.findall(text.lower())
    out: list = []
    for chunk in text.split():
        out.extend(_scan_chunk_cached(chunk))
    return out


def _should_stem(term: str) -> bool:
    # should_stem(): first codepoint must be Ll/Lt/Lm/Lo
    return bool(term) and unicodedata.category(term[0]) in _STEM_FIRST_CATS


@lru_cache(maxsize=65536)
def _stem_cached(term: str) -> str:
    return _porter2_stem(term)


def index_text(
    text: str,
    prefix: str = "",
    start_pos: int = 0,
    wdf_inc: int = 1,
) -> tuple[list[Token], int]:
    """STEM_SOME emission for one field.

    Returns (tokens, next_start_pos). Positions continue from ``start_pos``
    (the shared per-document counter — K8; field order is the caller's
    responsibility, matching /root/reference/src/main.rs:123-133).
    """
    del wdf_inc  # wdf is aggregated downstream (groupBy count) — K11
    tokens: list[Token] = []
    pos = start_pos
    for term in scan_terms(text):
        if len(term.encode("utf-8")) > MAX_TERM_BYTES:
            continue
        pos += 1
        tokens.append(Token(prefix + term, pos, False))
        if not _should_stem(term):
            continue
        stemmed = _stem_cached(term)
        if not stemmed:
            continue
        tokens.append(Token("Z" + prefix + stemmed, None, True))
    return tokens, pos


def index_document(fields: list[tuple[str, str]]) -> list[Token]:
    """Index a sequence of (prefix, text) fields with one shared position
    counter, in the given order — the reference's per-document indexing loop
    (/root/reference/src/main.rs:123-133: A, D, F, F, S, XS, K*, then body
    unprefixed)."""
    tokens: list[Token] = []
    pos = 0
    for prefix, text in fields:
        if not text:
            continue
        field_tokens, pos = index_text(text, prefix=prefix, start_pos=pos)
        tokens.extend(field_tokens)
    return tokens


def format_postings(tokens: list[Token]) -> str:
    """Render tokens in the golden format of api_termgen.cc:40-83:
    sorted terms; ``term:wdf`` when wdf differs from number of positions;
    ``term[p1,p2]`` listing positions."""
    by_term: dict[str, dict] = {}
    for t in tokens:
        e = by_term.setdefault(t.term, {"wdf": 0, "positions": []})
        e["wdf"] += 1
        if t.pos is not None:
            e["positions"].append(t.pos)
    parts = []
    for term in sorted(by_term):
        e = by_term[term]
        s = term
        if e["wdf"] != len(e["positions"]):
            s += f":{e['wdf']}"
        if e["positions"]:
            s += "[" + ",".join(str(p) for p in sorted(e["positions"])) + "]"
        parts.append(s)
    return " ".join(parts)
