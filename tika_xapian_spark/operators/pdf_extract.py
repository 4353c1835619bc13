"""Pure-Python PDF main-content text extraction.

From-scratch parser for the published PDF 1.x format (ISO 32000): locates
stream objects, FlateDecode-decompresses them with stdlib zlib, and interprets
the text-showing operators of content streams (BT/ET, Tj, TJ, ', ", Td/TD/T*/
Tm) with a simple layout model — text runs are grouped into lines by text-
matrix Y position, lines ordered top-to-bottom, runs within a line left-to-
right by X.

Scope (deliberately bounded; each unsupported feature raises or skips
deterministically):
  - supported: literal strings ``(...)`` with escapes, hex strings ``<...>``,
    FlateDecode and unfiltered streams, WinAnsi/Standard-encoding text.
  - unsupported -> NotImplementedError: encrypted documents (/Encrypt).
  - skipped silently: streams with other filters (images etc.), CID/CMap
    custom-encoded fonts (their strings decode as latin-1 best effort).

No image/audio decode libraries exist in this environment; PDF needs none.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/([A-Za-z0-9]+)")

# one content-stream token: string, hex string, number, operator, name, array
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string (no nested parens — see below)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|[-+]?\d*\.?\d+"  # number
    rb"|/[^\s/<>()\[\]{}%]+"  # name
    rb"|[A-Za-z'\"*]{1,3}"  # operator
    rb"|\[|\]",
    re.DOTALL,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> str:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and body[j : j + 1].isdigit():
                    oct_digits += body[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # unknown escape: drop backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex(tok: bytes) -> str:
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1")


def _extract_text_from_content(data: bytes) -> list[tuple[float, float, str]]:
    """Interpret text operators; return (y, x, text) runs."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    in_text = False
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok.startswith(b"("):
            stack.append(_decode_literal(tok))
        elif tok.startswith(b"<"):
            stack.append(_decode_hex(tok))
        elif tok in (b"[", b"]"):
            stack.append(tok)
        elif tok.startswith(b"/"):
            stack.append(tok)
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            stack.append(float(tok))
        else:
            op = tok
            if op == b"BT":
                in_text = True
                x = y = line_x = line_y = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tm" and len(stack) >= 6:
                x = line_x = float(stack[-2])
                y = line_y = float(stack[-1])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == b"TD":
                    leading = -ty
                line_x += tx
                line_y += ty
                x, y = line_x, line_y
            elif op == b"T*":
                line_y -= leading if leading else 12.0
                x, y = line_x, line_y
            elif op == b"TL" and stack:
                leading = float(stack[-1])
            elif op == b"Tj" and in_text:
                if stack and isinstance(stack[-1], str):
                    runs.append((y, x, stack[-1]))
            elif op in (b"'", b'"') and in_text:
                line_y -= leading if leading else 12.0
                x, y = line_x, line_y
                if stack and isinstance(stack[-1], str):
                    runs.append((y, x, stack[-1]))
            elif op == b"TJ" and in_text:
                # collect strings back to the matching '['
                parts = []
                for item in reversed(stack):
                    if item == b"[":
                        break
                    if isinstance(item, str):
                        parts.append(item)
                runs.append((y, x, "".join(reversed(parts))))
            stack = []
    return runs


def extract_pdf_text(raw: bytes) -> str:
    """Extract main text content from a PDF, layout-ordered."""
    if b"/Encrypt" in raw[:4096] or b"/Encrypt" in raw[-4096:]:
        raise NotImplementedError("encrypted PDFs")

    all_runs: list[tuple[float, float, str]] = []
    page_no = 0
    search_pos = 0
    while True:
        m = _STREAM_RE.search(raw, search_pos)
        if not m:
            break
        body = m.group(1)
        # the object dictionary precedes 'stream'
        dict_start = raw.rfind(b"<<", max(0, m.start() - 2048), m.start())
        obj_dict = raw[dict_start : m.start()] if dict_start != -1 else b""
        search_pos = m.end()

        data = None
        if _FLATE_RE.search(obj_dict):
            try:
                data = zlib.decompress(body)
            except zlib.error:
                continue
        elif _FILTER_RE.search(obj_dict):
            continue  # unsupported filter (image etc.)
        else:
            data = body
        if b"BT" not in data:
            continue
        runs = _extract_text_from_content(data)
        if runs:
            # offset pages so later pages sort after earlier ones
            all_runs.extend(((y - page_no * 1e7), x, t) for y, x, t in runs)
            page_no += 1

    if not all_runs:
        return ""

    # group into lines by y (descending = top to bottom), runs by x
    lines: dict[float, list[tuple[float, str]]] = {}
    for y, x, t in all_runs:
        key = round(y, 1)
        lines.setdefault(key, []).append((x, t))
    out_lines = []
    for y in sorted(lines, reverse=True):
        parts = [t for _x, t in sorted(lines[y], key=lambda p: p[0])]
        line = " ".join(p.strip() for p in parts if p.strip())
        if line:
            out_lines.append(line)
    return "\n".join(out_lines)
