"""PDF layout-parser tests over hand-built minimal PDFs (uncompressed and
FlateDecode content streams, multi-line Td/TD/T* layout, escapes, hex
strings) plus the unsupported-feature gates."""

import zlib

import pytest

from tika_xapian_spark.operators.extract import parse_page, sniff_doc_type
from tika_xapian_spark.operators.pdf_extract import extract_pdf_text


def make_pdf(content: bytes, compress: bool = False) -> bytes:
    """Assemble a minimal single-page PDF around one content stream."""
    if compress:
        body = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        body = content
        filt = b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << "
        + filt
        + b"/Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj",
    ]
    out = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    return out


SIMPLE_CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj "
    b"0 -14 Td (Second line here) Tj ET"
)


class TestPdfText:
    def test_uncompressed(self):
        text = extract_pdf_text(make_pdf(SIMPLE_CONTENT))
        assert text == "Hello PDF world\nSecond line here"

    def test_flate_compressed(self):
        text = extract_pdf_text(make_pdf(SIMPLE_CONTENT, compress=True))
        assert text == "Hello PDF world\nSecond line here"

    def test_tj_array_and_hex(self):
        content = (
            b"BT 72 700 Td [(Part) (ial)] TJ "
            b"0 -20 Td <48657820 6c696e65> Tj ET"
        )
        text = extract_pdf_text(make_pdf(content))
        assert text == "Partial\nHex line"

    def test_escapes_and_octal(self):
        content = rb"BT 72 700 Td (Paren \(x\) and \110i) Tj ET"
        text = extract_pdf_text(make_pdf(content))
        assert text == "Paren (x) and Hi"

    def test_tstar_leading(self):
        content = (
            b"BT 14 TL 72 720 Td (line one) Tj T* (line two) Tj T* (line three) Tj ET"
        )
        text = extract_pdf_text(make_pdf(content))
        assert text == "line one\nline two\nline three"

    def test_x_order_within_line(self):
        content = b"BT 200 700 Td (right) Tj ET BT 72 700 Td (left) Tj ET"
        text = extract_pdf_text(make_pdf(content))
        assert text == "left right"

    def test_encrypted_rejected(self):
        raw = b"%PDF-1.4\n/Encrypt 5 0 R\n%%EOF"
        with pytest.raises(NotImplementedError):
            extract_pdf_text(raw)

    def test_garbage_empty(self):
        assert extract_pdf_text(b"%PDF-1.4\nnothing here\n%%EOF") == ""


class TestPdfViaExtractPage:
    def test_sniff_and_parse(self):
        pdf = make_pdf(SIMPLE_CONTENT, compress=True)
        assert sniff_doc_type(pdf) == "pdf"
        d = parse_page("https://h.example/doc.pdf", pdf)
        assert d["status"] == "ok"
        assert d["doc_type"] == "pdf"
        assert d["body"] == "Hello PDF world\nSecond line here"
        assert bytes(d["body_bytes"]) == b"Hello PDF world\nSecond line here"

    def test_encrypted_to_error_channel(self):
        d = parse_page("u/enc.pdf", b"%PDF-1.4\n/Encrypt 5 0 R\n%%EOF")
        assert d["status"] == "error"
        assert "not supported" in d["error"]
