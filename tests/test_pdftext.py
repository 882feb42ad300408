"""S9 PDF→text: the native common-subset extractor vs hand-built PDFs.

The fixtures are minimal spec-valid PDFs constructed in the test (the
container has no PDF tooling to generate them), covering: uncompressed
and FlateDecode content streams, Tj / TJ-array / quote operators, escape
sequences, octal escapes, hex strings, line-break operators, and the
documented failure paths (encrypted, unsupported filter, no text) that
must return None → http 415 like the reference's pdftotext failure
branch (local_indexer.cc:127).
"""

import zlib

from mycelium_spark.functions.pdftext import pdf_extract_text


def _pdf(content: bytes, flate: bool = False, extra: bytes = b"") -> bytes:
    filt = b""
    data = content
    if flate:
        data = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(data)).encode() + filt + b" >>\n"
        b"stream\n" + data + b"\nendstream\nendobj\n"
        + extra +
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def test_simple_tj():
    c = b"BT /F1 12 Tf 72 720 Td (Hello world) Tj ET"
    assert pdf_extract_text(_pdf(c)) == "Hello world\n"


def test_flate_stream_and_lines():
    c = b"BT (line one) Tj 0 -14 Td (line two) Tj T* (line three) Tj ET"
    out = pdf_extract_text(_pdf(c, flate=True))
    assert out == "line one\nline two\nline three\n"


def test_tj_array_and_escapes():
    c = rb"BT [(kern)-120(ed \(text\))] TJ 0 -14 Td (tab\there \\ oct\101) Tj ET"
    out = pdf_extract_text(_pdf(c))
    assert out == "kerned (text)\ntab\there \\ octA\n"


def test_hex_string_bytes():
    c = b"BT <48656C6C6F> Tj ET"
    assert pdf_extract_text(_pdf(c)) == "Hello\n"


def test_cid_hex_skipped_not_mojibake():
    # 2-byte CID codes (\x00H...) are NOT decodable without the CMap —
    # must be skipped, never emitted as NUL-laden garbage
    c = b"BT <00480065> Tj (ok) Tj ET"
    assert pdf_extract_text(_pdf(c)) == "ok\n"


def test_failure_paths_return_none():
    assert pdf_extract_text(b"not a pdf") is None
    assert pdf_extract_text(_pdf(b"BT ET")) is None  # no text shown
    # unsupported filter
    raw = _pdf(b"xx").replace(b"/Length", b"/Filter /DCTDecode /Length")
    assert pdf_extract_text(raw) is None
    # encrypted
    enc = _pdf(b"BT (secret) Tj ET").replace(
        b"1 0 obj <<", b"1 0 obj << /Encrypt 9 0 R"
    )
    assert pdf_extract_text(enc) is None


def test_index_local_files_pdf_200_and_415(spark):
    from mycelium_spark.sources.files import index_local_files

    good = _pdf(b"BT (indexed text) Tj ET", flate=True)
    bad = b"%PDF-1.4 broken"
    df = spark.createDataFrame(
        [("/tmp/a.pdf", bytearray(good), "pdf"), ("/tmp/b.pdf", bytearray(bad), "pdf")],
        ["path", "content", "ext"],
    )
    rows = {r["url"]: r for r in index_local_files(df).collect()}
    a = rows["file:///tmp/a.pdf"]
    b = rows["file:///tmp/b.pdf"]
    assert a["http_code"] == 200 and "indexed text" in a["text"]
    assert b["http_code"] == 415 and b["text"] is None
