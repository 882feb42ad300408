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


# ---- Type0 / ToUnicode composite fonts (round-3 addition) ----

_CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    b"3 beginbfchar\n<0048> <0048>\n<0065> <0065>\n<0001> <00660066>\nendbfchar\n"
    b"2 beginbfrange\n<006C> <006F> <006C>\n<0041> <0042> [<0058> <0059>]\nendbfrange\n"
    b"endcmap\nendcmap end\n"
)


def _type0_pdf(content: bytes, cmap: bytes = _CMAP, flate_cmap: bool = False) -> bytes:
    data = zlib.compress(cmap) if flate_cmap else cmap
    filt = b" /Filter /FlateDecode" if flate_cmap else b""
    extra = (
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake"
        b" /Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n"
        b"6 0 obj << /Length " + str(len(data)).encode() + filt + b" >>\n"
        b"stream\n" + data + b"\nendstream\nendobj\n"
        b"7 0 obj << /Resources << /Font << /F9 5 0 R >> >> >> endobj\n"
    )
    return _pdf(content, extra=extra)


def test_type0_hex_cids_decode_through_tounicode():
    # "Hello": H,e via bfchar; l,l,o via the continuous bfrange
    c = b"BT /F9 12 Tf <00480065006C006C006F> Tj ET"
    assert pdf_extract_text(_type0_pdf(c)) == "Hello\n"


def test_type0_flate_cmap_and_array_range_and_multichar_dst():
    # X,Y from the array-form bfrange; "ff" ligature from the 2-char dst
    c = b"BT /F9 12 Tf <00410042> Tj <0001> Tj ET"
    assert pdf_extract_text(_type0_pdf(c, flate_cmap=True)) == "XYff\n"


def test_type0_literal_string_cids():
    # 2-byte CID codes inside a LITERAL string: \x00H \x00e
    c = b"BT /F9 12 Tf (\x00H\x00e) Tj ET"
    assert pdf_extract_text(_type0_pdf(c)) == "He\n"


def test_type0_font_switch_mid_stream():
    # Type0 text, then a simple font: each segment decodes by its own rules
    c = b"BT /F9 12 Tf <0048> Tj /F1 12 Tf (plain) Tj ET"
    assert pdf_extract_text(_type0_pdf(c)) == "Hplain\n"


def test_type0_all_unmapped_is_415():
    c = b"BT /F9 12 Tf <FFFE> Tj ET"  # code absent from the CMap
    assert pdf_extract_text(_type0_pdf(c)) is None


def test_type0_without_tounicode_still_415_path():
    # Type0 font but NO /ToUnicode: hex CIDs stay undecodable → skipped
    extra = (
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake"
        b" /Encoding /Identity-H >> endobj\n"
        b"7 0 obj << /Resources << /Font << /F9 5 0 R >> >> >> endobj\n"
    )
    c = b"BT /F9 12 Tf <00480065> Tj ET"
    assert pdf_extract_text(_pdf(c, extra=extra)) is None
