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


# ---- round-4 additions: LZW, cross-stream font state, CID literals ----

def _lzw_encode_9bit(data: bytes) -> bytes:
    """Minimal TIFF/PDF LZW encoder for fixtures (table stays < 512
    entries → fixed 9-bit codes; clear up front, EOD at the end)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes = [256]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
        else:
            codes.append(table[w])
            table[w + c] = next_code
            next_code += 1
            w = c
    if w:
        codes.append(table[w])
    codes.append(257)
    assert next_code < 511  # fixture must stay within 9-bit codes
    buf = 0
    nbits = 0
    out = bytearray()
    for code in codes:
        buf = (buf << 9) | code
        nbits += 9
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_stream_extracts():
    content = b"BT (lzw compressed text) Tj 0 -14 Td (second line) Tj ET"
    data = _lzw_encode_9bit(content)
    raw = (
        b"%PDF-1.4\n"
        b"4 0 obj << /Length " + str(len(data)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + data
        + b"\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_extract_text(raw) == "lzw compressed text\nsecond line\n"


def test_lzw_decode_roundtrip_and_corrupt():
    from mycelium_spark.functions.pdftext import lzw_decode

    msg = b"abcabcabcabc repeated payload " * 8
    assert lzw_decode(_lzw_encode_9bit(msg)) == msg
    # first code must be a literal — a table reference up front is corrupt
    assert lzw_decode(b"\xff\xff\xff") is None


def test_font_state_threads_across_streams():
    """A Tf issued in one content stream persists into the next (the PDF
    spec concatenates a page's streams) — Type0 hex text in a
    continuation stream decodes through the earlier stream's CMap."""
    s2 = b"BT <0065> Tj ET"
    extra = (
        b"8 0 obj << /Length " + str(len(s2)).encode() + b" >>\n"
        b"stream\n" + s2 + b"\nendstream\nendobj\n"
    )
    c = b"BT /F9 12 Tf <0048> Tj ET"
    raw = _type0_pdf(c)
    raw = raw.replace(b"trailer", extra + b"trailer")
    assert pdf_extract_text(raw) == "H\ne\n"


def test_type0_without_tounicode_literal_cids_not_leaked():
    """Literal-string CIDs under a Type0 font with no ToUnicode must be
    DROPPED (glyph ids are not text), not emitted as raw bytes; a doc
    with only such text 415s — the reference's pdftotext-failed path
    (local_indexer.cc:127)."""
    extra = (
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake"
        b" /Encoding /Identity-H >> endobj\n"
        b"7 0 obj << /Resources << /Font << /F9 5 0 R >> >> >> endobj\n"
    )
    c = b"BT /F9 12 Tf (\x00H\x00e) Tj ET"
    assert pdf_extract_text(_pdf(c, extra=extra)) is None
    # ...but other real text in the doc still extracts (partial doc)
    c2 = b"BT /F9 12 Tf (\x00H) Tj /F1 12 Tf (visible) Tj ET"
    assert pdf_extract_text(_pdf(c2, extra=extra)) == "visible\n"


# ---- round-5 additions: /ObjStm object streams ----

def _objstm_pdf(content: bytes, flate_stm: bool = True, extra_payload: bytes = b"") -> bytes:
    """Font dict + /Font resource dict live INSIDE a compressed /ObjStm
    (the modern-writer layout); the ToUnicode CMap stays a regular stream
    object (streams may not nest in an ObjStm)."""
    bodies = [
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake"
            b" /Encoding /Identity-H /ToUnicode 6 0 R >>"),
        (7, b"<< /Resources << /Font << /F9 5 0 R >> >> >>"),
    ]
    payload = b""
    offs = []
    for num, body in bodies:
        offs.append((num, len(payload)))
        payload += body + b"\n"
    payload += extra_payload
    header = b" ".join(b"%d %d" % (n, o) for n, o in offs) + b"\n"
    first = len(header)
    stm = header + payload
    data = zlib.compress(stm) if flate_stm else stm
    filt = b" /Filter /FlateDecode" if flate_stm else b""
    extra = (
        b"8 0 obj << /Type /ObjStm /N 2 /First " + str(first).encode() + filt
        + b" /Length " + str(len(data)).encode() + b" >>\n"
        b"stream\n" + data + b"\nendstream\nendobj\n"
        b"6 0 obj << /Length " + str(len(_CMAP)).encode() + b" >>\n"
        b"stream\n" + _CMAP + b"\nendstream\nendobj\n"
    )
    return _pdf(content, extra=extra)


def test_objstm_type0_text_extracts():
    # the round-4 gap: font + resources only reachable through the ObjStm
    c = b"BT /F9 12 Tf <00480065006C006C006F> Tj ET"
    assert pdf_extract_text(_objstm_pdf(c)) == "Hello\n"


def test_objstm_uncompressed_variant():
    c = b"BT /F9 12 Tf <0048> Tj ET"
    assert pdf_extract_text(_objstm_pdf(c, flate_stm=False)) == "H\n"


def test_objstm_payload_is_not_page_text():
    # a Tj-shaped string inside the ObjStm payload must never leak into
    # the extracted text (the page-text pass skips /ObjStm streams)
    c = b"BT (real) Tj ET"
    out = pdf_extract_text(_objstm_pdf(c, extra_payload=b"9 0: (leak) Tj\n"))
    assert out == "real\n"


def test_objstm_encrypted_still_415():
    enc = _objstm_pdf(b"BT /F9 12 Tf <0048> Tj ET").replace(
        b"1 0 obj <<", b"1 0 obj << /Encrypt 9 0 R"
    )
    assert pdf_extract_text(enc) is None
