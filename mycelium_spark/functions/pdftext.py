"""S9: PDF → text, pure-Python basic extractor.

The reference shells out to poppler's pdftotext
(/root/reference/src/local_indexer/local_indexer.cc:112) and 415s the doc
when it fails (:127). This container ships no poppler, so round 1 stubbed
every PDF to 415. This module implements the common subset natively:

* objects scanned linearly (no xref needed — works on appended/linearized
  files too);
* streams with /FlateDecode (stdlib zlib) or no filter;
* text-showing operators Tj, TJ, ' and " over literal ``(...)`` strings
  with the full escape table (octal, \\n, \\t, line continuations) and
  hex ``<...>`` strings when they look byte-encoded (even length, ASCII
  range after pairing);
* TD/Td/T*/ET treated as line breaks — the same newline placement
  heuristic pdftotext -layout=off uses for simple PDFs.

NOT covered (returns None → caller 415s, the reference's own failure
path): encrypted files, CID/Type0 composite fonts (ToUnicode CMaps),
LZW/DCT/CCITT filters, object streams (/ObjStm). For the plain text-PDF
corpus a local indexer actually meets, the common subset extracts.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_TEXT_OP_RE = re.compile(
    rb"""
    \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op1>Tj|'|")   # literal string shows
  | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<op2>Tj|'|")       # hex string shows
  | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ                  # array show
  | (?P<brk>T\*|TD|Td|ET)                             # line-break-ish ops
    """,
    re.X | re.S,
)
_ARR_ITEM_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt == b"":
            break
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < n and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            out += nxt
            i += 2
    return bytes(out)


def _decode_hex(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        h += b"0"  # PDF spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _stream_text(content: bytes) -> list[bytes]:
    """Text chunks from one decompressed content stream, in order."""
    chunks: list[bytes] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group("brk") is not None:
            if chunks and not chunks[-1].endswith(b"\n"):
                chunks.append(b"\n")
        elif m.group("lit") is not None:
            chunks.append(_unescape_literal(m.group("lit")))
        elif m.group("hex") is not None:
            b = _decode_hex(m.group("hex"))
            # heuristic: 2-byte CID codes (composite fonts) are not
            # decodable without the CMap — only keep byte-encoded text
            if b and all(9 <= x < 127 or x >= 160 for x in b):
                chunks.append(b)
        else:  # TJ array: concatenate its string items
            for item in _ARR_ITEM_RE.findall(m.group("arr")):
                if item.startswith(b"("):
                    chunks.append(_unescape_literal(item[1:-1]))
                else:
                    b = _decode_hex(item[1:-1])
                    if b and all(9 <= x < 127 or x >= 160 for x in b):
                        chunks.append(b)
    return chunks


def pdf_extract_text(raw: bytes) -> str | None:
    """Extract text from a PDF's content streams; None on anything the
    common-subset parser can't handle (caller maps to http_code 415,
    matching local_indexer.cc:127)."""
    if not raw.startswith(b"%PDF-"):
        return None
    if b"/Encrypt" in raw[: raw.find(b"stream") if b"stream" in raw else len(raw)]:
        return None
    chunks: list[bytes] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(raw, pos)
        if m is None:
            break
        sdict = m.group(1)
        start = m.end()
        end = raw.find(b"endstream", start)
        if end < 0:
            break
        pos = end + 9
        data = raw[start:end]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
        if b"/FlateDecode" in sdict:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in sdict:
            continue  # LZW/DCT/... unsupported
        if b"/Image" in sdict or b"/XObject" in sdict and b"BT" not in data:
            continue
        chunks.extend(_stream_text(data))
    if not chunks:
        return None
    text = b"".join(chunks)
    # pdftotext emits UTF-8; simple PDFs carry (win/standard/pdfdoc)-encoded
    # literals — latin-1 is the byte-preserving superset decode
    try:
        return text.decode("utf-8")
    except UnicodeDecodeError:
        return text.decode("latin-1")
