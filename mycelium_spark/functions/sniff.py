"""Byte-level sniffers & digests (F15/F16/F17/F19).

Spark-side equivalents of the reference's utils charset/digest helpers:
* ``unicode_bom`` — BOM detection (decl /root/reference/src/common/utils.hh:162-172);
* ``looks_ascii`` / ``looks_latin1`` / ``looks_utf8`` — cheap encoding
  detectors (utils.cc:394+, utils.hh:149-166);
* ``transcode_to_utf8`` — any-encoding → UTF-8 (the ICU converter wrapper,
  Unicode_wrap.cc, via Python codecs);
* ``sha1_hex`` — digest helpers (utils.cc:274-300; in DataFrame plans use
  the built-in ``F.sha1``/``F.sha2`` instead).
"""

from __future__ import annotations

import hashlib

from .text import valid_utf8

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def unicode_bom(b: bytes) -> str | None:
    """Returns the encoding named by a leading BOM, else None."""
    for bom, enc in _BOMS:
        if b.startswith(bom):
            return enc
    return None


def looks_ascii(b: bytes) -> bool:
    return all(c < 0x80 for c in b)


def looks_utf8(b: bytes) -> bool:
    return valid_utf8(b)


def looks_latin1(b: bytes) -> bool:
    """Printable latin-1: no C1 gap bytes used as text is a heuristic the
    reference also uses — treat any byte string as decodable latin-1 but
    flag C1 controls (0x80-0x9F) as suspicious."""
    return not any(0x80 <= c <= 0x9F for c in b)


def pdf_magic(b: bytes) -> str | None:
    """PDF version sniff (utils.hh:168-172): '%PDF-1.x' header."""
    if b.startswith(b"%PDF-") and len(b) >= 8:
        return b[5:8].decode("latin-1")
    return None


def transcode_to_utf8(b: bytes, charset: str | None) -> bytes | None:
    """F17: decode with the declared charset (fallback sniff) → UTF-8 bytes;
    None when the bytes don't decode."""
    encodings = []
    bom = unicode_bom(b)
    if bom:
        for bom_bytes, enc in _BOMS:
            if enc == bom:
                b = b[len(bom_bytes):]  # strip the BOM from the text
                break
        encodings.append(bom)
    if charset:
        encodings.append(charset)
    encodings += ["utf-8", "latin-1"]
    for enc in encodings:
        try:
            return b.decode(enc).encode("utf-8")
        except (LookupError, UnicodeDecodeError):
            continue
    return None


def sha1_hex(b: bytes | str) -> str:
    if isinstance(b, str):
        b = b.encode("utf-8")
    return hashlib.sha1(b).hexdigest()


def make_hex_dump(b: bytes | str) -> str:
    """F20: debug hex dump, '%02x ' per byte incl. the trailing space
    (utils.cc:305-314 makeHexDump)."""
    if isinstance(b, str):
        b = b.encode("utf-8")
    return "".join(f"{x:02x} " for x in b)
