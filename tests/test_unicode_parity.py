"""F17 (transcoding) / F18 (case folding) fixture verification.

The reference folds case with ICU ``u_strFoldCase(U_FOLD_CASE_DEFAULT)``
(Case_folder.cc:72) and transcodes with ICU converters opened by the
declared charset name (Unicode_wrap.cc:70-105). The Python stand-ins are
``str.casefold`` (CPython implements the same Unicode CaseFolding.txt
C+F full fold, Turkic mappings excluded — identical to ICU's DEFAULT
mode) and the codecs module. These fixtures pin the equivalence on the
hard cases — full folds that change length, non-BMP code points
(UTF-16 surrogate handling in ICU), charset aliases, and fallback
behavior — with expected values taken from the Unicode/W3C charset
specs that both ICU and codecs implement.
"""

from mycelium_spark.functions.sniff import transcode_to_utf8, unicode_bom
from mycelium_spark.functions.text import fold_case

# ------------------------------------------------------------- F18 fold ---

# (input, expected) — expected values are the CaseFolding.txt C+F entries
# that ICU U_FOLD_CASE_DEFAULT applies; all are stable since Unicode 3.1.
FOLD_FIXTURES = [
    ("", ""),
    ("HeLLo WORLD", "hello world"),
    ("ÉCOLE Ålborg", "école ålborg"),
    # full folds (output longer than input) — ICU/Python both apply the F set
    ("ß", "ss"),                      # U+00DF
    ("ẞ", "ss"),                      # U+1E9E capital sharp s
    ("ﬁﬆ", "fist"),                   # U+FB01, U+FB06 ligatures
    ("İ", "i̇"),                 # U+0130: dotted capital I (non-Turkic mode)
    ("ı", "ı"),                       # U+0131 dotless i folds to itself in DEFAULT
    ("ΣΊΣΥΦΟΣ", "σίσυφοσ"),            # final-sigma NOT special-cased by folding
    ("ΐ", "ΐ"),      # U+0390 full fold to 3 code points
    # non-BMP (surrogate pairs in ICU's UTF-16 path)
    ("\U00010400", "\U00010428"),     # Deseret LONG I
    ("\U00010410\U00010428", "\U00010438\U00010428"),
    ("\U0001D400", "\U0001D400"),     # math bold A: NO fold (not cased)
]


def test_fold_case_fixtures():
    for raw, expected in FOLD_FIXTURES:
        assert fold_case(raw) == expected, (raw, fold_case(raw), expected)


def test_fold_case_idempotent_and_utf8_safe():
    sample = "Größe STRAẞE ﬁn İstanbul \U00010400\U00010401 日本語 Ꮳ"
    once = fold_case(sample)
    assert fold_case(once) == once
    # folding valid UTF-8 text always yields valid UTF-8 (ICU would throw)
    once.encode("utf-8")


# -------------------------------------------------------- F17 transcode ---

def test_transcode_declared_charsets():
    # expected bytes per the charset specs (same tables ICU ships)
    assert transcode_to_utf8("école".encode("iso-8859-1"), "ISO-8859-1") == "école".encode()
    assert transcode_to_utf8(b"\x80\x93\x94\x96", "windows-1252") == "€“”–".encode()
    assert transcode_to_utf8(b"\x83n\x83\x8d\x81[", "shift_jis") == "ハロー".encode()
    assert transcode_to_utf8("Ωμέγα".encode("iso-8859-7"), "iso-8859-7") == "Ωμέγα".encode()


def test_transcode_charset_aliases():
    # header charset tokens arrive in many spellings; ICU resolves aliases
    # case-insensitively and so do Python codecs
    raw = "déjà".encode("iso-8859-1")
    for alias in ("ISO-8859-1", "iso-8859-1", "ISO8859-1", "latin-1", "Latin1", "L1"):
        assert transcode_to_utf8(raw, alias) == "déjà".encode(), alias


def test_transcode_bom_priority_and_stripping():
    # BOM wins over the (wrong) declared charset and is stripped from the text
    text = "grüß\U00010400"
    for enc in ("utf-8-sig", "utf-16-le", "utf-16-be", "utf-32-le"):
        b = text.encode(enc)
        if not enc.startswith("utf-8"):
            import codecs

            bom = {"utf-16-le": codecs.BOM_UTF16_LE, "utf-16-be": codecs.BOM_UTF16_BE,
                   "utf-32-le": codecs.BOM_UTF32_LE}[enc]
            b = bom + b
        assert unicode_bom(b) is not None
        assert transcode_to_utf8(b, "iso-8859-1") == text.encode("utf-8"), enc


def test_transcode_fallback_chain():
    # bad declared charset -> utf-8 attempt -> latin-1 backstop
    assert transcode_to_utf8("naïve".encode("utf-8"), "no-such-charset") == "naïve".encode()
    # invalid utf-8 + no charset -> latin-1 maps bytes 1:1 to U+00..U+FF
    assert transcode_to_utf8(b"\xff\xfe\x00broken", None) is not None
    # utf-8 text survives a LYING latin-1 declaration only when the bytes
    # happen to decode; here they do (latin-1 total) — the result differs,
    # which is exactly the reference behavior of trusting the header
    assert transcode_to_utf8("é".encode("utf-8"), "iso-8859-1") == "Ã©".encode()
