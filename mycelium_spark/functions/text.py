"""Tokenizer / text-analysis surface (SURVEY.md §2.8 + training-data ops).

Ports the reference's Python utilities:
* ``tokenize`` — split on spaces, keep ``^\\w+$`` tokens
  (/root/reference/dist/utils/__init__.py:69-73);
* ``word_tokenize`` — words, numbers, contractions
  (dist/utils/__init__.py:76-81);
* ``filter_ascii_control`` — drop bytes <=0x09, 0x0E-0x1F, 0x7F keeping
  \\n \\x0b \\x0c \\r (local_indexer.cc:74-82);
* ``valid_utf8`` — the W3C regex check (dist/utils/__init__.py:4-28);
* ``sgml_stripper`` — tag strip + entity replace (dist/utils/sgml_stripper.py);
* ``fold_case`` — full Unicode case fold (Case_folder.cc:40-122 uses ICU
  u_strFoldCase default; Python str.casefold matches for BMP).

Plus the training-data text kernels (language-ID heuristic, quality
scoring, token counting, fingerprinting) used by operators/quality.py —
the Spark versions of those are pure JVM expressions; these Python twins
exist for unit tests and local use.
"""

from __future__ import annotations

import re

from .entities import replace_all_entities

_TOKENIZE_SPLIT = re.compile(r" +", re.UNICODE)
_TOKENIZE_KEEP = re.compile(r"^\w+$", re.UNICODE)


def tokenize(txt: str) -> list[str]:
    """T1: split on runs of spaces, keep word-only tokens."""
    return [t for t in _TOKENIZE_SPLIT.split(txt) if _TOKENIZE_KEEP.match(t)]


_WORD_TOKENIZE_SPLIT = re.compile(r"(\s+|\'s|-|\'m|\'d|\x21-\x2F|\W)", re.UNICODE)
_WORD_TOKENIZE_KEEP = re.compile(r"^(:?\w+|\'|\'s|\'m|\'d)$", re.UNICODE)


def word_tokenize(txt: str) -> list[str]:
    """T2: words, numbers and contracted suffixes as separate tokens."""
    return [t for t in _WORD_TOKENIZE_SPLIT.split(txt) if t and _WORD_TOKENIZE_KEEP.match(t)]


# F14: keep \n(0x0A) \v(0x0B) \f(0x0C) \r(0x0D); drop other C0 controls + DEL
_CONTROL_RE = re.compile(rb"[\x00-\x09\x0e-\x1f\x7f]")


def filter_ascii_control(b: bytes) -> bytes:
    return _CONTROL_RE.sub(b"", b)


# F15: W3C valid-UTF-8 byte regex (dist/utils/__init__.py:6-16); note it also
# rejects C0 controls below 0x07 and 0x0E-0x1F by design
_VALID_UTF8_RE = re.compile(
    rb"""(?:
    [\x07-\x0D\x20-\x7E]
   | [\xC2-\xDF][\x80-\xBF]
   |  \xE0[\xA0-\xBF][\x80-\xBF]
   | [\xE1-\xEC\xEE\xEF][\x80-\xBF]{2}
   |  \xED[\x80-\x9F][\x80-\xBF]
   |  \xF0[\x90-\xBF][\x80-\xBF]{2}
   | [\xF1-\xF3][\x80-\xBF]{3}
   |  \xF4[\x80-\x8F][\x80-\xBF]{2}
)*\Z""",
    re.X,
)


def valid_utf8(b: bytes | str) -> bool:
    if isinstance(b, str):
        return True
    return _VALID_UTF8_RE.match(b) is not None


_STRIP_TAGS_RE = re.compile(rb"<[^>]*?>")
_ENTITY_PRESENT_RE = re.compile(rb"&#?[-\w\d:.]+;")


def sgml_stripper(s: bytes | str) -> bytes:
    """T4: strip tags then replace entities (dist/utils/sgml_stripper.py)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    s = _STRIP_TAGS_RE.sub(b"", s)
    if not _ENTITY_PRESENT_RE.search(s):
        return s
    return replace_all_entities(s)


def fold_case(s: str) -> str:
    """F18: full Unicode case fold (ICU default ≈ str.casefold)."""
    return s.casefold()


# --- training-data text kernels (Python twins of operators/quality.py) ---

# tiny per-language stopword profiles for the n-gram/stopword langid heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "von", "mit", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "por", "para", "que"),
}


def lang_id(text: str) -> str:
    """Stopword-profile language ID; 'und' when no profile scores > 0."""
    tokens = text.lower().split(" ")
    best_lang, best_score = "und", 0
    for lang in sorted(LANG_PROFILES):
        score = sum(1 for t in tokens if t in LANG_PROFILES[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_features(text: str) -> dict:
    """Length/punct/stopword quality features (all SQL-expressible)."""
    n_chars = len(text)
    tokens = [t for t in text.split(" ") if t]
    n_tokens = len(tokens)
    n_alpha = sum(1 for c in text if c.isalpha())
    n_punct = sum(1 for c in text if c in ".,;:!?'\"()-")
    stop = LANG_PROFILES["en"]
    n_stop = sum(1 for t in tokens if t.lower() in stop)
    mean_len = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / n_chars if n_chars else 0.0,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_tokens if n_tokens else 0.0,
        "mean_token_len": mean_len,
    }


_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def token_count(text: str) -> tuple[int, int]:
    """(whitespace tokens, BPE-ish regex tokens)."""
    ws = len([t for t in text.split(" ") if t])
    bpe = len(_BPEISH_RE.findall(text))
    return ws, bpe


_FP_MOD = (1 << 31) - 1


def small_hash(token: str) -> int:
    """28-bit content hash derived from md5 — identical in Spark SQL and
    DuckDB (conv(substr(md5(x),1,7),16,10)), enabling exact oracles."""
    import hashlib

    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:7], 16)


def fingerprint(text: str) -> int:
    """Order-sensitive rolling hash over space tokens, mod 2^31-1."""
    h = 0
    for t in text.split(" "):
        h = (h * 31 + small_hash(t)) % _FP_MOD
    return h
