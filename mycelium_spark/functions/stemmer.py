"""Porter / Porter2 stemmers (T3) — the indexing pipeline's stemming stage.

The reference bundles the Snowball C library for this slot
(/root/reference/3rd_party/libstemmer_c; usage doc
doc/sphinx/source/stemmer.rst:6-13 documents ``Stemmer('english')``, i.e.
Porter2). ``porter2_stem`` below is a from-scratch implementation of the
published Porter2 / Snowball-English algorithm (public algorithm,
snowballstem.org) and is parity-pinned in tests against the output of the
reference's own compiled libstemmer_c over a 47k-word vocabulary
(tests/fixtures/porter2_vocab.tsv). ``porter_stem`` (classic Porter 1980,
a genuinely different algorithm — e.g. "generously"→"gener" vs
Porter2's "generous") is kept for comparison and for the divergence test.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_vowel and cons:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    if word.endswith(suffix):
        stem = word[: len(word) - len(suffix)]
        if _measure(stem) > min_m:
            return stem + repl
    return None


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, repl in _STEP2:
        r = _replace(w, suf, repl, 0)
        if r is not None:
            w = r
            break
    # step 3
    for suf, repl in _STEP3:
        r = _replace(w, suf, repl, 0)
        if r is not None:
            w = r
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ====================================================================
# Porter2 (Snowball English) — the reference's documented stemmer
# ====================================================================
# Implemented from the published algorithm description; every structural
# quirk below (longest-suffix match LIMITED to the R1/R2 region, the
# atmark-p1 short-word test in step 1b, gener/commun/arsen R1 prefixes)
# follows the Snowball english.sbl semantics.

_V2 = frozenset("aeiouy")  # consonant-y is rewritten to 'Y' (not in set)
_DOUBLE2 = frozenset(("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"))
_LI_END = frozenset("cdeghkmnrt")

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# (suffix, replacement) longest-first; None replacement = conditional action
_P2_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("alli", "al"), ("ator", "ate"),
    ("bli", "ble"), ("ogi", None),
    ("li", None),
)
_P2_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""),
    ("ful", ""),
)
_P2_STEP4 = (
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
)


def _shortv(w: str, i: int) -> bool:
    """Short-syllable test with the cursor at position i (end of region):
    ...[non-v][v][non-v except w/x/Y]  or the whole word is [v][non-v]."""
    if i >= 3 and w[i - 1] not in _V2 and w[i - 1] not in "wxY" \
            and w[i - 2] in _V2 and w[i - 3] not in _V2:
        return True
    return i == 2 and w[0] in _V2 and w[1] not in _V2


def _gopast_v(w: str, i: int) -> int | None:
    while i < len(w):
        if w[i] in _V2:
            return i + 1
        i += 1
    return None


def _gopast_nonv(w: str, i: int) -> int | None:
    while i < len(w):
        if w[i] not in _V2:
            return i + 1
        i += 1
    return None


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        i = _gopast_v(w, 0)
        if i is not None:
            i = _gopast_nonv(w, i)
        if i is not None:
            p1 = i
    p2 = n
    i = _gopast_v(w, p1)
    if i is not None:
        i = _gopast_nonv(w, i)
    if i is not None:
        p2 = i
    return p1, p2


def porter2_stem(word: str) -> str:
    w = word.lower()
    if w in _EXC1:
        return _EXC1[w]
    if len(w) < 3:
        return w
    # prelude: strip one leading apostrophe; mark consonant-y as Y
    if w[0] == "'":
        w = w[1:]
    chars = list(w)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _V2):
            chars[i] = "Y"
    w = "".join(chars)
    p1, p2 = _mark_regions(w)

    # step 0: longest of 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) >= 5 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _V2 for c in w[:-2]):
            w = w[:-1]
    if w in _EXC2:
        return w.replace("Y", "y")
    # step 1b
    for suf in ("eedly", "ingly", "eed", "edly", "ing", "ed"):
        if w.endswith(suf):
            if suf in ("eed", "eedly"):
                if len(w) - len(suf) >= p1:
                    w = w[: len(w) - len(suf)] + "ee"
            else:
                stem = w[: len(w) - len(suf)]
                if any(c in _V2 for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w[-2:] in _DOUBLE2:
                        w = w[:-1]
                    elif len(w) == p1 and _shortv(w, len(w)):
                        w += "e"
            break
    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if len(w) >= 3 and w[-1] in "yY" and w[-2] not in _V2:
        w = w[:-1] + "i"
    # Steps 2-4 commit to the LONGEST matching word suffix, THEN test the
    # R1/R2 condition — if it fails nothing happens (no fallback to a
    # shorter suffix). This is the bundled libstemmer's among semantics
    # (find_among_b unrestricted, then r_R1/r_R2 as a guard): "element"
    # keeps 'ement' out of R2 and must NOT fall back to deleting 'ent'.
    # step 2 (in R1)
    for suf, repl in _P2_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                stem = w[: len(w) - len(suf)]
                if suf == "ogi":
                    if stem.endswith("l"):
                        w = stem + "og"
                elif suf == "li":
                    if stem and stem[-1] in _LI_END:
                        w = stem
                else:
                    w = stem + repl
            break
    # step 3 (in R1; 'ative' additionally needs R2)
    for suf, repl in _P2_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                stem = w[: len(w) - len(suf)]
                if suf == "ative":
                    if len(stem) >= p2:
                        w = stem
                else:
                    w = stem + repl
            break
    # step 4 (in R2; 'ion' additionally needs preceding s/t)
    for suf in _P2_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                stem = w[: len(w) - len(suf)]
                if suf == "ion":
                    if stem.endswith(("s", "t")):
                        w = stem
                else:
                    w = stem
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1 and not _shortv(w, len(w) - 1)):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= p2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]
    return w.replace("Y", "y")
