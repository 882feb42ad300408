"""Tokenizer / text-utility parity tests (SURVEY.md §2.8, F14-F15)."""

from mycelium_spark.functions.text import (
    filter_ascii_control,
    fold_case,
    lang_id,
    quality_features,
    sgml_stripper,
    token_count,
    tokenize,
    valid_utf8,
    word_tokenize,
)


def test_tokenize_t1():
    # split on runs of spaces, keep ^\w+$ tokens (dist/utils/__init__.py:69-73)
    assert tokenize("the quick  brown fox!") == ["the", "quick", "brown"]
    assert tokenize("a b-c d_e 42") == ["a", "d_e", "42"]
    assert tokenize("") == []


def test_word_tokenize_t2():
    # words, numbers, contractions (dist/utils/__init__.py:76-81)
    toks = word_tokenize("it's a test-case, isn't it?")
    assert "it" in toks and "'s" in toks and "test" in toks and "case" in toks
    assert "," not in toks and "?" not in toks


def test_filter_ascii_control_f14():
    # drops <=0x09, 0x0E-0x1F, 0x7F; keeps \n \v \f \r (local_indexer.cc:74-82)
    assert filter_ascii_control(b"a\x00b\x08c\td\ne\x0bf\x0cg\rh\x1fi\x7fj") == b"abcd\ne\x0bf\x0cg\rhij"


def test_valid_utf8_f15():
    assert valid_utf8("already str")
    assert valid_utf8("héllo".encode("utf-8"))
    assert not valid_utf8(b"\xff\xfe")
    assert not valid_utf8("x".encode("utf-16"))
    # the W3C regex rejects low control bytes (quirk of the reference)
    assert not valid_utf8(b"a\x00b")


def test_sgml_stripper_t4():
    assert sgml_stripper(b"<p>a &amp; b</p>") == b"a & b"
    assert sgml_stripper("no tags") == b"no tags"
    # unknown entity deleted by the entity pass
    assert sgml_stripper(b"x &bogus; y") == b"x  y"


def test_fold_case_f18():
    assert fold_case("HeLLo") == "hello"
    assert fold_case("STRASSE") == "strasse"
    assert fold_case("straße") == "strasse"  # full fold, like ICU default


def test_lang_id_heuristic():
    assert lang_id("the cat sat on the mat with a hat") == "en"
    assert lang_id("der hund und die katze ist nicht da") == "de"
    assert lang_id("xyzzy plugh") == "und"


def test_quality_features():
    f = quality_features("the cat. sat!")
    assert f["n_tokens"] == 3
    assert f["n_chars"] == 13
    assert 0 < f["alpha_ratio"] < 1
    assert f["stopword_ratio"] > 0


def test_token_count():
    ws, bpe = token_count("hello world 42!")
    assert ws == 3
    assert bpe == 5  # hello, world, '4', '2', '!'
