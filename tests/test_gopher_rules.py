"""Gopher-style quality filter: each rule branch fires on a crafted doc."""

from pyspark.sql import functions as F

from mycelium_spark.operators.quality import gopher_rules

GOOD = ("the quick brown fox jumps over that lazy dog and friends have "
        "gathered with many other animals to watch the famous race today "
        "which everyone agrees will be remembered for years to come since "
        "the weather is perfect and the track has been prepared with care")


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_rules(docs, **kw).collect()
    return {r.doc_id: (r.keep, r.fail_reason) for r in out}


def test_each_rule_fires(spark):
    rows = [
        (0, GOOD),
        (1, "too short"),
        (2, " ".join(["ab"] * 60)),                      # mean word len < 3
        (3, " ".join(["extraordinarily"] * 60)),         # mean word len > 10
        (4, GOOD + " " + "#" * 1 + " ####### ## ## ##"), # symbols
        (6, "\n".join([GOOD + "..."] * 10)),             # ellipsis lines
        (7, " ".join(["12345"] * 60)),                   # non-alpha words
        (8, " ".join(["zebra"] * 60)),                   # no stopwords
    ]
    got = _run(spark, rows, min_words=40)
    assert got[0] == (True, None)
    assert got[1] == (False, "too_few_words")
    assert got[2] == (False, "mean_word_len_low")
    assert got[3] == (False, "mean_word_len_high")
    assert got[4][1] == "symbol_ratio"
    assert got[6][1] == "ellipsis_lines"
    assert got[7][1] == "non_alpha_words"
    assert got[8][1] == "too_few_stopwords"


def test_bullet_rule(spark):
    # >90% of lines are bullets but everything else is fine
    body = "\n".join(["- " + GOOD] * 30)
    got = _run(spark, [(0, body)], max_bullet_frac=0.5)
    assert got[0] == (False, "bullet_lines")


def test_word_count_bounds(spark):
    got = _run(spark, [(0, GOOD)], min_words=10, max_words=20)
    assert got[0] == (False, "too_many_words")


def test_filter_keeps_majority_of_clean_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = gopher_rules(docs, min_words=5, min_stop_hits=0)
    n = docs.count()
    kept = out.filter("keep").count()
    assert kept > 0.9 * n  # clean synthetic prose passes at a low word bound


# ---------------------------------------------- repetition half ----------
from mycelium_spark.operators.quality import (  # noqa: E402
    repetition_features,
    repetition_filter,
)


def _rep(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_filter(docs).collect()
    return {r.doc_id: (r.keep, r.fail_reason) for r in out}


def test_repetition_rules_fire(spark):
    l1 = "alpha beta gamma delta"
    l2 = "epsilon zeta eta theta"
    l3 = "iota kappa lambda mu nu"
    # clean doc long enough that no single n-gram covers >16% of it
    clean = "\n".join(
        " ".join(f"word{i}x{j}" for j in range(8)) for i in range(6)
    )
    rows = [
        (0, clean),
        (1, "\n".join([l1, l2, l1, l1])),                      # 2/4 dup lines
        # dup paragraph whose lines stay below the line threshold:
        # paras = [A, B(6 distinct lines), A] → para dup 1/3 > 0.3,
        # line dup 2/10 = 0.2 ≤ 0.3
        (2, "aa bb\n\n" + "\n".join(
            f"line{i} word{i} tail{i} extra{i} pad{i}" for i in range(6)
        ) + "\n\naa bb"),
        (3, l1 + " " + "foo bar " * 12),                       # hot 2-gram
    ]
    got = _rep(spark, rows)
    assert got[0] == (True, None)
    assert got[1][1] == "dup_lines"
    assert got[2][1] == "dup_paras"
    assert got[3][1] == "top_2gram"


def test_repetition_boundaries(spark):
    """all-but-first convention + exact threshold semantics (> not >=)."""
    # 10 lines, 3 of them duplicates of line0 → dup_line_frac = 0.3,
    # NOT > 0.3 → the line rule must NOT fire
    base = [f"u{i} v{i} w{i} longish{i} trailer{i}" for i in range(7)]
    at_thr = "\n".join(base + ["u0 v0 w0 longish0 trailer0"] * 3)
    feats = {
        r.doc_id: r
        for r in repetition_features(
            spark.createDataFrame([(0, at_thr)], "doc_id long, text string")
        ).collect()
    }
    assert abs(feats[0].dup_line_frac - 0.3) < 1e-9
    got = _rep(spark, [(0, at_thr)])
    assert got[0][1] != "dup_lines"


def test_repetition_short_doc_ngram_zero(spark):
    feats = repetition_features(
        spark.createDataFrame([(0, "single")], "doc_id long, text string")
    ).collect()[0]
    assert feats.top2gram_char_frac == 0.0
    assert feats.top4gram_char_frac == 0.0


def test_dup_ngram_coverage_union_semantics(spark):
    """dup-n-gram char fraction: ALL occurrences of a repeated n-gram
    count, overlap counted once (union of covered token positions)."""
    # phrase of 6 tokens repeated twice, long distinct filler between
    phrase = "aa bb cc dd ee ff"
    filler = " ".join(f"fill{i}word{i}" for i in range(40))
    text = f"{phrase} {filler} {phrase}"
    feats = repetition_features(
        spark.createDataFrame([(0, text)], "doc_id long, text string")
    ).collect()[0]
    # covered tokens: both phrase occurrences (12 tokens x 2 chars);
    # denominator = charlen(text)
    expected = round(2 * (6 * 2) / len(text), 6)
    assert abs(feats.dup5gram_char_frac - expected) < 1e-9
    assert abs(feats.dup6gram_char_frac - expected) < 1e-9
    # no 7-gram repeats (phrase is only 6 tokens)
    assert feats.dup7gram_char_frac == 0.0


def test_dup_ngram_rule_fires_and_is_strict(spark):
    # 12-token phrase of LONG tokens: any single 4-gram covers < 16% of
    # the doc (top-n-gram rules stay quiet) but the repeated phrase
    # covers ~37% → the first dup-n-gram rule names the failure
    phrase = " ".join(f"phrase{i:02d}" for i in range(12))
    filler = " ".join(f"fillword{i:02d}" for i in range(30))
    doc_fail = f"{phrase} {filler} {phrase}"
    got = _rep(spark, [(0, doc_fail)])
    assert got[0][1] == "dup_5gram"  # first dup rule in order fires
