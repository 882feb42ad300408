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
