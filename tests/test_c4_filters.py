"""C4 line/document filters (Raffel et al. 2020 §2.2): branch and
boundary coverage + a DuckDB-twin parity check on constructed docs."""

import duckdb
import pytest

from mycelium_spark.operators import quality


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in quality.c4_filters(df).collect()}


GOOD = "one two three four five six.\nseven eight nine ten eleven!\ntwelve thirteen fourteen fifteen sixteen?"


def test_clean_doc_keeps_all_lines(spark):
    r = _run(spark, [(1, GOOD)])[1]
    assert r["keep"] is True and r["fail_reason"] is None
    assert r["n_lines"] == 3 and r["n_lines_kept"] == 3
    assert r["clean_text"] == GOOD


def test_line_without_terminal_punct_drops(spark):
    r = _run(spark, [(1, GOOD + "\nno punctuation line at all here")])[1]
    assert r["n_lines"] == 4 and r["n_lines_kept"] == 3
    assert r["keep"] is True  # doc survives on the 3 kept sentences


def test_closing_quote_is_terminal(spark):
    r = _run(spark, [(1, GOOD + '\nhe said the magic word "now"')])[1]
    assert r["n_lines_kept"] == 4


def test_four_word_line_drops_five_keeps(spark):
    r = _run(spark, [(1, GOOD + "\nfour words only here.\nfive words are enough now.")])[1]
    assert r["n_lines_kept"] == 4  # the 4-word line is out, the 5-word in


def test_javascript_line_drops_case_insensitive(spark):
    r = _run(spark, [(1, GOOD + "\nplease enable JavaScript to continue viewing.")])[1]
    assert r["n_lines_kept"] == 3


def test_curly_brace_drops_doc(spark):
    r = _run(spark, [(1, GOOD + "\nfunction f() { return one two three. }")])[1]
    assert r["keep"] is False and r["fail_reason"] == "curly_brace"


def test_lorem_ipsum_drops_doc(spark):
    r = _run(spark, [(1, "Lorem IPSUM dolor sit amet today.\n" + GOOD)])[1]
    assert r["keep"] is False and r["fail_reason"] == "lorem_ipsum"


def test_two_sentences_drop_three_keep(spark):
    two = "one two three four five six.\nseven eight nine ten eleven!"
    r = _run(spark, [(1, two), (2, GOOD)])
    assert r[1]["keep"] is False and r[1]["fail_reason"] == "too_few_sentences"
    assert r[2]["keep"] is True


def test_duckdb_twin_parity(spark):
    rows = [
        (0, GOOD),
        (1, GOOD + "\nbrace { here"),
        (2, "lorem ipsum filler.\n" + GOOD),
        (3, "no terminal punctuation anywhere in this text"),
        (4, GOOD + "\nshort line.\nuses javascript for everything today always."),
    ]
    got = sorted(
        tuple(r)
        for r in quality.c4_filters(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.sql(quality.c4_filters_sql("d")).fetchall())
    assert got == exp
