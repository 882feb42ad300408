"""Benchmark-decontamination operator: boundary + branch coverage, plus a
DuckDB-twin parity check on constructed docs with mid-range fractions
(the driver entry's fixture split only produces 0.0 / 1.0 overlaps)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    # eval corpus: one doc → distinct 2-grams {a b, b c, c d}
    return _docs(spark, [(100, "a b c d")])


def _run(spark, eval_docs, rows, n=2, threshold=0.25):
    out = decontam.decontaminate(_docs(spark, rows), eval_docs, n, threshold)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exactly_threshold_keeps(spark, eval_docs):
    # 4 distinct 2-grams {x y, y z, z a, a b}; exactly 1 matched ("a b")
    # → overlap 0.25 == threshold → KEEP (≤ semantics, exact integer cmp)
    r = _run(spark, eval_docs, [(1, "x y z a b")])[1]
    assert r["n_grams"] == 4 and r["n_matched"] == 1
    assert r["overlap_frac"] == 0.25
    assert r["keep"] is True


def test_just_over_threshold_drops(spark, eval_docs):
    # 3 distinct 2-grams {x y, y a, a b}, 1 matched → 1/3 > 0.25 → drop
    r = _run(spark, eval_docs, [(1, "x y a b")])[1]
    assert r["n_grams"] == 3 and r["n_matched"] == 1
    assert r["overlap_frac"] == round(1 / 3, 6)
    assert r["keep"] is False


def test_short_doc_zero_grams_keeps(spark, eval_docs):
    r = _run(spark, eval_docs, [(1, "solo")])[1]
    assert r["n_grams"] == 0 and r["n_matched"] == 0
    assert r["overlap_frac"] == 0.0
    assert r["keep"] is True


def test_full_overlap_drops(spark, eval_docs):
    r = _run(spark, eval_docs, [(1, "a b c")])[1]
    assert r["n_grams"] == 2 and r["n_matched"] == 2
    assert r["overlap_frac"] == 1.0
    assert r["keep"] is False


def test_repeated_gram_counts_once(spark, eval_docs):
    # "a b" occurs twice in the doc but is ONE distinct gram; "b a" bridges
    # grams: {a b, b a} → 2 distinct, 1 matched → 0.5
    r = _run(spark, eval_docs, [(1, "a b a b")])[1]
    assert r["n_grams"] == 2 and r["n_matched"] == 1
    assert r["overlap_frac"] == 0.5


def test_empty_tokens_filtered(spark, eval_docs):
    # double spaces produce empty tokens — they must not form grams
    r = _run(spark, eval_docs, [(1, "a  b  c")])[1]
    assert r["n_grams"] == 2 and r["n_matched"] == 2


def test_duckdb_twin_parity_midrange(spark):
    rows = [
        (0, "a b c d e f g h"),          # eval
        (1, "a b c x y z q w"),           # partial overlap
        (2, "p q r s t"),                 # no overlap
        (3, "a b c d e f g h"),           # full overlap
        (4, "zz"),                        # short
        (5, "x a b c d y a b c d"),       # repeated shared grams
    ]
    n, thr = 3, 0.3
    sdf = decontam.decontaminate(
        _docs(spark, [r for r in rows if r[0] != 0]), _docs(spark, [rows[0]]), n, thr
    )
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE alldocs (doc_id BIGINT, text VARCHAR);"
    )
    con.executemany("INSERT INTO alldocs VALUES (?, ?)", rows)
    sql = decontam.decontaminate_sql(
        n, thr,
        source="(SELECT * FROM alldocs WHERE doc_id != 0)",
        eval_source="(SELECT * FROM alldocs WHERE doc_id = 0)",
    )
    exp = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == exp
    # sanity: mid-range fraction actually exercised
    fracs = {r[0]: r[3] for r in got}
    assert 0.0 < fracs[1] < 1.0
