"""Unigram-LM perplexity filter: hand-computed Laplace math, the OOV
branch, DuckDB-twin equivalence, partitioning invariance, plan purity."""

import math

import duckdb
import pytest

from mycelium_spark.operators import lm

# train slice (doc_id % 5 = 0) = docs 0 and 5 → counts a:2 b:3 d:1,
# T=6, V=3, denom=9; doc 1 is fully/partly out-of-vocabulary
_DOCS = [(0, "a a b"), (1, "a c"), (5, "b b d"), (7, "b zz")]


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def _duck(rows, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return sorted(tuple(r) for r in con.sql(lm.unigram_nll_sql(**kw)).fetchall())


def test_hand_computed_laplace(spark):
    out = {r["doc_id"]: r for r in lm.unigram_nll(_df(spark, _DOCS)).collect()}
    nll = lambda cnt: round(math.log(9.0 / (cnt + 1)), 6)
    # doc 1 = "a c": a in-vocab (cnt 2), c OOV (cnt 0)
    assert out[1]["avg_nll"] == pytest.approx((nll(2) + nll(0)) / 2, abs=2e-6)
    assert out[1]["n_tokens"] == 2
    # doc 0 = "a a b": tf-weighted, trained-on doc scores low
    assert out[0]["avg_nll"] == pytest.approx((2 * nll(2) + nll(3)) / 3, abs=2e-6)
    # OOV-heavy doc scores strictly worse than the trained-on ones
    assert out[7]["avg_nll"] > out[0]["avg_nll"]
    assert out[7]["avg_nll"] > out[5]["avg_nll"]


def test_keep_gate_threshold(spark):
    thr = 1.2
    out = {
        r["doc_id"]: r["keep"]
        for r in lm.unigram_nll(_df(spark, _DOCS), nll_keep_max=thr).collect()
    }
    got = {r[0]: r[3] for r in _duck(_DOCS, nll_keep_max=thr)}
    assert out == got
    assert True in out.values() and False in out.values()  # both branches


def test_matches_duckdb_twin(spark):
    got = sorted(tuple(r) for r in lm.unigram_nll(_df(spark, _DOCS)).collect())
    assert got == _duck(_DOCS)


def test_zero_token_docs_dropped(spark):
    rows = _DOCS + [(9, "!!! ...")]  # no \w+ tokens → no score row
    out = lm.unigram_nll(_df(spark, rows)).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 5, 7]
    assert sorted(tuple(r) for r in out) == _duck(rows)


def test_partitioning_invariance(spark):
    a = sorted(tuple(r) for r in lm.unigram_nll(_df(spark, _DOCS)).collect())
    b = sorted(tuple(r) for r in lm.unigram_nll(_df(spark, _DOCS, parts=7)).collect())
    assert a == b


def test_plan_is_jvm_only(spark):
    df = lm.unigram_nll(_df(spark, _DOCS))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
