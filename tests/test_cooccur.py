"""PMI co-occurrence: hand-computed values, gate semantics, twin parity."""

import math

import duckdb
import pytest

from mycelium_spark.operators import cooccur

DOCS = [
    (1, "coffee milk sugar"),
    (2, "coffee milk"),
    (3, "coffee tea"),
    (4, "tea sugar lemon"),
    (5, "coffee milk foam"),
    (6, "rare1 rare2"),  # df-1 terms: gated out by min_df
]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["term_a"], r["term_b"]): (r["n_a"], r["n_b"], r["n_ab"], r["pmi"])
        for r in cooccur.cooccurrence_pmi(docs, min_df=2, min_pair=2).collect()
    }


def test_hand_computed_pmi(result):
    # coffee df=4, milk df=3, together 3 times, N=6:
    # pmi = ln(3*6 / (4*3)) = ln(1.5)
    assert result[("coffee", "milk")] == (4, 3, 3, round(math.log(1.5), 6))
    # milk sugar co-occur once only -> below min_pair
    assert ("milk", "sugar") not in result


def test_min_df_gates_hapaxes(result):
    assert not any("rare1" in k or "rare2" in k for k in result)


def test_max_df_gates_stopword_grade(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = cooccur.cooccurrence_pmi(docs, min_df=2, max_df=3, min_pair=2)
    assert not any(
        "coffee" in (r["term_a"], r["term_b"]) for r in out.collect()
    )  # coffee df=4 > 3


def test_duckdb_twin_parity(result):
    values = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS
    )
    rows = duckdb.sql(
        cooccur.cooccurrence_pmi_sql(2, 1 << 60, 2, source=f"( {values} )")
    ).fetchall()
    assert {(a, b): (na, nb, nab, p) for a, b, na, nb, nab, p in rows} == result


def test_plan_map_side_combine_no_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        cooccur.cooccurrence_pmi(docs, min_df=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2  # partial + final pair counts
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
