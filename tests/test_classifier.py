"""fastText-style classifier gate: hand-checked integer scoring, pluggable
weight table, DuckDB-twin equivalence, broadcast plan pin."""

import duckdb

from mycelium_spark.operators import classifier

_DOCS = [(0, "a a b"), (1, "c"), (2, "a b c d"), (3, "!!!")]


def _df(spark, rows=_DOCS, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def _duck(rows=_DOCS, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return sorted(tuple(r) for r in con.sql(classifier.classifier_score_sql(**kw)).fetchall())


def test_matches_duckdb_twin(spark):
    got = sorted(tuple(r) for r in classifier.classifier_score(_df(spark)).collect())
    assert got == _duck()


def test_integer_scoring_vs_manual(spark):
    # score doc 0 by hand through the same hash → bucket → weight chain
    out = {r["doc_id"]: r for r in classifier.classifier_score(_df(spark)).collect()}
    con = duckdb.connect()
    w = {}
    for t in ("a", "b"):
        bucket = con.sql(
            f"SELECT CAST(('0x' || substr(md5('{t}'),1,7)) AS BIGINT) % 4096"
        ).fetchone()[0]
        w[t] = bucket * classifier._MIX % 2001 - 1000
    assert out[0]["logit_sum"] == 2 * w["a"] + w["b"]
    assert out[0]["n_tokens"] == 3
    assert out[0]["keep"] == (out[0]["logit_sum"] * 1000 >= 0)
    assert 3 not in out  # tokenless doc drops


def test_pluggable_weight_table(spark):
    # an all-negative model must drop everything; all-positive keeps all
    for wval, expect in ((-5, False), (5, True)):
        w = spark.range(4096).selectExpr("id AS bucket", f"CAST({wval} AS BIGINT) AS weight_milli")
        out = classifier.classifier_score(_df(spark), weights=w).collect()
        assert len(out) == 3 and all(r["keep"] == expect for r in out)


def test_threshold_gate(spark):
    base = {r["doc_id"]: r for r in classifier.classifier_score(_df(spark)).collect()}
    hi = {
        r["doc_id"]: r
        for r in classifier.classifier_score(_df(spark), thr_milli=10**6).collect()
    }
    assert any(r["keep"] for r in base.values())
    assert not any(r["keep"] for r in hi.values())
    assert _duck(thr_milli=10**6) == sorted(
        tuple(r) for r in classifier.classifier_score(_df(spark), thr_milli=10**6).collect()
    )


def test_partitioning_invariance(spark):
    a = sorted(tuple(r) for r in classifier.classifier_score(_df(spark)).collect())
    b = sorted(tuple(r) for r in classifier.classifier_score(_df(spark, parts=7)).collect())
    assert a == b


def test_plan_broadcasts_weights(spark):
    plan = (
        classifier.classifier_score(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
