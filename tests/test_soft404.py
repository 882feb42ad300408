"""Soft-404 detection: signal weights, the 200-only rule, and the
single-projection plan."""

from mycelium_spark.operators import soft404

LONG = "genuine readable content " * 10  # > 80 chars, no error phrases


def _run(spark, rows):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "doc_id long, status long, title string, text string",
    )
    return {r["doc_id"]: r for r in soft404.detect_soft404(df).collect()}


def test_signals_and_threshold(spark):
    out = _run(
        spark,
        [
            (200, "Page Not Found", "gone"),  # title(2) + tiny(1) = 3
            (200, "My Blog", "Sorry, page not found. " + LONG),  # body 1 only
            (200, "My Blog", "tiny"),  # tiny only: 1
            (200, "404 Error", LONG),  # title only: 2 -> fires
            (200, "My Blog", LONG),  # clean
            (200, "My Blog", "page not found, it does not exist"),  # 2 body + tiny
        ],
    )
    assert out[0]["soft404"] and out[0]["score"] == 3
    assert not out[1]["soft404"] and out[1]["score"] == 1
    assert not out[2]["soft404"] and out[2]["score"] == 1
    assert out[3]["soft404"] and out[3]["title_hits"] == 2  # '404' + 'error'
    assert not out[4]["soft404"] and out[4]["score"] == 0
    assert out[5]["soft404"] and out[5]["body_hits"] == 2


def test_real_404_never_soft(spark):
    out = _run(spark, [(404, "Page Not Found", "gone"), (410, "Not Found", "x")])
    assert not out[0]["soft404"] and out[0]["score"] == 3
    assert not out[1]["soft404"]


def test_plan_single_projection(spark):
    df = spark.createDataFrame(
        [(1, 200, "t", "b")], "doc_id long, status long, title string, text string"
    )
    plan = soft404.detect_soft404(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
