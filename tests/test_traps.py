"""Crawl-trap detection: every rule, rule ordering, boundary
negatives, and the single-projection plan shape."""

from mycelium_spark.operators import traps


def _run(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r["doc_id"]: r for r in traps.detect_traps(df).collect()}


def test_each_rule_fires(spark):
    out = _run(
        spark,
        [
            "http://h/cat/page/cat/page/cat/page/x",  # 0
            "http://h/a/b/c/d/e/f/g/h/i/j/k/l/m",  # 1: 13 segs
            "http://h/s?q=" + "x" * 300,  # 2
            "http://h/s?" + "&".join(f"a{i}=1" for i in range(11)),  # 3
            "http://h/p;jsessionid=ABC",  # 4
            "http://h/2026/08/17/0500/p",  # 5
        ],
    )
    assert out[0]["reason"] == "repeated_segments" and out[0]["max_seg_repeat"] == 3
    assert out[1]["reason"] == "path_depth" and out[1]["path_depth"] == 13
    assert out[2]["reason"] == "query_length" and out[2]["query_len"] == 302
    assert out[3]["reason"] == "param_count" and out[3]["n_params"] == 11
    assert out[4]["reason"] == "session_id"
    assert out[5]["reason"] == "numeric_segments" and out[5]["n_numeric_segs"] == 4
    assert all(r["trap"] for r in out.values())


def test_boundaries_stay_clean(spark):
    out = _run(
        spark,
        [
            "http://h/cat/page/cat/x",  # repeat 2 < 3
            "http://h/" + "/".join("abcdefghijkl"),  # depth 12, not > 12
            "http://h/s?q=" + "x" * 254,  # query_len 256, not > 256
            "http://h/s?" + "&".join(f"a{i}=1" for i in range(10)),  # 10 params
            "http://h/a/b?x=1&userid=22",  # 'userid=' is not 'sid='
            "http://h/1/2/3/x",  # 3 numeric segs < 4
            "http://h/",  # no path at all
            "http://h/p.html",
        ],
    )
    assert all(not r["trap"] and r["reason"] == "" for r in out.values())
    assert out[6]["path_depth"] == 0 and out[6]["max_seg_repeat"] == 0


def test_rule_order_first_failing(spark):
    # a URL violating both repetition and depth reports repetition (the
    # fixed rule order), like the Gopher filter convention
    out = _run(spark, ["http://h/" + "/".join(["a"] * 15)])
    assert out[0]["reason"] == "repeated_segments"


def test_query_ignores_fragment(spark):
    out = _run(spark, ["http://h/p?a=1#frag=" + "x" * 300])
    assert out[0]["query_len"] == 3 and not out[0]["trap"]


def test_plan_single_projection_no_python(spark):
    df = spark.createDataFrame([(1, "http://h/p")], "doc_id long, url string")
    plan = (
        traps.detect_traps(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "Exchange" not in plan and "Aggregate" not in plan
