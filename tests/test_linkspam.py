"""Link-spam features: degree math, reciprocity, self-loop isolation,
and the distinct-edge discipline."""

from mycelium_spark.operators import linkspam


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["host"]: r for r in linkspam.linkspam_features(df).collect()}


def test_degrees_and_reciprocity(spark):
    out = _run(
        spark,
        [
            ("farm1", "farm2"), ("farm2", "farm1"),  # reciprocal pair
            ("farm1", "farm3"), ("farm3", "farm1"),
            ("good", "farm1"),  # one-way in
            ("farm1", "news"),  # one-way out
        ],
    )
    f1 = out["farm1"]
    assert (f1["out_deg"], f1["in_deg"]) == (3, 3)
    assert f1["recip_links"] == 2 and f1["recip_milli"] == 666
    assert out["good"]["recip_links"] == 0 and out["good"]["in_deg"] == 0
    assert out["news"]["out_deg"] == 0 and out["news"]["recip_milli"] == 0
    assert out["good"]["ratio_milli"] == 2000  # (1+1)/(0+1)


def test_self_loops_excluded_from_degrees(spark):
    out = _run(spark, [("a", "a"), ("a", "b")])
    assert out["a"]["self_links"] == 1
    assert out["a"]["out_deg"] == 1 and out["a"]["in_deg"] == 0
    assert out["b"]["self_links"] == 0
    # a self-loop is not a reciprocal link
    assert out["a"]["recip_links"] == 0


def test_multiplicity_is_not_evidence(spark):
    out = _run(spark, [("a", "b")] * 50 + [("b", "a")])
    assert out["a"]["out_deg"] == 1 and out["a"]["recip_links"] == 1
    assert out["a"]["recip_milli"] == 1000


def test_plan_no_cartesian(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    plan = (
        linkspam.linkspam_features(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "Window" not in plan
