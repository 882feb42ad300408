"""Snapshot delta: all four status branches, digest semantics, and the
bodies-never-move plan shape."""

from mycelium_spark.operators import delta


def test_all_four_branches(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "going away")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "brand new")],
        "url string, text string",
    )
    out = {r["url"]: r for r in delta.snapshot_delta(old, new).collect()}
    assert out["u1"]["status"] == "unchanged"
    assert out["u2"]["status"] == "changed"
    assert out["u3"]["status"] == "gone" and out["u3"]["new_digest"] == ""
    assert out["u4"]["status"] == "added" and out["u4"]["old_digest"] == ""
    assert out["u1"]["old_digest"] == out["u1"]["new_digest"] != ""
    assert out["u2"]["old_digest"] != out["u2"]["new_digest"]


def test_digests_computed_before_join(spark):
    # document bodies must not cross the join: the join inputs project
    # (url, digest) only
    old = spark.createDataFrame([("u", "x" * 1000)], "url string, text string")
    new = spark.createDataFrame([("u", "y" * 1000)], "url string, text string")
    plan = delta.snapshot_delta(old, new)._jdf.queryExecution().optimizedPlan().toString()
    # 'text' appears only under the pre-join Projects (md5 input), never
    # as a join output attribute
    join_line = [l for l in plan.splitlines() if "Join" in l][0]
    assert "text" not in join_line
