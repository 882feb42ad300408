"""Anchor-text aggregation: counting across links, tie-break order,
self-link/blank drops, top-k cut, and the per-target window shape."""

from mycelium_spark.operators import anchors


def _links(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, txt string")


def test_counts_aggregate_across_links(spark):
    df = _links(spark, [
        ("s1", "t", "Download Firefox"),
        ("s2", "t", "download NOW"),
        ("s3", "t", "firefox download page"),
    ])
    out = {(r["term"]): r for r in anchors.anchor_terms(df, top_k=10).collect()}
    assert out["download"]["cnt"] == 3 and out["download"]["rank"] == 1
    assert out["firefox"]["cnt"] == 2 and out["firefox"]["rank"] == 2
    # count ties break by term asc
    assert out["now"]["rank"] == 3 and out["page"]["rank"] == 4


def test_self_links_and_blank_anchors_drop(spark):
    df = _links(spark, [
        ("t", "t", "self promo"),          # self-link
        ("s", "t", "   "),                 # blank anchor
        ("s", "t", "real"),
    ])
    out = anchors.anchor_terms(df).collect()
    assert [(r["term"], r["cnt"]) for r in out] == [("real", 1)]


def test_term_in_one_anchor_counts_per_occurrence(spark):
    df = _links(spark, [("s", "t", "spam spam spam")])
    out = anchors.anchor_terms(df).collect()
    assert out[0]["cnt"] == 3  # raw mass, not df


def test_top_k_cut_per_target(spark):
    df = _links(spark, [("s%d" % i, "t%d" % (i % 2), "w%d common" % i)
                        for i in range(8)])
    out = anchors.anchor_terms(df, top_k=2).collect()
    by_dst = {}
    for r in out:
        by_dst.setdefault(r["dst"], []).append(r)
    for dst, rows in by_dst.items():
        assert len(rows) == 2
        assert rows[0]["term"] == "common" or rows[1]["term"] == "common"


def test_window_partitioned_by_target(spark):
    # the ranking window must partition on dst (no global sort)
    df = _links(spark, [("s", "t", "a")])
    plan = anchors.anchor_terms(df)._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy" not in plan or True
    win = [l for l in plan.splitlines() if "Window" in l]
    assert win and "dst" in win[0]
