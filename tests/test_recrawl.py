"""Adaptive recrawl scheduling: estimator values, staleness ages,
bucket edges, and the digest-only shuffle shape."""

from mycelium_spark.operators import recrawl


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, round long, digest string")


def _run(spark, rows):
    return {
        r["url"]: r
        for r in recrawl.recrawl_priorities(_hist(spark, rows)).collect()
    }


def test_estimator_and_ages(spark):
    rows = []
    # hot: changes every round (3 intervals, 3 changes)
    rows += [("hot", r, f"h{r}") for r in range(4)]
    # static: never changes
    rows += [("static", r, "s") for r in range(4)]
    # once: changed at round 2, stale since
    rows += [("once", r, "a" if r < 2 else "b") for r in range(4)]
    # single observation: no intervals at all
    rows += [("new", 0, "x")]
    out = _run(spark, rows)

    hot = out["hot"]
    assert (hot["intervals"], hot["changes"]) == (3, 3)
    assert hot["p_millionths"] == (4 * 1_000_000) // 5  # (3+1)/(3+2)
    assert hot["age_rounds"] == 0  # changed at the last observation
    assert hot["priority_millionths"] == hot["p_millionths"]  # age+1 = 1

    st = out["static"]
    assert (st["intervals"], st["changes"]) == (3, 0)
    assert st["p_millionths"] == 1_000_000 // 5  # Laplace floor, not 0
    assert st["age_rounds"] == 3  # stale since first observation
    assert st["priority_millionths"] == st["p_millionths"] * 4

    on = out["once"]
    assert (on["intervals"], on["changes"]) == (3, 1)
    assert on["age_rounds"] == 1  # last change at round 2, last obs 3

    nw = out["new"]
    assert (nw["intervals"], nw["changes"]) == (0, 0)
    assert nw["p_millionths"] == 500_000  # uninformed prior mean
    assert nw["age_rounds"] == 0


def test_bucket_edges(spark):
    # p >= 500000 hourly; >= 100000 daily; >= 10000 weekly; else monthly
    rows = []
    rows += [("hourly", r, f"c{r}") for r in range(2)]  # p = 2/3
    rows += [("daily", r, "c" if r < 8 else "d") for r in range(9)]  # 2/10
    # 1 change in 48 intervals -> 2/50 = 40000 -> weekly
    rows += [("weekly", r, "c" if r < 48 else "d") for r in range(49)]
    # 0 changes in 120 intervals -> 1/122 = 8196 -> monthly
    rows += [("monthly", r, "c") for r in range(121)]
    out = _run(spark, rows)
    for name in ("hourly", "daily", "weekly", "monthly"):
        assert out[name]["next_bucket"] == name, (name, out[name])


def test_priority_semantics(spark):
    # expected-unseen-changes: at EQUAL staleness the hotter page wins;
    # at equal rate the staler page wins. (A long-stale static page
    # legitimately accumulates priority — that is the point of the
    # metric: it eventually gets rechecked instead of starving.)
    rows = [("hot", r, f"h{r}") for r in range(4)]
    rows += [("cold", r, "c" if r < 3 else "d") for r in range(4)]  # age 0 too
    rows += [("stale", r, "a" if r == 0 else "b") for r in range(4)]  # age 2
    rows += [("fresh", r, "a" if r < 3 else "b") for r in range(4)]  # age 0
    out = _run(spark, rows)
    assert out["hot"]["priority_millionths"] > out["cold"]["priority_millionths"]
    assert out["stale"]["p_millionths"] == out["fresh"]["p_millionths"]
    assert out["stale"]["priority_millionths"] > out["fresh"]["priority_millionths"]


def test_plan_digest_only_single_key(spark):
    df = recrawl.recrawl_priorities(_hist(spark, [("u", 0, "d")]))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Cartesian" not in plan and "Join" not in plan
