"""Largest-remainder budget apportionment: exact totals, bonus
placement, degenerate cases, and partitioning invariance of the
two-phase rank."""

from mycelium_spark.operators import budget


def _run(spark, rows, b):
    df = spark.createDataFrame(rows, "host string, weight long")
    return {r["host"]: r for r in budget.apportion_budget(df, b).collect()}


def test_exact_hamilton(spark):
    # budget 10 over weights 5,3,1: bases 5,3,1 (floor of 50/9,30/9,10/9
    # = 5.55,3.33,1.11 -> 5,3,1), leftover 1 goes to the largest
    # remainder (a: 50%9=5; b: 30%9=3; c: 10%9=1)
    out = _run(spark, [("a", 5), ("b", 3), ("c", 1)], 10)
    assert (out["a"]["base"], out["b"]["base"], out["c"]["base"]) == (5, 3, 1)
    assert out["a"]["quota"] == 6 and out["b"]["quota"] == 3 and out["c"]["quota"] == 1
    assert sum(r["quota"] for r in out.values()) == 10


def test_remainder_tie_breaks_by_host(spark):
    # equal weights, budget 5 over 3 hosts: bases 1, remainders all
    # equal -> 2 bonuses land on the two smallest host names
    out = _run(spark, [("x", 2), ("m", 2), ("a", 2)], 5)
    assert [out[h]["quota"] for h in ("a", "m", "x")] == [2, 2, 1]


def test_zero_weight_host_and_total(spark):
    out = _run(spark, [("a", 0), ("b", 7)], 9)
    assert out["a"]["quota"] == 0 and out["b"]["quota"] == 9
    # all-zero weights: round-robin of the budget, host-ascending bonus
    out = _run(spark, [("a", 0), ("b", 0), ("c", 0)], 7)
    assert [out[h]["quota"] for h in ("a", "b", "c")] == [3, 2, 2]
    assert sum(r["quota"] for r in out.values()) == 7


def test_quotas_always_sum_to_budget(spark):
    rows = [(f"h{i:03d}", (i * i) % 101 + 1) for i in range(300)]
    out = _run(spark, rows, 12_345)
    assert sum(r["quota"] for r in out.values()) == 12_345
    assert sum(r["bonus"] for r in out.values()) < 300  # < one per host


def test_partitioning_invariance(spark):
    rows = [(f"h{i:03d}", (i * 7) % 31 + 1) for i in range(100)]
    df1 = spark.createDataFrame(rows, "host string, weight long").repartition(1)
    df8 = spark.createDataFrame(rows, "host string, weight long").repartition(8)
    a = sorted(map(tuple, budget.apportion_budget(df1, 997).collect()))
    b = sorted(map(tuple, budget.apportion_budget(df8, 997).collect()))
    assert a == b
