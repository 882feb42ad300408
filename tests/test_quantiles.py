"""Exact percentiles: nearest-rank law vs Python, duplicates, skewed
domains, partitioning invariance, empty input."""

import math

from mycelium_spark.operators import quantiles


def _py_pct(values, p):
    k = math.ceil(len(values) * p / 1000)
    return sorted(values)[k - 1]


def _run(spark, values, ps=quantiles.PS_DEFAULT, parts=None):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    if parts:
        df = df.repartition(parts)
    return {
        r["p_milli"]: r for r in quantiles.exact_percentiles(df, "v", ps).collect()
    }


def test_nearest_rank_matches_python(spark):
    vals = [((i * 7919) % 1000) for i in range(500)]
    out = _run(spark, vals)
    for p in (500, 900, 990):
        assert out[p]["value"] == _py_pct(vals, p), p


def test_duplicates_and_skew(spark):
    # 90% of mass on one value: median and p90 sit on it, p99 above
    vals = [42] * 900 + list(range(100, 200))
    out = _run(spark, vals)
    assert out[500]["value"] == 42 and out[900]["value"] == 42
    assert out[990]["value"] == _py_pct(vals, 990) > 42
    # n_le counts everything <= the percentile value
    assert out[500]["n_le"] == 900


def test_single_value_and_custom_ps(spark):
    out = _run(spark, [7, 7, 7], ps=(1, 999))
    assert out[1]["value"] == 7 and out[999]["value"] == 7


def test_partitioning_invariance(spark):
    vals = [((i * 31) % 97) for i in range(300)]
    a = _run(spark, vals, parts=1)
    b = _run(spark, vals, parts=8)
    assert {k: (v["value"], v["n_le"]) for k, v in a.items()} == {
        k: (v["value"], v["n_le"]) for k, v in b.items()
    }


def test_empty_input(spark):
    df = spark.createDataFrame([], "v long")
    assert quantiles.exact_percentiles(df, "v").collect() == []
