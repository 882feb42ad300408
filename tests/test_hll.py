"""Deterministic HLL: rho kernel vs a Python reference, accuracy
bounds on both estimator branches, duplicate insensitivity, merge/
partitioning invariance, and the fixed-size-sketch plan."""

import hashlib

from mycelium_spark.operators import hll


def _py_estimate(keys):
    """Independent single-process reference of the whole pipeline."""
    import math

    regs = {}
    for k in set(keys):
        h = hashlib.md5(k.encode()).hexdigest()
        b = h[:2]
        v = int(h[2:8], 16)
        rho = min(24 - v.bit_length() + 1, hll.RHO_CAP) if v else hll.RHO_CAP
        regs[b] = max(regs.get(b, 0), rho)
    nz = len(regs)
    s_scaled = sum(1 << (hll.RHO_CAP - m) for m in regs.values())
    s_scaled += (hll.M - nz) * (1 << hll.RHO_CAP)
    raw = hll.ALPHA_256 * hll.M * hll.M * float(2 ** hll.RHO_CAP) / s_scaled
    if raw <= 2.5 * hll.M and nz < hll.M:
        return round(hll.M * math.log(hll.M / (hll.M - nz)), 3)
    return round(raw, 3)


def _run(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "host string, url string")
    if parts:
        df = df.repartition(parts)
    return {
        r["grp"]: r for r in hll.approx_distinct(df, "url", "host").collect()
    }


def test_matches_python_reference_lc_branch(spark):
    keys = [f"/u{i}" for i in range(80)]
    out = _run(spark, [("h", k) for k in keys])
    assert out["h"]["estimate"] == _py_estimate(keys)


def test_matches_python_reference_raw_branch(spark):
    keys = [f"/u{i}" for i in range(3000)]
    out = _run(spark, [("h", k) for k in keys])
    est = out["h"]["estimate"]
    assert est == _py_estimate(keys)
    assert abs(est - 3000) / 3000 < 0.2  # ~3 sigma at m=256


def test_duplicates_do_not_count(spark):
    once = _run(spark, [("h", f"/u{i}") for i in range(50)])
    thrice = _run(spark, [("h", f"/u{i % 50}") for i in range(150)])
    assert once["h"]["estimate"] == thrice["h"]["estimate"]


def test_partitioning_invariance(spark):
    rows = [(f"h{i % 3}", f"/u{i}") for i in range(600)]
    a = _run(spark, rows, parts=1)
    b = _run(spark, rows, parts=8)
    assert {k: v["estimate"] for k, v in a.items()} == {
        k: v["estimate"] for k, v in b.items()
    }


def test_accuracy_band(spark):
    for n in (100, 1000):
        out = _run(spark, [("h", f"/k{i}") for i in range(n)])
        assert abs(out["h"]["estimate"] - n) / n < 0.25


def test_plan_fixed_size_no_distinct_shuffle(spark):
    df = spark.createDataFrame([("h", "/u")], "host string, url string")
    plan = (
        hll.approx_distinct(df, "url", "host")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the raw key column must not survive past the first projection:
    # aggregations run on (grp, bucket, rho) only
    for line in plan.splitlines():
        if "Aggregate" in line:
            assert "url#" not in line
    assert "BatchEvalPython" not in plan
